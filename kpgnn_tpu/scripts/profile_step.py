"""Profile the flagship training step on the attached TPU.

Answers "where does the step time go" for the three regimes the bench
tracks (VERDICT round-3 asks 2/3/8):

  * ``resident``  — the flagship KPGINPlus dense-resident scan epoch
    (bench.py's headline backend): capture a jax.profiler trace of one
    steady-state epoch and print the top device-time ops.
  * ``bf16``      — single dense train step, f32 vs bf16 A/B with
    per-variant traces (the round-3 bench had bf16 30% slower).
  * ``large``     — the n=8192 polymer pallas train step.

Each stage is independent; failures are reported and skipped.  Traces
land under ``--out_dir`` and are summarized inline with
utils/trace_summary (no TensorBoard needed — zero-egress environment).

The reference has no profiling subsystem at all (SURVEY.md §5); this is
the TPU-native observability tool the rebuild adds.
"""
from __future__ import annotations

import argparse
import os
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

K, L, HIDDEN, BATCH = 8, 8, 104, 64
N_SLOT = 40


def _flagship(dtype="float32"):
    from kpgnn_tpu.data.synthetic import synthetic_molecules
    from kpgnn_tpu.models import ModelConfig, make_model
    from kpgnn_tpu.prep import KHopConfig

    kcfg = KHopConfig(K=K, kernel="spd", max_edge_attr_num=30,
                      max_hop_num=6, max_edge_type=3, max_edge_count=20,
                      max_distance_count=30)
    graphs = synthetic_molecules(4 * BATCH, kcfg, seed=0)
    mcfg = ModelConfig(
        model_name="KPGINPlus", hidden_size=HIDDEN, num_layer=L, K=K,
        num_hop1_edge=3, max_pe_num=30, max_edge_type=3,
        max_edge_count=20, max_hop_num=6, max_distance_count=30,
        JK="concat", combine="attention", residual=True,
        input_encoder=("embedding", 21),
        task="graph_regression", pooling_method="sum",
        compute_dtype=dtype)
    return make_model(mcfg), mcfg, graphs


def _summarize(out_dir, label, top_n=30):
    from kpgnn_tpu.utils.trace_summary import report
    try:
        print(f"\n==== trace summary: {label} ====")
        print(report(out_dir, top_n), flush=True)
    except Exception as e:
        print(f"trace summary failed for {label}: {e!r}", flush=True)


def stage_resident(out_dir):
    from kpgnn_tpu.graph.batch import collate_dense
    from kpgnn_tpu.train import (build_dense_store, create_train_state,
                                 epoch_index_chunks,
                                 make_resident_train_epoch)

    model, mcfg, graphs = _flagship()
    v1, vk = mcfg.num_hop1_edge + 2, mcfg.max_pe_num + 2
    store = build_dense_store(graphs, N_SLOT, v1=v1, vk=vk)
    chunks = jnp.asarray(epoch_index_chunks(
        np.arange(len(graphs)), BATCH, store.num_graphs))
    example = collate_dense(graphs[:BATCH], n_slot=N_SLOT, v1=v1, vk=vk,
                            g_pad=BATCH)
    state, tx = create_train_state(model, example, jax.random.PRNGKey(0),
                                   1e-3)
    ep = make_resident_train_epoch(model, tx, loss="l1")
    rng = jax.random.PRNGKey(1)
    state, ls, cnt = ep(state, store, chunks, rng)     # compile + warmup
    jax.block_until_ready(ls)
    t0 = time.perf_counter()
    for _ in range(3):
        state, ls, cnt = ep(state, store, chunks, rng)
    jax.block_until_ready(ls)
    dt = (time.perf_counter() - t0) / 3
    print(f"resident epoch steady-state: {dt * 1e3:.1f} ms "
          f"({len(chunks)} steps of batch {BATCH})", flush=True)
    d = os.path.join(out_dir, "resident")
    jax.profiler.start_trace(d)
    state, ls, cnt = ep(state, store, chunks, rng)
    jax.block_until_ready(ls)
    jax.profiler.stop_trace()
    _summarize(d, "resident epoch (flagship KPGINPlus K=8 L=8 h=104)")


def stage_resident_ab(out_dir):
    """Resident-epoch A/B: f32 vs bf16 activations, steady-state only."""
    from kpgnn_tpu.graph.batch import collate_dense
    from kpgnn_tpu.train import (build_dense_store, create_train_state,
                                 epoch_index_chunks,
                                 make_resident_train_epoch)

    _, mcfg, graphs = _flagship()
    v1, vk = mcfg.num_hop1_edge + 2, mcfg.max_pe_num + 2
    store = build_dense_store(graphs, N_SLOT, v1=v1, vk=vk)
    chunks = jnp.asarray(epoch_index_chunks(
        np.arange(len(graphs)), BATCH, store.num_graphs))
    example = collate_dense(graphs[:BATCH], n_slot=N_SLOT, v1=v1, vk=vk,
                            g_pad=BATCH)
    import gc
    import os as _os
    dtypes = _os.environ.get("AB_DTYPES", "float32,bfloat16").split(",")
    for dtype in dtypes:
        gc.collect()            # drop the previous dtype's state buffers
        model, _, _ = _flagship(dtype)
        state, tx = create_train_state(model, example,
                                       jax.random.PRNGKey(0), 1e-3)
        ep = make_resident_train_epoch(model, tx, loss="l1")
        rng = jax.random.PRNGKey(1)
        state, ls, cnt = ep(state, store, chunks, rng)
        jax.block_until_ready(ls)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                state, ls, cnt = ep(state, store, chunks, rng)
            jax.block_until_ready(ls)
            best = min(best, (time.perf_counter() - t0) / 5)
        print(f"resident {dtype} epoch: {best * 1e3:.2f} ms "
              f"({len(chunks)} steps, loss_sum={float(ls):.4f})",
              flush=True)
        d = os.path.join(out_dir, f"resident_{dtype}")
        jax.profiler.start_trace(d)
        state, ls, cnt = ep(state, store, chunks, rng)
        jax.block_until_ready(ls)
        jax.profiler.stop_trace()
        _summarize(d, f"resident {dtype} epoch")
        del state, tx, ep, ls, cnt, model
        gc.collect()


def stage_bf16(out_dir):
    from kpgnn_tpu.graph.batch import collate_dense
    from kpgnn_tpu.train import create_train_state, make_train_step

    _, mcfg, graphs = _flagship()
    v1, vk = mcfg.num_hop1_edge + 2, mcfg.max_pe_num + 2
    batches = [collate_dense(graphs[i:i + BATCH], n_slot=N_SLOT, v1=v1,
                             vk=vk, g_pad=BATCH)
               for i in range(0, len(graphs), BATCH)]
    for dtype in ("float32", "bfloat16"):
        model, _, _ = _flagship(dtype)
        state, tx = create_train_state(model, batches[0],
                                       jax.random.PRNGKey(0), 1e-3)
        step = make_train_step(model, tx, loss="l1", donate=True)
        rng = jax.random.PRNGKey(1)
        for b in batches:
            state, m = step(state, b, rng)
        jax.block_until_ready(m["loss_sum"])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(50):
                state, m = step(state, batches[i % len(batches)], rng)
            jax.block_until_ready(m["loss_sum"])
            best = min(best, (time.perf_counter() - t0) / 50)
        print(f"dense {dtype} step: {best * 1e3:.3f} ms", flush=True)
        d = os.path.join(out_dir, f"step_{dtype}")
        jax.profiler.start_trace(d)
        for i in range(10):
            state, m = step(state, batches[i % len(batches)], rng)
        jax.block_until_ready(m["loss_sum"])
        jax.profiler.stop_trace()
        _summarize(d, f"dense {dtype} single step x10")


def stage_large(out_dir):
    from kpgnn_tpu.data.synthetic import synthetic_polymers
    from kpgnn_tpu.graph.batch import collate_pallas
    from kpgnn_tpu.models import ModelConfig, make_model
    from kpgnn_tpu.train import create_train_state, make_train_step

    n_nodes, kk, batch = 8192, 3, 2
    graphs = synthetic_polymers(batch, n_nodes, K=kk, seed=0)
    mcfg = ModelConfig(
        model_name="KPGIN", hidden_size=102, num_layer=3, K=kk,
        num_hop1_edge=3, max_pe_num=30, max_edge_type=3,
        max_edge_count=20, max_hop_num=6, max_distance_count=30,
        JK="last", combine="attention", residual=True,
        input_encoder=("embedding", 21),
        task="graph_regression", pooling_method="sum",
        compute_dtype="float32")
    model = make_model(mcfg)
    v1, vk = mcfg.num_hop1_edge + 2, mcfg.max_pe_num + 2
    b = collate_pallas(graphs, v1=v1, vk=vk, tile_r=256, wblock=512,
                       egroup=4)
    state, tx = create_train_state(model, b, jax.random.PRNGKey(0), 1e-3)
    step = make_train_step(model, tx, loss="l1", donate=True)
    rng = jax.random.PRNGKey(1)
    state, m = step(state, b, rng)
    jax.block_until_ready(m["loss_sum"])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            state, m = step(state, b, rng)
        jax.block_until_ready(m["loss_sum"])
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f"large-graph pallas step: {best * 1e3:.3f} ms", flush=True)
    d = os.path.join(out_dir, "large_pallas")
    jax.profiler.start_trace(d)
    for _ in range(5):
        state, m = step(state, b, rng)
    jax.block_until_ready(m["loss_sum"])
    jax.profiler.stop_trace()
    _summarize(d, "large-graph pallas step (n=8192 x2, K=3) x5")


def stage_banded(out_dir):
    """The banded-backend large-graph step (f32 + bf16)."""
    from kpgnn_tpu.data.synthetic import synthetic_polymers
    from kpgnn_tpu.graph.batch import collate_banded
    from kpgnn_tpu.models import ModelConfig, make_model
    from kpgnn_tpu.train import create_train_state, make_train_step

    n_nodes, kk, batch = 8192, 3, 2
    graphs = synthetic_polymers(batch, n_nodes, K=kk, seed=0)
    mk = lambda dtype: ModelConfig(
        model_name="KPGIN", hidden_size=102, num_layer=3, K=kk,
        num_hop1_edge=3, max_pe_num=30, max_edge_type=3,
        max_edge_count=20, max_hop_num=6, max_distance_count=30,
        JK="last", combine="attention", residual=True,
        input_encoder=("embedding", 21),
        task="graph_regression", pooling_method="sum",
        compute_dtype=dtype)
    b = collate_banded(graphs, v1=5, vk=32)
    print(f"banded plan: tile={b.adj.tile}, halo={b.adj.halo}, "
          f"spill={'none' if b.adj.spill_senders is None else b.adj.spill_senders.shape[0]}",
          flush=True)
    for dtype in ("float32", "bfloat16"):
        model = make_model(mk(dtype))
        state, tx = create_train_state(model, b, jax.random.PRNGKey(0),
                                       1e-3)
        step = make_train_step(model, tx, loss="l1", donate=True)
        rng = jax.random.PRNGKey(1)
        state, m = step(state, b, rng)
        jax.block_until_ready(m["loss_sum"])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                state, m = step(state, b, rng)
            jax.block_until_ready(m["loss_sum"])
            best = min(best, (time.perf_counter() - t0) / 20)
        print(f"banded {dtype} step: {best * 1e3:.3f} ms", flush=True)
        d = os.path.join(out_dir, f"banded_{dtype}")
        jax.profiler.start_trace(d)
        for _ in range(5):
            state, m = step(state, b, rng)
        jax.block_until_ready(m["loss_sum"])
        jax.profiler.stop_trace()
        _summarize(d, f"banded {dtype} large step (n=8192 x2, K=3) x5")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", default="/tmp/kpgnn_profile")
    p.add_argument("--stages", default="resident,bf16,large")
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)
    for stage in args.stages.split(","):
        fn = {"resident": stage_resident, "bf16": stage_bf16,
              "resident_ab": stage_resident_ab,
              "large": stage_large, "banded": stage_banded}[stage.strip()]
        print(f"\n######## stage {stage} ########", flush=True)
        t0 = time.time()
        try:
            fn(args.out_dir)
        except Exception:
            traceback.print_exc()
        print(f"[stage {stage} done in {time.time() - t0:.1f}s]",
              flush=True)


if __name__ == "__main__":
    main()
