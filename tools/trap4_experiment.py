#!/usr/bin/env python
"""Root-cause experiment for MEASUREMENT TRAP 4 (CLAUDE.md).

Symptom: a bf16 resident epoch dispatched AFTER f32 executables in the
same process runs ~4x slower WALL time with unchanged device time;
measured first or alone it is faster than f32.  The family also covers
"in-process banded depressed ~35%" and "which dtype wins flips run to
run".  All published numbers currently work around it with subprocess
isolation; this experiment varies one factor at a time to find the
mechanism.

Modes (each runs in its own process; drive with --mode):
  alone        bf16 epoch only                          (control: fast)
  after_f32    f32 epochs then bf16 epochs              (repro: slow?)
  nodonate     like after_f32 but bf16 epoch donate=False
  clear_cache  like after_f32 but jax.clear_caches() + del f32 state
               between the two measurements
  fresh_store  like after_f32 but the bf16 run packs its own copy of
               the store (no buffer sharing with the f32 run)
  f32_after    control for symmetry: bf16 first, then measure f32
  reverse_each run bf16, f32, bf16, f32 alternating — does the first
               bf16 stay fast and the second go slow?

Prints one JSON line: per-phase best epoch wall seconds + edges/s.

Usage:
  for m in alone after_f32 nodonate clear_cache fresh_store f32_after; do
    PYTHONPATH=/root/repo:/root/.axon_site python tools/trap4_experiment.py --mode $m
  done
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench  # the bench module's model/graph builders (same workload)


_SHARED = {}


def build(dtype, fresh_store=False):
    """Models/graphs/chunks are built once and shared across phases (the
    production scenario); `fresh_store=True` packs a new store copy to
    isolate buffer-sharing effects."""
    from kpgnn_tpu.graph.batch import collate_dense
    from kpgnn_tpu.train import build_dense_store, epoch_index_chunks

    if not _SHARED:
        model, mcfg, graphs, model_bf16 = bench._model_and_graphs()
        v1, vk = mcfg.num_hop1_edge + 2, mcfg.max_pe_num + 2
        store = build_dense_store(graphs, bench.N_SLOT, v1=v1, vk=vk)
        chunks = jnp.asarray(epoch_index_chunks(
            np.arange(len(graphs)), bench.BATCH, store.num_graphs))
        example = collate_dense(graphs[:bench.BATCH], n_slot=bench.N_SLOT,
                                v1=v1, vk=vk, g_pad=bench.BATCH)
        _SHARED.update(model=model, model_bf16=model_bf16, mcfg=mcfg,
                       graphs=graphs, store=store, chunks=chunks,
                       example=example,
                       epe=sum(g.num_edges for g in graphs),
                       v1=v1, vk=vk)
    s = _SHARED
    st = s["store"]
    if fresh_store:
        st = build_dense_store(s["graphs"], bench.N_SLOT, v1=s["v1"],
                               vk=s["vk"])
    m = s["model_bf16"] if dtype == "bf16" else s["model"]
    return m, st, s["chunks"], s["example"], s["epe"]


def measure(dtype, donate=True, fresh_store=False, n_epochs=12):
    from kpgnn_tpu.train import create_train_state, make_resident_train_epoch

    m, st, chunks, example, epe = build(dtype, fresh_store)
    state, tx = create_train_state(m, example, jax.random.PRNGKey(0), 1e-3)
    ep = make_resident_train_epoch(m, tx, loss="l1", donate=donate)
    rng = jax.random.PRNGKey(1)
    state, ls, cnt = ep(state, st, chunks, rng)
    jax.block_until_ready(ls)
    walls = []
    for _ in range(n_epochs):
        t0 = time.perf_counter()
        state, ls, cnt = ep(state, st, chunks, rng)
        jax.block_until_ready(ls)
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    return {"dtype": dtype, "donate": donate,
            "best_epoch_s": round(best, 5),
            "median_epoch_s": round(sorted(walls)[len(walls) // 2], 5),
            "edges_per_s": round(epe / best, 1),
            "walls": [round(w, 4) for w in walls]}


def _argcount_ms(counts=(1, 8, 32, 128), n: int = 30):
    """ms/dispatch of a precompiled sum over k small arrays, vs k —
    if the post-preamble slowdown is a per-argument dispatch cost, the
    slope (not the intercept) is what the preamble raises."""
    out = {}
    for k in counts:
        f = jax.jit(lambda *xs: sum(xs))
        args = [jnp.full((8, 128), float(i + 1)) for i in range(k)]
        r = f(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            args[0] = r         # dependent: defeat result caching
            r = f(*args)
        jax.block_until_ready(r)
        out[k] = round(1e3 * (time.perf_counter() - t0) / n, 3)
    return out


def _tiny_dispatch_ms(n: int = 50):
    """ms per dependent dispatch of a precompiled trivial op — measures
    the runtime's per-dispatch overhead independent of any program."""
    f = jax.jit(lambda a: a + 1.0)
    x = jnp.ones((8, 128))
    x = f(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    return round(1e3 * (time.perf_counter() - t0) / n, 3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", required=True)
    args = p.parse_args()
    out = {"mode": args.mode, "phases": []}

    if args.mode == "alone":
        out["phases"].append(measure("bf16"))
    elif args.mode == "after_f32":
        out["phases"].append(measure("f32"))
        out["phases"].append(measure("bf16"))
    elif args.mode == "nodonate":
        out["phases"].append(measure("f32"))
        out["phases"].append(measure("bf16", donate=False))
    elif args.mode == "clear_cache":
        out["phases"].append(measure("f32"))
        jax.clear_caches()
        out["phases"].append(measure("bf16"))
    elif args.mode == "fresh_store":
        # f32 phase, then bf16 with its own freshly-packed store copy
        out["phases"].append(measure("f32"))
        out["phases"].append(measure("bf16", fresh_store=True))
    elif args.mode == "f32_after":
        out["phases"].append(measure("bf16"))
        out["phases"].append(measure("f32"))
    elif args.mode == "reverse_each":
        for d in ("bf16", "f32", "bf16", "f32"):
            out["phases"].append(measure(d, n_epochs=8))
    elif args.mode.startswith("preamble_"):
        # bisect bench_preamble (which reproduced a 12-14x dtype-
        # independent slowdown of the resident epoch): one preamble
        # element at a time, plus a live-buffer/GC discriminator, plus
        # a tiny-dispatch probe that tells per-dispatch overhead from
        # program-specific slowdown
        from kpgnn_tpu.graph.batch import collate_dense

        which = args.mode[len("preamble_"):]
        model, mcfg, graphs, model_bf16 = bench._model_and_graphs()
        batched, edges = bench._collate_all(graphs, mcfg)
        out["tiny_ms_before"] = _tiny_dispatch_ms()
        keep = []
        if which in ("dense", "gc", "all", "nodonate"):
            keep.append(bench._bench_backend(model, batched["dense"],
                                             edges))
        if which in ("coo", "all"):
            keep.append(bench._bench_backend(model, batched["coo"], edges))
        if which in ("bf16m", "gc", "all"):
            keep.append(bench._bench_backend(model_bf16, batched["dense"],
                                             edges))
        if which == "gc":
            import gc
            del keep, batched
            jax.clear_caches()
            gc.collect()
            keep = []
        out["tiny_ms_after"] = _tiny_dispatch_ms()
        # nodonate: same dense preamble, but the resident epoch runs
        # donate=False — discriminates donation-aliasing overhead from
        # everything else the preamble leaves behind
        out["phases"].append(measure("bf16",
                                     donate=(which != "nodonate")))
        out["tiny_ms_end"] = _tiny_dispatch_ms()
    elif args.mode == "argcount":
        # per-argument dispatch cost before/after the dense preamble —
        # the decisive probe for the many-args mechanism
        model, mcfg, graphs, model_bf16 = bench._model_and_graphs()
        batched, edges = bench._collate_all(graphs, mcfg)
        out["argcount_before"] = _argcount_ms()
        bench._bench_backend(model, batched["dense"], edges)
        out["argcount_after"] = _argcount_ms()
        out["phases"].append(measure("bf16", n_epochs=6))
    elif args.mode == "bench_preamble":
        # replicate bench.py's main-path ordering: compile + run the
        # per-batch donated train steps for three other backends first,
        # then measure the resident epochs — the published f32-resident
        # 18.2M (vs 57M here in isolation) was measured in exactly this
        # contaminated position
        from kpgnn_tpu.graph.batch import collate, collate_dense

        model, mcfg, graphs, model_bf16 = bench._model_and_graphs()
        batched, edges = bench._collate_all(graphs, mcfg)
        pre = {}
        for nm, m, bs in (("dense", model, batched["dense"]),
                          ("coo", model, batched["coo"]),
                          ("dense_bf16", model_bf16, batched["dense"])):
            t0 = time.time()
            pre[nm] = round(bench._bench_backend(m, bs, edges), 1)
            pre[nm + "_s"] = round(time.time() - t0, 1)
        out["preamble"] = pre
        out["phases"].append(measure("f32"))
        out["phases"].append(measure("bf16"))
    else:
        raise SystemExit(f"unknown mode {args.mode}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
