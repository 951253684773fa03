"""Resident dense store: on-device gather == collate_dense, and the
one-scan epoch (train/resident.py) is numerically the per-batch path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpgnn_tpu.graph import collate_dense
from kpgnn_tpu.models import make_model
from kpgnn_tpu.train import (
    GraphLoader,
    TrainConfig,
    Trainer,
    build_dense_store,
    create_train_state,
    epoch_index_chunks,
    gather_batch,
    make_resident_eval,
    make_resident_train_epoch,
)
from kpgnn_tpu.train.loop import (evaluate, make_eval_step, make_train_step,
                                  train_epoch)

from test_train import make_dataset, model_cfg

N_SLOT = 10
V1, VK = 3, 12      # num_hop1_edge+2, max_pe_num+2 for model_cfg()


@pytest.fixture(scope="module")
def dataset():
    return make_dataset(n_graphs=40)


@pytest.fixture(scope="module")
def store(dataset):
    return build_dense_store(dataset, n_slot=N_SLOT, v1=V1, vk=VK)


def assert_batch_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0,
                                   atol=0)


def test_gather_equals_collate_dense_full(dataset, store):
    idx = np.array([3, 0, 7, 12], np.int32)
    got = gather_batch(store, jnp.asarray(idx))
    want = collate_dense([dataset[i] for i in idx], n_slot=N_SLOT,
                         v1=V1, vk=VK, g_pad=4)
    assert_batch_equal(got, want)


def test_gather_pads_partial_batch(dataset, store):
    # 3 real graphs in a 5-slot batch: pad slots = the empty graph
    idx = np.array([5, 9, 1], np.int32)
    chunks = epoch_index_chunks(idx, 5, pad_idx=store.num_graphs)
    assert chunks.shape == (1, 5)
    got = gather_batch(store, jnp.asarray(chunks[0]))
    want = collate_dense([dataset[i] for i in idx], n_slot=N_SLOT,
                         v1=V1, vk=VK, g_pad=5)
    assert_batch_equal(got, want)
    assert np.asarray(got.graph_mask).tolist() == [True] * 3 + [False] * 2


def test_scan_epoch_matches_per_batch(dataset, store):
    model = make_model(model_cfg())
    B = 8
    chunks = epoch_index_chunks(np.arange(len(dataset)), B,
                                pad_idx=store.num_graphs)
    batches = [collate_dense(dataset[i * B:(i + 1) * B], n_slot=N_SLOT,
                             v1=V1, vk=VK, g_pad=B)
               for i in range(chunks.shape[0])]
    state0, tx = create_train_state(model, batches[0], jax.random.PRNGKey(1),
                                    1e-3)

    # per-batch reference path (the exact train_epoch rng protocol)
    step = make_train_step(model, tx, "cross_entropy", donate=False)
    state_ref, loss_ref = train_epoch(step, state0, batches,
                                      jax.random.PRNGKey(7))

    ep = make_resident_train_epoch(model, tx, "cross_entropy")
    state_res, lsum, cnt = ep(state0, store, jnp.asarray(chunks),
                              jax.random.PRNGKey(7))
    assert float(cnt) == len(dataset)
    np.testing.assert_allclose(float(lsum) / float(cnt), loss_ref,
                               rtol=1e-5)
    for pr, pb in zip(jax.tree_util.tree_leaves(state_res.params),
                      jax.tree_util.tree_leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(pr), np.asarray(pb),
                                   rtol=2e-5, atol=2e-6)


def test_resident_eval_matches_evaluate(dataset, store):
    model = make_model(model_cfg())
    B = 8
    chunks = epoch_index_chunks(np.arange(len(dataset)), B,
                                pad_idx=store.num_graphs)
    batches = [collate_dense(dataset[i * B:(i + 1) * B], n_slot=N_SLOT,
                             v1=V1, vk=VK, g_pad=B)
               for i in range(chunks.shape[0])]
    state, _ = create_train_state(model, batches[0], jax.random.PRNGKey(2),
                                  1e-3)
    want = evaluate(make_eval_step(model, "cross_entropy"), state, batches)
    run = make_resident_eval(model, "cross_entropy")
    sums = jax.device_get(run(state, store, jnp.asarray(chunks)))
    from kpgnn_tpu.train.loop import summarize_eval_sums
    got = summarize_eval_sums({k: np.asarray(v, np.float64)
                               for k, v in sums.items()})
    assert got["count"] == want["count"]
    np.testing.assert_allclose(got["loss"], want["loss"], rtol=1e-6)
    np.testing.assert_allclose(got["accuracy"], want["accuracy"], rtol=0)


@pytest.mark.slow
def test_trainer_resident_equals_standard(dataset):
    """Full Trainer runs, resident on vs off, shuffle disabled: identical
    epoch histories (same rng protocol, same batches)."""
    lk = dict(mode="dense", n_slot=N_SLOT, v1=V1, vk=VK)
    results = {}
    for mode in ("on", "off"):
        model = make_model(model_cfg())
        loader = GraphLoader(dataset, batch_size=8, shuffle=False, **lk)
        val = GraphLoader(dataset, batch_size=8, **lk)
        cfg = TrainConfig(lr=5e-3, num_epochs=3, batch_size=8,
                          loss="cross_entropy", patience=50)
        tr = Trainer(model, cfg, loss="cross_entropy", metric_mode="max",
                     resident=mode)
        _, res = tr.fit(loader, val, val, rng=jax.random.PRNGKey(3))
        results[mode] = res
    for a, b in zip(results["on"]["history"], results["off"]["history"]):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=2e-5)
        np.testing.assert_allclose(a["val_accuracy"], b["val_accuracy"],
                                   rtol=0)
    assert results["on"]["best_val"] == results["off"]["best_val"]


def test_coo_gather_eval_matches_collate(dataset):
    """COO store gather uses slot layout (vs collate's compact packing),
    but masked losses/metrics must be identical on the same graphs."""
    from kpgnn_tpu.graph import collate
    from kpgnn_tpu.train.resident import build_coo_store, gather_coo_batch

    cstore = build_coo_store(dataset)
    model = make_model(model_cfg())
    idx = np.array([3, 0, 7, 12, 21], np.int32)
    gathered = gather_coo_batch(cstore, jnp.asarray(idx))
    compact = collate([dataset[i] for i in idx])
    state, _ = create_train_state(model, compact, jax.random.PRNGKey(2),
                                  1e-3)
    step = make_eval_step(model, "cross_entropy")
    m1 = step(state, compact)
    m2 = step(state, gathered)
    assert float(m1["count"]) == float(m2["count"]) == 5.0
    np.testing.assert_allclose(float(m2["loss_sum"]),
                               float(m1["loss_sum"]), rtol=1e-5)
    np.testing.assert_allclose(float(m2["correct"]),
                               float(m1["correct"]), rtol=0)


@pytest.mark.slow
def test_coo_resident_train_step_matches_per_batch(dataset):
    """One train step on the COO store's slot layout vs the compact
    collate of the same graphs: identical loss and updated params.

    Unlike the dense store (whose gather is bit-identical to
    collate_dense), the COO slot layout sums messages in a different
    order, so parity is allclose, not equality."""
    from kpgnn_tpu.graph import collate
    from kpgnn_tpu.train.resident import build_coo_store, gather_coo_batch

    cstore = build_coo_store(dataset)
    model = make_model(model_cfg())
    idx = np.array([3, 0, 7, 12, 21, 30, 11, 2], np.int32)
    gathered = gather_coo_batch(cstore, jnp.asarray(idx))
    compact = collate([dataset[i] for i in idx])
    outs = {}
    for name, batch in (("resident", gathered), ("per_batch", compact)):
        state, tx = create_train_state(model, batch, jax.random.PRNGKey(2),
                                       5e-3)
        step = jax.jit(make_train_step(model, tx, loss="cross_entropy",
                                       donate=False))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
        grads = jax.jit(jax.grad(
            lambda p: make_eval_step(model, "cross_entropy")(
                state.replace(params=p), batch)["loss_sum"]))(state.params)
        outs[name] = (metrics, grads)
    np.testing.assert_allclose(float(outs["resident"][0]["loss_sum"]),
                               float(outs["per_batch"][0]["loss_sum"]),
                               rtol=1e-5)
    # gradients, not post-optimizer params: Adam's first step is
    # ~lr*sign(grad), so noise-level grads (unused rows, zero-init
    # gates) flip sign between layouts and params jump by 2*lr — the
    # semantic invariant is the gradient field itself
    for a, b in zip(jax.tree_util.tree_leaves(outs["resident"][1]),
                    jax.tree_util.tree_leaves(outs["per_batch"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_coo_resident_trainer_matches_per_batch(dataset):
    """Trainer on coo loaders, resident on vs off, shuffle disabled:
    agreeing epoch histories.  The layouts sum in different orders and
    Adam turns noise-level gradients into ±lr sign-flips (see the
    step-parity test), so trajectories genuinely diverge at float
    speed — the history check is loose and exists to catch semantic
    bugs (wrong loss normalization, dropped or duplicated batches),
    which shift the loss by O(1) factors, not bit drift."""
    results = {}
    for mode in ("on", "off"):
        model = make_model(model_cfg())
        loader = GraphLoader(dataset, batch_size=8, shuffle=False,
                             mode="coo")
        val = GraphLoader(dataset, batch_size=8, mode="coo")
        cfg = TrainConfig(lr=5e-3, num_epochs=3, batch_size=8,
                          loss="cross_entropy", patience=50)
        tr = Trainer(model, cfg, loss="cross_entropy", metric_mode="max",
                     resident=mode)
        _, res = tr.fit(loader, val, val, rng=jax.random.PRNGKey(3))
        results[mode] = res
    # epoch 1 precedes the Adam sign-flip accumulation: tight bound here
    # catches regressions the loose multi-epoch check would let through
    np.testing.assert_allclose(results["on"]["history"][0]["train_loss"],
                               results["off"]["history"][0]["train_loss"],
                               rtol=1e-3)
    for a, b in zip(results["on"]["history"], results["off"]["history"]):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=0.2)
        np.testing.assert_allclose(a["val_accuracy"], b["val_accuracy"],
                                   atol=2.0 / 40 + 1e-9)


def test_coo_resident_parallel_epoch(dataset):
    """COO store through the mesh scan epoch: count exact, loss finite."""
    from kpgnn_tpu.parallel import make_mesh
    from kpgnn_tpu.train import (make_parallel_resident_train_epoch,
                                 parallel_epoch_index_chunks)
    from kpgnn_tpu.train.resident import build_coo_store, gather_coo_batch

    cstore = build_coo_store(dataset)
    model = make_model(model_cfg())
    mesh = make_mesh(4)
    chunks = parallel_epoch_index_chunks(np.arange(len(dataset)), 4, 4,
                                         cstore.num_graphs)
    example = gather_coo_batch(cstore, jnp.asarray(chunks[0, 0]))
    state, tx = create_train_state(model, example, jax.random.PRNGKey(1),
                                   1e-3)
    ep = make_parallel_resident_train_epoch(model, tx, mesh,
                                            "cross_entropy")
    state, lsum, cnt = ep(state, cstore, jnp.asarray(chunks),
                          jax.random.PRNGKey(7))
    assert float(cnt) == len(dataset)
    assert np.isfinite(float(lsum))


@pytest.mark.slow
def test_parallel_resident_epoch_matches_dp_loop(dataset, store):
    """One-dispatch mesh epoch == the per-super-batch dp loop on the
    identical batch composition (shared parallel_train_step_body)."""
    from kpgnn_tpu.parallel import make_mesh, make_parallel_train_step, \
        stack_batches
    from kpgnn_tpu.train import (make_parallel_resident_train_epoch,
                                 parallel_epoch_index_chunks)

    model = make_model(model_cfg())
    B, n_dev = 4, 4
    mesh = make_mesh(n_dev)
    chunks = parallel_epoch_index_chunks(np.arange(len(dataset)), B, n_dev,
                                         store.num_graphs)
    assert chunks.shape == (-(-len(dataset) // (B * n_dev)), n_dev, B)

    example = gather_batch(store, jnp.asarray(chunks[0, 0]))
    state0, tx = create_train_state(model, example, jax.random.PRNGKey(1),
                                    1e-3)
    state1, _ = create_train_state(model, example, jax.random.PRNGKey(1),
                                   1e-3)

    # reference: dp super-batch loop with train_epoch's rng protocol
    step = make_parallel_train_step(model, tx, mesh, loss="cross_entropy")
    rng = jax.random.PRNGKey(7)
    state_ref, ls_ref, cnt_ref = state0, 0.0, 0.0
    for s in range(chunks.shape[0]):
        per_dev = [gather_batch(store, jnp.asarray(chunks[s, d]))
                   for d in range(n_dev)]
        rng, sub = jax.random.split(rng)
        state_ref, m = step(state_ref, stack_batches(per_dev), sub)
        ls_ref += float(m["loss_sum"])
        cnt_ref += float(m["count"])

    ep = make_parallel_resident_train_epoch(model, tx, mesh,
                                            "cross_entropy")
    state_res, lsum, cnt = ep(state1, store, jnp.asarray(chunks),
                              jax.random.PRNGKey(7))
    assert float(cnt) == cnt_ref == len(dataset)
    np.testing.assert_allclose(float(lsum), ls_ref, rtol=1e-5)
    for pr, pb in zip(jax.tree_util.tree_leaves(state_res.params),
                      jax.tree_util.tree_leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(pr), np.asarray(pb),
                                   rtol=2e-5, atol=2e-6)


def test_parallel_resident_eval_matches_single_device(dataset, store):
    """psum'd mesh scan eval == the single-device resident eval sums,
    including a trailing partial super-batch (pure padding devices)."""
    from kpgnn_tpu.parallel import make_mesh
    from kpgnn_tpu.train import (make_parallel_resident_eval,
                                 parallel_epoch_index_chunks)

    model = make_model(model_cfg())
    B, n_dev = 4, 4
    # 40 graphs, 16-graph super-batches -> 3 steps, last mostly padding
    chunks = parallel_epoch_index_chunks(np.arange(len(dataset)), B, n_dev,
                                         store.num_graphs)
    example = gather_batch(store, jnp.asarray(chunks[0, 0]))
    state, _ = create_train_state(model, example, jax.random.PRNGKey(2),
                                  1e-3)
    flat = epoch_index_chunks(np.arange(len(dataset)), B,
                              pad_idx=store.num_graphs)
    want = jax.device_get(make_resident_eval(model, "cross_entropy")(
        state, store, jnp.asarray(flat)))
    mesh = make_mesh(n_dev)
    got = jax.device_get(make_parallel_resident_eval(
        model, mesh, "cross_entropy")(state, store, jnp.asarray(chunks)))
    assert float(got["count"]) == float(want["count"]) == len(dataset)
    np.testing.assert_allclose(float(got["loss_sum"]),
                               float(want["loss_sum"]), rtol=1e-5)
    np.testing.assert_allclose(float(got["correct"]),
                               float(want["correct"]), rtol=0)


def test_parallel_resident_hierarchical_dcn_mesh(dataset, store):
    """Resident scan epoch over a 2-host ("dcn", "data") mesh: psums name
    the axis pair, the index chunks shard over all 8 devices."""
    from kpgnn_tpu.parallel.multihost import dcn_mesh
    from kpgnn_tpu.train import (make_parallel_resident_train_epoch,
                                 parallel_epoch_index_chunks)

    model = make_model(model_cfg())
    mesh = dcn_mesh(n_hosts=2)
    n_dev = mesh.devices.size
    chunks = parallel_epoch_index_chunks(np.arange(len(dataset)), 2, n_dev,
                                         store.num_graphs)
    example = gather_batch(store, jnp.asarray(chunks[0, 0]))
    state, tx = create_train_state(model, example, jax.random.PRNGKey(1),
                                   1e-3)
    ep = make_parallel_resident_train_epoch(model, tx, mesh,
                                            "cross_entropy",
                                            axis=("dcn", "data"))
    state, lsum, cnt = ep(state, store, jnp.asarray(chunks),
                          jax.random.PRNGKey(7))
    assert float(cnt) == len(dataset)
    assert np.isfinite(float(lsum))


@pytest.mark.slow
def test_trainer_mesh_resident_learns(dataset):
    """Trainer with mesh + dense loaders takes the parallel resident path
    (one dispatch per epoch across the mesh) and still trains."""
    from kpgnn_tpu.parallel import make_mesh

    lk = dict(mode="dense", n_slot=N_SLOT, v1=V1, vk=VK)
    model = make_model(model_cfg())
    loader = GraphLoader(dataset, batch_size=4, shuffle=True, seed=0, **lk)
    val = GraphLoader(dataset, batch_size=4, **lk)
    cfg = TrainConfig(lr=5e-3, num_epochs=20, batch_size=4,
                      loss="cross_entropy", patience=50)
    tr = Trainer(model, cfg, loss="cross_entropy", metric_mode="max",
                 mesh=make_mesh(4), resident="on")
    _, res = tr.fit(loader, val, val, rng=jax.random.PRNGKey(0))
    assert res["best_val"] > 0.85, res["best_val"]
    assert res["history"][-1]["val_loss"] is not None


def test_trainer_auto_resident_learns(dataset):
    """Shuffled auto-resident e2e: the triangle task still trains."""
    lk = dict(mode="dense", n_slot=N_SLOT, v1=V1, vk=VK)
    model = make_model(model_cfg())
    loader = GraphLoader(dataset, batch_size=8, shuffle=True, seed=0, **lk)
    val = GraphLoader(dataset, batch_size=8, **lk)
    cfg = TrainConfig(lr=5e-3, num_epochs=25, batch_size=8,
                      loss="cross_entropy", patience=50)
    tr = Trainer(model, cfg, loss="cross_entropy", metric_mode="max")
    _, res = tr.fit(loader, val, val, rng=jax.random.PRNGKey(0))
    assert res["best_val"] > 0.85, res["best_val"]


# ---------------------------------------------------------------------------
# BandedStore: resident one-scan epochs for the large-graph regime
# ---------------------------------------------------------------------------

def make_banded_dataset(n_graphs=6, seed=0, K=2):
    """Chain + short chords (banded under the node order); every other
    graph gets one long chord whose span exceeds the halo cap, so the
    store's spill remap is exercised."""
    from kpgnn_tpu.prep import KHopConfig, extract_khop

    rng = np.random.default_rng(seed)
    cfg = KHopConfig(K=K, kernel="spd", max_edge_attr_num=10,
                     max_hop_num=2, max_edge_type=1, max_edge_count=10,
                     max_distance_count=10)
    graphs = []
    for i in range(n_graphs):
        n = int(rng.integers(540, 580))
        src = np.arange(n - 1)
        ch = rng.integers(0, n - 13, n // 4)
        s = np.concatenate([src, src + 1, ch])
        r = np.concatenate([src + 1, src, ch + rng.integers(2, 12, n // 4)])
        if i % 2 == 0:
            s = np.concatenate([s, [0]])
            r = np.concatenate([r, [n - 10]])     # reach > tile + halo
        ei = np.stack([s, r]).astype(np.int64)
        g = extract_khop(n, ei, None, cfg,
                         x=np.zeros((n, 1), np.int64),
                         y=np.array([s.shape[0] / n], np.float32))
        graphs.append(g)
    return graphs


def banded_model_cfg(K=2):
    from kpgnn_tpu.models import ModelConfig
    return ModelConfig(
        model_name="KPGIN", hidden_size=12, num_layer=2, K=K,
        num_hop1_edge=1, max_pe_num=10, max_edge_type=1,
        max_edge_count=10, max_hop_num=2, max_distance_count=10,
        JK="last", combine="geometric", input_encoder=("embedding", 2),
        task="graph_regression", pooling_method="sum", output_size=1,
    )


@pytest.fixture(scope="module")
def banded_dataset():
    return make_banded_dataset()


def test_banded_gather_matches_collate_forward(banded_dataset):
    """gather_banded_batch (slotted layout) and collate_banded (packed
    layout) must produce identical per-graph model outputs — same
    plans, same spill edges, different node placement."""
    from kpgnn_tpu.graph.batch import collate_banded
    from kpgnn_tpu.train import build_banded_store, gather_banded_batch

    cfg = banded_model_cfg()
    v1, vk = cfg.num_hop1_edge + 2, cfg.max_pe_num + 2
    store = build_banded_store(banded_dataset, v1, vk)
    assert store.spill_rows is not None       # the long chords did spill
    idx = np.array([0, 3, 2], np.int32)       # includes spill graphs
    got_b = gather_banded_batch(store, jnp.asarray(idx))
    want_b = collate_banded([banded_dataset[i] for i in idx], v1=v1,
                            vk=vk, g_pad=3, tile=store.tile,
                            halo=store.halo)
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0), want_b, train=False)
    got = np.asarray(model.apply(params, got_b, train=False))[:3]
    want = np.asarray(model.apply(params, want_b, train=False))[:3]
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_banded_gather_pads_partial_batch(banded_dataset):
    from kpgnn_tpu.train import build_banded_store, gather_banded_batch

    cfg = banded_model_cfg()
    v1, vk = cfg.num_hop1_edge + 2, cfg.max_pe_num + 2
    store = build_banded_store(banded_dataset, v1, vk)
    chunks = epoch_index_chunks(np.array([1, 4]), 4,
                                pad_idx=store.num_graphs)
    got = gather_banded_batch(store, jnp.asarray(chunks[0]))
    assert np.asarray(got.graph_mask).tolist() == [True] * 2 + [False] * 2
    # pad slots contribute nothing: all-zero plans, masked nodes
    nm = np.asarray(got.node_mask).reshape(4, -1)
    assert not nm[2:].any()


def test_banded_resident_trainer_learns(banded_dataset):
    """Trainer auto-detects the banded loader, builds the store, and the
    one-scan epochs converge on the regression target."""
    from kpgnn_tpu.train import GraphLoader, TrainConfig, Trainer

    cfg = banded_model_cfg()
    v1, vk = cfg.num_hop1_edge + 2, cfg.max_pe_num + 2
    model = make_model(cfg)
    mk = lambda sh: GraphLoader(banded_dataset, batch_size=2, shuffle=sh,
                                seed=0, mode="banded", v1=v1, vk=vk)
    logs = []

    class L:
        def info(self, m):
            logs.append(str(m))

    tr = Trainer(model, TrainConfig(lr=5e-3, num_epochs=8, batch_size=2,
                                    loss="l1", patience=50),
                 loss="l1", metric_mode="min", logger=L())
    _, res = tr.fit(mk(True), mk(False), mk(False),
                    rng=jax.random.PRNGKey(0))
    assert any("resident store" in m for m in logs), logs[:5]
    assert np.isfinite(res["best_val"])
    first = res["history"][0]["val_loss"]
    assert res["best_val"] < first, (res["best_val"], first)


def test_banded_gather_slice_hops_via_gnnplus(banded_dataset):
    """GNNPlus slices the batch plan per layer (k = min(l+1, K)); the
    store's remapped spill rows must keep dropping correctly under
    slice_hops (hop-k' rows land >= k*B*n and out-of-range-drop)."""
    from kpgnn_tpu.graph.batch import collate_banded
    from kpgnn_tpu.models import ModelConfig, make_model
    from kpgnn_tpu.train import build_banded_store, gather_banded_batch

    cfg = ModelConfig(
        model_name="KPGINPlus", hidden_size=12, num_layer=3, K=2,
        num_hop1_edge=1, max_pe_num=10, max_edge_type=1,
        max_edge_count=10, max_hop_num=2, max_distance_count=10,
        JK="last", combine="attention", input_encoder=("embedding", 2),
        task="graph_regression", pooling_method="sum", output_size=1,
    )
    v1, vk = cfg.num_hop1_edge + 2, cfg.max_pe_num + 2
    store = build_banded_store(banded_dataset, v1, vk)
    idx = np.array([0, 2], np.int32)          # spill graphs included
    got_b = gather_banded_batch(store, jnp.asarray(idx))
    want_b = collate_banded([banded_dataset[i] for i in idx], v1=v1,
                            vk=vk, g_pad=2, tile=store.tile,
                            halo=store.halo)
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0), want_b, train=False)
    got = np.asarray(model.apply(params, got_b, train=False))[:2]
    want = np.asarray(model.apply(params, want_b, train=False))[:2]
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()
