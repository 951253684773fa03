"""Pallas CSR gather/segment-sum vs the XLA path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import kpgnn_tpu.ops.pallas_spmm as ps
from kpgnn_tpu.ops.pallas_spmm import (
    build_plan, gather_segment_sum, khop_spmm, _build_one,
)


@pytest.fixture(autouse=True)
def force_interpret(monkeypatch):
    orig = ps.gather_segment_sum
    monkeypatch.setattr(
        ps, "gather_segment_sum",
        lambda x, csr, interpret=True: orig(x, csr, interpret=True))
    yield


def case(seed=0, n=256, e=700, K=3, D=8, V1=5, Vk=7):
    rng = np.random.default_rng(seed)
    # row n-1 is the reserved zero/padding slot (kernel contract)
    senders = rng.integers(0, n - 1, e).astype(np.int32)
    receivers = np.sort(rng.integers(0, n - 1, e)).astype(np.int32)
    attr = rng.integers(0, Vk, size=(e, K)).astype(np.int32)
    attr[:, 0] = rng.integers(0, V1, e)
    x = rng.normal(size=(n, K, D)).astype(np.float32)
    t1 = rng.normal(size=(V1, D)).astype(np.float32)
    tk = rng.normal(size=(Vk, D)).astype(np.float32)
    return senders, receivers, attr, x, t1, tk


def oracle(senders, receivers, attr, x, t1, tk, n):
    t1 = t1.copy()
    t1[0] = 0
    tk = tk.copy()
    tk[0] = 0
    emb = np.concatenate([t1[attr[:, :1]], tk[attr[:, 1:]]], axis=1)
    msgs = (attr > 0)[..., None] * x[senders] + emb
    out = np.zeros_like(x)
    np.add.at(out, receivers, msgs)
    return out


def test_gather_segment_sum_basic():
    rng = np.random.default_rng(1)
    n, e, D = 256, 600, 16
    senders = rng.integers(0, n - 1, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    csr = _build_one(receivers, senders, n, 128)
    x = rng.normal(size=(n, D)).astype(np.float32)
    out = gather_segment_sum(jnp.asarray(x), csr, interpret=True)
    expect = np.zeros((n, D), np.float32)
    np.add.at(expect, receivers, x[senders])
    assert np.allclose(np.asarray(out), expect, atol=1e-4)


def test_heavy_row():
    # one receiver with > TILE_E incoming edges exercises the chunk loop
    rng = np.random.default_rng(2)
    n, e, D = 256, 900, 8
    senders = rng.integers(0, n - 1, e).astype(np.int32)
    receivers = np.where(np.arange(e) < 400, 17,
                         rng.integers(0, n, e)).astype(np.int32)
    csr = _build_one(receivers, senders, n, 128)
    x = rng.normal(size=(n, D)).astype(np.float32)
    out = gather_segment_sum(jnp.asarray(x), csr, interpret=True)
    expect = np.zeros((n, D), np.float32)
    np.add.at(expect, receivers, x[senders])
    assert np.allclose(np.asarray(out), expect, atol=1e-3)


def test_hub_tile_spills_to_coo(monkeypatch):
    """A hub receiver whose sender span / edge count exceeds the kernel
    caps keeps the kernel for the in-cap edges and spills the rest to a
    COO side list — NOT the all-or-nothing XLA fallback.  Tight caps
    force spilling at test scale; the result must stay exact and the
    kernel statics bounded."""
    rng = np.random.default_rng(7)
    n, D = 1024, 16
    # hub node 3 receives from everywhere (span = whole table); the rest
    # is sparse local structure
    hub_e = 3000
    senders = np.concatenate([
        rng.integers(0, n - 1, hub_e),
        rng.integers(0, n - 1, 800)]).astype(np.int32)
    receivers = np.concatenate([
        np.full(hub_e, 3), rng.integers(0, n, 800)]).astype(np.int32)
    monkeypatch.setattr(ps, "SPILL_CHUNK_ROWS", 8)
    monkeypatch.setattr(ps, "SPILL_WBLOCKS", 2)
    csr = _build_one(receivers, senders, n, 128, wblock=128)
    assert csr.spill_senders is not None
    assert csr.max_chunks <= 8 and csr.max_wblocks <= 2
    x = rng.normal(size=(n, D)).astype(np.float32)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")        # the scatter fallback would warn
        out = gather_segment_sum(jnp.asarray(x), csr, interpret=True)
    expect = np.zeros((n, D), np.float32)
    np.add.at(expect, receivers, x[senders])
    assert np.allclose(np.asarray(out), expect, atol=1e-3), \
        np.abs(np.asarray(out) - expect).max()
    # an uncapped plan of the same graph must be spill-free
    monkeypatch.setattr(ps, "SPILL_CHUNK_ROWS", 64)
    monkeypatch.setattr(ps, "SPILL_WBLOCKS", 8)
    csr2 = _build_one(receivers, senders, n, 128)
    assert csr2.spill_senders is None


def test_spill_khop_plan_matches_oracle(monkeypatch):
    """Full khop_spmm (embeddings + GCN scales) over a spilling plan,
    including slice_hops and gradients."""
    monkeypatch.setattr(ps, "SPILL_CHUNK_ROWS", 4)
    monkeypatch.setattr(ps, "SPILL_WBLOCKS", 1)
    senders, receivers, attr, x, t1, tk = case(seed=9, n=256, e=2000, D=8)
    # concentrate edges on one hub receiver (re-sort: the COO reference
    # assumes receiver-sorted edges)
    receivers = receivers.copy()
    receivers[:900] = 5
    order = np.argsort(receivers, kind="stable")
    senders, receivers, attr = senders[order], receivers[order], attr[order]
    n = x.shape[0]
    plan = build_plan(receivers, senders, attr, n, t1.shape[0],
                      tk.shape[0])
    assert plan.fwd.spill_senders is not None
    out = khop_spmm(jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk), plan)
    expect = oracle(senders, receivers, attr, x, t1, tk, n)
    assert np.allclose(np.asarray(out), expect, atol=1e-4), \
        np.abs(np.asarray(out) - expect).max()
    # GCN factored-norm epilogue exercises the spill-aware weighted hists
    rng = np.random.default_rng(3)
    sc = rng.random((n, attr.shape[1])).astype(np.float32)
    ss = rng.random((n, attr.shape[1])).astype(np.float32)
    out2 = khop_spmm(jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk),
                     plan, scale=jnp.asarray(sc),
                     sender_scale=jnp.asarray(ss))
    expect2 = _coo_reference(senders, receivers, attr, x, t1, tk, n,
                             scale=jnp.asarray(sc),
                             sender_scale=jnp.asarray(ss))
    assert np.allclose(np.asarray(out2), expect2, atol=1e-4), \
        np.abs(np.asarray(out2) - expect2).max()
    # sliced window keeps its own spill prefix
    k = 2
    sub = plan.slice_hops(k)
    out3 = khop_spmm(jnp.asarray(x[:, :k]), jnp.asarray(t1),
                     jnp.asarray(tk), sub)
    expect3 = oracle(senders, receivers, attr[:, :k], x[:, :k], t1, tk, n)
    assert np.allclose(np.asarray(out3), expect3, atol=1e-4), \
        np.abs(np.asarray(out3) - expect3).max()
    # gradients flow through kernel + spill
    g = jax.grad(lambda v: jnp.sum(khop_spmm(
        v, jnp.asarray(t1), jnp.asarray(tk), plan) ** 2))(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()


def test_collate_pallas_auto_geometry():
    """--backend pallas users get the measured-optimal geometry without
    flags: flagship-shaped batches auto-pick tile_r=256 (tune_pallas:
    256x512x4 on v5e), tiny fixtures keep 128 so n_pad stays small."""
    from kpgnn_tpu.data.synthetic import synthetic_molecules
    from kpgnn_tpu.graph.batch import collate_pallas
    from kpgnn_tpu.prep import KHopConfig

    kcfg = KHopConfig(K=4, kernel="spd", max_edge_attr_num=10,
                      max_hop_num=2, max_edge_type=2, max_edge_count=10,
                      max_distance_count=10)
    graphs = synthetic_molecules(64, kcfg, seed=0)
    b = collate_pallas(graphs, v1=5, vk=12)
    assert b.adj.fwd.tile_r == 256
    assert b.adj.fwd.wblock == 512
    assert b.adj.fwd.egroup == 4
    tiny = collate_pallas(graphs[:2], v1=5, vk=12)
    assert tiny.adj.fwd.tile_r == 128


def test_khop_spmm_matches_oracle():
    senders, receivers, attr, x, t1, tk = case()
    n = x.shape[0]
    plan = build_plan(receivers, senders, attr, n, t1.shape[0], tk.shape[0])
    out = khop_spmm(jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk), plan)
    expect = oracle(senders, receivers, attr, x, t1, tk, n)
    assert np.allclose(np.asarray(out), expect, atol=1e-4), \
        np.abs(np.asarray(out) - expect).max()


def test_khop_spmm_bf16_in_out():
    """bf16 activations stay bf16 through the plan backend (the kernel
    boundary relayouts run at half traffic) and gradients keep the
    primal dtype."""
    senders, receivers, attr, x, t1, tk = case()
    n = x.shape[0]
    plan = build_plan(receivers, senders, attr, n, t1.shape[0], tk.shape[0])
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    out = khop_spmm(xb, jnp.asarray(t1), jnp.asarray(tk), plan)
    assert out.dtype == jnp.bfloat16
    expect = oracle(senders, receivers, attr, x, t1, tk, n)
    scale = max(np.abs(expect).max(), 1.0)
    assert np.allclose(np.asarray(out, np.float32), expect,
                       atol=0.03 * scale)
    g = jax.grad(lambda v: jnp.sum(
        khop_spmm(v, jnp.asarray(t1), jnp.asarray(tk), plan)
        .astype(jnp.float32)))(xb)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_multi_window_blocks():
    # a small wblock forces several predicated window sub-blocks per tile
    # (the per-tile span path); must match the single-block default
    senders, receivers, attr, x, t1, tk = case(seed=5, n=384, e=900, D=24)
    n = x.shape[0]
    plan = build_plan(receivers, senders, attr, n, t1.shape[0], tk.shape[0],
                      wblock=128)
    assert plan.fwd.max_wblocks > 1
    out = khop_spmm(jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk), plan)
    expect = oracle(senders, receivers, attr, x, t1, tk, n)
    assert np.allclose(np.asarray(out), expect, atol=1e-4)


def test_slice_hops_matches_full_prefix():
    # GNNPlus's sliding hop window slices the fused CSR to a row prefix;
    # the sliced plan must equal a plan built from the first k hop columns
    senders, receivers, attr, x, t1, tk = case(seed=21, n=256, e=700, K=4)
    n, K = x.shape[0], attr.shape[1]
    plan = build_plan(receivers, senders, attr, n, t1.shape[0], tk.shape[0])
    for k in (1, 2, 3):
        sliced = plan.slice_hops(k)
        assert sliced.K == k
        ref_plan = build_plan(receivers, senders, attr[:, :k], n,
                              t1.shape[0], tk.shape[0])
        out_s = khop_spmm(jnp.asarray(x[:, :k]), jnp.asarray(t1),
                          jnp.asarray(tk), sliced)
        out_r = khop_spmm(jnp.asarray(x[:, :k]), jnp.asarray(t1),
                          jnp.asarray(tk), ref_plan)
        assert np.allclose(np.asarray(out_s), np.asarray(out_r),
                           atol=1e-4), k
        # sender-scaled (GCN-norm) path slices the flat edge arrays too
        rng = np.random.default_rng(k)
        s_j = jnp.asarray(rng.uniform(0.5, 2.0, (n, k)).astype(np.float32))
        ws = khop_spmm(jnp.asarray(x[:, :k]), jnp.asarray(t1),
                       jnp.asarray(tk), sliced, sender_scale=s_j)
        wr = khop_spmm(jnp.asarray(x[:, :k]), jnp.asarray(t1),
                       jnp.asarray(tk), ref_plan, sender_scale=s_j)
        assert np.allclose(np.asarray(ws), np.asarray(wr), atol=1e-3), k


def _coo_reference(senders, receivers, attr, x, t1, tk, n, scale=None,
                   sender_scale=None, aggr="add"):
    from kpgnn_tpu.ops.adjacency import COOAdj, khop_aggregate_adj
    adj = COOAdj(senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
                 edge_attr=jnp.asarray(attr),
                 edge_mask=jnp.ones(len(senders), bool), n_nodes=n)
    return khop_aggregate_adj(
        adj, jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk),
        scale=scale, sender_scale=sender_scale, aggr=aggr)


def test_khop_spmm_gcn_norm_matches_coo():
    # GCN's factored s_i * s_j norm: sender side scales both the gathered
    # state and the edge embeddings (weighted-count path)
    senders, receivers, attr, x, t1, tk = case(seed=7)
    n, K = x.shape[0], x.shape[1]
    rng = np.random.default_rng(8)
    s_i = jnp.asarray(rng.uniform(0.5, 2.0, (n, K)).astype(np.float32))
    s_j = jnp.asarray(rng.uniform(0.5, 2.0, (n, K)).astype(np.float32))
    plan = build_plan(receivers, senders, attr, n, t1.shape[0], tk.shape[0])
    out = khop_spmm(jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk), plan,
                    scale=s_i, sender_scale=s_j)
    expect = _coo_reference(senders, receivers, attr, x, t1, tk, n,
                            scale=s_i, sender_scale=s_j)
    assert np.allclose(np.asarray(out), np.asarray(expect), atol=1e-3), \
        np.abs(np.asarray(out) - np.asarray(expect)).max()


def test_khop_spmm_mean_matches_coo():
    senders, receivers, attr, x, t1, tk = case(seed=9)
    n = x.shape[0]
    plan = build_plan(receivers, senders, attr, n, t1.shape[0], tk.shape[0])
    out = khop_spmm(jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk), plan,
                    aggr="mean")
    expect = _coo_reference(senders, receivers, attr, x, t1, tk, n,
                            aggr="mean")
    assert np.allclose(np.asarray(out), np.asarray(expect), atol=1e-4), \
        np.abs(np.asarray(out) - np.asarray(expect)).max()


def test_plan_degree_matches_coo():
    from kpgnn_tpu.ops.adjacency import COOAdj, degree, union_in_degree
    senders, receivers, attr, x, t1, tk = case(seed=11)
    n = x.shape[0]
    plan = build_plan(receivers, senders, attr, n, t1.shape[0], tk.shape[0])
    adj = COOAdj(senders=jnp.asarray(senders),
                 receivers=jnp.asarray(receivers),
                 edge_attr=jnp.asarray(attr),
                 edge_mask=jnp.ones(len(senders), bool), n_nodes=n)
    np.testing.assert_allclose(np.asarray(degree(plan, add_self_loop=True)),
                               np.asarray(degree(adj, add_self_loop=True)))
    np.testing.assert_allclose(np.asarray(union_in_degree(plan)),
                               np.asarray(union_in_degree(adj)))


def test_gcn_layer_through_pallas_backend():
    # full KPGCNConv forward parity COO vs pallas plan (degree -> norm ->
    # aggregate -> combine), the family the backend previously refused
    from kpgnn_tpu.nn.layers import KPGCNConv
    from kpgnn_tpu.ops.adjacency import COOAdj
    senders, receivers, attr, x, t1, tk = case(seed=13, K=2, D=8)
    n, K = x.shape[0], 2
    H = 16
    rng = np.random.default_rng(14)
    feats = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    adj = COOAdj(senders=jnp.asarray(senders),
                 receivers=jnp.asarray(receivers),
                 edge_attr=jnp.asarray(attr),
                 edge_mask=jnp.ones(len(senders), bool), n_nodes=n)
    plan = build_plan(receivers, senders, attr, n, 4 + 2, 7 + 2)
    layer = KPGCNConv(hidden_size=H, K=K, num_hop1_edge=4, num_pe=7)
    params = layer.init(jax.random.PRNGKey(0), feats, adj)
    out_coo = layer.apply(params, feats, adj)
    out_pl = layer.apply(params, feats, plan)
    assert np.allclose(np.asarray(out_coo), np.asarray(out_pl), atol=1e-3), \
        np.abs(np.asarray(out_coo) - np.asarray(out_pl)).max()


def test_sage_layer_through_pallas_backend():
    from kpgnn_tpu.nn.layers import KPGraphSAGEConv
    from kpgnn_tpu.ops.adjacency import COOAdj
    senders, receivers, attr, x, t1, tk = case(seed=15, K=2, D=8)
    n, K = x.shape[0], 2
    H = 16
    rng = np.random.default_rng(16)
    feats = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    adj = COOAdj(senders=jnp.asarray(senders),
                 receivers=jnp.asarray(receivers),
                 edge_attr=jnp.asarray(attr),
                 edge_mask=jnp.ones(len(senders), bool), n_nodes=n)
    plan = build_plan(receivers, senders, attr, n, 4 + 2, 7 + 2)
    layer = KPGraphSAGEConv(hidden_size=H, K=K, num_hop1_edge=4, num_pe=7)
    params = layer.init(jax.random.PRNGKey(0), feats, adj)
    out_coo = layer.apply(params, feats, adj)
    out_pl = layer.apply(params, feats, plan)
    assert np.allclose(np.asarray(out_coo), np.asarray(out_pl), atol=1e-3), \
        np.abs(np.asarray(out_coo) - np.asarray(out_pl)).max()


def test_khop_spmm_grads():
    senders, receivers, attr, x, t1, tk = case(seed=3, n=128, e=300)
    n = x.shape[0]
    plan = build_plan(receivers, senders, attr, n, t1.shape[0], tk.shape[0])

    w = np.cos(np.arange(x.size).reshape(x.shape) * 0.01).astype(np.float32)

    def pallas_loss(x, t1, tk):
        return jnp.sum(khop_spmm(x, t1, tk, plan) * w)

    def xla_loss(x, t1, tk):
        t1 = t1.at[0].set(0.0)
        tk = tk.at[0].set(0.0)
        a = jnp.asarray(attr)
        emb = jnp.concatenate([t1[a[:, :1]], tk[a[:, 1:]]], axis=1)
        msgs = (a > 0)[..., None] * x[jnp.asarray(senders)] + emb
        out = jax.ops.segment_sum(msgs, jnp.asarray(receivers),
                                  num_segments=n)
        return jnp.sum(out * w)

    args = (jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk))
    gp = jax.grad(pallas_loss, argnums=(0, 1, 2))(*args)
    gx = jax.grad(xla_loss, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(gp, gx, ["dx", "dt1", "dtk"]):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3), \
            (name, np.abs(np.asarray(a) - np.asarray(b)).max())


def test_windowed_gather_on_graph_sorted_batch():
    """Graph-sorted batches give narrow per-tile sender windows: win_rows
    must shrink well below the node table and the result must still match
    the oracle (senders outside a window vanish from the one-hot)."""
    rng = np.random.default_rng(3)
    n, gsize, K, D, V1, Vk = 1024, 32, 2, 8, 5, 7
    senders, receivers = [], []
    for g0 in range(0, n - gsize, gsize):          # intra-graph edges only
        e = 40
        senders.append(rng.integers(g0, g0 + gsize, e))
        receivers.append(rng.integers(g0, g0 + gsize, e))
    senders = np.concatenate(senders).astype(np.int32)
    receivers = np.concatenate(receivers).astype(np.int32)
    attr = rng.integers(0, Vk, size=(len(senders), K)).astype(np.int32)
    attr[:, 0] = rng.integers(0, V1, len(senders))
    x = rng.normal(size=(n, K, D)).astype(np.float32)
    t1 = rng.normal(size=(V1, D)).astype(np.float32)
    tk = rng.normal(size=(Vk, D)).astype(np.float32)

    plan = build_plan(receivers, senders, attr, n, V1, Vk)
    # 32-node graphs inside 128-row tiles: every tile's span fits one
    # 256-row window block
    assert plan.fwd.max_wblocks == 1, plan.fwd.max_wblocks
    assert plan.bwd.max_wblocks == 1
    out = khop_spmm(jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk), plan)
    ref = oracle(senders, receivers, attr, x, t1, tk, n)
    assert np.allclose(np.asarray(out), ref, atol=1e-4)

    # gradients flow through the windowed transpose CSRs too
    f = lambda x_: jnp.sum(khop_spmm(x_, jnp.asarray(t1),
                                     jnp.asarray(tk), plan) ** 2)
    g = jax.grad(f)(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("tile_r,tile_e", [(256, 128), (512, 128),
                                           (128, 256), (256, 256)])
def test_khop_spmm_tile_geometry(tile_r, tile_e):
    """The kernel grid geometry is sweepable (throughput tuning on real
    hardware, scripts/tune_pallas.py); every tile pair must agree with
    the default.  tile_e != 128 lowers only in interpret mode (Mosaic
    DMA sublane alignment — build_plan rejects it on TPU), so those
    rows test the math, not a hardware path; the sweepable hardware
    axis is tile_r."""
    senders, receivers, attr, x, t1, tk = case(seed=7, n=512, e=1400)
    n = x.shape[0]
    plan = build_plan(receivers, senders, attr, n, t1.shape[0],
                      tk.shape[0], tile_r=tile_r, tile_e=tile_e)
    out = khop_spmm(jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk), plan)
    expect = oracle(senders, receivers, attr, x, t1, tk, n)
    assert np.allclose(np.asarray(out), expect, atol=1e-4), (tile_r, tile_e)
    # gradients route through the transpose CSR with the same geometry
    f = lambda x: khop_spmm(x, jnp.asarray(t1), jnp.asarray(tk), plan).sum()
    g = jax.grad(f)(jnp.asarray(x))
    plan0 = build_plan(receivers, senders, attr, n, t1.shape[0], tk.shape[0])
    f0 = lambda x: khop_spmm(x, jnp.asarray(t1), jnp.asarray(tk),
                             plan0).sum()
    g0 = jax.grad(f0)(jnp.asarray(x))
    assert np.allclose(np.asarray(g), np.asarray(g0), atol=1e-4)


def test_collate_pallas_tile_r_pads_nodes():
    from kpgnn_tpu.graph.batch import collate_pallas
    from tests.test_batch import toy_graph
    gs = [toy_graph(10, 24, K=3, seed=i) for i in range(4)]
    b = collate_pallas(gs, v1=6, vk=9, tile_r=256)
    assert b.x.shape[0] % 256 == 0
    assert b.adj.fwd.tile_r == 256


def test_scratch_overflow_falls_back_to_xla(monkeypatch):
    """A plan whose double-buffered scratch exceeds the VMEM budget must
    not fail the train step: gather_segment_sum warns once (at trace
    time) and routes through the bit-compatible XLA segment-sum path."""
    rng = np.random.default_rng(3)
    n, e, D = 256, 600, 16
    senders = rng.integers(0, n - 1, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    csr = _build_one(receivers, senders, n, 128)
    x = rng.normal(size=(n, D)).astype(np.float32)
    monkeypatch.setattr(ps, "VMEM_SCRATCH_LIMIT", 1)
    with pytest.warns(UserWarning, match="falling back"):
        out = gather_segment_sum(jnp.asarray(x), csr, interpret=True)
    expect = np.zeros((n, D), np.float32)
    np.add.at(expect, receivers, x[senders])
    assert np.allclose(np.asarray(out), expect, atol=1e-4)
