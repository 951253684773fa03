"""Banded window backend vs the COO oracle (ops/banded.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _jit_smap(*a, **k):
    """jax.jit(jax.shard_map(...)): the eager shard_map impl
    dispatches primitive-by-primitive (~50 ms each on this CPU)
    and dominated the suite wall-clock; compiled numerics are
    identical."""
    import jax as _jax
    return _jax.jit(_jax.shard_map(*a, **k))

from kpgnn_tpu.ops.banded import (BandedAdj, banded_khop_aggregate,
                                  build_banded)


def oracle(senders, receivers, attr, x, t1, tk, scale=None, aggr="add"):
    t1 = t1.copy()
    t1[0] = 0
    if tk is not None:
        tk = tk.copy()
        tk[0] = 0
        emb = np.concatenate([t1[attr[:, :1]], tk[attr[:, 1:]]], axis=1)
    else:
        emb = t1[attr[:, :1]]
    msgs = (attr > 0)[..., None] * x[senders] + emb
    out = np.zeros_like(x)
    np.add.at(out, receivers, msgs)
    if scale is not None:
        out = out * scale[..., None]
    if aggr == "mean":
        deg = np.bincount(receivers, minlength=x.shape[0]).astype(np.float32)
        out = out / np.maximum(deg, 1.0)[:, None, None]
    return out


def banded_case(seed=0, n=768, K=3, D=8, V1=5, Vk=7, tile=256,
                long_edges=0):
    """Chain + short chords (banded under the node order), plus optional
    long-range edges that must spill."""
    rng = np.random.default_rng(seed)
    src = np.arange(n - 1)
    chords = rng.integers(0, n - 20, n // 3)
    senders = np.concatenate([src, chords])
    receivers = np.concatenate([src + 1, chords + rng.integers(2, 19,
                                                               n // 3)])
    if long_edges:
        ls = rng.integers(0, n // 4, long_edges)
        lr = ls + n // 2
        senders = np.concatenate([senders, ls])
        receivers = np.concatenate([receivers, lr])
    order = np.argsort(receivers, kind="stable")
    senders = senders[order].astype(np.int32)
    receivers = receivers[order].astype(np.int32)
    e = len(senders)
    attr = rng.integers(0, Vk, size=(e, K)).astype(np.int32)
    attr[:, 0] = rng.integers(0, V1, e)
    x = rng.normal(size=(n, K, D)).astype(np.float32)
    t1 = rng.normal(size=(V1, D)).astype(np.float32)
    tk = rng.normal(size=(Vk, D)).astype(np.float32)
    return senders, receivers, attr, x, t1, tk


def test_banded_matches_oracle_add():
    s, r, a, x, t1, tk = banded_case()
    adj = build_banded(r, s, a, x.shape[0], t1.shape[0], tk.shape[0])
    assert adj.spill_senders is None          # banded graph: no spill
    assert adj.halo == 64                     # reach <= 18 rounds to 64
    out = banded_khop_aggregate(jnp.asarray(x), jnp.asarray(t1),
                                jnp.asarray(tk), adj)
    assert np.allclose(np.asarray(out), oracle(s, r, a, x, t1, tk),
                       atol=1e-4)


def test_banded_hop_major_native():
    s, r, a, x, t1, tk = banded_case(seed=3)
    adj = build_banded(r, s, a, x.shape[0], t1.shape[0], tk.shape[0])
    xh = jnp.asarray(x.transpose(1, 0, 2))
    out = banded_khop_aggregate(xh, jnp.asarray(t1), jnp.asarray(tk), adj,
                                hop_major=True)
    assert out.shape == xh.shape
    assert np.allclose(np.asarray(out).transpose(1, 0, 2),
                       oracle(s, r, a, x, t1, tk), atol=1e-4)


def test_banded_scale_and_mean():
    s, r, a, x, t1, tk = banded_case(seed=5)
    n, K = x.shape[0], x.shape[1]
    adj = build_banded(r, s, a, n, t1.shape[0], tk.shape[0])
    rng = np.random.default_rng(0)
    sc = rng.uniform(0.5, 2.0, size=(n, K)).astype(np.float32)
    out = banded_khop_aggregate(jnp.asarray(x), jnp.asarray(t1),
                                jnp.asarray(tk), adj,
                                scale=jnp.asarray(sc))
    assert np.allclose(np.asarray(out), oracle(s, r, a, x, t1, tk, sc),
                       atol=1e-4)
    outm = banded_khop_aggregate(jnp.asarray(x), jnp.asarray(t1),
                                 jnp.asarray(tk), adj, aggr="mean")
    assert np.allclose(np.asarray(outm),
                       oracle(s, r, a, x, t1, tk, aggr="mean"), atol=1e-4)


def test_banded_spill_long_edges():
    s, r, a, x, t1, tk = banded_case(seed=7, long_edges=40)
    adj = build_banded(r, s, a, x.shape[0], t1.shape[0], tk.shape[0],
                       halo=64)
    assert adj.spill_senders is not None
    out = banded_khop_aggregate(jnp.asarray(x), jnp.asarray(t1),
                                jnp.asarray(tk), adj)
    assert np.allclose(np.asarray(out), oracle(s, r, a, x, t1, tk),
                       atol=1e-4)


def test_banded_slice_hops():
    s, r, a, x, t1, tk = banded_case(seed=9, long_edges=16)
    adj = build_banded(r, s, a, x.shape[0], t1.shape[0], tk.shape[0],
                       halo=64)
    for k in (1, 2):
        sub = adj.slice_hops(k)
        assert sub.K == k
        out = banded_khop_aggregate(
            jnp.asarray(x[:, :k]), jnp.asarray(t1),
            jnp.asarray(tk) if k > 1 else None, sub)
        assert np.allclose(np.asarray(out),
                           oracle(s, r, a[:, :k], x[:, :k], t1,
                                  tk if k > 1 else None), atol=1e-4), k


def test_banded_gradients_match_coo():
    from kpgnn_tpu.ops.adjacency import COOAdj, khop_aggregate_adj

    s, r, a, x, t1, tk = banded_case(seed=11, long_edges=8)
    n = x.shape[0]
    adj = build_banded(r, s, a, n, t1.shape[0], tk.shape[0], halo=64)
    coo = COOAdj(senders=jnp.asarray(s), receivers=jnp.asarray(r),
                 edge_attr=jnp.asarray(a),
                 edge_mask=jnp.ones(len(s), bool), n_nodes=n)

    def loss(backend):
        def f(x, t1, tk):
            out = khop_aggregate_adj(backend, x, t1, tk)
            return jnp.sum(out * jnp.cos(out))
        return f

    args = (jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk))
    gb = jax.grad(loss(adj), argnums=(0, 1, 2))(*args)
    gc = jax.grad(loss(coo), argnums=(0, 1, 2))(*args)
    for b, c in zip(gb, gc):
        assert np.allclose(np.asarray(b), np.asarray(c), atol=1e-4)


def test_banded_gcn_norm_matches_coo():
    """KPGCNConv end to end on a gcn_norm banded plan == the COO backend
    (the structural deg^-0.5 sender scale folds into the mask, the
    weighted histograms, and the spill weights), gradients included."""
    from kpgnn_tpu.graph.batch import collate, collate_banded
    from kpgnn_tpu.graph.data import Graph
    from kpgnn_tpu.nn.layers import KPGCNConv

    rng = np.random.default_rng(23)
    K, V1, VK = 2, 4, 8
    gs = []
    for n in (300, 280):                  # long edges force spill
        src = np.arange(n - 1)
        s = np.concatenate([src, [5, 9]])
        r = np.concatenate([src + 1, [5 + n // 2, 9 + n // 2]])
        ei = np.stack([s, r])
        e = ei.shape[1]
        ea = rng.integers(1, VK, size=(e, K)).astype(np.int32)
        ea[:, 0] = rng.integers(1, V1, e)
        # hop-DISTINCT liveness: different edges dead on different hops,
        # so per-hop degrees (and the folded deg^-0.5 columns) differ —
        # a hop-column mixing bug in the fold cannot pass
        for k in range(K):
            ea[rng.random(e) < 0.3 + 0.2 * k, k] = 0
        gs.append(Graph(num_nodes=n, edge_index=ei.astype(np.int32),
                        edge_attr=ea,
                        x=rng.normal(size=(n, 12)).astype(np.float32),
                        y=np.zeros(1, np.float32),
                        pe_attr=rng.integers(0, VK, size=(n, K - 1))
                        .astype(np.int32)))
    cb = collate_banded(gs, v1=V1, vk=VK, halo=64, gcn_norm=True)
    assert cb.adj.sender_scaled and cb.adj.spill_weights is not None
    cc = collate(gs, n_pad=cb.n_pad)
    conv = KPGCNConv(hidden_size=12, K=K, num_hop1_edge=V1 - 2,
                     num_pe=VK - 2)
    v = conv.init(jax.random.PRNGKey(0), cc.x, cc.adj,
                  cc.pe_attr[:, :K - 1], None, cc.node_mask)
    app = jax.jit(conv.apply)          # eager flax apply dominated wall
    out_c = app(v, cc.x, cc.adj, cc.pe_attr[:, :K - 1], None,
                cc.node_mask)
    out_b = app(v, cb.x, cb.adj, cb.pe_attr[:, :K - 1], None,
                cb.node_mask)
    assert np.allclose(np.asarray(out_b), np.asarray(out_c), atol=1e-4), \
        np.abs(np.asarray(out_b) - np.asarray(out_c)).max()

    gc = jax.jit(jax.grad(lambda p: jnp.sum(conv.apply(
        p, cc.x, cc.adj, cc.pe_attr[:, :K - 1], None, cc.node_mask) ** 2)
    ))(v)
    gb = jax.jit(jax.grad(lambda p: jnp.sum(conv.apply(
        p, cb.x, cb.adj, cb.pe_attr[:, :K - 1], None, cb.node_mask) ** 2)
    ))(v)
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(gb)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    # a plain (unscaled) banded plan must refuse the GCN layer loudly
    cb2 = collate_banded(gs, v1=V1, vk=VK, halo=64)
    with pytest.raises(ValueError, match="gcn_norm"):
        conv.apply(v, cb2.x, cb2.adj, cb2.pe_attr[:, :K - 1], None,
                   cb2.node_mask)


def test_banded_rejects_sender_scale():
    s, r, a, x, t1, tk = banded_case(seed=13)
    adj = build_banded(r, s, a, x.shape[0], t1.shape[0], tk.shape[0])
    with pytest.raises(ValueError, match="sender_scale"):
        banded_khop_aggregate(jnp.asarray(x), jnp.asarray(t1),
                              jnp.asarray(tk), adj,
                              sender_scale=jnp.ones(x.shape[:2]))


def test_banded_degree_helpers():
    from kpgnn_tpu.ops.adjacency import degree, union_in_degree

    s, r, a, x, t1, tk = banded_case(seed=15, long_edges=12)
    n, K = x.shape[0], x.shape[1]
    adj = build_banded(r, s, a, n, t1.shape[0], tk.shape[0], halo=64)
    deg = np.zeros((n, K), np.float32)
    for k in range(K):
        np.add.at(deg[:, k], r[a[:, k] > 0], 1.0)
    assert np.array_equal(np.asarray(degree(adj)), deg)
    assert np.array_equal(np.asarray(union_in_degree(adj)),
                          np.bincount(r, minlength=n))


def _sharded_case(seed=0, n=1024, K=3, D=8, V=6, long_edges=24):
    """Banded graph + some long-range edges, plus the unsharded COO adj."""
    from kpgnn_tpu.ops.adjacency import COOAdj

    s, r, a, x, t1, tk = banded_case(seed=seed, n=n, K=K, D=D, V1=V, Vk=V,
                                     long_edges=long_edges)
    coo = COOAdj(senders=jnp.asarray(s), receivers=jnp.asarray(r),
                 edge_attr=jnp.asarray(a),
                 edge_mask=jnp.ones(len(s), bool), n_nodes=n)
    return coo, jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk)


@pytest.mark.parametrize("mode", ["add", "scale", "mean"])
def test_sharded_banded_aggregate_matches_coo(mode):
    """Halo exchange composed with the local banded window matmuls: in-
    shard edges ride the windows, every cross-shard edge travels the
    spill list.  Pure XLA, so the compiled path runs under shard_map on
    CPU too (no interpret-mode indirection)."""
    from jax.sharding import PartitionSpec as P
    from kpgnn_tpu.ops.adjacency import khop_aggregate_adj
    from kpgnn_tpu.parallel import make_mesh, partition_adj
    from kpgnn_tpu.parallel.partition import attach_banded_plans

    coo, x, t1, tk = _sharded_case()
    n, K = x.shape[0], x.shape[1]
    rng = np.random.default_rng(1)
    scale = (jnp.asarray(rng.random((n, K)), jnp.float32)
             if mode == "scale" else None)
    aggr = "mean" if mode == "mean" else "add"
    expect = khop_aggregate_adj(coo, x, t1, tk, scale=scale, aggr=aggr)

    n_shards = 2
    sharded = attach_banded_plans(partition_adj(coo, n_shards),
                                  v1=t1.shape[0], vk=tk.shape[0])
    assert sharded.banded is not None
    # cross-shard edges must all be in the spill lists
    assert sharded.banded.spill_senders is not None
    mesh = make_mesh(n_shards, axis_names=("node",))
    node = P("node")
    sh_specs = sharded.replace(
        senders=node, receivers=node, edge_attr=node, edge_mask=node,
        send_rows=node, banded=jax.tree.map(lambda _: node,
                                            sharded.banded))
    opt = lambda v: node if v is not None else None

    def per_device(adj_s, x_s, sc):
        assert adj_s.banded is not None
        return khop_aggregate_adj(adj_s, x_s, t1, tk, scale=sc, aggr=aggr)

    fn = _jit_smap(per_device, mesh=mesh,
                       in_specs=(sh_specs, node, opt(scale)),
                       out_specs=node)
    out = fn(sharded, x, scale)
    assert np.allclose(np.asarray(out), np.asarray(expect), atol=1e-4), \
        np.abs(np.asarray(out) - np.asarray(expect)).max()

    if mode != "add":
        return
    # gradients through the exchange + window matmuls + spill
    w = jnp.asarray(np.cos(np.arange(expect.size)).reshape(expect.shape),
                    jnp.float32)
    g_ref = jax.grad(lambda xx: jnp.sum(khop_aggregate_adj(
        coo, xx, t1, tk) * w))(x)
    loss_sh = _jit_smap(
        lambda adj_s, x_s, w_s: jax.lax.psum(
            jnp.sum(khop_aggregate_adj(adj_s, x_s, t1, tk) * w_s),
            "node"),
        mesh=mesh, in_specs=(sh_specs, node, node), out_specs=P())
    g_sh = jax.grad(lambda xx: loss_sh(sharded, xx, w))(x)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-4), \
        np.abs(np.asarray(g_sh) - np.asarray(g_ref)).max()


def test_sharded_banded_slice_hops_keeps_plan():
    """slice_hops on a banded-planned sharded adjacency slices the plan
    statically (no per-window plan copies) and the padded spill entries
    of hops >= k drop out via out-of-range rows."""
    from jax.sharding import PartitionSpec as P
    from kpgnn_tpu.ops.adjacency import khop_aggregate_adj
    from kpgnn_tpu.parallel import make_mesh, partition_adj
    from kpgnn_tpu.parallel.partition import attach_banded_plans

    coo, x, t1, tk = _sharded_case(seed=4)
    n_shards = 2
    sharded = attach_banded_plans(partition_adj(coo, n_shards),
                                  v1=t1.shape[0], vk=tk.shape[0])
    mesh = make_mesh(n_shards, axis_names=("node",))
    node = P("node")
    sh_specs = sharded.replace(
        senders=node, receivers=node, edge_attr=node, edge_mask=node,
        send_rows=node, banded=jax.tree.map(lambda _: node,
                                            sharded.banded))
    for k in (1, 2):
        expect = khop_aggregate_adj(coo.slice_hops(k), x[:, :k], t1,
                                    tk if k > 1 else None)

        def per_device(adj_s, x_s, k=k):
            sl = adj_s.slice_hops(k)
            assert sl.banded is not None        # fast path kept
            return khop_aggregate_adj(sl, x_s[:, :k], t1,
                                      tk if k > 1 else None)

        fn = _jit_smap(per_device, mesh=mesh,
                           in_specs=(sh_specs, node), out_specs=node)
        out = fn(sharded, x)
        assert np.allclose(np.asarray(out), np.asarray(expect),
                           atol=1e-4), (k, np.abs(
                               np.asarray(out) - np.asarray(expect)).max())


def test_banded_loader_pins_one_compiled_shape():
    """Shuffled banded-mode loading must produce identical pytree shapes
    across batches (halo and spill length pinned to dataset worst case),
    or every step would recompile."""
    from kpgnn_tpu.graph.data import Graph
    from kpgnn_tpu.train import GraphLoader

    rng = np.random.default_rng(3)
    gs = []
    for i in range(12):
        n = int(rng.integers(520, 640))   # long edges (span n//2) must
                                          # exceed the dataset halo
        src = np.arange(n - 1)
        s, r = [src], [src + 1]
        # varying numbers of long-range edges -> varying raw spill counts
        for _ in range(int(rng.integers(0, 4))):
            a = int(rng.integers(0, n // 3))
            s.append([a])
            r.append([a + n // 2])
        ei = np.stack([np.concatenate(s), np.concatenate(r)])
        e = ei.shape[1]
        ea = rng.integers(1, 6, size=(e, 2)).astype(np.int32)
        gs.append(Graph(num_nodes=n, edge_index=ei.astype(np.int32),
                        edge_attr=ea,
                        x=rng.normal(size=(n, 4)).astype(np.float32),
                        y=np.zeros(1, np.float32)))
    loader = GraphLoader(gs, batch_size=4, shuffle=True, seed=0,
                         mode="banded", v1=6, vk=6)
    shapes = {tuple((p, tuple(a.shape)) for p, a in
                    jax.tree_util.tree_leaves_with_path(b))
              for b in loader}
    assert len(shapes) == 1, f"{len(shapes)} distinct compiled shapes"
    b = loader.example()
    assert b.adj.spill_rows is not None        # padded, present in all


def test_banded_padded_spill_slice_hops_drops():
    """A spill_pad-built plan has no static hop cuts; sliced hops must
    still drop the higher-hop (and padding) spill entries exactly."""
    s, r, a, x, t1, tk = banded_case(seed=17, long_edges=10)
    adj = build_banded(r, s, a, x.shape[0], t1.shape[0], tk.shape[0],
                       halo=64, spill_pad=256)
    assert adj.spill_hop_ends == ()
    assert adj.spill_rows.shape[0] == 256
    out_full = banded_khop_aggregate(jnp.asarray(x), jnp.asarray(t1),
                                     jnp.asarray(tk), adj)
    assert np.allclose(np.asarray(out_full), oracle(s, r, a, x, t1, tk),
                       atol=1e-4)
    for k in (1, 2):
        sub = adj.slice_hops(k)
        out = banded_khop_aggregate(
            jnp.asarray(x[:, :k]), jnp.asarray(t1),
            jnp.asarray(tk) if k > 1 else None, sub)
        assert np.allclose(np.asarray(out),
                           oracle(s, r, a[:, :k], x[:, :k], t1,
                                  tk if k > 1 else None), atol=1e-4), k


def test_banded_layer_matches_coo():
    """KPGINConv end to end: banded == COO, values and shapes."""
    from kpgnn_tpu.graph.batch import collate, collate_banded
    from kpgnn_tpu.graph.data import Graph
    from kpgnn_tpu.nn.layers import KPGINConv

    rng = np.random.default_rng(21)
    K, V1, VK = 2, 4, 8
    gs = []
    for n in (60, 45):
        src = np.arange(n - 1)
        ei = np.stack([np.concatenate([src, src + 1]),
                       np.concatenate([src + 1, src])])
        e = ei.shape[1]
        ea = rng.integers(1, VK, size=(e, K)).astype(np.int32)
        ea[:, 0] = rng.integers(1, V1, e)
        gs.append(Graph(num_nodes=n, edge_index=ei.astype(np.int32),
                        edge_attr=ea,
                        x=rng.normal(size=(n, 12)).astype(np.float32),
                        y=np.zeros(1, np.float32),
                        pe_attr=rng.integers(0, VK, size=(n, K - 1))
                        .astype(np.int32)))
    cb = collate_banded(gs, v1=V1, vk=VK)
    cc = collate(gs, n_pad=cb.n_pad)
    conv = KPGINConv(hidden_size=12, K=K, num_hop1_edge=V1 - 2,
                     num_pe=VK - 2)
    v = conv.init(jax.random.PRNGKey(0), cc.x, cc.adj,
                  cc.pe_attr[:, :K - 1], None, cc.node_mask)
    out_c = conv.apply(v, cc.x, cc.adj, cc.pe_attr[:, :K - 1], None,
                       cc.node_mask)
    out_b = conv.apply(v, cb.x, cb.adj, cb.pe_attr[:, :K - 1], None,
                       cb.node_mask)
    assert np.allclose(np.asarray(out_b), np.asarray(out_c), atol=1e-4)
