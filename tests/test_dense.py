"""Dense (MXU) adjacency backend == COO backend, layer by layer and
end-to-end.  Same graphs, same params, two physical layouts."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpgnn_tpu.graph import Graph, collate, collate_dense
from kpgnn_tpu.models import ModelConfig, make_model
from kpgnn_tpu.nn import KPGCNConv, KPGINConv, KPGINPlusConv, KPGraphSAGEConv

V1, VK = 6, 8  # num_hop1_edge+2, num_pe+2


def graphs_case(K=3, seed=0, n_graphs=3):
    rng = np.random.default_rng(seed)
    gs = []
    for _ in range(n_graphs):
        n = int(rng.integers(5, 9))
        e = int(rng.integers(6, 14))
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        # dedupe (u, v) pairs so dense assignment is well defined
        seen, keep = set(), []
        for i in range(e):
            key = (int(ei[0, i]), int(ei[1, i]))
            if key not in seen:
                seen.add(key)
                keep.append(i)
        ei = ei[:, keep]
        e = ei.shape[1]
        ea = rng.integers(0, VK - 2, size=(e, K))
        ea[:, 0] = rng.integers(2, V1 - 1, size=e)
        gs.append(Graph(
            num_nodes=n, edge_index=ei, edge_attr=ea,
            x=rng.normal(size=(n, 12)).astype(np.float32),
            y=np.array([0.0], np.float32),
            pe_attr=rng.integers(0, VK - 2, size=(n, K - 1)).astype(np.int32)))
    return gs


def both_batches(gs, K):
    coo = collate(gs, n_pad=64, e_pad=128, g_pad=len(gs) + 1)
    dense = collate_dense(gs, n_slot=10, v1=V1, vk=VK, g_pad=len(gs))
    return coo, dense


def real_rows(batch):
    return np.flatnonzero(np.asarray(batch.node_mask))


@pytest.mark.parametrize("cls,kw", [
    (KPGINConv, {}),
    (KPGCNConv, {}),
    (KPGraphSAGEConv, {"aggr": "mean"}),
    (KPGraphSAGEConv, {"aggr": "add"}),
    (KPGraphSAGEConv, {"aggr": "max"}),
])
def test_layer_dense_equals_coo(cls, kw):
    K = 3
    gs = graphs_case(K)
    coo, dense = both_batches(gs, K)
    conv = cls(hidden_size=12, K=K, num_hop1_edge=V1 - 2, num_pe=VK - 2, **kw)

    pa_coo = jnp.zeros((coo.n_pad, K, 4))
    pa_dense = jnp.zeros((dense.n_pad, K, 4))
    v = conv.init(jax.random.PRNGKey(0), coo.x, coo.adj, coo.pe_attr, pa_coo)
    out_coo = np.asarray(conv.apply(v, coo.x, coo.adj, coo.pe_attr, pa_coo))
    out_dense = np.asarray(conv.apply(v, dense.x, dense.adj, dense.pe_attr,
                                      pa_dense))
    a = out_coo[real_rows(coo)]
    b = out_dense[real_rows(dense)]
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_kpginplus_slice_dense_equals_coo():
    K = 3
    gs = graphs_case(K, seed=2)
    coo, dense = both_batches(gs, K)
    conv = KPGINPlusConv(hidden_size=12, K=2, num_hop1_edge=V1 - 2,
                         num_pe=VK - 2)
    # KPGINPlusConv takes the hop-major (k, N, H) window
    xs_coo = jnp.stack([coo.x, coo.x * 0.5], axis=0)
    xs_dense = jnp.stack([dense.x, dense.x * 0.5], axis=0)
    pa_coo = jnp.zeros((2, coo.n_pad, 12))
    pa_dense = jnp.zeros((2, dense.n_pad, 12))
    v = conv.init(jax.random.PRNGKey(1), xs_coo, coo.adj.slice_hops(2),
                  coo.pe_attr[:, :1], pa_coo, coo.node_mask)
    out_coo, _ = conv.apply(v, xs_coo, coo.adj.slice_hops(2),
                            coo.pe_attr[:, :1], pa_coo, coo.node_mask,
                            True, mutable=["batch_stats"])
    out_dense, _ = conv.apply(v, xs_dense, dense.adj.slice_hops(2),
                              dense.pe_attr[:, :1], pa_dense, dense.node_mask,
                              True, mutable=["batch_stats"])
    a = np.asarray(out_coo)[real_rows(coo)]
    b = np.asarray(out_dense)[real_rows(dense)]
    # BN stats differ: COO batch has 64 mask-counted rows vs dense 30?
    # no — masked BN counts only real rows, identical sets. Must match.
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_khop_max_matches_reference_oracle():
    """aggr='max' reference semantics on COO and dense vs a literal
    numpy oracle: PyG maxes the MASKED messages, so union edges dead at
    hop k contribute 0.0 and empty receivers read 0
    (reference: layers/KPGraphSAGE.py:104 masked_fill + scatter amax,
    include_self=False)."""
    from kpgnn_tpu.ops.adjacency import khop_aggregate_adj

    K, D = 3, 5
    gs = graphs_case(K, seed=11)
    coo, dense = both_batches(gs, K)
    rng = np.random.default_rng(3)
    # strictly negative features make the masked-as-0 candidates load-
    # bearing: excluding them (the old bug) yields negative maxima
    x = -np.abs(rng.normal(size=(coo.n_pad, K, D))).astype(np.float32) - 0.1
    t1 = rng.normal(size=(V1, D)).astype(np.float32)
    tk = rng.normal(size=(VK, D)).astype(np.float32)

    snd = np.asarray(coo.adj.senders)
    rcv = np.asarray(coo.adj.receivers)
    attr = np.asarray(coo.adj.edge_attr)
    mask = np.asarray(coo.adj.edge_mask)
    want = np.zeros((coo.n_pad, K, D), np.float32)
    for i in range(coo.n_pad):
        for k in range(K):
            cands = []
            for e in np.flatnonzero(mask & (rcv == i)):
                if attr[e, k] > 0:
                    tab = t1 if k == 0 else tk
                    cands.append(x[snd[e], k] + tab[attr[e, k]])
                else:
                    cands.append(np.zeros(D, np.float32))
            if cands:
                want[i, k] = np.max(np.stack(cands), axis=0)

    got_coo = np.asarray(khop_aggregate_adj(
        coo.adj, jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk),
        aggr="max"))
    assert np.allclose(got_coo, want, atol=1e-5), \
        np.abs(got_coo - want).max()

    # dense: same graphs live in per-graph slots; map node rows over
    x_d = np.zeros((dense.n_pad, K, D), np.float32)
    rows_c, rows_d = real_rows(coo), real_rows(dense)
    x_d[rows_d] = x[rows_c]
    got_dense = np.asarray(khop_aggregate_adj(
        dense.adj, jnp.asarray(x_d), jnp.asarray(t1), jnp.asarray(tk),
        aggr="max"))
    assert np.allclose(got_dense[rows_d], want[rows_c], atol=1e-5), \
        np.abs(got_dense[rows_d] - want[rows_c]).max()


def test_full_model_dense_equals_coo():
    K = 3
    gs = graphs_case(K, seed=5, n_graphs=4)
    coo = collate(gs, n_pad=64, e_pad=256, g_pad=5)
    dense = collate_dense(gs, n_slot=10, v1=V1, vk=VK, g_pad=4)
    cfg = ModelConfig(
        model_name="KPGIN", hidden_size=12, num_layer=2, K=K,
        num_hop1_edge=V1 - 2, max_pe_num=VK - 2, norm_type="Batch",
        virtual_node=True, JK="concat", combine="attention",
        input_encoder=("linear", 12),
        task="graph_regression", pooling_method="mean")
    model = make_model(cfg)
    v = model.init(jax.random.PRNGKey(0), coo, train=False)
    out_coo = np.asarray(model.apply(v, coo, train=False))
    out_dense = np.asarray(model.apply(v, dense, train=False))
    a = out_coo[np.flatnonzero(np.asarray(coo.graph_mask))]
    b = out_dense[np.flatnonzero(np.asarray(dense.graph_mask))]
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_pallas_backend_equals_coo(monkeypatch):
    """Third backend: the Pallas kernel plan, via interpret mode on CPU."""
    import kpgnn_tpu.ops.pallas_spmm as ps

    orig = ps.gather_segment_sum
    monkeypatch.setattr(
        ps, "gather_segment_sum",
        lambda x, csr, interpret=True, **kw: orig(x, csr, interpret=True))

    from kpgnn_tpu.graph.batch import collate_pallas

    K = 3
    gs = graphs_case(K, seed=8, n_graphs=3)
    coo = collate(gs, n_pad=128, e_pad=256, g_pad=len(gs) + 1)
    pal = collate_pallas(gs, v1=V1, vk=VK, n_pad=128, e_pad=256,
                         g_pad=len(gs) + 1)

    conv = KPGINConv(hidden_size=12, K=K, num_hop1_edge=V1 - 2, num_pe=VK - 2)
    rng = np.random.default_rng(0)
    pa = jnp.asarray(rng.normal(size=(coo.n_pad, K, 4)).astype(np.float32))
    v = conv.init(jax.random.PRNGKey(0), coo.x, coo.adj, coo.pe_attr, pa)
    out_coo = np.asarray(conv.apply(v, coo.x, coo.adj, coo.pe_attr, pa))
    # hop-major-native backends take hop-major peripheral (the backbone
    # transposes it once per forward)
    out_pal = np.asarray(conv.apply(v, pal.x, pal.adj, pal.pe_attr,
                                    jnp.transpose(pa, (1, 0, 2))))
    rows = real_rows(coo)
    assert np.allclose(out_coo[rows], out_pal[rows], atol=1e-4), \
        np.abs(out_coo[rows] - out_pal[rows]).max()


def test_pallas_backend_full_model(monkeypatch):
    import kpgnn_tpu.ops.pallas_spmm as ps

    orig = ps.gather_segment_sum
    monkeypatch.setattr(
        ps, "gather_segment_sum",
        lambda x, csr, interpret=True, **kw: orig(x, csr, interpret=True))

    from kpgnn_tpu.graph.batch import collate_pallas

    K = 3
    gs = graphs_case(K, seed=9, n_graphs=4)
    coo = collate(gs, n_pad=128, e_pad=256, g_pad=5)
    pal = collate_pallas(gs, v1=V1, vk=VK, n_pad=128, e_pad=256, g_pad=5)
    cfg = ModelConfig(
        model_name="KPGIN", hidden_size=12, num_layer=2, K=K,
        num_hop1_edge=V1 - 2, max_pe_num=VK - 2, norm_type="Batch",
        virtual_node=True, JK="concat", input_encoder=("linear", 12),
        task="graph_regression", pooling_method="mean")
    model = make_model(cfg)
    v = model.init(jax.random.PRNGKey(0), coo, train=False)
    a = np.asarray(model.apply(v, coo, train=False))
    b = np.asarray(model.apply(v, pal, train=False))
    g = np.flatnonzero(np.asarray(coo.graph_mask))
    assert np.allclose(a[g], b[g], atol=1e-4), np.abs(a[g] - b[g]).max()
