"""GraphBatch collation invariants."""
import numpy as np

from kpgnn_tpu.graph import BucketSpec, Graph, collate, pad_sizes


def toy_graph(n, e, K=3, seed=0, y=None):
    rng = np.random.default_rng(seed)
    ei = rng.integers(0, n, size=(2, e))
    ea = rng.integers(0, 5, size=(e, K))
    ea[:, 0] = rng.integers(2, 5, size=e)  # every real edge visible somewhere
    x = rng.normal(size=(n, 4)).astype(np.float32)
    return Graph(num_nodes=n, edge_index=ei, edge_attr=ea, x=x,
                 y=np.array([y if y is not None else 0.0], dtype=np.float32),
                 pe_attr=np.zeros((n, K - 1), dtype=np.int32))


def test_collate_shapes_and_masks():
    gs = [toy_graph(5, 8, seed=0, y=1.0), toy_graph(7, 12, seed=1, y=2.0)]
    b = collate(gs, n_pad=16, e_pad=32, g_pad=4)
    assert b.x.shape == (16, 4)
    assert b.edge_attr.shape == (32, 3)
    assert int(b.node_mask.sum()) == 12
    assert int(b.edge_mask.sum()) == 20
    assert int(b.graph_mask.sum()) == 2
    # padded nodes live in the masked last graph slot
    assert (np.asarray(b.node_graph_ids)[12:] == 3).all()
    assert np.asarray(b.y)[:2].tolist() == [1.0, 2.0]


def test_receivers_sorted_and_offset():
    gs = [toy_graph(5, 8, seed=0), toy_graph(7, 12, seed=1)]
    b = collate(gs, n_pad=16, e_pad=32, g_pad=4)
    r = np.asarray(b.receivers)
    assert (np.diff(r) >= 0).all()
    em = np.asarray(b.edge_mask)
    # padded edges all point at the last node slot with all-zero attrs
    assert (r[~em] == 15).all()
    assert (np.asarray(b.edge_attr)[~em] == 0).all()
    # second graph's nodes offset by 5
    s = np.asarray(b.senders)[em]
    assert s.max() < 12


def test_segment_sum_equivalence():
    """Padded/sorted batch aggregation == naive per-graph aggregation."""
    import jax.numpy as jnp
    import jax.ops

    gs = [toy_graph(5, 8, seed=0), toy_graph(7, 12, seed=1)]
    b = collate(gs, n_pad=16, e_pad=32, g_pad=4)
    msg = jnp.where((b.edge_attr[:, :1] > 0), b.x[b.senders][:, :1], 0.0)
    agg = jax.ops.segment_sum(msg, b.receivers, num_segments=16)
    # naive
    expect = np.zeros((16, 1), dtype=np.float32)
    off = 0
    for g in gs:
        for i in range(g.num_edges):
            if g.edge_attr[i, 0] > 0:
                expect[g.edge_index[1, i] + off, 0] += g.x[g.edge_index[0, i], 0]
        off += g.num_nodes
    assert np.allclose(np.asarray(agg)[:12], expect[:12], atol=1e-5)


def test_bucketing_bounds_shapes():
    spec = BucketSpec(node_multiple=64, edge_multiple=256)
    sizes = set()
    rng = np.random.default_rng(0)
    for _ in range(50):
        gs = [toy_graph(int(rng.integers(4, 30)), int(rng.integers(4, 60)), seed=i)
              for i in range(int(rng.integers(2, 20)))]
        sizes.add(pad_sizes(gs, spec)[:2])
    assert len(sizes) < 12
