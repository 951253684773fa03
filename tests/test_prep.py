"""k-hop extraction parity against independent networkx/numpy oracles."""
import networkx as nx
import numpy as np
import pytest

from kpgnn_tpu.prep import (
    KHopConfig,
    adjacency_powers,
    apply_ablation_clamps,
    bfs_apsp,
    extract_khop,
    resistance_distance,
)


def random_graph(n, p, seed, directed=False, attrs=True):
    rng = np.random.default_rng(seed)
    g = nx.gnp_random_graph(n, p, seed=int(seed), directed=False)
    edges = []
    for u, v in g.edges:
        edges.append((u, v))
        edges.append((v, u))
    if not edges:
        return n, np.zeros((2, 0), dtype=np.int64), None
    ei = np.array(edges, dtype=np.int64).T
    ea = None
    if attrs:
        # symmetric edge types in {2,3,4}
        ea = np.zeros(ei.shape[1], dtype=np.int64)
        typ = {}
        for i, (u, v) in enumerate(zip(*ei)):
            key = (min(u, v), max(u, v))
            if key not in typ:
                typ[key] = rng.integers(2, 5)
            ea[i] = typ[key]
    return n, ei, ea


def adj_from(ei, n):
    A = np.zeros((n, n), dtype=np.int64)
    A[ei[0], ei[1]] = 1
    return A


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("K", [1, 2, 3, 4])
def test_spd_edges_and_attrs(seed, K):
    n, ei, ea = random_graph(10, 0.3, seed)
    if ei.shape[1] == 0:
        pytest.skip("empty graph")
    cfg = KHopConfig(K=K, kernel="spd", max_edge_attr_num=30)
    g = extract_khop(n, ei, ea, cfg)

    A = adj_from(ei, n)
    G = nx.from_numpy_array(A, create_using=nx.DiGraph)
    spl = dict(nx.all_pairs_shortest_path_length(G))

    # expected union edge set: ordered pairs u != v with SPD <= K
    expected = set()
    for u in range(n):
        for v, d in spl.get(u, {}).items():
            if u != v and d <= K:
                expected.add((u, v))
    got = set(zip(g.edge_index[0].tolist(), g.edge_index[1].tolist()))
    assert got == expected

    attr_map = {}
    for i in range(ei.shape[1]):
        attr_map[(int(ei[0, i]), int(ei[1, i]))] = int(ea[i])

    for idx, (u, v) in enumerate(zip(*g.edge_index)):
        u, v = int(u), int(v)
        d = spl[u][v]
        row = g.edge_attr[idx]
        # hop-1 column: original attr if a direct edge exists, else 0
        assert row[0] == attr_map.get((u, v), 0)
        for k in range(2, K + 1):
            if k == d:
                walks = np.linalg.matrix_power(A, d)[u, v]
                assert row[k - 1] == min(walks, 30) + 1
            else:
                assert row[k - 1] == 0


@pytest.mark.parametrize("seed", range(4))
def test_gd_edges_and_attrs(seed):
    K = 3
    n, ei, ea = random_graph(9, 0.3, seed)
    if ei.shape[1] == 0:
        pytest.skip("empty graph")
    cfg = KHopConfig(K=K, kernel="gd", max_edge_attr_num=50)
    g = extract_khop(n, ei, ea, cfg)

    A = adj_from(ei, n)
    pw = [np.linalg.matrix_power(A, k) for k in range(1, K + 1)]
    for p in pw:
        np.fill_diagonal(p, 0)
    union = set(zip(*np.nonzero(sum(pw))))
    got = set(zip(g.edge_index[0].tolist(), g.edge_index[1].tolist()))
    assert got == union

    for idx, (u, v) in enumerate(zip(*g.edge_index)):
        u, v = int(u), int(v)
        for k in range(2, K + 1):
            w = pw[k - 1][u, v]
            exp = min(w, 50) + 1 if w > 0 else 0
            assert g.edge_attr[idx, k - 1] == exp


def test_pe_attr_is_diag_of_processed_powers():
    # reference zeroes diagonals of every power (data_utils.py:123), so the
    # path encoding is identically zero — we reproduce the semantics.
    n, ei, ea = random_graph(8, 0.4, 0)
    g = extract_khop(n, ei, ea, KHopConfig(K=3, kernel="spd", max_edge_attr_num=10))
    assert g.pe_attr.shape == (n, 2)
    assert (g.pe_attr == 0).all()


def test_bfs_apsp_matches_networkx():
    for seed in range(5):
        n, ei, _ = random_graph(12, 0.25, seed, attrs=False)
        A = adj_from(ei, n) if ei.size else np.zeros((n, n), dtype=np.int64)
        for cap in [1, 2, 3, 10]:
            dist = bfs_apsp(A > 0, cap)
            G = nx.from_numpy_array(A, create_using=nx.DiGraph)
            for u in range(n):
                lengths = nx.single_source_shortest_path_length(G, u, cutoff=cap)
                for v in range(n):
                    exp = lengths.get(v, 0)
                    if v == u:
                        exp = 0
                    assert dist[u, v] == exp, (u, v, cap)


def test_bfs_apsp_dense_no_overflow():
    """Regression: int8 walk-count matmul wrapped past 127 walks on dense
    graphs and returned dist 0 for reachable pairs (advice r1)."""
    rng = np.random.default_rng(7)
    n = 200
    A = (rng.random((n, n)) < 0.6)
    A = (A | A.T) & ~np.eye(n, dtype=bool)
    dist = bfs_apsp(A, 4)
    G = nx.from_numpy_array(A.astype(int))
    for u in (0, 50, 199):
        lengths = nx.single_source_shortest_path_length(G, u, cutoff=4)
        for v in range(n):
            exp = 0 if v == u else lengths.get(v, 0)
            assert dist[u, v] == exp, (u, v)


def test_peripheral_attrs_oracle():
    cfg = KHopConfig(
        K=2, kernel="spd", max_edge_attr_num=10,
        max_hop_num=3, max_edge_type=2, max_edge_count=10, max_distance_count=15,
    )
    n, ei, ea = random_graph(10, 0.35, 3)
    g = extract_khop(n, ei, ea, cfg)
    assert g.peripheral_edge_attr.shape == (n, 2, 2, 2)
    assert g.peripheral_config_attr.shape == (n, 2, 4)

    # independent oracle for hop-1 (the SPD hop-1 matrix is just A)
    A = adj_from(ei, n)
    Aattr = np.zeros((n, n), dtype=np.int64)
    Aattr[ei[0], ei[1]] = ea
    for i in range(n):
        nbr = np.flatnonzero(A[i])
        if nbr.size < 2:
            assert (g.peripheral_edge_attr[i, 0] == 0).all()
            continue
        sub = Aattr[np.ix_(nbr, nbr)]
        vals, counts = np.unique(sub[sub > 0], return_counts=True)
        if vals.size == 0:
            continue
        # the top type reported must be the argmax count (value - 2)
        top_idx = np.argmax(g.peripheral_edge_attr[i, 0, :, 1])
        top_type = g.peripheral_edge_attr[i, 0, top_idx, 0]
        best = vals[np.argmax(counts)] - 2
        best_count = counts.max()
        reported = dict(zip(g.peripheral_edge_attr[i, 0, :, 0].tolist(),
                            g.peripheral_edge_attr[i, 0, :, 1].tolist()))
        assert reported.get(int(best), -1) == min(best_count, 10) or \
            list(reported.values()).count(min(best_count, 10)) >= 1

        # configuration histogram: distances inside the subgraph
        Gs = nx.from_numpy_array(sub, create_using=nx.DiGraph)
        hist = np.zeros(4, dtype=np.int64)
        for u in Gs.nodes:
            for v, d in nx.single_source_shortest_path_length(Gs, u, cutoff=3).items():
                if u != v and 1 <= d <= 3:
                    hist[d] += 1
        assert (g.peripheral_config_attr[i, 0, 1:] == np.minimum(hist[1:], 15)).all()


def test_resistance_distance_path_graph():
    # path 0-1-2: resistance to node 0 equals hop distance (unit resistors)
    ei = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
    rd = resistance_distance(3, ei)
    assert np.allclose(rd.ravel(), [0.0, 1.0, 2.0], atol=1e-5)


def test_ablation_clamps():
    n, ei, ea = random_graph(10, 0.4, 1)
    g = extract_khop(n, ei, ea, KHopConfig(K=3, kernel="spd", max_edge_attr_num=30))
    g2 = apply_ablation_clamps(g, wo_path_encoding=True)
    assert g2.edge_attr[:, 1:].max() <= 2
    assert (g2.edge_attr[:, 0] == g.edge_attr[:, 0]).all()
    assert (g2.pe_attr == 0).all()
    g3 = apply_ablation_clamps(g, wo_edge_feature=True)
    assert g3.edge_attr[:, 0].max() <= 2
    assert (g3.edge_attr[:, 1:] == g.edge_attr[:, 1:]).all()


def test_empty_graph():
    cfg = KHopConfig(K=3, kernel="spd", max_edge_attr_num=5,
                     max_hop_num=2, max_edge_type=1,
                     max_edge_count=5, max_distance_count=5)
    g = extract_khop(4, np.zeros((2, 0)), None, cfg)
    assert g.num_edges == 0
    assert g.edge_attr.shape == (0, 3)
    assert (g.peripheral_edge_attr == 0).all()


def test_walk_counts_use_int64():
    # dense graph with K=9: walk counts overflow int32
    n = 20
    ei = np.array([(u, v) for u in range(n) for v in range(n) if u != v]).T
    pw = adjacency_powers(adj_from(ei, n), 9)
    assert pw.dtype == np.int64
    assert pw[8].max() > 2**31


@pytest.mark.parametrize("kernel", ["spd", "gd"])
def test_device_khop_matches_host(kernel):
    """On-device SPD/GD extraction == host extraction, per hop-attr cell."""
    import jax.numpy as jnp

    from kpgnn_tpu.graph.batch import collate_dense
    from kpgnn_tpu.prep.device import device_khop_dense

    rng = np.random.default_rng(0)
    K, n_slot, v1, vk = 3, 12, 6, 9
    cfg = KHopConfig(K=K, kernel=kernel, max_edge_attr_num=vk - 2)
    graphs, adjs, attrs = [], [], []
    for seed in range(4):
        n, ei, ea = random_graph(int(rng.integers(6, 11)), 0.35, seed)
        if ei.shape[1] == 0:
            continue
        graphs.append(extract_khop(n, ei, ea, cfg))
        A = np.zeros((n_slot, n_slot))
        A[ei[0], ei[1]] = 1
        At = np.zeros((n_slot, n_slot), np.int32)
        At[ei[0], ei[1]] = ea
        adjs.append(A)
        attrs.append(At)

    host = collate_dense(graphs, n_slot=n_slot, v1=v1, vk=vk,
                         g_pad=len(graphs))
    dev, pe = device_khop_dense(
        jnp.asarray(np.stack(adjs)),
        jnp.asarray(np.swapaxes(np.stack(attrs), -1, -2)),  # receiver-major
        K=K, max_edge_attr_num=vk - 2, kernel=kernel, v1=v1, vk=vk)

    assert (np.asarray(dev.hop_attr) == np.asarray(host.adj.hop_attr)).all()
    assert np.allclose(np.asarray(dev.counts1), np.asarray(host.adj.counts1))
    assert np.allclose(np.asarray(dev.countsk), np.asarray(host.adj.countsk))


def test_preprocess_runner_parallel_and_cache(tmp_path):
    from kpgnn_tpu.prep import preprocess_graphs

    rng = np.random.default_rng(0)
    raws = []
    for i in range(80):
        n = int(rng.integers(5, 9))
        n_, ei, ea = random_graph(n, 0.4, i)
        raws.append({"num_nodes": n_, "edge_index": ei, "edge_attr": ea,
                     "x": np.zeros((n_, 1), np.int64),
                     "y": np.array([0.0], np.float32)})
    cfg = KHopConfig(K=2, kernel="spd", max_edge_attr_num=5)
    g1 = preprocess_graphs(raws, cfg, cache_dir=str(tmp_path), name="t",
                           num_workers=2)
    # second call hits the cache
    g2 = preprocess_graphs(raws, cfg, cache_dir=str(tmp_path), name="t")
    assert len(g1) == len(g2) == 80
    assert (g1[3].edge_attr == g2[3].edge_attr).all()
    # different config -> different cache entry
    cfg2 = KHopConfig(K=3, kernel="spd", max_edge_attr_num=5)
    g3 = preprocess_graphs(raws, cfg2, cache_dir=str(tmp_path), name="t")
    assert g3[3].edge_attr.shape[1] == 3


def test_preprocess_cache_is_structural_only(tmp_path):
    """Labels must come from the raw dicts on every call, never from the
    cache — counting/property scripts rewrite raw['y'] per task and reuse
    one structural prep (regression: tasks 1..4 silently trained on task
    0's cached labels)."""
    from kpgnn_tpu.prep import preprocess_graphs

    raws = []
    for i in range(4):
        n_, ei, ea = random_graph(6, 0.4, i)
        raws.append({"num_nodes": n_, "edge_index": ei, "edge_attr": ea,
                     "x": np.zeros((n_, 1), np.int64),
                     "y": np.array([0.0], np.float32)})
    cfg = KHopConfig(K=2, kernel="spd", max_edge_attr_num=5)
    preprocess_graphs(raws, cfg, cache_dir=str(tmp_path), name="lbl")
    for i, r in enumerate(raws):          # task switch rewrites labels
        r["y"] = np.array([float(i + 1)], np.float32)
    g2 = preprocess_graphs(raws, cfg, cache_dir=str(tmp_path), name="lbl")
    assert [float(g.y[0]) for g in g2] == [1.0, 2.0, 3.0, 4.0]
    # size change under the same name -> reprocess, not a truncated zip
    g3 = preprocess_graphs(raws[:2], cfg, cache_dir=str(tmp_path), name="lbl")
    assert len(g3) == 2 and float(g3[1].y[0]) == 2.0
