"""C++ native preprocessing kernels vs the numpy reference path."""
import numpy as np
import pytest

from kpgnn_tpu.prep import khop as K
from kpgnn_tpu.prep import native
from kpgnn_tpu.prep.khop import KHopConfig

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")


def rand_graph(n, p, seed):
    rng = np.random.default_rng(seed)
    A = np.triu((rng.uniform(size=(n, n)) < p).astype(np.int64), 1)
    A = A + A.T
    attr = np.where(A > 0, rng.integers(2, 6, size=(n, n)), 0)
    attr = np.triu(attr, 1)
    attr = attr + attr.T
    return A, attr.astype(np.int64)


@pytest.mark.parametrize("seed", range(4))
def test_powers_and_masks(seed):
    A, _ = rand_graph(15, 0.3, seed)
    for Kh in (1, 3, 5):
        ref = K.adjacency_powers(A, Kh)
        nat = native.adjacency_powers(A, Kh)
        assert (ref == nat).all()

        ref_m, ref_u = K._spd_mask(ref.copy())
        nat_m, nat_u = native.spd_mask(nat.copy())
        assert (ref_m == nat_m).all()
        assert (ref_u == nat_u).all()

        assert (native.gd_union(nat) ==
                (ref.sum(0) > 0).astype(np.int64)).all()


@pytest.mark.parametrize("seed", range(4))
def test_bfs_apsp(seed):
    A, _ = rand_graph(14, 0.25, seed)
    for cap in (1, 2, 6):
        assert (native.bfs_apsp((A > 0).astype(np.uint8), cap) ==
                K.bfs_apsp(A > 0, cap)).all()


@pytest.mark.parametrize("seed", range(4))
def test_peripheral(seed):
    A, attr = rand_graph(12, 0.35, seed)
    cfg = KHopConfig(K=2, kernel="spd", max_edge_attr_num=10,
                     max_hop_num=3, max_edge_type=2, max_edge_count=7,
                     max_distance_count=9)
    powers = K.adjacency_powers(A, 2)
    hop_mats, _ = K._spd_mask(powers)
    for k in range(2):
        em_ref, cm_ref = K._peripheral_for_hop(attr, hop_mats[k], cfg)
        em_nat, cm_nat = native.peripheral_hop(
            attr, hop_mats[k], cfg.max_hop_num, cfg.max_edge_type,
            cfg.max_edge_count, cfg.max_distance_count)
        assert (em_ref == em_nat).all(), (em_ref, em_nat)
        assert (cm_ref == cm_nat).all()


def test_full_extract_native_equals_numpy(monkeypatch):
    A, attr = rand_graph(13, 0.3, 7)
    ei = np.stack(np.nonzero(A)).astype(np.int64)
    ea = attr[ei[0], ei[1]]
    cfg = KHopConfig(K=3, kernel="spd", max_edge_attr_num=8,
                     max_hop_num=3, max_edge_type=2, max_edge_count=7,
                     max_distance_count=9)
    g_nat = K.extract_khop(13, ei, ea, cfg)
    monkeypatch.setattr(native, "available", lambda: False)
    g_ref = K.extract_khop(13, ei, ea, cfg)
    assert (g_nat.edge_index == g_ref.edge_index).all()
    assert (g_nat.edge_attr == g_ref.edge_attr).all()
    assert (g_nat.peripheral_edge_attr == g_ref.peripheral_edge_attr).all()
    assert (g_nat.peripheral_config_attr == g_ref.peripheral_config_attr).all()
