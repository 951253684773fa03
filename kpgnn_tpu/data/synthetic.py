"""Synthetic graph generators for benchmarking and shape checks.

`synthetic_molecules` mimics the ZINC-subset size distribution (9-37
heavy atoms, sparse bonds, small vocab) so benchmark batches exercise the
same shapes as the real training path without network access.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..graph.data import Graph
from ..prep.khop import KHopConfig, extract_khop


def _random_connected(n: int, rng) -> np.ndarray:
    """Random connected sparse undirected graph as (2, E) directed pairs:
    a random spanning tree plus a few extra edges (molecule-like density)."""
    edges = set()
    perm = rng.permutation(n)
    for i in range(1, n):
        u = int(perm[rng.integers(0, i)])
        v = int(perm[i])
        edges.add((min(u, v), max(u, v)))
    extra = int(rng.integers(0, max(2, n // 4)))
    for _ in range(extra):
        u, v = int(rng.integers(0, n)), int(rng.integers(0, n))
        if u != v:
            edges.add((min(u, v), max(u, v)))
    e = np.array(sorted(edges), dtype=np.int64)
    return np.concatenate([e, e[:, ::-1]], axis=0).T


def synthetic_molecules(
    n_graphs: int,
    cfg: KHopConfig,
    seed: int = 0,
    n_min: int = 9,
    n_max: int = 37,
    num_atom_types: int = 21,
    num_bond_types: int = 3,
    node_level_y: bool = False,
) -> List[Graph]:
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(n_min, n_max + 1))
        ei = _random_connected(n, rng)
        e = ei.shape[1]
        # bond types offset by +2 so 0/1 stay reserved (prep contract)
        ea = np.zeros(e, dtype=np.int64)
        half = e // 2
        t = rng.integers(2, num_bond_types + 2, size=half)
        ea[:half] = t
        ea[half:] = t
        x = rng.integers(0, num_atom_types, size=(n, 1)).astype(np.int64)
        y = (rng.normal(size=(n,)).astype(np.float32) if node_level_y
             else np.array([rng.normal()], dtype=np.float32))
        graphs.append(extract_khop(n, ei, ea, cfg, x=x, y=y))
    return graphs


def synthetic_khop_graphs(n_graphs: int, K: int, seed: int = 0, **kw):
    cfg = KHopConfig(K=K, kernel="spd", max_edge_attr_num=50,
                     max_hop_num=4, max_edge_type=3, max_edge_count=20,
                     max_distance_count=30)
    return synthetic_molecules(n_graphs, cfg, seed=seed, **kw)
