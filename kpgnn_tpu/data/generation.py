"""Random graph family generators (reference: datasets/graph_generation.py).

Ten families plus the PNA-style mixture; graphs are undirected, simple,
no self-loops, returned as dense {0,1} adjacency matrices with node
values sampled U[0,1].
"""
from __future__ import annotations

import math
from enum import Enum
from typing import Optional, Tuple

import networkx as nx
import numpy as np


class GraphType(Enum):
    RANDOM = 0
    ERDOS_RENYI = 1
    BARABASI_ALBERT = 2
    GRID = 3
    CAVEMAN = 5
    TREE = 6
    LADDER = 7
    LINE = 8
    STAR = 9
    CATERPILLAR = 10
    LOBSTER = 11


MIXTURE = [
    (GraphType.ERDOS_RENYI, 0.2), (GraphType.BARABASI_ALBERT, 0.2),
    (GraphType.GRID, 0.05), (GraphType.CAVEMAN, 0.05), (GraphType.TREE, 0.15),
    (GraphType.LADDER, 0.05), (GraphType.LINE, 0.05), (GraphType.STAR, 0.05),
    (GraphType.CATERPILLAR, 0.1), (GraphType.LOBSTER, 0.1),
]


def _largest_divisor_leq_sqrt(N: int) -> int:
    m = 1
    for i in range(1, int(math.sqrt(N)) + 1):
        if N % i == 0:
            m = i
    return m


def _family(N: int, gtype: GraphType, seed: int, degree: Optional[int],
            rng: np.random.Generator) -> nx.Graph:
    if gtype is GraphType.ERDOS_RENYI:
        deg = degree if degree is not None else rng.integers(1, N)
        return nx.fast_gnp_random_graph(N, deg / N, seed=seed)
    if gtype is GraphType.BARABASI_ALBERT:
        deg = degree if degree is not None else int(rng.integers(1, 11))
        return nx.barabasi_albert_graph(N, min(deg, N - 1), seed=seed)
    if gtype is GraphType.GRID:
        m = _largest_divisor_leq_sqrt(N)
        return nx.convert_node_labels_to_integers(nx.grid_2d_graph(m, N // m))
    if gtype is GraphType.CAVEMAN:
        m = _largest_divisor_leq_sqrt(N)
        return nx.caveman_graph(m, N // m)
    if gtype is GraphType.TREE:
        try:
            return nx.random_powerlaw_tree(N, seed=seed, tries=10000)
        except nx.NetworkXError:
            return nx.random_labeled_tree(N, seed=seed)
    if gtype is GraphType.LADDER:
        G = nx.ladder_graph(N // 2)
        if N % 2:
            G.add_node(N - 1)
            G.add_edge(0, N - 1)
        return G
    if gtype is GraphType.LINE:
        return nx.path_graph(N)
    if gtype is GraphType.STAR:
        return nx.star_graph(N - 1)
    if gtype is GraphType.CATERPILLAR:
        B = int(rng.integers(1, N))
        G = nx.empty_graph(N)
        for i in range(1, B):
            G.add_edge(i - 1, i)
        for i in range(B, N):
            G.add_edge(i, int(rng.integers(0, B)))
        return G
    if gtype is GraphType.LOBSTER:
        B = int(rng.integers(1, N))
        F = int(rng.integers(B + 1, N + 1))
        G = nx.empty_graph(N)
        for i in range(1, B):
            G.add_edge(i - 1, i)
        for i in range(B, F):
            G.add_edge(i, int(rng.integers(0, B)))
        for i in range(F, N):
            G.add_edge(i, int(rng.integers(B, F)))
        return G
    raise ValueError(f"unknown graph type {gtype}")


def generate_graph(N: int, gtype: GraphType = GraphType.RANDOM,
                   seed: Optional[int] = None, degree: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray, GraphType]:
    """Returns (adjacency, U[0,1] node values, concrete family used)."""
    rng = np.random.default_rng(seed)
    if gtype is GraphType.RANDOM:
        types, probs = zip(*MIXTURE)
        gtype = types[int(rng.choice(len(types), p=np.array(probs)))]
    G = _family(N, gtype, int(rng.integers(1 << 30)), degree, rng)
    A = np.zeros((N, N), dtype=np.float64)
    for u, v in G.edges:
        if u != v and u < N and v < N:
            A[u, v] = A[v, u] = 1.0
    features = rng.uniform(size=N)
    return A, features, gtype


def adjacency_to_edge_index(A: np.ndarray) -> np.ndarray:
    u, v = np.nonzero(A)
    return np.stack([u, v]).astype(np.int64)
