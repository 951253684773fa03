"""Numpy graph oracles (reference: datasets/graph_algorithms.py).

Independent closed-form / classical-algorithm implementations used as
dataset label generators and as test oracles.  All operate on dense
symmetric {0,1} adjacency matrices without self-loops.
"""
from __future__ import annotations

import math
from collections import deque

import numpy as np


def all_pairs_shortest_paths(A: np.ndarray, inf_sub=math.inf) -> np.ndarray:
    """Floyd–Warshall; unreachable pairs become `inf_sub`
    (reference: graph_algorithms.py:292-313)."""
    n = A.shape[0]
    dist = np.where(A > 0, 1.0, np.inf)
    np.fill_diagonal(dist, 0.0)
    for k in range(n):
        dist = np.minimum(dist, dist[:, k:k + 1] + dist[k:k + 1, :])
    if not math.isinf(inf_sub):
        dist = np.where(np.isinf(dist), inf_sub, dist)
    return dist


def is_connected(A: np.ndarray) -> float:
    n = A.shape[0]
    seen = np.zeros(n, dtype=bool)
    q = deque([0])
    seen[0] = True
    while q:
        u = q.popleft()
        for v in np.flatnonzero(A[u]):
            if not seen[v]:
                seen[v] = True
                q.append(int(v))
    return float(seen.all())


def diameter(A: np.ndarray) -> float:
    """Longest finite shortest path (reference: graph_algorithms.py:316-326)."""
    d = all_pairs_shortest_paths(A)
    finite = d[np.isfinite(d)]
    return float(finite.max()) if finite.size else 0.0


def eccentricity(A: np.ndarray) -> np.ndarray:
    """Per-node eccentricity; unreachable pairs are excluded by mapping
    them to -1 before the max (reference: graph_algorithms.py:327-336)."""
    d = all_pairs_shortest_paths(A)
    cap = np.sum(A)
    d = np.where(d < cap + 1, d, -1.0)
    return np.max(d, axis=0)


def sssp_dist(A: np.ndarray, source: int) -> np.ndarray:
    """BFS distances from `source` (unreachable -> 0, matching the
    reference's use of all_pairs_shortest_paths(adj, 0)[source])."""
    return all_pairs_shortest_paths(A, 0)[source]


def graph_laplacian(A: np.ndarray) -> np.ndarray:
    return np.diag(A.sum(axis=0)) - A


def graph_laplacian_features(A: np.ndarray, F: np.ndarray) -> np.ndarray:
    """L @ F (reference: graph_algorithms.py:138-146)."""
    return graph_laplacian(A) @ F


def spectral_radius(A: np.ndarray) -> float:
    return float(np.max(np.abs(np.linalg.eigvals(A)).real))


def max_eigenvalue(A: np.ndarray) -> float:
    return float(np.max(np.linalg.eigvalsh(A)))


def page_rank(A: np.ndarray, d: float = 0.85, iters: int = 64) -> np.ndarray:
    n = A.shape[0]
    deg = np.maximum(A.sum(axis=1), 1.0)
    M = (A / deg[:, None]).T
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - d) / n + d * (M @ r)
    return r


# ---- closed-form substructure counts (reference:
# datasets/GraphCountDataset.py:44-58) ----

def _comb(n, k):
    return math.comb(int(n), k) if n >= k else 0


def substructure_counts(A: np.ndarray) -> np.ndarray:
    """[triangle, tailed-triangle, 3-star, 4-cycle, custom] counts."""
    A = A.astype(np.float64)
    A2 = A @ A
    A3 = A2 @ A
    deg = A.sum(axis=0)
    tri = np.trace(A3) / 6.0
    tailed = float(((np.diag(A3) / 2.0) * (deg - 2.0)).sum())
    star = float(sum(_comb(d, 3) for d in deg))
    cyc4 = (np.trace(A3 @ A) + np.trace(A2) - 2.0 * A2.sum()) / 8.0
    custom = float((A @ np.diag(np.exp(-A2.sum(axis=1))) @ A).sum())
    return np.array([tri, tailed, star, cyc4, custom], dtype=np.float64)


def sssp_predecessor(A: np.ndarray, F: np.ndarray) -> np.ndarray:
    """BFS predecessor matrix from the one-hot source in F
    (reference: graph_algorithms.py:338-360)."""
    s = int(np.argmax(F))
    n = A.shape[0]
    P = np.zeros_like(A)
    seen = np.zeros(n, dtype=bool)
    seen[s] = True
    q = deque([s])
    while q:
        u = q.popleft()
        for v in np.flatnonzero(A[u]):
            if not seen[v]:
                seen[v] = True
                P[v, u] = 1.0
                q.append(int(v))
    return P


def count_edges(A: np.ndarray) -> float:
    return float(A.sum() / 2.0)


def first_neighbours(A: np.ndarray) -> np.ndarray:
    return A.sum(axis=0)


def kth_neighbours(A: np.ndarray, k: int) -> np.ndarray:
    d = all_pairs_shortest_paths(A, 0)
    return (d == k).sum(axis=0).astype(np.float64)


def mean_neighbourhood(A: np.ndarray, F: np.ndarray) -> np.ndarray:
    deg = np.maximum(A.sum(axis=1), 1.0)
    return (A @ F) / deg


def max_neighbourhood(A: np.ndarray, F: np.ndarray) -> np.ndarray:
    out = np.full(A.shape[0], -np.inf)
    for i in range(A.shape[0]):
        nbr = np.flatnonzero(A[i])
        out[i] = F[nbr].max() if nbr.size else F[i]
    return out


def max_eigenvalues(A: np.ndarray, k: int) -> np.ndarray:
    ev = np.sort(np.linalg.eigvalsh(A))[::-1]
    return ev[:k]


def wl_colors(A: np.ndarray, labels=None, iters: int = 10) -> tuple:
    """1-WL color refinement; returns the sorted color histogram signature
    (two graphs with different signatures are non-isomorphic)."""
    n = A.shape[0]
    colors = (np.zeros(n, dtype=np.int64) if labels is None
              else np.asarray(labels, dtype=np.int64).copy())
    for _ in range(iters):
        sigs = []
        for i in range(n):
            nbr = tuple(sorted(colors[np.flatnonzero(A[i])].tolist()))
            sigs.append((int(colors[i]), nbr))
        uniq = {s: c for c, s in enumerate(sorted(set(sigs)))}
        new = np.array([uniq[s] for s in sigs], dtype=np.int64)
        if len(set(new.tolist())) == len(set(colors.tolist())):
            colors = new
            break
        colors = new
    vals, cnts = np.unique(colors, return_counts=True)
    return tuple(sorted(cnts.tolist()))
