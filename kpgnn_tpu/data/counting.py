"""Substructure-counting dataset with closed-form ground truth
(reference: datasets/GraphCountDataset.py).

The reference loads a shipped randomgraph.mat (absent even upstream —
listed in its .MISSING_LARGE_BLOBS); here the graphs are generated:
Erdős–Rényi graphs of 10..20 nodes, labels computed analytically from
powers of A, and a fixed 30/20/50 split like the original benchmark.
Labels are standardized by the train split's std at training time
(reference: train_structure_counting.py:203).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from .algorithms import substructure_counts
from .generation import adjacency_to_edge_index

TASKS = ["triangle", "tailed_triangle", "star", "cycle4", "custom"]


def generate_counting_dataset(n_graphs: int = 1500, seed: int = 1234
                              ) -> Dict[str, List[dict]]:
    rng = np.random.default_rng(seed)
    graphs = []
    while len(graphs) < n_graphs:
        n = int(rng.integers(10, 21))
        p = rng.uniform(0.25, 0.5)
        A = (rng.uniform(size=(n, n)) < p).astype(np.float64)
        A = np.triu(A, 1)
        A = A + A.T
        if A.max(axis=0).min() == 0:     # no singleton nodes
            continue
        y = substructure_counts(A).astype(np.float32)
        graphs.append({
            "num_nodes": n,
            "edge_index": adjacency_to_edge_index(A),
            "x": np.ones((n, 1), dtype=np.int64),
            "y": y,
        })
    n_train = int(0.3 * n_graphs)
    n_val = int(0.2 * n_graphs)
    return {
        "train": graphs[:n_train],
        "val": graphs[n_train:n_train + n_val],
        "test": graphs[n_train + n_val:],
    }
