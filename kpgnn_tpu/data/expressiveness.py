"""Expressiveness benchmark datasets: EXP/CEXP, SR25, CSL
(reference: datasets/PlanarSATPairsDataset.py, datasets/SRDataset.py,
train_CSL.py:212-214).

EXP ships as a pickle of torch_geometric Data objects; a tolerant
unpickler maps the PyG classes onto a stub so no PyG install is needed.
CEXP ships as a text file of (label, adjacency-list) blocks.  SR25 is a
graph6 file (15 strongly regular (25,12,5,6) graphs).  CSL (circular
skip links) graphs are deterministic — C_41 plus skip-r links for ten
values of r — so they are generated directly instead of downloaded.
"""
from __future__ import annotations

import pickle
from typing import List, Optional

import networkx as nx
import numpy as np


class _StubData:
    """Stand-in for torch_geometric.data.Data during unpickling."""

    def __init__(self, *args, **kw):
        self.__dict__.update(kw)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__.update(dict(state))


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("torch_geometric"):
            return _StubData
        return super().find_class(module, name)


def _to_np(t):
    if t is None:
        return None
    try:
        return np.asarray(t.detach().cpu().numpy())
    except AttributeError:
        return np.asarray(t)


def load_exp_pickle(path: str) -> List[dict]:
    """EXP/CEXP pickle -> raw graph dicts (x int codes, y class)."""
    with open(path, "rb") as f:
        data_list = _TolerantUnpickler(f).load()
    out = []
    for d in data_list:
        attrs = d.__dict__
        # old PyG keeps tensors either flat or under __dict__['_store']
        store = attrs.get("_store", attrs)
        if hasattr(store, "__dict__"):
            store = store.__dict__
        ei = _to_np(store["edge_index"]).astype(np.int64)
        x = _to_np(store.get("x"))
        y = _to_np(store.get("y"))
        n = int(store.get("num_nodes") or (ei.max() + 1 if ei.size else
                                           (x.shape[0] if x is not None else 0)))
        if x is not None and x.ndim == 1:
            x = x[:, None]
        out.append({
            "num_nodes": n,
            "edge_index": ei,
            "x": x.astype(np.int64) if x is not None else
                 np.zeros((n, 1), np.int64),
            "y": np.asarray(y).reshape(-1)[:1].astype(np.int64),
        })
    return out


def load_exp_txt(path: str) -> List[dict]:
    """CEXP text format (GIN/S2V style): first line = number of graphs,
    then per graph:
         <num_nodes> <graph_label>
         <node_tag> <num_neighbors> <neighbors...>   (x num_nodes)
    """
    with open(path) as f:
        tokens = f.read().split("\n")
    n_graphs = int(tokens[0].strip())
    out = []
    i = 1
    while i < len(tokens) and len(out) < n_graphs:
        line = tokens[i].strip()
        i += 1
        if not line:
            continue
        n, label = map(int, line.split())
        edges = []
        tags = np.zeros((n, 1), dtype=np.int64)
        for u in range(n):
            row = list(map(int, tokens[i].split()))
            i += 1
            tags[u, 0] = row[0]
            for v in row[2:2 + row[1]]:
                edges.append((u, v))
        ei = (np.array(edges, dtype=np.int64).T if edges
              else np.zeros((2, 0), np.int64))
        out.append({"num_nodes": n, "edge_index": ei, "x": tags,
                    "y": np.array([label], np.int64)})
    return out


def load_sr25(path: str) -> List[dict]:
    """15 strongly-regular graphs; each graph is its own class
    (reference: train_SR.py:196)."""
    graphs = nx.read_graph6(path)
    if not isinstance(graphs, list):
        graphs = [graphs]
    out = []
    for i, g in enumerate(graphs):
        n = g.number_of_nodes()
        edges = [(u, v) for u, v in g.edges] + [(v, u) for u, v in g.edges]
        ei = np.array(sorted(edges), dtype=np.int64).T
        out.append({
            "num_nodes": n,
            "edge_index": ei,
            "x": np.zeros((n, 1), np.int64),
            "y": np.array([i], np.int64),
        })
    return out


CSL_SKIPS = (2, 3, 4, 5, 6, 9, 11, 12, 13, 16)


def generate_csl(n: int = 41, copies: int = 15, seed: int = 0) -> List[dict]:
    """Circular-skip-link graphs: C_n plus skip-r edges; class = r.  The
    standard benchmark is 10 classes x 15 relabeled copies of 41-node
    graphs (the content of PyG's GNNBenchmarkDataset('CSL'))."""
    rng = np.random.default_rng(seed)
    out = []
    for cls, r in enumerate(CSL_SKIPS):
        base = set()
        for i in range(n):
            base.add(tuple(sorted((i, (i + 1) % n))))
            base.add(tuple(sorted((i, (i + r) % n))))
        for c in range(copies):
            perm = (np.arange(n) if c == 0
                    else rng.permutation(n))
            edges = []
            for u, v in base:
                pu, pv = int(perm[u]), int(perm[v])
                edges.append((pu, pv))
                edges.append((pv, pu))
            ei = np.array(sorted(set(edges)), dtype=np.int64).T
            out.append({
                "num_nodes": n,
                "edge_index": ei,
                "x": np.zeros((n, 1), np.int64),
                "y": np.array([cls], np.int64),
            })
    return out
