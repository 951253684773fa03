"""Parallel preprocessing driver with on-disk caching.

The reference preprocesses datasets single-threaded inside the dataset's
`pre_transform` and caches to `data/<name>_<K>_<kernel>/processed`
(reference: train_ZINC.py:204-217).  Here extraction is a pure function per
graph, so we fan it out over a process pool and cache the resulting Graph
list as one compressed npz bundle keyed by the config.
"""
from __future__ import annotations

import dataclasses
import hashlib
import os
import pickle
from concurrent.futures import ProcessPoolExecutor
from typing import Callable, Iterable, List, Optional, Sequence

import numpy as np

from ..graph.data import Graph
from .khop import KHopConfig, extract_khop


def _cache_key(name: str, cfg: KHopConfig, extra: str = "") -> str:
    payload = f"{name}|{dataclasses.asdict(cfg)}|{extra}"
    return hashlib.sha1(payload.encode()).hexdigest()[:16]


def _extract_one(args):
    raw, cfg = args
    return extract_khop(
        num_nodes=raw["num_nodes"],
        edge_index=raw["edge_index"],
        edge_attr=raw.get("edge_attr"),
        cfg=cfg,
        x=raw.get("x"),
        y=raw.get("y"),
        z=raw.get("z"),
        pos=raw.get("pos"),
    )


def preprocess_graphs(
    raw_graphs: Sequence[dict],
    cfg: KHopConfig,
    cache_dir: Optional[str] = None,
    name: str = "dataset",
    num_workers: int = 0,
    reprocess: bool = False,
) -> List[Graph]:
    """Extract k-hop attributes for a list of raw graphs.

    Each raw graph is a dict with keys num_nodes / edge_index and optional
    edge_attr / x / y / z / pos.  With `cache_dir` set, results round-trip
    through a pickle cache keyed by (name, cfg).

    The cache is STRUCTURAL ONLY: labels (`y`) are re-attached from the
    raw dicts on every call, cached or not.  Scripts routinely rewrite
    `raw["y"]` per task/target before calling (e.g. counting tasks 0..4
    share one structural prep); baking labels into the cache would serve
    task 0's labels to every other task.
    """
    cache_path = None
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = os.path.join(
            cache_dir, f"{name}_{cfg.K}_{cfg.kernel}_{_cache_key(name, cfg)}.pkl"
        )
        if os.path.exists(cache_path) and not reprocess:
            with open(cache_path, "rb") as f:
                cached = pickle.load(f)
            if len(cached) == len(raw_graphs):
                return [g.replace(y=raw.get("y"))
                        for g, raw in zip(cached, raw_graphs)]
            # stale cache (dataset size changed under the same name)

    jobs = [(raw, cfg) for raw in raw_graphs]
    if num_workers and num_workers > 1 and len(jobs) > 64:
        with ProcessPoolExecutor(max_workers=num_workers) as ex:
            graphs = list(ex.map(_extract_one, jobs, chunksize=64))
    else:
        graphs = [_extract_one(j) for j in jobs]

    if cache_path is not None:
        with open(cache_path, "wb") as f:
            pickle.dump(graphs, f)
    return graphs
