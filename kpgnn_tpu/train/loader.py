"""Batch iterator: Graph list -> stream of fixed-shape GraphBatches.

Shapes are chosen once per loader (worst-case over the dataset by
default), so the jitted train step compiles exactly once.  The final
partial batch is padded with masked graph slots instead of being dropped
or reshaped.

Shuffled (training) iteration collates on a background thread with a
small queue, overlapping host-side packing with device compute; ordered
(eval) iteration collates once and replays device-resident batches.
"""
from __future__ import annotations

import math
import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

from ..graph.batch import (BucketSpec, GraphBatch, collate, collate_banded,
                           collate_dense, collate_pallas)
from ..graph.data import Graph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def background_iter(factory, maxsize: int = 2):
    """Run `factory()` (an iterator) on a daemon thread; yield its items
    through a bounded queue.

    Abandoning the returned generator (GeneratorExit, consumer exception,
    KeyboardInterrupt mid-epoch) cancels the producer promptly: puts are
    timed and observe a cancel event set in the generator's finally, so
    neither the thread nor its queued items outlive the consumer — the
    blocked-forever-on-put leak a plain q.put producer has."""
    q: "queue.Queue" = queue.Queue(maxsize=maxsize)
    SENTINEL = object()
    cancel = threading.Event()

    def put(item) -> bool:
        while not cancel.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                pass
        return False

    def producer():
        try:
            for item in factory():
                if not put(item):
                    return
            put(SENTINEL)
        except BaseException as e:      # surface in the consumer
            put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()
    finally:
        cancel.set()


class GraphLoader:
    """mode="coo" for general graphs; mode="dense" routes small graphs
    (n <= n_slot) through the MXU matmul backend — v1/vk must then match
    the model's num_hop1_edge+2 / max_pe_num+2 vocab sizes."""

    def __init__(
        self,
        graphs: Sequence[Graph],
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        n_pad: Optional[int] = None,
        e_pad: Optional[int] = None,
        spec: Optional[BucketSpec] = None,
        y_is_node_level: bool = False,
        drop_last: bool = False,
        mode: str = "coo",
        n_slot: Optional[int] = None,
        v1: Optional[int] = None,
        vk: Optional[int] = None,
        pallas_geometry: Optional[tuple] = None,  # (tile_r, wblock, egroup)
        banded_gcn_norm: bool = False,  # fold GCN's deg^-0.5 into the plan
    ):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.y_is_node_level = y_is_node_level
        self.drop_last = drop_last
        self.mode = mode
        spec = spec or BucketSpec()

        if mode in ("dense", "pallas", "banded") and (v1 is None or vk is None):
            raise ValueError(f"{mode} mode needs v1/vk vocab sizes")
        if mode in ("pallas", "banded"):
            self.v1, self.vk = v1, vk
            self.pallas_geometry = pallas_geometry or (None, None, None)
            self.banded_gcn_norm = banded_gcn_norm
        if mode == "banded":
            # pin the halo and the spill-list length to dataset worst
            # cases so every batch compiles to ONE shape (per-batch
            # auto-sizing would recompile on nearly every shuffled step)
            from ..ops.banded import (BANDED_TILE, DEFAULT_HALO_CAP,
                                      HALO_ALIGN)
            cap = min(DEFAULT_HALO_CAP, BANDED_TILE)
            spans_max, spills = [], []
            for g in self.graphs:
                span = np.abs(g.edge_index[0].astype(np.int64)
                              - g.edge_index[1]).astype(np.int64)
                spans_max.append(int(span.max()) if len(span) else 0)
                spills.append((span, np.asarray(g.edge_attr) > 0))
            need = min(max(spans_max, default=0), cap)
            self.banded_halo = -(-need // HALO_ALIGN) * HALO_ALIGN
            # edges with span <= halo can never spill (reach <= span);
            # bound each graph's spill by its live hop entries beyond
            # the halo, then take the worst batch_size graphs together
            per_g = sorted((int(live[span > self.banded_halo].sum())
                            for span, live in spills), reverse=True)
            self.banded_spill_pad = sum(per_g[:batch_size]) or None
        if mode == "dense":
            max_n = max(g.num_nodes for g in self.graphs)
            self.n_slot = n_slot if n_slot is not None else _round_up(max_n, 8)
            if max_n > self.n_slot:
                raise ValueError(f"n_slot {self.n_slot} < largest graph {max_n}")
            self.v1, self.vk = v1, vk
            self.g_pad = batch_size
        else:
            if n_pad is None or e_pad is None:
                # worst case: batch_size largest graphs end up together
                ns = sorted((g.num_nodes for g in self.graphs), reverse=True)
                es = sorted((g.num_edges for g in self.graphs), reverse=True)
                worst_n = sum(ns[:batch_size])
                worst_e = sum(es[:batch_size])
                dn, de = spec.pad_sizes(worst_n, worst_e)
                n_pad = n_pad if n_pad is not None else dn
                e_pad = e_pad if e_pad is not None else de
            self.n_pad, self.e_pad = n_pad, e_pad
            self.g_pad = batch_size + 1

    def example(self) -> GraphBatch:
        """One representative batch (for model init / shape probing),
        collated inline — no producer thread, no epoch state touched."""
        return self._collate(self.graphs[: self.batch_size])

    def __len__(self) -> int:
        n = len(self.graphs)
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def _collate(self, batch_graphs):
        if self.mode == "dense":
            return collate_dense(
                batch_graphs, n_slot=self.n_slot, v1=self.v1, vk=self.vk,
                g_pad=self.g_pad, y_is_node_level=self.y_is_node_level)
        if self.mode == "pallas":
            tr, wb, eg = self.pallas_geometry
            return collate_pallas(
                batch_graphs, v1=self.v1, vk=self.vk, n_pad=self.n_pad,
                e_pad=self.e_pad, g_pad=self.g_pad,
                y_is_node_level=self.y_is_node_level,
                tile_r=tr, wblock=wb, egroup=eg)
        if self.mode == "banded":
            return collate_banded(
                batch_graphs, v1=self.v1, vk=self.vk, n_pad=self.n_pad,
                e_pad=self.e_pad, g_pad=self.g_pad,
                y_is_node_level=self.y_is_node_level,
                halo=self.banded_halo, spill_pad=self.banded_spill_pad,
                gcn_norm=self.banded_gcn_norm)
        return collate(
            batch_graphs, n_pad=self.n_pad, e_pad=self.e_pad,
            g_pad=self.g_pad, y_is_node_level=self.y_is_node_level)

    def __iter__(self) -> Iterator[GraphBatch]:
        if not self.shuffle:
            # deterministic order: collate once, replay device-resident
            # batches every epoch (eval loaders dominate epoch wall-clock
            # on small datasets otherwise)
            if not hasattr(self, "_cache"):
                bs = self.batch_size
                self._cache = [
                    self._collate(self.graphs[i * bs:(i + 1) * bs])
                    for i in range(len(self))
                ]
            yield from self._cache
            return
        order = np.arange(len(self.graphs))
        self.rng.shuffle(order)
        bs = self.batch_size
        n_batches = len(self)

        def batches():
            for i in range(n_batches):
                idx = order[i * bs:(i + 1) * bs]
                yield self._collate([self.graphs[j] for j in idx])

        yield from background_iter(batches, maxsize=2)
