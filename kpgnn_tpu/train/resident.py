"""Device-resident dense dataset + one-dispatch scan epochs.

On a tunnel-attached TPU the per-batch host->device transfer (~25 ms/MB)
and per-step dispatch dominate epoch wall-clock for molecule-scale
datasets: the recorded ZINC-shape epoch is ~12 s end-to-end of which
device compute is ~1.3 s.  The fix is TPU-native: ship the WHOLE
preprocessed dataset to HBM once as per-graph dense tensors (the dense
backend already gives every graph a fixed n_slot x n_slot tile), then
run each epoch as ONE jitted `lax.scan` whose body gathers a shuffled
index chunk out of the store and applies the identical train step the
per-batch path uses (train/loop.py `train_step_body`).  Per epoch the
host sends one (steps, B) int32 index array and receives two scalars.

The reference counterpart is the DataLoader epoch loop of every
train script (reference: train_ZINC.py:255-271); semantics (shuffled
batching, masked padding of the trailing partial batch, loss/metric
sums) are unchanged — only the data motion is.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..graph.batch import GraphBatch, _device_dense_adj
from ..graph.data import Graph
from .loop import eval_step_body, train_step_body


@struct.dataclass
class DenseStore:
    """Per-graph dense tensors, leading dim Gs = num_graphs + 1.

    The last slot is an all-empty pad graph (node_mask false,
    graph_valid false, zero adjacency): index chunks that pad the
    trailing partial batch point at it, reproducing collate_dense's
    masked-slot padding exactly."""

    hop16: jnp.ndarray                    # (Gs, K, n, n) int16 attr codes
    x: jnp.ndarray                        # (Gs, n, ...)
    node_mask: jnp.ndarray                # (Gs, n) bool
    graph_valid: jnp.ndarray              # (Gs,) bool
    pe_attr: Optional[jnp.ndarray]
    peripheral_edge_attr: Optional[jnp.ndarray]
    peripheral_config_attr: Optional[jnp.ndarray]
    rd: Optional[jnp.ndarray]
    z: Optional[jnp.ndarray]
    pos: Optional[jnp.ndarray]
    y: Optional[jnp.ndarray]              # (Gs, ...) or (Gs, n, ...)
    v1: int = struct.field(pytree_node=False)
    vk: int = struct.field(pytree_node=False)
    y_is_node_level: bool = struct.field(pytree_node=False)

    @property
    def num_graphs(self) -> int:          # real graphs (excl. pad slot)
        return self.hop16.shape[0] - 1

    @property
    def n_slot(self) -> int:
        return self.hop16.shape[-1]


def store_nbytes(graphs: Sequence[Graph], n_slot: int) -> int:
    """Cheap upper-bound estimate of the store's HBM footprint."""
    g = graphs[0]
    Gs = len(graphs) + 1
    per = 2 * g.K * n_slot * n_slot                      # hop16
    for f in ("x", "pe_attr", "peripheral_edge_attr",
              "peripheral_config_attr", "rd", "z", "pos"):
        a = getattr(g, f, None)
        if a is not None:
            a = np.asarray(a)
            per += 4 * n_slot * int(np.prod(a.shape[1:], dtype=np.int64))
    return Gs * per


def build_dense_store(
    graphs: Sequence[Graph],
    n_slot: int,
    v1: int,
    vk: int,
    y_is_node_level: bool = False,
) -> DenseStore:
    """Pack the dataset into one device-resident pytree (one transfer)."""
    G = len(graphs)
    Gs = G + 1
    K = graphs[0].K
    hop16 = np.zeros((Gs, K, n_slot, n_slot), dtype=np.int16)
    for i, g in enumerate(graphs):
        if g.num_nodes > n_slot:
            raise ValueError(f"graph with {g.num_nodes} nodes > "
                             f"n_slot={n_slot}")
        if g.num_edges:
            u, v = g.edge_index[0], g.edge_index[1]
            ea = np.asarray(g.edge_attr).reshape(g.num_edges, K)
            for k in range(K):
                hop16[i, k, v, u] = ea[:, k]

    node_mask, graph_valid, stack_nodes = _stack_node_fields(graphs, n_slot)
    y = _stack_y(graphs, n_slot, y_is_node_level)
    j = lambda a: jnp.asarray(a) if a is not None else None
    return DenseStore(
        hop16=j(hop16), x=j(stack_nodes("x")), node_mask=j(node_mask),
        graph_valid=j(graph_valid), pe_attr=j(stack_nodes("pe_attr")),
        peripheral_edge_attr=j(stack_nodes("peripheral_edge_attr")),
        peripheral_config_attr=j(stack_nodes("peripheral_config_attr")),
        rd=j(stack_nodes("rd")), z=j(stack_nodes("z")),
        pos=j(stack_nodes("pos")), y=j(y),
        v1=v1, vk=vk, y_is_node_level=y_is_node_level,
    )


@struct.dataclass
class COOStore:
    """Per-graph padded COO tensors, leading dim Gs = num_graphs + 1.

    The COO analogue of DenseStore for graphs too large for dense
    n_slot x n_slot tiles (e.g. TU DD): each graph keeps its union edge
    list padded to e_slot with local node ids in [0, n_slot); batch
    assembly offsets graph b's ids by b*n_slot.  Padded edges carry
    all-zero edge_attr, so their messages vanish exactly like
    collate()'s padding (graph/batch.py).  Last slot = empty pad graph."""

    senders: jnp.ndarray                  # (Gs, E) int32 local ids
    receivers: jnp.ndarray                # (Gs, E) int32 local ids
    edge_attr16: jnp.ndarray              # (Gs, E, K) int16 attr codes
    edge_mask: jnp.ndarray                # (Gs, E) bool
    x: jnp.ndarray                        # (Gs, n, ...)
    node_mask: jnp.ndarray                # (Gs, n) bool
    graph_valid: jnp.ndarray              # (Gs,) bool
    pe_attr: Optional[jnp.ndarray]
    peripheral_edge_attr: Optional[jnp.ndarray]
    peripheral_config_attr: Optional[jnp.ndarray]
    rd: Optional[jnp.ndarray]
    z: Optional[jnp.ndarray]
    pos: Optional[jnp.ndarray]
    y: Optional[jnp.ndarray]
    y_is_node_level: bool = struct.field(pytree_node=False)

    @property
    def num_graphs(self) -> int:
        return self.senders.shape[0] - 1

    @property
    def n_slot(self) -> int:
        return self.node_mask.shape[-1]

    @property
    def e_slot(self) -> int:
        return self.senders.shape[1]


def _stack_node_fields(graphs: Sequence[Graph], n_slot: int):
    """(Gs, n_slot, ...) arrays for every present node-level field, plus
    node_mask/graph_valid/y — shared by both store builders."""
    G = len(graphs)
    Gs = G + 1
    node_mask = np.zeros((Gs, n_slot), dtype=bool)
    for i, g in enumerate(graphs):
        if g.num_nodes > n_slot:
            raise ValueError(f"graph with {g.num_nodes} nodes > "
                             f"n_slot={n_slot}")
        node_mask[i, : g.num_nodes] = True

    def stack_nodes(field):
        arrs = [getattr(g, field) for g in graphs]
        if any(a is None for a in arrs):
            return None
        a0 = np.asarray(arrs[0])
        out = np.zeros((Gs, n_slot) + a0.shape[1:], dtype=a0.dtype)
        for i, (g, a) in enumerate(zip(graphs, arrs)):
            out[i, : g.num_nodes] = np.asarray(a)
        return out

    graph_valid = np.zeros((Gs,), dtype=bool)
    graph_valid[:G] = True
    return node_mask, graph_valid, stack_nodes


def _stack_y(graphs: Sequence[Graph], n_slot: int,
             y_is_node_level: bool):
    G = len(graphs)
    Gs = G + 1
    ys = [g.y for g in graphs]
    if any(v is None for v in ys):
        return None
    y0 = np.asarray(ys[0])
    if y_is_node_level:
        y = np.zeros((Gs, n_slot) + y0.shape[1:], dtype=y0.dtype)
        for i, g in enumerate(graphs):
            y[i, : g.num_nodes] = np.asarray(g.y)
        return y
    y0 = y0.reshape(-1)
    y = np.zeros((Gs, y0.shape[0]) if y0.shape[0] > 1 else (Gs,),
                 dtype=y0.dtype)
    for i, g in enumerate(graphs):
        y[i] = (np.asarray(g.y).reshape(-1) if y.ndim > 1
                else np.asarray(g.y).reshape(()))
    return y


def coo_store_nbytes(graphs: Sequence[Graph], n_slot: int,
                     e_slot: int) -> int:
    """Cheap upper-bound estimate of a COOStore's HBM footprint."""
    g = graphs[0]
    Gs = len(graphs) + 1
    per = e_slot * (4 + 4 + 1 + 2 * g.K)         # senders/recv/mask/attr16
    for f in ("x", "pe_attr", "peripheral_edge_attr",
              "peripheral_config_attr", "rd", "z", "pos"):
        a = getattr(g, f, None)
        if a is not None:
            a = np.asarray(a)
            per += 4 * n_slot * int(np.prod(a.shape[1:], dtype=np.int64))
    return Gs * per


def build_coo_store(
    graphs: Sequence[Graph],
    n_slot: Optional[int] = None,
    e_slot: Optional[int] = None,
    y_is_node_level: bool = False,
) -> COOStore:
    """Pack the dataset into a device-resident per-graph COO pytree.

    Per-graph edges are sorted by local receiver, so after the
    b*n_slot offset the assembled batch is receiver-sorted within each
    graph block and blocks ascend — the same monotonic layout
    collate() produces."""
    G = len(graphs)
    Gs = G + 1
    K = graphs[0].K
    if n_slot is None:
        n_slot = max(g.num_nodes for g in graphs)
    if e_slot is None:
        e_slot = max(g.num_edges for g in graphs)
    senders = np.zeros((Gs, e_slot), dtype=np.int32)
    receivers = np.zeros((Gs, e_slot), dtype=np.int32)
    edge_attr = np.zeros((Gs, e_slot, K), dtype=np.int16)
    edge_mask = np.zeros((Gs, e_slot), dtype=bool)
    for i, g in enumerate(graphs):
        e = g.num_edges
        if e > e_slot:
            raise ValueError(f"graph with {e} edges > e_slot={e_slot}")
        if e:
            u = np.asarray(g.edge_index[0], np.int32)
            v = np.asarray(g.edge_index[1], np.int32)
            ea = np.asarray(g.edge_attr).reshape(e, K)
            order = np.argsort(v, kind="stable")
            senders[i, :e] = u[order]
            receivers[i, :e] = v[order]
            edge_attr[i, :e] = ea[order].astype(np.int16)
            edge_mask[i, :e] = True

    node_mask, graph_valid, stack_nodes = _stack_node_fields(graphs, n_slot)
    j = lambda a: jnp.asarray(a) if a is not None else None
    return COOStore(
        senders=j(senders), receivers=j(receivers),
        edge_attr16=j(edge_attr), edge_mask=j(edge_mask),
        x=j(stack_nodes("x")), node_mask=j(node_mask),
        graph_valid=j(graph_valid), pe_attr=j(stack_nodes("pe_attr")),
        peripheral_edge_attr=j(stack_nodes("peripheral_edge_attr")),
        peripheral_config_attr=j(stack_nodes("peripheral_config_attr")),
        rd=j(stack_nodes("rd")), z=j(stack_nodes("z")),
        pos=j(stack_nodes("pos")),
        y=j(_stack_y(graphs, n_slot, y_is_node_level)),
        y_is_node_level=y_is_node_level,
    )


def gather_coo_batch(store: COOStore, idx: jnp.ndarray) -> GraphBatch:
    """On-device COO batch assembly for the graphs at `idx`: node slots
    b*n_slot..(b+1)*n_slot-1 like dense mode, edge ids offset per slot.
    Padded edges keep all-zero attrs so their messages vanish; their
    endpoints land inside the owning slot, which masked norms/pools
    already ignore."""
    from ..ops.adjacency import COOAdj

    B = idx.shape[0]
    n = store.n_slot
    offs = (jnp.arange(B, dtype=jnp.int32) * n)[:, None]
    take = lambda a: None if a is None else a[idx]
    flat = lambda a: (None if a is None
                      else a.reshape((B * n,) + a.shape[2:]))
    adj = COOAdj(
        senders=(store.senders[idx] + offs).reshape(-1),
        receivers=(store.receivers[idx] + offs).reshape(-1),
        edge_attr=store.edge_attr16[idx].astype(jnp.int32).reshape(
            B * store.e_slot, -1),
        edge_mask=store.edge_mask[idx].reshape(-1),
        n_nodes=B * n,
    )
    y = store.y
    if y is not None:
        y = y[idx]
        if store.y_is_node_level:
            y = y.reshape((B * n,) + y.shape[2:])
    return GraphBatch(
        x=flat(take(store.x)),
        node_mask=flat(take(store.node_mask)),
        node_graph_ids=jnp.repeat(jnp.arange(B, dtype=jnp.int32), n),
        pe_attr=flat(take(store.pe_attr)),
        peripheral_edge_attr=flat(take(store.peripheral_edge_attr)),
        peripheral_config_attr=flat(take(store.peripheral_config_attr)),
        rd=flat(take(store.rd)),
        z=flat(take(store.z)),
        pos=flat(take(store.pos)),
        adj=adj,
        y=y,
        graph_mask=store.graph_valid[idx],
    )


@struct.dataclass
class BandedStore:
    """Per-graph banded plans, leading dim Gs = num_graphs + 1 — the
    large-graph regime's resident store (the banded backend wins that
    regime but per-batch dispatch pays the ~0.25 ms tunnel floor per
    step; VERDICT r4 item 4).

    Every graph's plan shares (tile, halo, spill_pad, n_slot) so a batch
    assembles on device by pure stacking: window masks concatenate along
    the tile axis, per-node fields along the node axis, and the
    spill lists remap from per-graph hop-major rows (k·n + r) to batch
    hop-major rows (k·B·n + b·n + r).  Dropped/pad spill entries carry
    the per-graph sentinel row K·n, which remaps to >= K·B·n and keeps
    dropping.  Last slot = empty pad graph."""

    live: jnp.ndarray                     # (Gs, K, T, tile, win)
    counts1: jnp.ndarray                  # (Gs, n, V1) f32
    countsk: Optional[jnp.ndarray]        # (Gs, n, K-1, Vk) | None
    union_deg: jnp.ndarray                # (Gs, n)
    hop_deg: jnp.ndarray                  # (Gs, n, K)
    spill_rows: Optional[jnp.ndarray]     # (Gs, S) int32, k*n + r
    spill_senders: Optional[jnp.ndarray]  # (Gs, S) int32, k*n + s
    spill_weights: Optional[jnp.ndarray]  # (Gs, S) f32 | None
    x: jnp.ndarray                        # (Gs, n, ...)
    node_mask: jnp.ndarray                # (Gs, n) bool
    graph_valid: jnp.ndarray              # (Gs,) bool
    pe_attr: Optional[jnp.ndarray]
    peripheral_edge_attr: Optional[jnp.ndarray]
    peripheral_config_attr: Optional[jnp.ndarray]
    rd: Optional[jnp.ndarray]
    z: Optional[jnp.ndarray]
    pos: Optional[jnp.ndarray]
    y: Optional[jnp.ndarray]
    tile: int = struct.field(pytree_node=False)
    halo: int = struct.field(pytree_node=False)
    sender_scaled: bool = struct.field(pytree_node=False)
    y_is_node_level: bool = struct.field(pytree_node=False)

    @property
    def num_graphs(self) -> int:
        return self.live.shape[0] - 1

    @property
    def n_slot(self) -> int:
        return self.node_mask.shape[-1]

    @property
    def n_hops(self) -> int:
        return self.live.shape[1]


def banded_store_nbytes(graphs: Sequence[Graph], n_slot: int, tile: int,
                        halo: int, spill_pad: int, v1: int,
                        vk: int) -> int:
    """Cheap upper-bound estimate of a BandedStore's HBM footprint."""
    g = graphs[0]
    Gs = len(graphs) + 1
    K = g.K
    T = n_slot // tile
    win = tile + 2 * halo
    per = K * T * tile * win                      # live int8
    per += 4 * n_slot * (v1 + (K - 1) * vk + 1 + K)   # counts + degs
    per += spill_pad * 8
    for f in ("x", "pe_attr", "peripheral_edge_attr",
              "peripheral_config_attr", "rd", "z", "pos"):
        a = getattr(g, f, None)
        if a is not None:
            a = np.asarray(a)
            per += 4 * n_slot * int(np.prod(a.shape[1:], dtype=np.int64))
    return Gs * per


def plan_banded_store_shapes(graphs: Sequence[Graph]):
    """Shared (tile, halo, n_slot, spill_pad) over a graph set, using
    the same auto rules as collate_banded / GraphLoader: halo sized to
    the worst edge span (capped), tile 128 when the halo fits, per-graph
    slots rounded up to the tile."""
    from ..ops.banded import BANDED_TILE, DEFAULT_HALO_CAP, HALO_ALIGN

    cap = min(DEFAULT_HALO_CAP, BANDED_TILE)
    span_max = 0
    for g in graphs:
        if g.num_edges:
            span_max = max(span_max, int(np.abs(
                g.edge_index[0].astype(np.int64)
                - g.edge_index[1]).max()))
    halo = min(-(-span_max // HALO_ALIGN) * HALO_ALIGN, cap)
    tile = 128 if halo <= 128 else BANDED_TILE
    n_slot = -(-max(g.num_nodes for g in graphs) // tile) * tile
    # exact per-graph spill counts at this (tile, halo): reach beyond
    # the receiver's own tile, same formula as build_banded
    spill = 0
    for g in graphs:
        if not g.num_edges:
            continue
        r = np.asarray(g.edge_index[1], np.int64)
        s = np.asarray(g.edge_index[0], np.int64)
        t_of = r // tile
        reach = np.maximum.reduce([t_of * tile - s,
                                   s - ((t_of + 1) * tile - 1),
                                   np.zeros_like(s)])
        live = np.asarray(g.edge_attr).reshape(g.num_edges, g.K) > 0
        spill = max(spill, int(live[reach > halo].sum()))
    return tile, halo, n_slot, spill


def build_banded_store(
    graphs: Sequence[Graph],
    v1: int,
    vk: int,
    y_is_node_level: bool = False,
    gcn_norm: bool = False,
    shapes: Optional[tuple] = None,       # (tile, halo, n_slot, spill_pad)
) -> BandedStore:
    """Pack per-graph banded plans into one device-resident pytree.

    ``shapes`` pins (tile, halo, n_slot, spill_pad) so train/val/test
    stores share compiled scan shapes (the Trainer plans them over all
    splits together)."""
    from ..ops.banded import build_banded

    G = len(graphs)
    Gs = G + 1
    K = graphs[0].K
    tile, halo, n_slot, spill_pad = (shapes if shapes is not None
                                     else plan_banded_store_shapes(graphs))
    T = n_slot // tile
    win = tile + 2 * halo
    live_dt = np.float32 if gcn_norm else np.int8
    live = np.zeros((Gs, K, T, tile, win), live_dt)
    counts1 = np.zeros((Gs, n_slot, v1), np.float32)
    countsk = (np.zeros((Gs, n_slot, K - 1, vk), np.float32)
               if K > 1 else None)
    union_deg = np.zeros((Gs, n_slot), np.float32)
    hop_deg = np.zeros((Gs, n_slot, K), np.float32)
    sp = spill_pad > 0
    # pad-slot spill entries keep the sentinel row K*n (always dropped)
    spill_rows = (np.full((Gs, spill_pad), K * n_slot, np.int32)
                  if sp else None)
    spill_senders = np.zeros((Gs, spill_pad), np.int32) if sp else None
    spill_weights = (np.zeros((Gs, spill_pad), np.float32)
                     if sp and gcn_norm else None)
    for i, g in enumerate(graphs):
        if not g.num_edges:
            continue
        r = np.asarray(g.edge_index[1], np.int64)
        s = np.asarray(g.edge_index[0], np.int64)
        attr = np.asarray(g.edge_attr).reshape(g.num_edges, K)
        sw = None
        if gcn_norm:
            deg = np.ones((n_slot, K), np.float32)
            for k in range(K):
                np.add.at(deg[:, k], r[attr[:, k] > 0], 1.0)
            sw = 1.0 / np.sqrt(deg)
        plan = build_banded(r, s, attr, n_slot, v1, vk, tile=tile,
                            halo=halo, spill_pad=spill_pad or None,
                            sender_weights=sw, as_numpy=True)
        live[i] = plan.live
        counts1[i] = plan.counts1
        if countsk is not None:
            countsk[i] = plan.countsk
        union_deg[i] = plan.union_deg
        hop_deg[i] = plan.hop_deg
        if sp and plan.spill_rows is not None:
            spill_rows[i] = plan.spill_rows
            spill_senders[i] = plan.spill_senders
            if spill_weights is not None:
                spill_weights[i] = plan.spill_weights

    node_mask, graph_valid, stack_nodes = _stack_node_fields(graphs, n_slot)
    j = lambda a: jnp.asarray(a) if a is not None else None
    return BandedStore(
        live=j(live), counts1=j(counts1), countsk=j(countsk),
        union_deg=j(union_deg), hop_deg=j(hop_deg),
        spill_rows=j(spill_rows), spill_senders=j(spill_senders),
        spill_weights=j(spill_weights),
        x=j(stack_nodes("x")), node_mask=j(node_mask),
        graph_valid=j(graph_valid), pe_attr=j(stack_nodes("pe_attr")),
        peripheral_edge_attr=j(stack_nodes("peripheral_edge_attr")),
        peripheral_config_attr=j(stack_nodes("peripheral_config_attr")),
        rd=j(stack_nodes("rd")), z=j(stack_nodes("z")),
        pos=j(stack_nodes("pos")),
        y=j(_stack_y(graphs, n_slot, y_is_node_level)),
        tile=tile, halo=halo, sender_scaled=gcn_norm,
        y_is_node_level=y_is_node_level,
    )


def gather_banded_batch(store: BandedStore, idx: jnp.ndarray) -> GraphBatch:
    """On-device banded batch assembly: graph b owns node slots
    [b*n_slot, (b+1)*n_slot) (dense-mode convention; collate_banded
    packs nodes contiguously instead, but all downstream ops are
    mask-aware so the layouts are interchangeable).  Window masks stack
    along the tile axis; spill rows remap k·n + r -> k·(B·n) + b·n + r,
    which interleaves graphs in the hop-major row space — the assembled
    list is no longer row-sorted, so the plan clears spill_sorted."""
    from ..ops.banded import BandedAdj

    B = idx.shape[0]
    n = store.n_slot
    K = store.n_hops
    T = store.live.shape[2]
    tile, win = store.live.shape[3], store.live.shape[4]
    take = lambda a: None if a is None else a[idx]
    flat = lambda a: (None if a is None
                      else a.reshape((B * n,) + a.shape[2:]))
    live = jnp.swapaxes(store.live[idx], 0, 1).reshape(K, B * T, tile, win)
    sp_r = sp_s = sp_w = None
    if store.spill_rows is not None:
        rows_g = store.spill_rows[idx]              # (B, S)
        cols_g = store.spill_senders[idx]
        offs = (jnp.arange(B, dtype=jnp.int32) * n)[:, None]
        remap = lambda a: ((a // n) * (B * n) + offs + a % n).reshape(-1)
        sp_r, sp_s = remap(rows_g), remap(cols_g)
        if store.spill_weights is not None:
            sp_w = store.spill_weights[idx].reshape(-1)
    adj = BandedAdj(
        live=live,
        counts1=store.counts1[idx].reshape(B * n, -1),
        countsk=(store.countsk[idx].reshape(B * n, K - 1, -1)
                 if store.countsk is not None else None),
        union_deg=store.union_deg[idx].reshape(-1),
        hop_deg=store.hop_deg[idx].reshape(B * n, K),
        spill_senders=sp_s, spill_rows=sp_r, spill_weights=sp_w,
        spill_hop_ends=(), sender_scaled=store.sender_scaled,
        spill_sorted=False, tile=tile, halo=store.halo, n_hops=K,
        n_cols_static=0,
    )
    y = store.y
    if y is not None:
        y = y[idx]
        if store.y_is_node_level:
            y = y.reshape((B * n,) + y.shape[2:])
    return GraphBatch(
        x=flat(take(store.x)),
        node_mask=flat(take(store.node_mask)),
        node_graph_ids=jnp.repeat(jnp.arange(B, dtype=jnp.int32), n),
        pe_attr=flat(take(store.pe_attr)),
        peripheral_edge_attr=flat(take(store.peripheral_edge_attr)),
        peripheral_config_attr=flat(take(store.peripheral_config_attr)),
        rd=flat(take(store.rd)),
        z=flat(take(store.z)),
        pos=flat(take(store.pos)),
        adj=adj,
        y=y,
        graph_mask=store.graph_valid[idx],
    )


def gather_any(store, idx: jnp.ndarray) -> GraphBatch:
    """Dispatch by store type (static at trace time)."""
    if isinstance(store, COOStore):
        return gather_coo_batch(store, idx)
    if isinstance(store, BandedStore):
        return gather_banded_batch(store, idx)
    return gather_batch(store, idx)


def gather_batch(store: DenseStore, idx: jnp.ndarray) -> GraphBatch:
    """On-device batch assembly: exactly collate_dense's layout for the
    graphs at `idx` (pad-slot indices become masked graph slots)."""
    B = idx.shape[0]
    n = store.n_slot
    take = lambda a: None if a is None else a[idx]
    flat = lambda a: (None if a is None
                      else a.reshape((B * n,) + a.shape[2:]))
    adj = _device_dense_adj(store.hop16[idx], store.v1, store.vk)
    y = store.y
    if y is not None:
        y = y[idx]
        if store.y_is_node_level:
            y = y.reshape((B * n,) + y.shape[2:])
    return GraphBatch(
        x=flat(take(store.x)),
        node_mask=flat(take(store.node_mask)),
        node_graph_ids=jnp.repeat(jnp.arange(B, dtype=jnp.int32), n),
        pe_attr=flat(take(store.pe_attr)),
        peripheral_edge_attr=flat(take(store.peripheral_edge_attr)),
        peripheral_config_attr=flat(take(store.peripheral_config_attr)),
        rd=flat(take(store.rd)),
        z=flat(take(store.z)),
        pos=flat(take(store.pos)),
        adj=adj,
        y=y,
        graph_mask=store.graph_valid[idx],
    )


def epoch_index_chunks(order: np.ndarray, batch_size: int,
                       pad_idx: int) -> np.ndarray:
    """(steps, B) int32 chunks; the trailing partial batch is padded with
    the empty-graph slot index."""
    n = len(order)
    steps = max((n + batch_size - 1) // batch_size, 1)
    out = np.full((steps * batch_size,), pad_idx, dtype=np.int32)
    out[:n] = order
    return out.reshape(steps, batch_size)


def make_resident_train_epoch(model, tx, loss: str = "l1",
                              node_level: bool = False,
                              donate: bool = True):
    """jitted (state, store, idx_chunks (S,B), rng) ->
    (state, loss_sum, count): the whole epoch in one dispatch.

    `donate=False` trades one extra state copy in HBM for ~10% lower
    epoch wall on the tunnel-attached chip (donation constrains the
    output layouts to alias the inputs); the default stays True so
    callers that re-feed the returned state never hold two copies."""
    body = train_step_body(model, tx, loss, node_level)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def epoch(state, store, idx_chunks, rng):
        def step(carry, idx):
            st, r = carry
            r, sub = jax.random.split(r)
            st, m = body(st, gather_any(store, idx), sub)
            return (st, r), (m["loss_sum"], m["count"])

        (state, _), (ls, cs) = jax.lax.scan(step, (state, rng), idx_chunks)
        return state, jnp.sum(ls), jnp.sum(cs)

    return epoch


def make_resident_eval(model, loss: str = "l1", node_level: bool = False,
                       metric: str = "same", bn_train_mode: bool = False):
    """jitted (state, store, idx_chunks) -> dict of summed metrics."""
    body = eval_step_body(model, loss, node_level, metric, bn_train_mode)

    @jax.jit
    def run(state, store, idx_chunks):
        def step(_, idx):
            return None, body(state, gather_any(store, idx))

        _, ms = jax.lax.scan(step, None, idx_chunks)
        return {k: jnp.sum(v, axis=0) for k, v in ms.items()}

    return run


def parallel_epoch_index_chunks(order: np.ndarray, batch_size: int,
                                n_dev: int, pad_idx: int) -> np.ndarray:
    """(steps, n_dev, B) int32 chunks; trailing partial super-batch padded
    with the empty-graph slot (the resident analogue of shard_loader's
    masked-empty fill — every graph is seen, none double-counted)."""
    flat = epoch_index_chunks(order, batch_size * n_dev, pad_idx)
    return flat.reshape(flat.shape[0], n_dev, batch_size)


def make_parallel_resident_train_epoch(model, tx, mesh, loss: str = "l1",
                                       node_level: bool = False,
                                       axis: str = "data"):
    """Data-parallel one-dispatch epoch over a device mesh.

    jitted (replicated state, replicated store, idx_chunks (S, n_dev, B)
    sharded on the device axis, rng) -> (state, loss_sum, count).

    The dense store is replicated into every device's HBM (molecule-scale
    stores are tens of MB; parameters are already replicated the same
    way), each scan step gathers a per-device sub-batch by index, and the
    per-step gradient psum rides ICI — the whole epoch is one dispatch
    and the only per-epoch host->device traffic is the (S, n_dev, B)
    int32 index array.  Replaces the per-super-batch host loop of
    dp.shard_loader + make_parallel_train_step with identical numerics
    (shared parallel_train_step_body).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.dp import parallel_train_step_body

    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    body = parallel_train_step_body(model, tx, loss, node_level, axis)

    def per_device(state, store, idx_chunks, rng):
        local = idx_chunks.reshape(idx_chunks.shape[0], -1)   # (S, B) here

        def step(carry, idx):
            st, r = carry
            r, sub = jax.random.split(r)
            st, m = body(st, gather_any(store, idx), sub)
            return (st, r), (m["loss_sum"], m["count"])

        (state, _), (ls, cs) = jax.lax.scan(step, (state, rng), local)
        return state, jnp.sum(ls), jnp.sum(cs)

    dev_spec = axes if len(axes) > 1 else axes[0]
    smapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(None, dev_spec), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return jax.jit(smapped, donate_argnums=(0,))


def make_parallel_resident_eval(model, mesh, loss: str = "l1",
                                node_level: bool = False,
                                metric: str = "same",
                                bn_train_mode: bool = False,
                                axis: str = "data"):
    """jitted (state, store, idx_chunks (S, n_dev, B)) -> summed metrics
    (already psum'd across the mesh, so the host reads replicated sums)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.dp import parallel_eval_step_body

    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    body = parallel_eval_step_body(model, loss, node_level, metric,
                                   bn_train_mode, axis)

    def per_device(state, store, idx_chunks):
        local = idx_chunks.reshape(idx_chunks.shape[0], -1)

        def step(_, idx):
            return None, body(state, gather_any(store, idx))

        _, ms = jax.lax.scan(step, None, local)
        return {k: jnp.sum(v, axis=0) for k, v in ms.items()}

    dev_spec = axes if len(axes) > 1 else axes[0]
    smapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(None, dev_spec)),
        out_specs=P(),
        check_vma=False)
    return jax.jit(smapped)
