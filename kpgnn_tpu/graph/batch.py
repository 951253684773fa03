"""Statically-shaped padded graph batches for XLA.

Everything under `jit` needs static shapes, so a batch of ragged graphs is
packed into one padded `GraphBatch` pytree.  The adjacency lives behind
one of two backends (ops/adjacency.py):

  * COO ("coo")   — edges concatenated, receiver-sorted, padded to e_pad;
    padded edges carry all-zero edge_attr (the hop mask) so their messages
    vanish; general, any graph size.
  * dense ("dense") — each graph gets a fixed n_slot x n_slot hop-attr
    tile; aggregation becomes batched masked matmul on the MXU.  The node
    axis stays flat (N = B * n_slot) so all non-adjacency code is
    layout-agnostic.

Masks mark real entries everywhere; padded nodes belong to the masked
last graph slot (COO) or to their slot's graph with node_mask=0 (dense),
and either way masked stats/pools keep padding out of the math.

Design note: the reference reaches the same per-hop masking semantics
with dynamic shapes inside PyG's MessagePassing
(reference: layers/KPGIN.py:115-118); here masking *is* the padding
story, one mechanism for both.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.adjacency import COOAdj, DenseAdj, Adjacency
from .data import Graph


@struct.dataclass
class GraphBatch:
    """Padded batch of graphs as a jit-friendly pytree."""

    # --- node-level (N = n_pad) ---
    x: jnp.ndarray                       # (N, F) float or (N, C) int
    node_mask: jnp.ndarray               # (N,) bool
    node_graph_ids: jnp.ndarray          # (N,) int32 in [0, G)
    pe_attr: Optional[jnp.ndarray]       # (N, K-1) int32 | None
    peripheral_edge_attr: Optional[jnp.ndarray]    # (N, K, T, 2) | None
    peripheral_config_attr: Optional[jnp.ndarray]  # (N, K, H+1) | None
    rd: Optional[jnp.ndarray]            # (N, 1) float | None
    z: Optional[jnp.ndarray]             # (N,) or (N, Z) int | None
    pos: Optional[jnp.ndarray]           # (N, 3) float | None

    # --- adjacency backend ---
    adj: Adjacency

    # --- graph-level (G = g_pad) ---
    y: Optional[jnp.ndarray]             # (G, ...) or (N, ...) target
    graph_mask: jnp.ndarray              # (G,) bool

    @property
    def n_pad(self) -> int:
        return self.x.shape[0]

    @property
    def g_pad(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def K(self) -> int:
        return self.adj.K

    @property
    def num_nodes(self) -> jnp.ndarray:
        return jnp.sum(self.node_mask)

    @property
    def num_graphs(self) -> jnp.ndarray:
        return jnp.sum(self.graph_mask)

    # COO conveniences (tests / kernels)
    @property
    def senders(self):
        return self.adj.senders

    @property
    def receivers(self):
        return self.adj.receivers

    @property
    def edge_attr(self):
        return self.adj.edge_attr

    @property
    def edge_mask(self):
        return self.adj.edge_mask


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Rounds raw batch sizes up to a small set of shapes.

    `node_multiple`/`edge_multiple` align the padded axes to TPU-friendly
    sizes; power-of-two escalation above the multiple keeps the number of
    compiled programs logarithmic in batch size.
    """

    node_multiple: int = 128
    edge_multiple: int = 512
    power_of_two: bool = True

    def round(self, n: int, multiple: int) -> int:
        n = max(n, 1)
        r = _round_up(n, multiple)
        if self.power_of_two and r > multiple:
            p = multiple
            while p < n:
                p *= 2
            r = p
        return r

    def pad_sizes(self, num_nodes: int, num_edges: int) -> Tuple[int, int]:
        return (
            self.round(num_nodes + 1, self.node_multiple),
            self.round(num_edges, self.edge_multiple),
        )


def pad_sizes(graphs: Sequence[Graph], spec: Optional[BucketSpec] = None) -> Tuple[int, int, int]:
    """(n_pad, e_pad, g_pad) for a list of graphs under a bucket spec."""
    spec = spec or BucketSpec()
    tot_n = sum(g.num_nodes for g in graphs)
    tot_e = sum(g.num_edges for g in graphs)
    n_pad, e_pad = spec.pad_sizes(tot_n, tot_e)
    return n_pad, e_pad, len(graphs) + 1


def _cat_nodes(graphs, field, n_pad, slot=None):
    """Concatenate a node-level field with padding; `slot` (dense mode)
    places graph b at offset b*slot."""
    arrs = [getattr(g, field) for g in graphs]
    if any(a is None for a in arrs):
        return None
    a0 = np.asarray(arrs[0])
    out = np.zeros((n_pad,) + a0.shape[1:], dtype=a0.dtype)
    off = 0
    for b, (g, a) in enumerate(zip(graphs, arrs)):
        o = b * slot if slot is not None else off
        out[o:o + g.num_nodes] = np.asarray(a)
        off += g.num_nodes
    return out


def _collate_y(graphs, g_pad, n_pad, y_is_node_level, slot=None):
    ys = [g.y for g in graphs]
    if any(v is None for v in ys):
        return None
    y0 = np.asarray(ys[0])
    if y_is_node_level:
        y = np.zeros((n_pad,) + y0.shape[1:], dtype=y0.dtype)
        off = 0
        for b, g in enumerate(graphs):
            o = b * slot if slot is not None else off
            y[o:o + g.num_nodes] = np.asarray(g.y)
            off += g.num_nodes
        return y
    y0 = y0.reshape(-1)
    y = np.zeros((g_pad, y0.shape[0]) if y0.shape[0] > 1 else (g_pad,),
                 dtype=y0.dtype)
    for i, g in enumerate(graphs):
        y[i] = (np.asarray(g.y).reshape(-1) if y.ndim > 1
                else np.asarray(g.y).reshape(()))
    return y


def collate(
    graphs: Sequence[Graph],
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    g_pad: Optional[int] = None,
    spec: Optional[BucketSpec] = None,
    y_is_node_level: bool = False,
) -> GraphBatch:
    """COO collation: offset node indices, sort edges by receiver (stable),
    pad everything to (n_pad, e_pad, g_pad)."""
    if n_pad is None or e_pad is None or g_pad is None:
        dn, de, dg = pad_sizes(graphs, spec)
        n_pad = n_pad if n_pad is not None else dn
        e_pad = e_pad if e_pad is not None else de
        g_pad = g_pad if g_pad is not None else dg

    B = len(graphs)
    if B > g_pad:
        raise ValueError(f"batch of {B} graphs > g_pad={g_pad}")
    tot_n = sum(g.num_nodes for g in graphs)
    tot_e = sum(g.num_edges for g in graphs)
    if tot_n > n_pad - 1 or tot_e > e_pad:
        raise ValueError(
            f"batch needs {tot_n}+1 node / {tot_e} edge slots, "
            f"got n_pad={n_pad}, e_pad={e_pad}"
        )

    K = graphs[0].K
    node_mask = np.zeros((n_pad,), dtype=bool)
    node_mask[:tot_n] = True
    node_graph_ids = np.full((n_pad,), g_pad - 1, dtype=np.int32)
    off = 0
    for i, g in enumerate(graphs):
        node_graph_ids[off:off + g.num_nodes] = i
        off += g.num_nodes

    senders = np.zeros((e_pad,), dtype=np.int32)
    receivers = np.full((e_pad,), n_pad - 1, dtype=np.int32)
    edge_attr = np.zeros((e_pad, K), dtype=np.int32)
    edge_mask = np.zeros((e_pad,), dtype=bool)
    off_n, off_e = 0, 0
    for g in graphs:
        e = g.num_edges
        senders[off_e:off_e + e] = g.edge_index[0] + off_n
        receivers[off_e:off_e + e] = g.edge_index[1] + off_n
        edge_attr[off_e:off_e + e] = np.asarray(g.edge_attr).reshape(e, K)
        edge_mask[off_e:off_e + e] = True
        off_n += g.num_nodes
        off_e += e

    order = np.argsort(receivers[:off_e], kind="stable")
    senders[:off_e] = senders[:off_e][order]
    receivers[:off_e] = receivers[:off_e][order]
    edge_attr[:off_e] = edge_attr[:off_e][order]

    graph_mask = np.zeros((g_pad,), dtype=bool)
    graph_mask[:B] = True

    adj = COOAdj(
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        edge_attr=jnp.asarray(edge_attr),
        edge_mask=jnp.asarray(edge_mask),
        n_nodes=n_pad,
    )
    return _finish(graphs, adj, n_pad, g_pad, node_mask, node_graph_ids,
                   graph_mask, y_is_node_level, slot=None)


def collate_dense(
    graphs: Sequence[Graph],
    n_slot: int,
    v1: int,
    vk: int,
    g_pad: Optional[int] = None,
    y_is_node_level: bool = False,
) -> GraphBatch:
    """Dense collation: graph b occupies node slots [b*n_slot, (b+1)*n_slot).

    v1/vk are the hop-1 / hop-k attr vocab sizes (num_hop1_edge+2 and
    max_pe_num+2 in model terms) for the precomputed count histograms.
    """
    B = len(graphs)
    g_pad = g_pad if g_pad is not None else B
    K = graphs[0].K
    for g in graphs:
        if g.num_nodes > n_slot:
            raise ValueError(f"graph with {g.num_nodes} nodes > n_slot={n_slot}")
    n_pad = g_pad * n_slot

    hop_attr = np.zeros((g_pad, K, n_slot, n_slot), dtype=np.int32)
    node_mask = np.zeros((n_pad,), dtype=bool)
    node_graph_ids = np.repeat(np.arange(g_pad, dtype=np.int32), n_slot)
    for b, g in enumerate(graphs):
        node_mask[b * n_slot: b * n_slot + g.num_nodes] = True
        if g.num_edges:
            u, v = g.edge_index[0], g.edge_index[1]
            ea = np.asarray(g.edge_attr).reshape(g.num_edges, K)
            # receiver-major: [k, i, j] = attr of edge j -> i
            for k in range(K):
                hop_attr[b, k, v, u] = ea[:, k]

    graph_mask = np.zeros((g_pad,), dtype=bool)
    graph_mask[:B] = True
    # ship a compact int16 tensor; the attr-code histograms are one-hot
    # sums computed on-device (saves ~60% of the host->device bytes and
    # all host-side histogram time)
    adj = _device_dense_adj(jnp.asarray(hop_attr.astype(np.int16)), v1, vk)
    return _finish(graphs, adj, n_pad, g_pad, node_mask, node_graph_ids,
                   graph_mask, y_is_node_level, slot=n_slot)


@partial(jax.jit, static_argnums=(1, 2))
def _device_dense_adj(hop16: jnp.ndarray, v1: int, vk: int) -> DenseAdj:
    """(B, K, n, n) int16 attr codes -> DenseAdj with on-device count
    histograms (counts1/countsk row 0 zeroed: code 0 is the mask)."""
    hop = hop16.astype(jnp.int32)
    K = hop.shape[1]
    counts1 = jnp.sum(
        jax.nn.one_hot(jnp.clip(hop[:, 0], 0, v1 - 1), v1), axis=-2)
    counts1 = counts1.at[..., 0].set(0.0)
    countsk = None
    if K > 1:
        ck = jnp.sum(
            jax.nn.one_hot(jnp.clip(hop[:, 1:], 0, vk - 1), vk), axis=-2)
        countsk = jnp.swapaxes(ck, 1, 2).at[..., 0].set(0.0)
    return DenseAdj(hop_attr=hop, counts1=counts1, countsk=countsk)


def collate_pallas(
    graphs: Sequence[Graph],
    v1: int,
    vk: int,
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    g_pad: Optional[int] = None,
    spec: Optional[BucketSpec] = None,
    y_is_node_level: bool = False,
    tile_r: Optional[int] = None,
    tile_e: Optional[int] = None,
    wblock: Optional[int] = None,
    egroup: Optional[int] = None,
) -> GraphBatch:
    """COO collation whose adjacency is a fused-hop Pallas kernel plan
    (ops/pallas_spmm.py) — the fast sparse backend for every layer
    family.  tile_r/tile_e/wblock/egroup override the kernel grid
    geometry (multiples of 128 / chunks per matmul; n_pad is raised to a
    tile_r multiple).  When tile_r is not given it auto-picks the
    measured-optimal 256 (tune_pallas on v5e: 256x512x4 geometry) for
    batches that already pad to >= 256 nodes, keeping 128 only for tiny
    fixtures whose n_pad would otherwise double."""
    from ..ops.pallas_spmm import (EGROUP, TILE_E, TILE_R, WBLOCK,
                                   build_plan)

    if tile_r is None:
        est = n_pad if n_pad is not None else pad_sizes(graphs, spec)[0]
        tile_r = 256 if est >= 256 else TILE_R
    tile_e = tile_e or TILE_E
    wblock = wblock or WBLOCK
    egroup = egroup or EGROUP
    if n_pad is not None:
        n_pad = ((n_pad + tile_r - 1) // tile_r) * tile_r
    elif spec is not None:
        # caller-provided spec keeps its own bucketing policy
        spec = dataclasses.replace(spec, node_multiple=tile_r)
    else:
        # tile multiples already quantize the shape; power-of-two
        # escalation would pad 16386 -> 32768 nodes (2x kernel rows).
        # Loaders that want few compiled shapes pass a fixed n_pad.
        spec = BucketSpec(node_multiple=tile_r, power_of_two=False)
    batch = collate(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                    spec=spec, y_is_node_level=y_is_node_level)
    coo = batch.adj
    em = np.asarray(coo.edge_mask)
    plan = build_plan(
        np.asarray(coo.receivers)[em], np.asarray(coo.senders)[em],
        np.asarray(coo.edge_attr)[em], coo.n_nodes, v1, vk,
        tile_r=tile_r, tile_e=tile_e, wblock=wblock, egroup=egroup)
    return batch.replace(adj=plan)


def collate_banded(
    graphs: Sequence[Graph],
    v1: int,
    vk: int,
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    g_pad: Optional[int] = None,
    spec: Optional[BucketSpec] = None,
    y_is_node_level: bool = False,
    tile: Optional[int] = None,
    halo: Optional[int] = None,
    spill_pad: Optional[int] = None,
    gcn_norm: bool = False,
) -> GraphBatch:
    """COO collation whose adjacency is a banded window plan
    (ops/banded.py) — the fastest backend for large locally-ordered
    graphs (bounded bandwidth under the node order).  The halo auto-
    sizes to the batch's actual edge reach; out-of-band edges spill to
    a COO side list, so any graph runs — but bandwidth-ordered graphs
    run at banded-matmul speed.

    Loaders pin ``halo`` and ``spill_pad`` (worst case over the
    dataset) so every batch compiles to one shape; ad-hoc calls may
    leave both None and take the batch-fitted shapes."""
    from ..ops.banded import (BANDED_TILE, DEFAULT_HALO_CAP, HALO_ALIGN,
                              build_banded)

    if tile is None:
        # tile 128 is measured-optimal when the halo fits under it
        # (clean-process v5e sweep: 160.8M vs 143.9M edges/s full step
        # at halo 64 — win = tile + 2h, so the smaller tile does ~33%
        # fewer MACs); wider-band batches need the bigger tile because
        # the halo caps at the tile height.  Estimate the halo from the
        # tile-independent edge span bound (reach <= span).
        if halo is not None:
            h_est = halo
        else:
            span = 0
            for g in graphs:
                if g.num_edges:
                    span = max(span, int(np.abs(
                        g.edge_index[0].astype(np.int64)
                        - g.edge_index[1]).max()))
            h_est = min(-(-span // HALO_ALIGN) * HALO_ALIGN,
                        DEFAULT_HALO_CAP)
        tile = 128 if h_est <= 128 else BANDED_TILE
    if n_pad is not None:
        n_pad = ((n_pad + tile - 1) // tile) * tile
    elif spec is not None:
        spec = dataclasses.replace(spec, node_multiple=tile)
    else:
        spec = BucketSpec(node_multiple=tile, power_of_two=False)
    batch = collate(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                    spec=spec, y_is_node_level=y_is_node_level)
    coo = batch.adj
    em = np.asarray(coo.edge_mask)
    recv = np.asarray(coo.receivers)[em]
    send = np.asarray(coo.senders)[em]
    attr = np.asarray(coo.edge_attr)[em]
    sw = None
    if gcn_norm:
        # KPGCN's structural sender scale deg^-0.5 (self-loop included,
        # matching degree(adj, add_self_loop=True)) folds into the plan
        K = attr.shape[1]
        deg = np.ones((coo.n_nodes, K), np.float32)     # +1 self loop
        for k in range(K):
            np.add.at(deg[:, k], recv[attr[:, k] > 0], 1.0)
        sw = 1.0 / np.sqrt(deg)
    adj = build_banded(recv, send, attr, coo.n_nodes, v1, vk,
                       tile=tile, halo=halo, spill_pad=spill_pad,
                       sender_weights=sw)
    return batch.replace(adj=adj)


def _finish(graphs, adj, n_pad, g_pad, node_mask, node_graph_ids, graph_mask,
            y_is_node_level, slot):
    x = _cat_nodes(graphs, "x", n_pad, slot)
    pe = _cat_nodes(graphs, "pe_attr", n_pad, slot)
    per_e = _cat_nodes(graphs, "peripheral_edge_attr", n_pad, slot)
    per_c = _cat_nodes(graphs, "peripheral_config_attr", n_pad, slot)
    rd = _cat_nodes(graphs, "rd", n_pad, slot)
    z = _cat_nodes(graphs, "z", n_pad, slot)
    pos = _cat_nodes(graphs, "pos", n_pad, slot)
    y = _collate_y(graphs, g_pad, n_pad, y_is_node_level, slot)
    j = jnp.asarray
    return GraphBatch(
        x=j(x) if x is not None else None,
        node_mask=j(node_mask),
        node_graph_ids=j(node_graph_ids),
        pe_attr=j(pe) if pe is not None else None,
        peripheral_edge_attr=j(per_e) if per_e is not None else None,
        peripheral_config_attr=j(per_c) if per_c is not None else None,
        rd=j(rd) if rd is not None else None,
        z=j(z) if z is not None else None,
        pos=j(pos) if pos is not None else None,
        adj=adj,
        y=j(y) if y is not None else None,
        graph_mask=j(graph_mask),
    )
