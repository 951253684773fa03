"""Statically-shaped padded graph batches for XLA.

Everything under `jit` needs static shapes, so a batch of ragged graphs is
packed into one padded `GraphBatch` pytree:

  * node arrays padded to `n_pad`, edge arrays to `e_pad`, graph arrays to
    `g_pad`; boolean masks mark real entries,
  * edges are sorted by receiver so the aggregation segment-sum is a
    monotone scatter (fast, deterministic on TPU),
  * padded edges carry all-zero `edge_attr` (the hop mask), so their
    messages vanish without extra masking in the hot loop,
  * padded nodes belong to the (masked) last graph slot so pooled padding
    never contaminates a real graph's readout,
  * pad sizes come from `BucketSpec` rounding, bounding the number of
    distinct compiled shapes.

Design note: the reference reaches the same per-hop masking semantics with
dynamic shapes inside PyG's MessagePassing (reference: layers/KPGIN.py:115-118);
here masking *is* the padding story, one mechanism for both.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from .data import Graph


@struct.dataclass
class GraphBatch:
    """Padded batch of graphs as a jit-friendly pytree.

    Shapes (all static): N = n_pad nodes, E = e_pad edges, G = g_pad graphs,
    K hops.
    """

    # --- node-level ---
    x: jnp.ndarray                       # (N, F) float or (N, C) int
    node_mask: jnp.ndarray               # (N,) bool
    node_graph_ids: jnp.ndarray          # (N,) int32 in [0, G)
    pe_attr: Optional[jnp.ndarray]       # (N, K-1) int32 | None
    peripheral_edge_attr: Optional[jnp.ndarray]    # (N, K, T, 2) | None
    peripheral_config_attr: Optional[jnp.ndarray]  # (N, K, H+1) | None
    rd: Optional[jnp.ndarray]            # (N, 1) float | None
    z: Optional[jnp.ndarray]             # (N,) or (N, Z) int | None
    pos: Optional[jnp.ndarray]           # (N, 3) float | None

    # --- edge-level (sorted by receiver) ---
    senders: jnp.ndarray                 # (E,) int32
    receivers: jnp.ndarray               # (E,) int32
    edge_attr: jnp.ndarray               # (E, K) int32, 0 = masked
    edge_mask: jnp.ndarray               # (E,) bool

    # --- graph-level ---
    y: Optional[jnp.ndarray]             # (G, ...) or (N, ...) target
    graph_mask: jnp.ndarray              # (G,) bool

    @property
    def n_pad(self) -> int:
        return self.x.shape[0]

    @property
    def e_pad(self) -> int:
        return self.senders.shape[0]

    @property
    def g_pad(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def K(self) -> int:
        return self.edge_attr.shape[1]

    @property
    def num_nodes(self) -> jnp.ndarray:
        return jnp.sum(self.node_mask)

    @property
    def num_graphs(self) -> jnp.ndarray:
        return jnp.sum(self.graph_mask)


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


def collate(
    graphs: Sequence[Graph],
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    g_pad: Optional[int] = None,
    spec: Optional[BucketSpec] = None,
    y_is_node_level: bool = False,
) -> GraphBatch:
    """Pack graphs into one padded `GraphBatch` (host-side numpy, then jnp).

    Node indices are offset per graph; edges are concatenated then sorted by
    receiver (stable, so same-receiver edges keep graph order).  Padded
    nodes are assigned to the final (masked) graph slot.
    """
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

    def cat(field, pad_value=0, dtype=None, extra_shape=()):
        arrs = [getattr(g, field) for g in graphs]
        if any(a is None for a in arrs):
            return None
        a0 = np.asarray(arrs[0])
        dtype = dtype or a0.dtype
        out = np.full((n_pad,) + a0.shape[1:], pad_value, dtype=dtype)
        off = 0
        for g, a in zip(graphs, arrs):
            a = np.asarray(a)
            out[off:off + g.num_nodes] = a
            off += g.num_nodes
        return out

    x = cat("x")
    pe = cat("pe_attr")
    per_e = cat("peripheral_edge_attr")
    per_c = cat("peripheral_config_attr")
    rd = cat("rd")
    z = cat("z")
    pos = cat("pos")

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
        ea = np.asarray(g.edge_attr)
        edge_attr[off_e:off_e + e] = ea.reshape(e, K)
        edge_mask[off_e:off_e + e] = True
        off_n += g.num_nodes
        off_e += e

    # Sort edges by receiver (stable) — padded edges point at n_pad-1 and
    # stay at the tail, so the segment ids are monotone over the whole axis.
    order = np.argsort(receivers[:off_e], kind="stable")
    senders[:off_e] = senders[:off_e][order]
    receivers[:off_e] = receivers[:off_e][order]
    edge_attr[:off_e] = edge_attr[:off_e][order]

    graph_mask = np.zeros((g_pad,), dtype=bool)
    graph_mask[:B] = True

    y = None
    ys = [g.y for g in graphs]
    if all(v is not None for v in ys):
        y0 = np.asarray(ys[0])
        if y_is_node_level:
            y = np.zeros((n_pad,) + y0.shape[1:], dtype=y0.dtype)
            off = 0
            for g in graphs:
                y[off:off + g.num_nodes] = np.asarray(g.y)
                off += g.num_nodes
        else:
            y0 = y0.reshape(-1)
            y = np.zeros((g_pad, y0.shape[0]) if y0.shape[0] > 1 else (g_pad,),
                         dtype=y0.dtype)
            for i, g in enumerate(graphs):
                y[i] = np.asarray(g.y).reshape(-1) if y.ndim > 1 else np.asarray(g.y).reshape(())
    return GraphBatch(
        x=jnp.asarray(x) if x is not None else None,
        node_mask=jnp.asarray(node_mask),
        node_graph_ids=jnp.asarray(node_graph_ids),
        pe_attr=jnp.asarray(pe) if pe is not None else None,
        peripheral_edge_attr=jnp.asarray(per_e) if per_e is not None else None,
        peripheral_config_attr=jnp.asarray(per_c) if per_c is not None else None,
        rd=jnp.asarray(rd) if rd is not None else None,
        z=jnp.asarray(z) if z is not None else None,
        pos=jnp.asarray(pos) if pos is not None else None,
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        edge_attr=jnp.asarray(edge_attr),
        edge_mask=jnp.asarray(edge_mask),
        y=jnp.asarray(y) if y is not None else None,
        graph_mask=jnp.asarray(graph_mask),
    )
