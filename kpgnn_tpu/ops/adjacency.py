"""Adjacency backends for the k-hop aggregation.

Two physical layouts, one logical op:

* `COOAdj` — receiver-sorted edge list.  General (any graph size); the
  aggregation is gather -> mask -> segment-sum (ops/segment.py).

* `DenseAdj` — per-graph dense hop-attribute tensors (B, K, n, n).  For
  the molecule-scale benchmarks (n <= ~64) this is the TPU-native hot
  path: neighbor aggregation is a batched masked matmul on the MXU and
  the per-edge embedding sum collapses into `counts @ table` (the counts
  are precomputed at collate time), so the training step contains no
  gathers or scatters at all.  A 64-graph ZINC batch is ~25x faster this
  way than through XLA scatter.

Node states stay flat (N = B * n for dense) so every other component
(norms, pooling, heads, backbones) is layout-agnostic.

The math implemented is exactly the reference's masked message pass
(reference: layers/KPGIN.py:100,115-118): for hop k,
out[i,k] = aggr_j  live(attr[k,i,j]) * scale * (x[j,k] + emb_k(attr[k,i,j])).
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class COOAdj:
    senders: jnp.ndarray        # (E,) int32
    receivers: jnp.ndarray      # (E,) int32, sorted ascending
    edge_attr: jnp.ndarray      # (E, K) int32, 0 = hop absent
    edge_mask: jnp.ndarray      # (E,) bool
    n_nodes: int = struct.field(pytree_node=False)

    @property
    def K(self) -> int:
        return self.edge_attr.shape[1]

    def slice_hops(self, k: int) -> "COOAdj":
        return self.replace(edge_attr=self.edge_attr[:, :k])


@struct.dataclass
class DenseAdj:
    """hop_attr[b, k, i, j] = attr code of union edge j -> i at hop k
    (0 = absent).  counts1/countsk are per-(node, hop) histograms of the
    attr codes over j — the edge-embedding sum is then counts @ table."""

    hop_attr: jnp.ndarray       # (B, K, n, n) int32
    counts1: jnp.ndarray        # (B, n, V1) float32  — hop-1 code histogram
    countsk: Optional[jnp.ndarray]  # (B, n, K-1, Vk) float32 | None if K==1

    @property
    def K(self) -> int:
        return self.hop_attr.shape[1]

    @property
    def B(self) -> int:
        return self.hop_attr.shape[0]

    @property
    def n(self) -> int:
        return self.hop_attr.shape[-1]

    def slice_hops(self, k: int) -> "DenseAdj":
        return self.replace(
            hop_attr=self.hop_attr[:, :k],
            countsk=self.countsk[:, :, :k - 1] if k > 1 else None,
        )


Adjacency = Union[COOAdj, DenseAdj, "KHopPallasPlan", "BandedAdj"]


def _zero_row0(table: jnp.ndarray) -> jnp.ndarray:
    return table.at[0].set(0.0) if table is not None else None


def hop_major_native(adj) -> bool:
    """True for backends whose aggregation is natively hop-major
    (K, N, D) — layers then run their whole body hop-major and skip the
    kernel-boundary transposes; the backbone passes hop-major
    peripheral embeddings to match."""
    from .banded import BandedAdj
    from .pallas_spmm import KHopPallasPlan

    return isinstance(adj, (BandedAdj, KHopPallasPlan))


def degree(adj: Adjacency, add_self_loop: bool = False) -> jnp.ndarray:
    """(N, K) per-hop in-degree over live hop entries."""
    from .banded import BandedAdj
    from .pallas_spmm import KHopPallasPlan
    from .sharded_adjacency import ShardedCOOAdj, sharded_degree

    if isinstance(adj, ShardedCOOAdj):
        return sharded_degree(adj, add_self_loop)
    if isinstance(adj, (KHopPallasPlan, BandedAdj)):
        deg = adj.degree()
        return deg + 1.0 if add_self_loop else deg
    if isinstance(adj, COOAdj):
        live = (adj.edge_attr > 0).astype(jnp.float32)
        deg = jax.ops.segment_sum(live, adj.receivers,
                                  num_segments=adj.n_nodes,
                                  indices_are_sorted=True)
    else:
        deg = (adj.hop_attr > 0).sum(axis=-1)            # (B, K, n)
        deg = deg.transpose(0, 2, 1).astype(jnp.float32)  # (B, n, K)
        deg = deg.reshape(-1, adj.K)
    if add_self_loop:
        deg = deg + 1.0
    return deg


def union_in_degree(adj: Adjacency) -> jnp.ndarray:
    """(N,) count of union edges into each node (the reference's PyG mean
    denominator counts every union edge regardless of hop mask)."""
    from .banded import BandedAdj
    from .pallas_spmm import KHopPallasPlan
    from .sharded_adjacency import ShardedCOOAdj, sharded_union_in_degree

    if isinstance(adj, ShardedCOOAdj):
        return sharded_union_in_degree(adj)
    if isinstance(adj, (KHopPallasPlan, BandedAdj)):
        return adj.union_deg
    if isinstance(adj, COOAdj):
        return jax.ops.segment_sum(
            adj.edge_mask.astype(jnp.float32), adj.receivers,
            num_segments=adj.n_nodes, indices_are_sorted=True)
    union = (adj.hop_attr > 0).any(axis=1)               # (B, n, n)
    return union.sum(axis=-1).astype(jnp.float32).reshape(-1)


def khop_aggregate_adj(
    adj: Adjacency,
    x: jnp.ndarray,                     # (N, K, D) | (K, N, D) hop-major
    table1: jnp.ndarray,                # (V1, D) hop-1 edge-emb table
    tablek: Optional[jnp.ndarray],      # (Vk, D) hop-k table | None if K==1
    *,
    scale: Optional[jnp.ndarray] = None,   # (N, K) receiver-side scale d_i
    sender_scale: Optional[jnp.ndarray] = None,  # (N, K) sender-side d_j
    aggr: str = "add",
    hop_major: bool = False,
) -> jnp.ndarray:
    """out[i,k] = aggr_j live * s_i[k] * s_j[k] * (x[j,k] + emb_k(attr)).

    GCN's symmetric norm factors as s_i * s_j (both deg^-0.5), which keeps
    the dense path a pure matmul; generic per-edge scales only exist on
    the COO path.

    ``hop_major=True`` takes and returns (K, N, D) — the layout GNNPlus
    builds its sliding windows in for free.  The pallas and dense
    backends run it natively (zero layout copies at the aggregation
    boundary); COO and sharded transpose at the boundary.
    """
    from .pallas_spmm import KHopPallasPlan, khop_spmm
    from .sharded_adjacency import ShardedCOOAdj, sharded_khop_aggregate

    if isinstance(adj, ShardedCOOAdj):
        if hop_major:
            out = khop_aggregate_adj(
                adj, jnp.transpose(x, (1, 0, 2)), table1, tablek,
                scale=scale, sender_scale=sender_scale, aggr=aggr)
            return jnp.transpose(out, (1, 0, 2))
        t1 = _zero_row0(table1).astype(x.dtype)
        tk = (_zero_row0(tablek).astype(x.dtype)
              if tablek is not None else None)
        return sharded_khop_aggregate(adj, x, t1, tk, scale=scale,
                                      sender_scale=sender_scale, aggr=aggr)
    if isinstance(adj, KHopPallasPlan):
        # khop_spmm handles dtype itself (bf16 models keep the kernel-
        # boundary relayouts in bf16; f32 stays f32 end to end)
        return khop_spmm(x, table1, tablek, adj,
                         scale=scale, sender_scale=sender_scale,
                         aggr=aggr, hop_major=hop_major)
    from .banded import BandedAdj, banded_khop_aggregate
    if isinstance(adj, BandedAdj):
        return banded_khop_aggregate(x, table1, tablek, adj,
                                     scale=scale, sender_scale=sender_scale,
                                     aggr=aggr, hop_major=hop_major)
    if hop_major and isinstance(adj, COOAdj):
        out = khop_aggregate_adj(
            adj, jnp.transpose(x, (1, 0, 2)), table1, tablek,
            scale=scale, sender_scale=sender_scale, aggr=aggr)
        return jnp.transpose(out, (1, 0, 2))

    table1 = _zero_row0(table1).astype(x.dtype)
    tablek = (_zero_row0(tablek).astype(x.dtype)
              if tablek is not None else None)
    K = adj.K
    if isinstance(adj, COOAdj):
        from ..nn.embed import small_table_lookup
        e1 = small_table_lookup(table1, adj.edge_attr[:, :1])
        e_emb = (jnp.concatenate(
            [e1, small_table_lookup(tablek, adj.edge_attr[:, 1:])], axis=-2)
            if K > 1 else e1)
        edge_scale = None
        if scale is not None or sender_scale is not None:
            s_i = scale[adj.receivers] if scale is not None else 1.0
            s_j = sender_scale[adj.senders] if sender_scale is not None else 1.0
            edge_scale = s_i * s_j
        from .segment import khop_aggregate
        return khop_aggregate(x, adj.senders, adj.receivers, e_emb,
                              adj.edge_attr, scale=edge_scale, aggr=aggr,
                              edge_mask=adj.edge_mask)

    # ---- dense path ----
    B, n = adj.B, adj.n
    D = x.shape[-1]
    if aggr == "max" and not hop_major:
        if scale is not None or sender_scale is not None:
            raise ValueError("aggr='max' composes with no edge scales "
                             "(the reference only pairs max with "
                             "KPGraphSAGE, which is unscaled)")
        return _dense_max(adj, x, table1, tablek)
    if hop_major:
        if scale is not None or sender_scale is not None or aggr != "add":
            # scaled/mean variants are node-major-only (no hop-major
            # caller uses them); route through the boundary transpose
            out = khop_aggregate_adj(
                adj, jnp.transpose(x, (1, 0, 2)), table1, tablek,
                scale=scale, sender_scale=sender_scale, aggr=aggr)
            return jnp.transpose(out, (1, 0, 2))
        xb = x.reshape(K, B, n, D)
        # hop-major mask: the swap fuses into the compare's layout
        live = jnp.swapaxes((adj.hop_attr > 0), 0, 1).astype(x.dtype)
        neigh = jnp.einsum("kbij,kbjd->kbid", live, xb)   # (K, B, n, D)
        parts = [adj.counts1.astype(x.dtype) @ table1]    # (B, n, D)
        if K > 1:
            parts += [adj.countsk[:, :, k - 1].astype(x.dtype) @ tablek
                      for k in range(1, K)]
        return (neigh + jnp.stack(parts, axis=0)).reshape(K, B * n, D)
    xb = x.reshape(B, n, K, D)
    live = (adj.hop_attr > 0).astype(x.dtype)            # (B, K, n, n)
    if sender_scale is not None:
        sj = sender_scale.reshape(B, n, K).transpose(0, 2, 1)  # (B, K, n)
        live = live * sj[:, :, None, :]
    neigh = jnp.einsum("bkij,bjkd->bikd", live, xb)      # (B, n, K, D)

    emb1 = adj.counts1.astype(x.dtype) @ table1          # (B, n, D)
    if K > 1:
        embk = jnp.einsum("bnkv,vd->bnkd",
                          adj.countsk.astype(x.dtype), tablek)
        emb = jnp.concatenate([emb1[:, :, None], embk], axis=2)
    else:
        emb = emb1[:, :, None]
    if sender_scale is not None:
        # counts were built unweighted; weight by sender degrees instead
        emb = _dense_weighted_emb(adj, sender_scale, table1, tablek, x.dtype)
    out = neigh + emb
    if scale is not None:
        out = out * scale.reshape(B, n, K)[..., None]
    if aggr == "mean":
        cnt = union_in_degree(adj).reshape(B, n)
        out = out / jnp.maximum(cnt, 1.0)[..., None, None]
    elif aggr != "add":
        raise ValueError(f"dense adjacency does not support aggr={aggr!r}")
    return out.reshape(-1, K, D)


def _dense_max(adj: DenseAdj, x, table1, tablek) -> jnp.ndarray:
    """Reference max semantics on the dense layout
    (layers/KPGraphSAGE.py:104 + PyG scatter amax, include_self=False):
    per (receiver i, hop k), max over the receiver's UNION edges of the
    masked message — live edges contribute x_j + emb(attr), union edges
    dead at hop k contribute literal 0.0, receivers with no union edges
    read 0.  Needs per-pair attr codes, so it materializes (B, n, n, D)
    messages one hop at a time (max does not factor into the counts @
    table embedding fold the add path uses)."""
    from ..nn.embed import small_table_lookup

    B, K, n = adj.B, adj.K, adj.n
    D = x.shape[-1]
    xb = x.reshape(B, n, K, D)
    union_deg = (adj.hop_attr > 0).any(axis=1).sum(axis=-1)      # (B, n)
    neg = jnp.asarray(-jnp.inf, x.dtype)
    outs = []
    for k in range(K):
        table = (table1 if k == 0 else tablek).astype(x.dtype)
        attr = adj.hop_attr[:, k]                                # (B, n, n)
        emb = small_table_lookup(table, attr)                    # (B,n,n,D)
        msg = xb[:, None, :, k, :] + emb      # [b, i, j, d]
        live = (attr > 0)[..., None]
        live_max = jnp.max(jnp.where(live, msg, neg), axis=2)    # (B, n, D)
        live_deg = (attr > 0).sum(axis=-1)                       # (B, n)
        has_dead = (union_deg > live_deg)[..., None]
        out = jnp.where(has_dead, jnp.maximum(live_max, 0.0), live_max)
        outs.append(jnp.where(jnp.isneginf(out), 0.0, out))
    return jnp.stack(outs, axis=2).reshape(B * n, K, D)


def _dense_weighted_emb(adj: DenseAdj, sender_scale, table1, tablek, dtype):
    """Sum_j s_j * emb(attr[k,i,j]) via a one-hot einsum (GCN norm path)."""
    B, K, n = adj.B, adj.K, adj.n
    sj = sender_scale.reshape(B, n, K).transpose(0, 2, 1)      # (B, K, n)
    out = []
    for k in range(K):
        table = table1 if k == 0 else tablek
        oh = jax.nn.one_hot(adj.hop_attr[:, k], table.shape[0], dtype=dtype)
        wc = jnp.einsum("bijv,bj->biv", oh, sj[:, k])          # (B, n, V)
        out.append(wc @ table)
    return jnp.stack(out, axis=2)                               # (B, n, K, D)
