"""Segment primitives and the k-hop neighborhood aggregation.

This is the training hot loop: gather sender states, add per-edge hop
embeddings, zero the hops where the edge is absent, and scatter-add into
the receiver nodes (reference: layers/KPGIN.py:100,115-118 inside PyG's
MessagePassing).  Batches arrive with edges sorted by receiver
(graph/batch.py), so every scatter below runs with
`indices_are_sorted=True` — on TPU XLA lowers that to a fast monotone
segment reduction instead of a generic scatter.

Shapes: N nodes, E edges, K hops, D per-hop feature width.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


# graph-level reductions (pooling, per-graph norm stats, virtual-node
# updates) have few segments; a one-hot contraction runs them on the MXU
# instead of XLA's scatter loop (measured 286 us -> MXU-trivial for the
# n=8192 polymer readout), and its transpose (the backward gather) rides
# the MXU too.  Scatter stays for large segment counts (edge->node).
_ONEHOT_SEGMENTS_MAX = 1024


def _onehot_segment_sum(data, segment_ids, num_segments: int):
    flat = data.reshape(data.shape[0], -1)
    oh = (segment_ids[:, None] ==
          jnp.arange(num_segments, dtype=segment_ids.dtype))
    out = jax.lax.dot_general(
        oh.astype(flat.dtype), flat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        # exact: one-hot entries are 0/1, and HIGHEST keeps f32 inputs
        # from the MXU's default bf16 rounding
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return out.astype(data.dtype).reshape((num_segments,) + data.shape[1:])


def segment_sum(data, segment_ids, num_segments: int, sorted: bool = True):
    if (num_segments <= _ONEHOT_SEGMENTS_MAX
            and jnp.issubdtype(jnp.result_type(data), jnp.floating)):
        return _onehot_segment_sum(data, segment_ids, num_segments)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=sorted,
    )


def segment_mean(data, segment_ids, num_segments: int, weights=None,
                 sorted: bool = True):
    """Mean over segments; `weights` masks entries out of both numerator
    and denominator."""
    if weights is not None:
        w = weights.astype(data.dtype)
        while w.ndim < data.ndim:
            w = w[..., None]
        data = data * w
        counts = segment_sum(
            jnp.broadcast_to(w, data.shape), segment_ids,
            num_segments=num_segments, sorted=sorted)
    else:
        counts = segment_sum(
            jnp.ones_like(data), segment_ids,
            num_segments=num_segments, sorted=sorted)
    total = segment_sum(
        data, segment_ids, num_segments=num_segments, sorted=sorted)
    return total / jnp.maximum(counts, 1.0)


def segment_max(data, segment_ids, num_segments: int, sorted: bool = True):
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=sorted,
    )


def segment_softmax(logits, segment_ids, num_segments: int, mask=None,
                    sorted: bool = True):
    """Numerically-stable softmax within segments (used by attention
    pooling).  `mask` excludes padded entries."""
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    seg_max = jax.ops.segment_max(
        logits, segment_ids, num_segments=num_segments,
        indices_are_sorted=sorted)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(logits - seg_max[segment_ids])
    if mask is not None:
        ex = jnp.where(mask, ex, 0.0)
    denom = jax.ops.segment_sum(
        ex, segment_ids, num_segments=num_segments, indices_are_sorted=sorted)
    return ex / jnp.maximum(denom[segment_ids], 1e-16)


def multi_hop_degree(edge_attr, receivers, num_nodes: int,
                     add_self_loop: bool = False):
    """Per-hop in-degree: count of edges with a live hop mask per receiver
    (reference: layers/KPGCN.py:11-25).  (E, K) int mask -> (N, K) float.

    `add_self_loop` adds the +1 the GCN layer gets from its (analytically
    handled) self-loop edge with attr 1 on every hop.
    """
    live = (edge_attr > 0).astype(jnp.float32)
    deg = jax.ops.segment_sum(
        live, receivers, num_segments=num_nodes, indices_are_sorted=True)
    if add_self_loop:
        deg = deg + 1.0
    return deg


def khop_aggregate(
    x: jnp.ndarray,             # (N, K, D) node state per hop
    senders: jnp.ndarray,       # (E,)
    receivers: jnp.ndarray,     # (E,)
    edge_emb: jnp.ndarray,      # (E, K, D) per-edge hop embeddings
    edge_attr: jnp.ndarray,     # (E, K) int, 0 = hop absent
    *,
    scale: Optional[jnp.ndarray] = None,   # (E, K) e.g. GCN norm
    aggr: str = "add",
    edge_mask: Optional[jnp.ndarray] = None,  # (E,) for mean denominators
    num_segments: Optional[int] = None,   # output rows (default: x rows)
) -> jnp.ndarray:
    """out[i, k] = aggr over edges e with receivers[e] == i of
    mask[e, k] * scale[e, k] * (x[senders[e], k] + edge_emb[e, k]).

    Padded edges carry edge_attr == 0 on every hop, so they vanish from the
    sum; for `mean` the denominator counts union edges per receiver (the
    reference's PyG mean divides by all union-set in-edges regardless of
    hop mask), excluding padding via `edge_mask`.

    `num_segments` decouples the output row count from the node-state
    table: the sharded backend scatters into the locally-owned node range
    while gathering from an extended [local | halo] table.
    """
    msg = x[senders] + edge_emb                       # (E, K, D)
    live = (edge_attr > 0)[..., None]
    if scale is not None:
        msg = msg * scale[..., None]
    msg = jnp.where(live, msg, 0.0)
    n = x.shape[0] if num_segments is None else num_segments
    if aggr == "add":
        return jax.ops.segment_sum(
            msg, receivers, num_segments=n, indices_are_sorted=True)
    if aggr == "mean":
        total = jax.ops.segment_sum(
            msg, receivers, num_segments=n, indices_are_sorted=True)
        if edge_mask is None:
            edge_mask = jnp.ones(senders.shape, dtype=jnp.float32)
        cnt = jax.ops.segment_sum(
            edge_mask.astype(jnp.float32), receivers, num_segments=n,
            indices_are_sorted=True)
        return total / jnp.maximum(cnt, 1.0)[:, None, None]
    if aggr == "max":
        # Reference semantics: PyG aggregates the MASKED messages, so a
        # union edge dead at hop k contributes a literal 0.0 to the max
        # (layers/KPGraphSAGE.py:104 masked_fill(mask==0, 0.) feeds the
        # scatter; torch scatter_reduce(amax, include_self=False) then
        # maxes over every union-edge message).  Only PADDED edges are
        # excluded entirely; receivers with no union edges read 0.
        # `msg` is already where(live, msg, 0.0) from above.
        if edge_mask is not None:
            msg = jnp.where(edge_mask[:, None, None], msg, -jnp.inf)
        out = jax.ops.segment_max(
            msg, receivers, num_segments=n, indices_are_sorted=True)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    raise ValueError(f"unknown aggr {aggr!r}")
