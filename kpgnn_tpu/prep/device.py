"""On-device k-hop extraction for batched small graphs.

The host path (prep/khop.py + the C++ kernels) computes everything
offline; this module moves the SPD/GD construction itself onto the TPU:
batched walk-count matrix powers, SPD masking, and attr processing as
pure jitted tensor ops over (B, n, n) adjacency stacks, emitting a
`DenseAdj` directly — raw edge lists to model-ready adjacency without
leaving the device.  Peripheral-subgraph statistics are per-node induced
subgraph computations and stay on the host/native path; use this for
configs that don't need them (ablations, simulation, throughput runs) or
combine with host peripheral extraction.

Numerics: walk counts are carried in f32 and clipped at CLIP between
steps — counts only matter up to `max_edge_attr_num` (clipped anyway) and
as a >0 mask, so saturating early keeps everything exact where it is
observable while avoiding f32 integer overflow at large K.

Reference semantics mirrored: data_utils.py:55-96 (adjacency powers with
zeroed diagonals, SPD masking, clip+shift attr encoding).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.adjacency import DenseAdj

CLIP = 1_000_000.0    # walk-count saturation (far above any attr clip)


@partial(jax.jit, static_argnames=("K", "max_edge_attr_num", "kernel",
                                   "v1", "vk"))
def device_khop_dense(
    adj: jnp.ndarray,        # (B, n, n) float/int 0-1 adjacency
    attr_adj: jnp.ndarray,   # (B, n, n) int32 1-hop attr codes (>=2, 0=none)
    K: int,
    max_edge_attr_num: int,
    kernel: str = "spd",
    v1: int = 4,
    vk: int = 4,
) -> Tuple[DenseAdj, jnp.ndarray]:
    """Returns (DenseAdj, pe_attr (B*n, K-1) int32) for the batch."""
    B, n, _ = adj.shape
    a = adj.astype(jnp.float32)
    eye = jnp.eye(n, dtype=bool)[None]

    # walk-count chain with per-step saturation; diagonals zeroed per hop
    powers = []
    cur = a
    for k in range(K):
        if k > 0:
            cur = jnp.minimum(
                jnp.einsum("bij,bjk->bik", cur, a,
                           precision=jax.lax.Precision.HIGHEST), CLIP)
        powers.append(jnp.where(eye, 0.0, cur))
    pw = jnp.stack(powers, axis=1)                         # (B, K, n, n)

    if kernel == "spd":
        masked = [pw[:, 0]]
        seen = pw[:, 0] > 0
        for k in range(1, K):
            m = jnp.where(seen, 0.0, pw[:, k])
            seen = seen | (m > 0)
            masked.append(m)
        hop = jnp.stack(masked, axis=1)
    else:
        hop = pw

    # attr encoding: clip then +1 on nonzeros (0 stays the mask value)
    clipped = jnp.minimum(hop, float(max_edge_attr_num))
    proc = jnp.where(clipped > 0, clipped + 1.0, 0.0).astype(jnp.int32)

    # hop-1 column carries the original attr codes where a direct edge
    # exists; receiver-major layout = transpose of the i->j convention
    hop1 = jnp.where(hop[:, 0] > 0, attr_adj, 0).astype(jnp.int32)
    hop_attr = jnp.concatenate(
        [hop1[:, None], proc[:, 1:]], axis=1)              # (B, K, n, n)
    hop_attr = jnp.swapaxes(hop_attr, -1, -2)              # receiver-major

    # path encoding = diagonal of the processed hop matrices (zero by the
    # reference's diagonal-zeroing; kept for layout compatibility)
    pe = jnp.zeros((B * n, K - 1), jnp.int32) if K > 1 else None

    counts1 = jnp.sum(
        jax.nn.one_hot(jnp.clip(hop_attr[:, 0], 0, v1 - 1), v1), axis=-2)
    counts1 = counts1.at[..., 0].set(0.0)                  # (B, n, v1)
    countsk = None
    if K > 1:
        ck = jnp.sum(
            jax.nn.one_hot(jnp.clip(hop_attr[:, 1:], 0, vk - 1), vk),
            axis=-2)                                       # (B, K-1, n, vk)
        countsk = jnp.swapaxes(ck, 1, 2).at[..., 0].set(0.0)
    return DenseAdj(hop_attr=hop_attr, counts1=counts1,
                    countsk=countsk), pe
