"""Embedding with a hard-zero padding row.

Index 0 is the mask value throughout the framework (edge absent at a hop /
padded edge), so `PaddedEmbed` pins row 0 to zero *in the forward pass*
rather than only at init — this also zeroes its gradient, matching torch's
`padding_idx=0` behavior used by every reference embedding table
(reference: layers/KPGIN.py:49-53).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from .inits import normal_init

# Lookups from tables at or below this many rows lower to one-hot
# matmuls.  TPU-profiled on the flagship step: the backward of a gather
# from a tiny table is a serial scatter-add fusion (0.18-0.52 ms for
# 20k-61k indices), while the matmul transpose is ordinary MXU work;
# the per-step scatter fusions were ~45% of the whole train step.
# Env-overridable for A/B profiling (0 disables the one-hot path).
ONEHOT_MAX_ROWS = int(os.environ.get("KPGNN_ONEHOT_MAX_ROWS", "64"))


def small_table_lookup(table: jnp.ndarray, ids: jnp.ndarray,
                       max_rows: int = ONEHOT_MAX_ROWS) -> jnp.ndarray:
    """`table[ids]` that differentiates as a matmul, not a scatter.

    For tables up to `max_rows` rows the gather is computed as
    one_hot(ids) @ table at HIGHEST precision.  Each one-hot row has a
    single 1, so the forward is bit-exact vs the gather on every
    backend (no accumulation, and the bf16x6 decomposition of a 0/1
    operand reconstructs the f32 table values exactly); the backward
    becomes onehot^T @ grad — one (V, N)·(N, D) matmul instead of a
    serial scatter-add.  Wider tables fall back to the plain gather.
    """
    V = table.shape[0]
    if V > max_rows:
        return table[ids]
    oh = (ids[..., None] == jnp.arange(V, dtype=ids.dtype)).astype(table.dtype)
    return jnp.einsum("...v,vd->...d", oh, table,
                      precision=jax.lax.Precision.HIGHEST)


class PaddedEmbed(nn.Module):
    num_embeddings: int
    features: int
    padding_idx: int | None = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray, counts: bool = False) -> jnp.ndarray:
        table = self.param(
            "embedding", normal_init(1.0), (self.num_embeddings, self.features)
        ).astype(self.dtype)
        if self.padding_idx is not None:
            mask = (
                jnp.arange(self.num_embeddings) != self.padding_idx
            ).astype(table.dtype)[:, None]
            table = table * mask
        if counts:
            # `ids` is a float (..., num_embeddings) histogram: the sum
            # of lookups collapses to counts @ table (padding row is
            # already zeroed above, so masked values drop out)
            return jnp.einsum("...v,vd->...d", ids.astype(table.dtype),
                              table, precision=jax.lax.Precision.HIGHEST)
        return small_table_lookup(table, ids)
