"""Embedding with a hard-zero padding row.

Index 0 is the mask value throughout the framework (edge absent at a hop /
padded edge), so `PaddedEmbed` pins row 0 to zero *in the forward pass*
rather than only at init — this also zeroes its gradient, matching torch's
`padding_idx=0` behavior used by every reference embedding table
(reference: layers/KPGIN.py:49-53).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .inits import normal_init


class PaddedEmbed(nn.Module):
    num_embeddings: int
    features: int
    padding_idx: int | None = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", normal_init(1.0), (self.num_embeddings, self.features)
        ).astype(self.dtype)
        if self.padding_idx is not None:
            mask = (
                jnp.arange(self.num_embeddings) != self.padding_idx
            ).astype(table.dtype)[:, None]
            table = table * mask
        return table[ids]
