"""Feature and input encoders (reference: layers/feature_encoder.py,
layers/input_encoder.py)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .basic import TorchLinear
from .embed import PaddedEmbed


class FeatureSumEncoder(nn.Module):
    """Sum of per-column embeddings (defined upstream but unused there)."""

    feature_dims: Sequence[int]
    hidden_size: int
    padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = 0.0
        for i, dim in enumerate(self.feature_dims):
            emb = PaddedEmbed(dim, self.hidden_size,
                              padding_idx=0 if self.padding else None,
                              name=f"emb{i}")
            out = out + emb(x[..., i])
        return out


class FeatureConcatEncoder(nn.Module):
    """Per-column embeddings, concatenated then projected — used for the
    peripheral edge / configuration embeddings
    (reference: models/GNNs.py:92-97).

    `sum_axis` (an axis of x[..., i], i.e. of x without its last dim)
    computes `encoder(x).sum(axis=sum_axis)` without materializing the
    per-element embeddings: the sum commutes through the linear
    stack, so each column's contribution is histogram(x_i) @ table_i
    and the projection bias is scaled by the summed length.  On the
    flagship TPU step this removes the (N*K*T, H)-shaped intermediates
    AND their backward scatters (the encoder output is summed over the
    per-hop component axis at models/GNNs.py:172-179 in the reference).
    """

    feature_dims: Sequence[int]
    hidden_size: int
    padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 sum_axis: Optional[int] = None) -> jnp.ndarray:
        # sum_axis indexes into x[..., i] (x minus its trailing column
        # axis); normalize it before the one-hot appends a value axis
        if sum_axis is not None and sum_axis < 0:
            sum_axis += x.ndim - 1
        embs = []
        for i, dim in enumerate(self.feature_dims):
            emb = PaddedEmbed(dim, self.hidden_size,
                              padding_idx=0 if self.padding else None,
                              name=f"emb{i}")
            if sum_axis is None:
                embs.append(emb(x[..., i]))
            else:
                ids = x[..., i]
                counts = jnp.sum(
                    (ids[..., None] == jnp.arange(dim, dtype=ids.dtype))
                    .astype(jnp.float32), axis=sum_axis)   # (..., dim)
                embs.append(emb(counts, counts=True))
        out = TorchLinear(self.hidden_size, name="proj")(
            jnp.concatenate(embs, axis=-1))
        if sum_axis is not None:
            # proj ran after the sum: its bias entered once instead of
            # once per summed element
            t = x.shape[sum_axis]
            bias = self.get_variable("params", "proj")["bias"]
            out = out + (t - 1) * bias.astype(out.dtype)
        return out


class EmbeddingEncoder(nn.Module):
    """Initial node encoder for integer features (no padding row)."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, batch) -> jnp.ndarray:
        x = batch.x
        if x.ndim == 2 and x.shape[-1] == 1:
            x = x[:, 0]
        return PaddedEmbed(self.input_size, self.hidden_size,
                           padding_idx=None, name="init_proj")(x)


class LinearEncoder(nn.Module):
    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, batch) -> jnp.ndarray:
        return TorchLinear(self.hidden_size, name="init_proj")(
            batch.x.astype(jnp.float32))


class QM9InputEncoder(nn.Module):
    """z-embedding (summed if multi-code) concat continuous features
    (reference: layers/input_encoder.py:43-85)."""

    hidden_size: int
    use_pos: bool = False

    @nn.compact
    def __call__(self, batch) -> jnp.ndarray:
        x = batch.x.astype(jnp.float32)
        z_emb = PaddedEmbed(1000, 8, padding_idx=None, name="z_embedding")(batch.z)
        if z_emb.ndim == 3:
            z_emb = z_emb.sum(axis=1)
        x = jnp.concatenate([z_emb, x], axis=-1)
        if self.use_pos:
            x = jnp.concatenate([x, batch.pos.astype(jnp.float32)], axis=-1)
        return TorchLinear(self.hidden_size, name="init_proj")(x)
