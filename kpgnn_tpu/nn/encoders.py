"""Feature and input encoders (reference: layers/feature_encoder.py,
layers/input_encoder.py)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
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

    Computed in FOLDED form: proj(concat_i(T_i[x_i])) is algebraically
    sum_i one_hot(x_i) @ (T_i @ P_i) + bias, where P_i is the i-th
    H-row slice of the projection kernel.  The per-column products
    T_i @ P_i are tiny (dim x H @ H x H); folding removes the
    (..., C*H) concat intermediate and the C*H-wide projection matmul
    entirely — on the flagship step the configuration encoder's
    (N, K, 728) concat and its 728->104 projection were ~3 GFLOP of the
    26 GFLOP step.  Parameters and their tree layout are unchanged
    (emb{i}/embedding + proj/kernel + proj/bias), so checkpoints and the
    cross-framework parity mapping are unaffected; the math is
    identical (autodiff differentiates through the folded products).

    `sum_axis` (an axis of x[..., i], i.e. of x without its last dim)
    additionally folds `encoder(x).sum(axis=sum_axis)` into the same
    histogram contraction, with the projection bias scaled by the
    summed length (the reference sums the encoder output over the
    per-hop component axis at models/GNNs.py:172-179).
    """

    feature_dims: Sequence[int]
    hidden_size: int
    padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 sum_axis: Optional[int] = None) -> jnp.ndarray:
        H = self.hidden_size
        dims = list(self.feature_dims)
        # sum_axis indexes into x[..., i] (x minus its trailing column
        # axis); normalize it before the one-hot appends a value axis
        if sum_axis is not None and sum_axis < 0:
            sum_axis += x.ndim - 1
        # instantiate the identical parameter tree; the dummy calls only
        # create params (their outputs are dead code XLA removes)
        for i, dim in enumerate(dims):
            PaddedEmbed(dim, H, padding_idx=0 if self.padding else None,
                        name=f"emb{i}")(jnp.zeros((1,), jnp.int32))
        TorchLinear(H, name="proj")(jnp.zeros((1, len(dims) * H)))
        kernel = self.get_variable("params", "proj")["kernel"]
        bias = self.get_variable("params", "proj")["bias"]
        folded = []
        for i, dim in enumerate(dims):
            t = self.get_variable("params", f"emb{i}")["embedding"]
            if self.padding:
                t = t * (jnp.arange(dim) != 0).astype(t.dtype)[:, None]
            folded.append(t @ kernel[i * H:(i + 1) * H])
        table = jnp.concatenate(folded, axis=0)      # (sum dims, H)
        # per-column one-hots concatenated along the value axis (each is
        # (..., dim_i); no (..., C, sum dims) intermediate)
        oh = jnp.concatenate(
            [(x[..., i:i + 1] == jnp.arange(dim, dtype=x.dtype)
              ).astype(jnp.float32)
             for i, dim in enumerate(dims)], axis=-1)   # (..., V)
        if sum_axis is not None:
            oh = jnp.sum(oh, axis=sum_axis)
        out = jnp.einsum("...v,vd->...d", oh, table,
                         precision=jax.lax.Precision.HIGHEST)
        n_bias = 1 if sum_axis is None else x.shape[sum_axis]
        return out + n_bias * bias.astype(out.dtype)


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
