"""Cross-hop combine functions (reference: layers/combine.py).

Both operate on (N, K, D) hop-stacked node states and reduce the hop axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.lstm import BiLSTM


class AttentionCombine(nn.Module):
    """Bi-LSTM over the hop axis scores each hop; softmax-weighted sum
    (reference: layers/combine.py:8-27).  LSTM hidden size is K, so scores
    are (N, K, 2K) summed over the last axis.

    ``hop_major=True`` takes x as (K, N, D) — the LSTM's native time-major
    layout, so the whole combine runs transpose-free."""

    K: int
    hop_major: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        lstm = BiLSTM(self.K, time_major=self.hop_major,
                      name="attention_lstm")
        score = lstm(x)                     # (N, K, 2K) | (K, N, 2K)
        hop_axis = 0 if self.hop_major else 1
        att = jax.nn.softmax(score.sum(-1), axis=hop_axis)[..., None]
        return (x * att).sum(axis=hop_axis)


class GeometricCombine(nn.Module):
    """Per-channel learnable geometric hop weights
    theta_i ∝ sigmoid(a) * (1 - sigmoid(a))^i, softmax-normalized over hops
    (reference: layers/combine.py:30-58).  ``hop_major=True`` takes
    (K, N, D)."""

    K: int
    hidden_size: int
    hop_major: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alphas = self.param("alphas", nn.initializers.zeros, (self.hidden_size,))
        a = jax.nn.sigmoid(alphas).astype(x.dtype)
        i = jnp.arange(self.K, dtype=x.dtype)[:, None]
        thetas = a[None, :] * (1.0 - a[None, :]) ** i        # (K, D)
        thetas = jax.nn.softmax(thetas, axis=0)
        if self.hop_major:
            return (x * thetas[:, None]).sum(axis=0)
        return (x * thetas[None]).sum(axis=-2)


def make_combine(combine: str, K: int, hidden_size: int, name: str = "combine",
                 hop_major: bool = False):
    if combine == "attention":
        return AttentionCombine(K, hop_major, name=name)
    if combine == "geometric":
        return GeometricCombine(K, hidden_size, hop_major, name=name)
    raise ValueError("Not implemented combine function")
