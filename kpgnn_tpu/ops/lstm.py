"""Bidirectional LSTM over a short static axis, as a fused `lax.scan`.

The reference scores hops / layers with a cuDNN bi-LSTM
(reference: layers/combine.py:17, models/GNNs.py:66).  Sequence lengths
here are tiny (K or num_layer), so the TPU-shaped implementation is:

* input projections for every timestep and BOTH directions precomputed
  as one batched matmul (out of the recurrence);
* the recurrence runs both directions in a single scan step — the
  backward direction operates on the time-reversed sequence, so each
  step is one (2, B, 4H) batched matmul instead of two small ones;
* the scan is fully unrolled (T is a small static constant), letting XLA
  fuse the per-step elementwise work into the matmuls.

Gate order matches torch (input, forget, cell, output) and all
parameters initialize U(-1/sqrt(H), 1/sqrt(H)) like torch's LSTM reset,
so activations are directly comparable to the reference (verified in
tests/test_layers.py against torch.nn.LSTM).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _lstm_uniform(hidden_size: int):
    bound = 1.0 / (hidden_size ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class BiLSTM(nn.Module):
    """One-layer bidirectional LSTM. Input (B, T, F) -> output (B, T, 2H);
    with ``time_major=True`` input (T, B, F) -> output (T, B, 2H) and no
    boundary transposes at all (the recurrence is time-major internally —
    hop-major callers feed it for free)."""

    hidden_size: int
    time_major: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.time_major:
            T, B, F = x.shape
        else:
            B, T, F = x.shape
        H = self.hidden_size
        init = _lstm_uniform(H)
        params = {}
        for d in ("fwd", "bwd"):
            params[d] = dict(
                w_ih=self.param(f"w_ih_{d}", init, (4 * H, F)),
                w_hh=self.param(f"w_hh_{d}", init, (4 * H, H)),
                b_ih=self.param(f"b_ih_{d}", init, (4 * H,)),
                b_hh=self.param(f"b_hh_{d}", init, (4 * H,)),
            )

        tm = x if self.time_major else jnp.swapaxes(x, 0, 1)   # (T, B, F)
        # both directions' input projections in ONE matmul over the
        # F-wide input (concatenated gate weights), then slice per
        # direction — the time reversal applies to the 4H-narrow gate
        # activations instead of duplicating the F-wide sequence
        # ((T, 2, B, F) materialization measured as the combine's
        # biggest HBM cost on the flagship step)
        w_ih = jnp.concatenate([params["fwd"]["w_ih"],
                                params["bwd"]["w_ih"]]).astype(x.dtype)
        b_ih = jnp.concatenate([params["fwd"]["b_ih"],
                                params["bwd"]["b_ih"]]).astype(x.dtype)
        xg_all = tm @ w_ih.T + b_ih                     # (T, B, 8H)
        xg = jnp.stack([xg_all[..., : 4 * H],
                        xg_all[::-1, :, 4 * H:]], axis=1)   # (T, 2, B, 4H)

        w_hh = jnp.stack([params["fwd"]["w_hh"],
                          params["bwd"]["w_hh"]]).astype(x.dtype)
        b_hh = jnp.stack([params["fwd"]["b_hh"],
                          params["bwd"]["b_hh"]]).astype(x.dtype)

        def step(carry, xg_t):
            h, c = carry                                 # (2, B, H)
            gates = xg_t + jnp.einsum("dbh,dgh->dbg", h, w_hh) \
                + b_hh[:, None]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((2, B, H), x.dtype)
        # under shard_map(check_vma=True) the carry must vary over the
        # same mesh axes as the (node-sharded) input or scan rejects the
        # carry-type mismatch after the first step
        vma = getattr(getattr(x, "aval", None), "vma", None)
        if vma:
            h0 = jax.lax.pvary(h0, tuple(vma))
        _, hs = jax.lax.scan(step, (h0, h0), xg, unroll=True)  # (T, 2, B, H)
        out = jnp.concatenate([hs[:, 0], hs[::-1, 1]], axis=-1)  # (T, B, 2H)
        return out if self.time_major else jnp.swapaxes(out, 0, 1)
