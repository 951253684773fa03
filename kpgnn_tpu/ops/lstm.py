"""Bidirectional LSTM over a short static axis, as a `lax.scan`.

The reference scores hops / layers with a cuDNN bi-LSTM
(reference: layers/combine.py:17, models/GNNs.py:66).  Sequence lengths
here are tiny (K or num_layer), so one fused scan with both directions per
step is the right TPU shape: weights stay in VMEM, the time loop is
compiled, and the batch dimension (nodes) rides the MXU.

Gate order matches torch (input, forget, cell, output) and all parameters
initialize U(-1/sqrt(H), 1/sqrt(H)) like torch's LSTM reset, so
activations are directly comparable to the reference.
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
    """One-layer bidirectional LSTM. Input (B, T, F) -> output (B, T, 2H)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
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

        def run(p, seq):
            # seq: (T, B, F) time-major for the scan
            xg = jnp.einsum("tbf,gf->tbg", seq, p["w_ih"]) + p["b_ih"]

            def step(carry, xg_t):
                h, c = carry
                gates = xg_t + h @ p["w_hh"].T + p["b_hh"]
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                g = jnp.tanh(g)
                c = f * c + i * g
                h = o * jnp.tanh(c)
                return (h, c), h

            h0 = jnp.zeros((seq.shape[1], H), seq.dtype)
            _, hs = jax.lax.scan(step, (h0, h0), xg)
            return hs  # (T, B, H)

        tm = jnp.swapaxes(x, 0, 1)
        fwd = run(params["fwd"], tm)
        bwd = run(params["bwd"], tm[::-1])[::-1]
        out = jnp.concatenate([fwd, bwd], axis=-1)      # (T, B, 2H)
        return jnp.swapaxes(out, 0, 1)
