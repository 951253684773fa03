"""Pallas CSR SpMM vs the XLA segment-sum path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpgnn_tpu.ops.pallas_spmm import (
    CSR, build_csc, build_csr, csr_khop_spmm, khop_spmm,
)


def case(seed=0, n=256, e=700, K=3, D=8, V1=5, Vk=7):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = np.sort(rng.integers(0, n, e)).astype(np.int32)
    attr = rng.integers(0, Vk, size=(e, K)).astype(np.int32)
    attr[:, 0] = rng.integers(0, V1, e)
    x = rng.normal(size=(n, K, D)).astype(np.float32)
    t1 = rng.normal(size=(V1, D)).astype(np.float32)
    tk = rng.normal(size=(Vk, D)).astype(np.float32)
    return senders, receivers, attr, x, t1, tk


def xla_reference(senders, receivers, attr, x, t1, tk, n):
    t1 = t1.copy()
    t1[0] = 0
    tk = tk.copy()
    tk[0] = 0
    emb = np.concatenate([t1[attr[:, :1]], tk[attr[:, 1:]]], axis=1)
    msgs = (attr > 0)[..., None] * x[senders] + emb
    out = np.zeros_like(x)
    np.add.at(out, receivers, msgs)
    return out


def test_forward_matches_xla():
    senders, receivers, attr, x, t1, tk = case()
    n = x.shape[0]
    csr = build_csr(receivers, senders, attr, n)
    out = csr_khop_spmm(jnp.asarray(x), csr, jnp.asarray(t1),
                        jnp.asarray(tk), interpret=True)
    expect = xla_reference(senders, receivers, attr, x, t1, tk, n)
    assert np.allclose(np.asarray(out), expect, atol=1e-4), \
        np.abs(np.asarray(out) - expect).max()


def test_forward_heavy_row():
    # one receiver with > TILE_E incoming edges exercises the chunk loop
    senders, receivers, attr, x, t1, tk = case(seed=1, e=900)
    receivers = np.sort(np.where(np.arange(900) < 400, 17,
                                 receivers)).astype(np.int32)
    n = x.shape[0]
    csr = build_csr(receivers, senders, attr, n)
    out = csr_khop_spmm(jnp.asarray(x), csr, jnp.asarray(t1),
                        jnp.asarray(tk), interpret=True)
    expect = xla_reference(senders, receivers, attr, x, t1, tk, n)
    assert np.allclose(np.asarray(out), expect, atol=1e-3), \
        np.abs(np.asarray(out) - expect).max()


def test_vjp_matches_xla_grads():
    senders, receivers, attr, x, t1, tk = case(seed=2, n=128, e=300)
    n = x.shape[0]
    csr = build_csr(receivers, senders, attr, n)
    csc = build_csc(receivers, senders, attr, n)

    def pallas_loss(x, t1, tk):
        out = khop_spmm(x, t1, tk, csr, csc, True)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                     .reshape(out.shape) * 0.01))

    def xla_loss(x, t1, tk):
        t1 = t1.at[0].set(0.0)
        tk = tk.at[0].set(0.0)
        a = jnp.asarray(attr)
        emb = jnp.concatenate([t1[a[:, :1]], tk[a[:, 1:]]], axis=1)
        msgs = (a > 0)[..., None] * x[jnp.asarray(senders)] + emb
        out = jax.ops.segment_sum(msgs, jnp.asarray(receivers),
                                  num_segments=n)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                     .reshape(out.shape) * 0.01))

    args = (jnp.asarray(x), jnp.asarray(t1), jnp.asarray(tk))
    gp = jax.grad(pallas_loss, argnums=(0, 1, 2))(*args)
    gx = jax.grad(xla_loss, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(gp, gx, ["dx", "dt1", "dtk"]):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3), \
            (name, np.abs(np.asarray(a) - np.asarray(b)).max())
