"""Pallas CSR k-hop SpMM: the sparse-path aggregation as a TPU kernel.

Computes, for receiver-sorted COO edges in CSR form,

    out[i, k, :] = sum over edges e with receiver(e) == i of
                   live(attr[e,k]) * x[sender(e), k, :] + emb_k(attr[e,k])

in one pass.  Design (see pallas_guide.md):

* grid over output row tiles (TILE_R receivers); the CSR indptr and the
  sender ids ride in as scalar-prefetch so each step knows its edge range
  and DMA targets before the body runs (PrefetchScalarGridSpec);
* sender rows stream HBM -> VMEM via grouped async DMAs (the gather);
* per-edge hop embeddings are computed in-kernel as
  one_hot(attr) @ table on the MXU — table row 0 is zeroed so the hop
  mask is free, and the (E, K, D) message tensor never materializes in
  HBM (the XLA path materializes it; this kernel is the memory-optimal
  form);
* the within-tile segment sum is one_hot(local_receiver)^T @ msgs on the
  MXU — no scatter anywhere.

The public entry `khop_spmm` wraps it in a custom VJP: dx reuses the same
kernel on the transpose graph (CSC layout built at batch time, zero
tables), table gradients are small dense matmuls left to XLA.

Reference semantics: layers/KPGIN.py:100,115-118 (masked message +
scatter-add); this kernel is its speed-of-light TPU form.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 128          # receiver rows per grid step
TILE_E = 128          # edges per inner chunk
DMA_GROUP = 16        # concurrent row DMAs


class CSR(NamedTuple):
    """Receiver-sorted edge layout (+ DMA slack rows at the tail)."""

    indptr: jnp.ndarray      # (N+1,) int32 — edge range per receiver row
    senders: jnp.ndarray     # (E_pad + slack,) int32
    receivers: jnp.ndarray   # (E_pad + slack,) int32 (for XLA-side grads)
    attr: jnp.ndarray        # (E_pad + slack, K) int32, 0 = hop absent


def _one_hot(codes: jnp.ndarray, V: int) -> jnp.ndarray:
    """TPU-safe one-hot (broadcasted_iota, no 1-D arange)."""
    iota = jax.lax.broadcasted_iota(
        jnp.int32, codes.shape + (V,), codes.ndim)
    return (codes[..., None] == iota).astype(jnp.float32)


def _kernel(indptr_ref, senders_ref, attr_hbm, x_hbm, starts_ref,
            t1_ref, tk_ref, out_ref, xbuf, attrbuf, sems, attr_sem):
    i = pl.program_id(0)
    r0 = i * TILE_R
    K = out_ref.shape[1]
    D = out_ref.shape[2]
    V1 = t1_ref.shape[0]
    Vk = tk_ref.shape[0]

    # edge range of this tile: two scalar reads from the prefetched indptr;
    # per-row starts arrive as a blocked (TILE_R, 1) vector input
    e_lo = indptr_ref[r0]
    e_hi = indptr_ref[r0 + TILE_R]
    row_starts = jnp.reshape(starts_ref[...], (1, TILE_R))   # (1, TILE_R)

    out_ref[...] = jnp.zeros_like(out_ref)
    n_chunks = pl.cdiv(e_hi - e_lo, TILE_E)

    def chunk_body(c, _):
        off = e_lo + c * TILE_E

        attr_dma = pltpu.make_async_copy(
            attr_hbm.at[pl.ds(off, TILE_E)], attrbuf, attr_sem)
        attr_dma.start()

        def dma_group(g, _):
            base = g * DMA_GROUP
            for j in range(DMA_GROUP):
                s = senders_ref[off + base + j]
                pltpu.make_async_copy(
                    x_hbm.at[s], xbuf.at[base + j], sems.at[j]).start()
            for j in range(DMA_GROUP):
                s = senders_ref[off + base + j]
                pltpu.make_async_copy(
                    x_hbm.at[s], xbuf.at[base + j], sems.at[j]).wait()
            return 0

        jax.lax.fori_loop(0, TILE_E // DMA_GROUP, dma_group, 0,
                          unroll=False)
        attr_dma.wait()

        attr = attrbuf[...]                                   # (TILE_E, K)

        # local receiver id of edge e in row r: starts are nondecreasing
        # and e < indptr[r0+r+1] <= every later start, so
        # local_recv = (number of row starts <= e) - 1
        eidx = off + jax.lax.broadcasted_iota(
            jnp.int32, (TILE_E, 1), 0)                        # (TILE_E, 1)
        local_recv = jnp.sum(
            (eidx >= row_starts).astype(jnp.int32),
            axis=1, keepdims=True) - 1                        # (TILE_E, 1)
        valid = (eidx < e_hi).astype(jnp.float32)             # (TILE_E, 1)
        ohr = _one_hot(local_recv[:, 0], TILE_R) * valid      # (TILE_E, TILE_R)

        # Mosaic matmul/reshape is 2-D: loop the (static, small) hop axis
        for k in range(K):
            ak = attr[:, k:k + 1]                             # (TILE_E, 1)
            table = t1_ref if k == 0 else tk_ref
            V = V1 if k == 0 else Vk
            emb_k = jnp.dot(_one_hot(ak[:, 0], V), table[...],
                            preferred_element_type=jnp.float32)  # (TILE_E, D)
            live_k = (ak > 0).astype(jnp.float32)             # (TILE_E, 1)
            msg_k = live_k * xbuf[:, k, :] + emb_k            # (TILE_E, D)
            partial = jax.lax.dot_general(
                ohr, msg_k,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (TILE_R, D)
            out_ref[:, k, :] += partial
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def csr_khop_spmm(x: jnp.ndarray, csr: CSR, table1: jnp.ndarray,
                  tablek: Optional[jnp.ndarray],
                  interpret: bool = False) -> jnp.ndarray:
    """out (N, K, D) = masked k-hop aggregation of x (N, K, D)."""
    n, K, D = x.shape
    assert n % TILE_R == 0, f"n_pad {n} must divide by {TILE_R}"
    t1 = table1.at[0].set(0.0)
    tk = (tablek.at[0].set(0.0) if tablek is not None
          else jnp.zeros((8, D), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // TILE_R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # attr (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),      # x (HBM)
            pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0)),  # row starts
            pl.BlockSpec(memory_space=pltpu.VMEM),     # table1
            pl.BlockSpec(memory_space=pltpu.VMEM),     # tablek
        ],
        out_specs=pl.BlockSpec(
            (TILE_R, K, D), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((TILE_E, K, D), jnp.float32),   # gathered rows
            pltpu.VMEM((TILE_E, K), jnp.int32),        # attr chunk
            pltpu.SemaphoreType.DMA((DMA_GROUP,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    row_starts = csr.indptr[:-1].reshape(n, 1)
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, K, D), jnp.float32),
        interpret=interpret,
    )(csr.indptr, csr.senders, csr.attr, x, row_starts, t1, tk)


def build_csr(receivers, senders, attr, n_nodes: int,
              slack: int = TILE_E) -> CSR:
    """Host-side CSR from receiver-sorted COO (+ DMA slack at the tail).

    Slack rows carry attr 0 / index 0, so chunk overreads contribute
    exactly zero (mask kills the x term, table row 0 kills the emb term).
    """
    receivers = np.asarray(receivers)
    senders = np.asarray(senders)
    attr = np.asarray(attr)
    indptr = np.searchsorted(receivers, np.arange(n_nodes + 1)).astype(np.int32)
    pad = ((0, slack),)
    return CSR(
        indptr=jnp.asarray(indptr),
        senders=jnp.asarray(np.pad(senders, pad).astype(np.int32)),
        receivers=jnp.asarray(np.pad(receivers, pad).astype(np.int32)),
        attr=jnp.asarray(np.pad(attr, (pad[0], (0, 0))).astype(np.int32)),
    )


def build_csc(receivers, senders, attr, n_nodes: int,
              slack: int = TILE_E) -> CSR:
    """Transpose layout: edges re-sorted by sender (for the backward
    gather of dout) — a CSR of the reversed graph."""
    senders = np.asarray(senders)
    order = np.argsort(senders, kind="stable")
    return build_csr(senders[order], np.asarray(receivers)[order],
                     np.asarray(attr)[order], n_nodes, slack)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def khop_spmm(x, table1, tablek, csr: CSR, csc: CSR,
              interpret: bool = False):
    """Differentiable k-hop SpMM; csc is the transpose layout for bwd."""
    return csr_khop_spmm(x, csr, table1, tablek, interpret=interpret)


def _fwd(x, table1, tablek, csr, csc, interpret):
    out = csr_khop_spmm(x, csr, table1, tablek, interpret=interpret)
    return out, (x, table1, tablek)


def _bwd(csr, csc, interpret, res, g):
    x, table1, tablek = res
    n, K, D = x.shape
    # dx[s] = sum over edges from s of live * g[receiver]: the same
    # aggregation on the transpose graph with zero embedding tables
    zero1 = jnp.zeros((2, D), jnp.float32)
    zerok = jnp.zeros((2, D), jnp.float32) if K > 1 else None
    dx = csr_khop_spmm(g, csc, zero1, zerok, interpret=interpret)

    # table grads: d table[v] = sum over (edge, hop) with attr == v of
    # g[receiver, hop, :].  Small dense matmuls in XLA.
    g_edges = g[csr.receivers]                           # (E', K, D)
    oh1 = jax.nn.one_hot(csr.attr[:, 0], table1.shape[0],
                         dtype=jnp.float32)
    d1 = (oh1.T @ g_edges[:, 0]).at[0].set(0.0)
    if tablek is not None:
        ohk = jax.nn.one_hot(csr.attr[:, 1:], tablek.shape[0],
                             dtype=jnp.float32)          # (E', K-1, Vk)
        dk = jnp.einsum("ekv,ekd->vd", ohk, g_edges[:, 1:]).at[0].set(0.0)
    else:
        dk = None
    return dx, d1, dk


khop_spmm.defvjp(_fwd, _bwd)
