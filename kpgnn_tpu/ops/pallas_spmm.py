"""Pallas CSR gather/segment-sum: the sparse k-hop aggregation on TPU.

The k-hop aggregate
    out[i, k, :] = sum_e live(attr[e,k]) * x[sender(e), k, :]
                 + sum_e emb_k(attr[e,k])          (receiver(e) == i)
splits into a data part and an embedding part.  The embedding part
depends only on *how many* edges of each attr code enter a node, so it is
a host-precomputed histogram matmul `counts @ table` (MXU, differentiable
in the tables for free).  The data part is a pure gather + segment-sum —
this module's Pallas kernel.

Two structural moves make the kernel MXU-shaped instead of
gather/scatter-shaped:

* one *filtered, receiver-sorted* CSR per hop (for the SPD kernel every
  union edge is live at exactly one hop, so the per-hop lists together
  are no larger than the original edge list) — the per-(edge,hop) mask
  disappears;
* both the gather and the scatter become one-hot matmuls:
      out_tile = one_hot(local_recv)^T @ (one_hot(sender) @ X)
  with X resident in VMEM.  A TPU reads a random 512-byte row from HBM at
  ~mu-s latency, so E row-DMAs are latency-bound; the one-hot contraction
  runs at MXU rate and wins by orders of magnitude for any batch whose
  node table fits VMEM (asserted).

Grid: output row tiles; CSR indptr rides in as scalar prefetch
(PrefetchScalarGridSpec); per-tile edge segments are host-padded to
TILE_E multiples with null edges (sender = last padding row, forced zero)
so sender chunks are lane-aligned rows of a 2-D array.

Backward: dx is the same kernel on the transpose (sender-sorted) CSR.

Reference semantics: layers/KPGIN.py:100,115-118 (masked message +
scatter-add inside PyG MessagePassing).
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 128          # receiver rows per grid step
TILE_E = 128          # edges per inner chunk
VMEM_X_LIMIT = 8 * 1024 * 1024   # max bytes of node table kept in VMEM


@struct.dataclass
class HopCSR:
    """One hop's live edges, receiver-sorted, tile-aligned."""

    indptr: jnp.ndarray        # (N+1,) int32 into the padded edge list
    senders2d: jnp.ndarray     # (E_pad/TILE_E, TILE_E) int32
    row_starts: jnp.ndarray    # (N, 1) int32 == indptr[:-1]
    row_ends: jnp.ndarray      # (N, 1) int32 == indptr[1:]
    # per receiver tile: 128-aligned start of the sender-id window that
    # covers every live edge of the tile.  Batches are graph-sorted and
    # edges intra-graph, so the window is ~TILE_R + one graph instead of
    # the whole node table — the gather one-hot contraction shrinks from
    # (TILE_E, N) to (TILE_E, win_rows), cutting MXU work by N/win_rows.
    win_lo: jnp.ndarray        # (n_tiles,) int32
    # static: a traced chunk bound would lower to Mosaic's serializing
    # while-loop (see _kernel)
    max_chunks: int = struct.field(pytree_node=False)
    win_rows: int = struct.field(pytree_node=False)   # static window size
    # tile geometry this CSR was built for (tile_e is also encoded in
    # senders2d.shape[1]); both must be multiples of 128 — lane width for
    # the edge axis, and the window-start `pl.multiple_of` hint for rows
    tile_r: int = struct.field(pytree_node=False, default=TILE_R)


def _buf_rows(max_chunks: int) -> int:
    """Scratch height for one tile's bulk sender DMA: max_chunks rounded
    up to 8 sublanes (Mosaic dynamic-slice alignment).  _build_one pads
    senders2d with this many null tail rows so the copy stays in
    bounds."""
    return max(8, ((max_chunks + 7) // 8) * 8)


def _one_hot(codes: jnp.ndarray, V: int) -> jnp.ndarray:
    """TPU-safe one-hot (broadcasted_iota, no 1-D arange)."""
    iota = jax.lax.broadcasted_iota(
        jnp.int32, codes.shape + (V,), codes.ndim)
    return (codes[..., None] == iota).astype(jnp.float32)


def _kernel(max_chunks, precision, win_rows, col_off, tile_r, tile_e,
            indptr_ref, wlo_ref,
            senders2d_hbm, x_ref, starts_ref, ends_ref, out_ref, sbuf, sem):
    # CRITICAL Mosaic behavior (measured): a fori_loop with a *traced*
    # trip count lowers to a serializing while-loop at ~1 ms/iteration;
    # the same body under a static python loop with pl.when predication
    # runs at ~8 us/iteration.  So the chunk count is a static bound and
    # empty chunks are predicated off.
    i = pl.program_id(0)
    r0 = i * tile_r
    e_lo = indptr_ref[r0]              # multiple of tile_e by construction
    e_hi = indptr_ref[r0 + tile_r]
    w_lo = pl.multiple_of(wlo_ref[i], 128)   # w_lo + win_rows <= N
    starts_col = starts_ref[...]                              # (tile_r, 1)
    ends_col = ends_ref[...]                                  # (tile_r, 1)

    out_ref[...] = jnp.zeros_like(out_ref)

    # ONE bulk DMA per output tile: all of this tile's sender chunks
    # land in sbuf up front (rows past e_hi are the null rows _build_one
    # appends).  The previous per-chunk (1, tile_e) copies paid an HBM
    # round-trip latency *inside* every loop iteration; batching them
    # turns max_chunks blocking waits into one.
    row0 = e_lo // tile_e
    dma = pltpu.make_async_copy(
        senders2d_hbm.at[pl.ds(row0, sbuf.shape[0]), :], sbuf, sem)
    dma.start()
    dma.wait()

    for c in range(max_chunks):
        off = e_lo + c * tile_e

        @pl.when(off < e_hi)
        def _():
            # sender gather as a one-hot matmul against this tile's
            # window of the VMEM-resident node table (row-DMA loops and
            # dynamic VMEM loads are latency-bound; this rides the MXU)
            # col_off shifts sender ids into this node-table shard's local
            # row range; senders outside [w_lo, w_lo + win_rows) miss
            # every iota column and contribute zero (that is also the
            # streaming fallback's masking and the null-padding path)
            codes_col = (jnp.transpose(sbuf[pl.ds(c, 1), :])
                         - col_off - w_lo)                    # (tile_e, 1)
            s_oh = (codes_col == jax.lax.broadcasted_iota(
                jnp.int32, (tile_e, win_rows), 1)).astype(jnp.float32)
            sx = jax.lax.dot_general(
                s_oh, x_ref[pl.ds(w_lo, win_rows), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)           # (tile_e, D)

            # receiver membership as a pure elementwise range test —
            # row r owns edges [indptr[r], indptr[r+1]); no cross-lane
            # reductions anywhere in the kernel
            eidx = off + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_e), 1)                    # (1, tile_e)
            ohr_t = ((eidx >= starts_col) & (eidx < ends_col)
                     ).astype(jnp.float32)                    # (tile_r,tile_e)
            out_ref[...] += jax.lax.dot_general(
                ohr_t, sx,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)


def gather_segment_sum(x: jnp.ndarray, csr: HopCSR,
                       interpret: Optional[bool] = None,
                       precision=jax.lax.Precision.DEFAULT) -> jnp.ndarray:
    """out[i, :] = sum of x[sender(e), :] over csr edges with receiver i.

    x: (N, D) float32, N % csr.tile_r == 0.  Row N-1 must be a padding
    slot (it is zeroed here — null alignment edges point at it).  The
    feature dim pads to the 128-lane tile internally.
    """
    if interpret is None:
        # Mosaic only lowers on TPU; on CPU run the kernel in interpret
        # mode so --backend pallas stays debuggable everywhere
        interpret = jax.default_backend() == "cpu"
    tile_r = csr.tile_r
    tile_e = csr.senders2d.shape[1]
    n, D_in = x.shape
    D = ((D_in + 127) // 128) * 128
    assert n % tile_r == 0, f"n_pad {n} must divide by {tile_r}"
    x = x.at[n - 1].set(0.0)
    if D != D_in:
        x = jnp.pad(x, ((0, 0), (0, D - D_in)))

    def call(x_shard, col_off, wlo, win_rows):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n // tile_r,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),               # senders2d
                pl.BlockSpec(memory_space=pltpu.VMEM),           # x shard
                pl.BlockSpec((tile_r, 1), lambda i, *_: (i, 0)),  # row starts
                pl.BlockSpec((tile_r, 1), lambda i, *_: (i, 0)),  # row ends
            ],
            out_specs=pl.BlockSpec((tile_r, D), lambda i, *_: (i, 0)),
            scratch_shapes=[
                # all sender chunks of one tile, bulk-DMA'd per grid step;
                # rounded to 8 sublanes (Mosaic slice alignment) — must
                # match the null-row padding in _build_one
                pltpu.VMEM((_buf_rows(csr.max_chunks), tile_e), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel, csr.max_chunks, precision,
                              win_rows, col_off, tile_r, tile_e),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, D), jnp.float32),
            interpret=interpret,
        )(csr.indptr, wlo, csr.senders2d, x_shard,
          csr.row_starts, csr.row_ends)

    if n * D * 4 <= VMEM_X_LIMIT:
        out = call(x, 0, csr.win_lo, min(csr.win_rows, n))
    else:
        # streaming fallback: keep one node-table shard in VMEM at a time;
        # out-of-shard senders vanish from the one-hot, so the per-shard
        # outputs just sum (windows disabled: window/shard intersection
        # bookkeeping is not worth it on this slow path)
        rows = max(tile_r, (VMEM_X_LIMIT // (D * 4)) // tile_r * tile_r)
        zero = jnp.zeros_like(csr.win_lo)
        out = sum(call(x[s:s + rows], s, zero, min(rows, n - s))
                  for s in range(0, n, rows))
    return out[:, :D_in] if D != D_in else out


def _build_one(receivers, senders, n_nodes, tile_r=TILE_R,
               tile_e=TILE_E, aux=()) -> HopCSR:
    """Receiver-sorted CSR whose per-row-tile edge segments are padded to
    TILE_E multiples with null edges (sender = n_nodes-1, contribution
    forced to zero by the kernel).

    `aux`: optional [(array, pad_value), ...] of per-edge metadata sorted
    and padded alongside the senders; returns (csr, [flat_aux, ...]) then.
    """
    assert tile_r % 128 == 0 and tile_e % 128 == 0, (tile_r, tile_e)
    order = np.argsort(receivers, kind="stable")
    receivers = np.asarray(receivers)[order]
    senders = np.asarray(senders)[order]
    aux = [(np.asarray(a)[order], pad) for a, pad in aux]
    raw_indptr = np.searchsorted(receivers, np.arange(n_nodes + 1))

    n_tiles = n_nodes // tile_r
    seg_senders: List[np.ndarray] = []
    seg_aux: List[List[np.ndarray]] = [[] for _ in aux]
    # vectorized tile bookkeeping (this runs per batch per hop per
    # direction — python-per-row loops were the collate hot spot)
    tile_lo = raw_indptr[:-1:tile_r]                        # (n_tiles,)
    tile_hi = raw_indptr[tile_r::tile_r]                    # (n_tiles,)
    seg_len = tile_hi - tile_lo
    pad_len = (-seg_len) % tile_e
    starts_padded = np.zeros(n_tiles, np.int64)
    if n_tiles:
        starts_padded[1:] = np.cumsum(seg_len + pad_len)[:-1]
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    shift = (starts_padded - tile_lo)                       # per tile
    indptr[:n_nodes] = raw_indptr[:n_nodes] + np.repeat(shift, tile_r)
    pos = int((seg_len + pad_len).sum())
    indptr[n_nodes] = pos
    # per-tile sender window (graph-sorted batches make these narrow)
    wlo_raw = np.zeros(n_tiles, np.int64)
    wspan = np.zeros(n_tiles, np.int64)
    for t in range(n_tiles):
        seg = senders[tile_lo[t]:tile_hi[t]]
        if len(seg):
            wlo_raw[t] = (int(seg.min()) // tile_r) * tile_r
            wspan[t] = int(seg.max()) + 1 - wlo_raw[t]
        seg_senders.append(seg)
        if pad_len[t]:
            seg_senders.append(np.full(pad_len[t], n_nodes - 1,
                                       senders.dtype))
        for j, (a, pv) in enumerate(aux):
            seg_aux[j].append(a[tile_lo[t]:tile_hi[t]])
            if pad_len[t]:
                seg_aux[j].append(np.full(pad_len[t], pv, a.dtype))
    win_rows = int(min(n_nodes,
                       max(tile_r, -(-int(wspan.max()) // tile_r) * tile_r)
                       if n_tiles else tile_r))
    win_lo = np.minimum(wlo_raw, n_nodes - win_rows)
    flat = (np.concatenate(seg_senders) if seg_senders
            else np.zeros(0, np.int64))
    flat_aux = [np.concatenate(s) if s else np.zeros(0, np.int64)
                for s in seg_aux]
    if len(flat) == 0:
        flat = np.full(tile_e, n_nodes - 1, np.int64)
        flat_aux = [np.full(tile_e, pv, np.int64) for _, pv in aux]
        pos = tile_e
        indptr[n_nodes] = 0
    # tile t's padded segment length = next tile start - this tile start
    starts = [int(indptr[t * tile_r]) for t in range(n_tiles)] + [int(pos)]
    max_chunks = max(max(
        (starts[t + 1] - starts[t]) // tile_e for t in range(n_tiles)), 1)
    # null tail rows so every tile's bulk sender DMA window
    # [e_lo/tile_e, e_lo/tile_e + _buf_rows(max_chunks)) is in bounds —
    # the kernel copies the full scratch height regardless of e_hi
    extra = _buf_rows(max_chunks) * tile_e
    flat = np.concatenate([flat, np.full(extra, n_nodes - 1, np.int64)])
    flat_aux = [np.concatenate([a, np.full(extra, pv, np.int64)])
                for a, (_, pv) in zip(flat_aux, aux)]
    csr = HopCSR(
        indptr=jnp.asarray(indptr.astype(np.int32)),
        senders2d=jnp.asarray(flat.astype(np.int32).reshape(-1, tile_e)),
        row_starts=jnp.asarray(indptr[:-1].astype(np.int32)
                               .reshape(n_nodes, 1)),
        row_ends=jnp.asarray(indptr[1:].astype(np.int32)
                             .reshape(n_nodes, 1)),
        win_lo=jnp.asarray(win_lo.astype(np.int32)),
        max_chunks=max_chunks,
        win_rows=win_rows,
        tile_r=tile_r,
    )
    if aux:
        return csr, [jnp.asarray(a.astype(np.int32)) for a in flat_aux]
    return csr


@struct.dataclass
class KHopPallasPlan:
    """Per-hop forward/backward CSRs + embedding count histograms.

    Doubles as a GraphBatch adjacency backend ("pallas" collate mode).
    """

    fwd: Tuple[HopCSR, ...]         # per hop, receiver-sorted live edges
    bwd: Tuple[HopCSR, ...]         # per hop, sender-sorted (transpose)
    counts1: jnp.ndarray            # (N, V1) hop-1 attr histogram
    countsk: Optional[jnp.ndarray]  # (N, K-1, Vk) | None
    # per hop, aligned with fwd[k].senders2d.reshape(-1): receiver id and
    # attr code of every padded edge (pad: receiver N-1, code 0) — only
    # needed for sender-scaled embeddings (GCN norm)
    hop_recv: Tuple[jnp.ndarray, ...] = ()
    hop_code: Tuple[jnp.ndarray, ...] = ()
    # (N,) union in-degree over real edges regardless of hop mask (the
    # reference's PyG mean denominator); slice_hops keeps it because the
    # union edge list does not shrink when hop columns are sliced
    union_deg: Optional[jnp.ndarray] = None
    # (N, K) per-hop live in-degree (CSR row extents are tile-padded on
    # the last row of each tile, so the exact counts are stored directly)
    hop_deg: Optional[jnp.ndarray] = None

    @property
    def K(self) -> int:
        return len(self.fwd)

    def slice_hops(self, k: int) -> "KHopPallasPlan":
        return KHopPallasPlan(
            fwd=self.fwd[:k], bwd=self.bwd[:k],
            counts1=self.counts1,
            countsk=(self.countsk[:, :k - 1] if k > 1 else None),
            hop_recv=self.hop_recv[:k], hop_code=self.hop_code[:k],
            union_deg=self.union_deg,
            hop_deg=(self.hop_deg[:, :k]
                     if self.hop_deg is not None else None),
        )

    def degree(self) -> jnp.ndarray:
        return self.hop_deg


def build_plan(receivers, senders, attr, n_nodes: int, v1: int, vk: int,
               tile_r: int = TILE_R, tile_e: int = TILE_E
               ) -> KHopPallasPlan:
    """Host-side plan: filter live edges per hop, sort both directions,
    histogram attr codes per receiver.  tile_r sets the kernel's grid
    geometry (multiple of 128; sweepable for throughput tuning — n_pad
    must divide by tile_r).

    tile_e is hardware-constrained to 128: the kernel DMAs one senders2d
    row per chunk, and Mosaic only lowers a dynamic 1-sublane HBM slice
    when the row spans exactly one (8, 128) lane tile — wider rows fail
    with "Slice shape along dimension 0 must be aligned to tiling (8)"
    (measured on v5e; interpret mode accepts them, so the constraint is
    enforced here, at build time)."""
    if tile_e != 128 and jax.default_backend() != "cpu":
        raise ValueError(
            f"tile_e={tile_e}: Mosaic only lowers 128-wide sender rows "
            "(single lane tile) for the chunk DMA; sweep tile_r instead")
    receivers = np.asarray(receivers)
    senders = np.asarray(senders)
    attr = np.asarray(attr)
    K = attr.shape[1]
    fwd, bwd, hop_recv, hop_code = [], [], [], []
    for k in range(K):
        live = attr[:, k] > 0
        r, s = receivers[live], senders[live]
        c = np.clip(attr[live, k], 0, (v1 if k == 0 else vk) - 1)
        csr, (rf, cf) = _build_one(r, s, n_nodes, tile_r, tile_e,
                                   aux=[(r, n_nodes - 1), (c, 0)])
        fwd.append(csr)
        hop_recv.append(rf)
        hop_code.append(cf)
        bwd.append(_build_one(s, r, n_nodes, tile_r, tile_e))
    counts1 = np.zeros((n_nodes, v1), np.float32)
    np.add.at(counts1, (receivers, np.clip(attr[:, 0], 0, v1 - 1)), 1.0)
    counts1[:, 0] = 0.0
    countsk = None
    if K > 1:
        countsk = np.zeros((n_nodes, K - 1, vk), np.float32)
        for k in range(1, K):
            np.add.at(countsk[:, k - 1],
                      (receivers, np.clip(attr[:, k], 0, vk - 1)), 1.0)
        countsk[:, :, 0] = 0.0
    union_deg = np.bincount(receivers, minlength=n_nodes).astype(np.float32)
    hop_deg = np.stack(
        [np.bincount(receivers[attr[:, k] > 0], minlength=n_nodes)
         for k in range(K)], axis=1).astype(np.float32)
    return KHopPallasPlan(
        fwd=tuple(fwd), bwd=tuple(bwd),
        counts1=jnp.asarray(counts1),
        countsk=jnp.asarray(countsk) if countsk is not None else None,
        hop_recv=tuple(hop_recv), hop_code=tuple(hop_code),
        union_deg=jnp.asarray(union_deg),
        hop_deg=jnp.asarray(hop_deg),
    )


@jax.custom_vjp
def _gather_segment(x, csr_fwd: HopCSR, csr_bwd: HopCSR):
    # csr args are traced batch data under jit, so they sit in regular
    # (differentiable) positions; their cotangents are float0 (ints).
    return gather_segment_sum(x, csr_fwd)


def _float0_like(csr: HopCSR) -> HopCSR:
    return jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), csr)


def _gs_fwd(x, csr_fwd, csr_bwd):
    return gather_segment_sum(x, csr_fwd), (csr_fwd, csr_bwd)


def _gs_bwd(res, g):
    csr_fwd, csr_bwd = res
    dx = gather_segment_sum(g, csr_bwd)
    return dx, _float0_like(csr_fwd), _float0_like(csr_bwd)


_gather_segment.defvjp(_gs_fwd, _gs_bwd)


def _weighted_counts(plan: KHopPallasPlan, k: int, s_col: jnp.ndarray,
                     V: int) -> jnp.ndarray:
    """(N, V) histogram of hop-k attr codes weighted by the sender-side
    scale: W[i, v] = sum over live hop-k edges e -> i with code v of
    s_col[sender(e)].  Padding edges carry code 0, killed by the zeroed
    table row downstream."""
    n = s_col.shape[0]
    senders_flat = plan.fwd[k].senders2d.reshape(-1)
    s_e = s_col[senders_flat]
    idx = plan.hop_recv[k] * V + plan.hop_code[k]
    return jax.ops.segment_sum(s_e, idx, num_segments=n * V
                               ).reshape(n, V)


def khop_spmm(x: jnp.ndarray, table1: jnp.ndarray,
              tablek: Optional[jnp.ndarray],
              plan: KHopPallasPlan,
              *,
              scale: Optional[jnp.ndarray] = None,         # (N, K) s_i
              sender_scale: Optional[jnp.ndarray] = None,  # (N, K) s_j
              aggr: str = "add") -> jnp.ndarray:
    """Full differentiable k-hop aggregation via the Pallas kernel.

    x: (N, K, D); returns (N, K, D).  Matches ops.adjacency's
    khop_aggregate_adj on the COO backend, including GCN's factored
    s_i * s_j norm (sender side pre-scales the gathered table, receiver
    side post-scales the output) and SAGE's union-denominator mean.
    """
    n, K, D = x.shape
    if sender_scale is not None:
        x = x * sender_scale[..., None]
    outs = [
        _gather_segment(x[:, k, :], plan.fwd[k], plan.bwd[k])
        for k in range(K)
    ]
    out = jnp.stack(outs, axis=1)                              # (N, K, D)
    t1 = table1.at[0].set(0.0)
    hi = jax.lax.Precision.HIGHEST     # counts are exact integers; keep f32
    if sender_scale is None:
        emb = jnp.matmul(plan.counts1, t1, precision=hi)       # (N, D)
        if tablek is not None and K > 1:
            tk = tablek.at[0].set(0.0)
            embk = jnp.einsum("nkv,vd->nkd", plan.countsk, tk,
                              precision=hi)                    # (N, K-1, D)
            emb_all = jnp.concatenate([emb[:, None], embk], axis=1)
        else:
            emb_all = emb[:, None]
    else:
        # counts were built unweighted; rebuild per hop weighted by s_j
        # (scalar scatter per edge, then the table matmul rides the MXU)
        w1 = _weighted_counts(plan, 0, sender_scale[:, 0], t1.shape[0])
        parts = [jnp.matmul(w1, t1, precision=hi)[:, None]]
        if tablek is not None and K > 1:
            tk = tablek.at[0].set(0.0)
            for k in range(1, K):
                wk = _weighted_counts(plan, k, sender_scale[:, k],
                                      tk.shape[0])
                parts.append(jnp.matmul(wk, tk, precision=hi)[:, None])
        emb_all = jnp.concatenate(parts, axis=1)
    out = out + emb_all
    if scale is not None:
        out = out * scale[..., None]
    if aggr == "mean":
        out = out / jnp.maximum(plan.union_deg, 1.0)[:, None, None]
    elif aggr != "add":
        raise ValueError(f"pallas backend does not support aggr={aggr!r}")
    return out
