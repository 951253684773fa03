"""Pallas CSR gather/segment-sum: the sparse k-hop aggregation on TPU.

The k-hop aggregate
    out[i, k, :] = sum_e live(attr[e,k]) * x[sender(e), k, :]
                 + sum_e emb_k(attr[e,k])          (receiver(e) == i)
splits into a data part and an embedding part.  The embedding part
depends only on *how many* edges of each attr code enter a node, so it is
a host-precomputed histogram matmul `counts @ table` (MXU, differentiable
in the tables for free).  The data part is a pure gather + segment-sum —
this module's Pallas kernel.

Three structural moves make the kernel MXU-shaped instead of
gather/scatter-shaped:

* **hop fusion** — all K hops live in one CSR over a hop-major virtual
  row space of size K*N (hop-k edge s -> r becomes k*N+s -> k*N+r), so
  one kernel dispatch covers the whole aggregation instead of K
  dispatches forward + K backward per layer (for the SPD kernel every
  union edge is live at exactly one hop, so the fused edge list is no
  larger than the union edge list);
* both the gather and the scatter become **one-hot matmuls**:
      out_tile = one_hot(local_recv)^T @ (one_hot(sender) @ X_window)
  A TPU reads a random 512-byte row from HBM at ~mu-s latency, so E
  row-DMAs are latency-bound; the one-hot contraction runs at MXU rate;
* all HBM traffic (sender-id chunks and the per-tile node-table window)
  is **double-buffered across grid steps**: tile i+1's copies start
  before tile i's matmuls, so the DMA latency hides behind compute.
  The node table itself stays in HBM — per-tile windows are the only
  VMEM residency, which removes any node-table size limit.

Per-tile work is proportional to the tile's *own* sender-window span
(predicated window sub-blocks of `wblock` rows), not to a global
max-window: one tile straddling a graph boundary no longer inflates
every tile's contraction width.

Grid: output row tiles; CSR indptr rides in as scalar prefetch
(PrefetchScalarGridSpec); per-tile edge segments are host-padded to
TILE_E multiples with null edges (sender = one past the table, landing
in the kernel's zero overhang rows) so sender chunks are lane-aligned
rows of a 2-D array.  Receiver and sender spaces may differ (rectangular
gather): the node-sharded backend scatters to owned rows only while
gathering from the halo-extended table.

Backward: dx is the same kernel on the transpose (sender-sorted) CSR.

Reference semantics: layers/KPGIN.py:100,115-118 (masked message +
scatter-add inside PyG MessagePassing).
"""
from __future__ import annotations

import functools
import os
import warnings
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 128          # receiver rows per grid step
TILE_E = 128          # edges per inner chunk
WBLOCK = 512          # sender-window rows per predicated sub-block
EGROUP = 4            # chunks fused per matmul pair
# (tile_r=256, wblock=512, egroup=4 measured optimal on v5e for molecule
# batches — 160.8M union-edges/s fwd; tile_r defaults to 128 only so
# n_pad geometry stays stable for small fixtures.  scripts/tune_pallas.py
# re-measures on new hardware.)
# double-buffered scratch budget (sender chunks + x windows);
# VMEM is ~16 MB/core and the pipeline also holds in/out blocks
VMEM_SCRATCH_LIMIT = 10 * 1024 * 1024
# node tables at most this big stay fully VMEM-resident (no window DMA)
VMEM_X_RESIDENT_LIMIT = 9 * 1024 * 1024
# degree-skew (hub) caps: a tile may keep at most SPILL_CHUNK_ROWS
# 128-edge sender chunks and SPILL_WBLOCKS window sub-blocks on the
# kernel path; edges beyond either cap spill to a COO side list that
# gather_segment_sum adds with one XLA segment-sum.  Normal graph-sorted
# batches sit far below both caps (typ. <= 32 chunks, <= 3 blocks); the
# caps bound BOTH the VMEM scratch and the kernel's unrolled body count
# ((chunks/egroup) * wblocks predicated matmul pairs — a 10k-in-edge hub
# without caps compiled to ~1.5k bodies and minutes of Mosaic time).
SPILL_CHUNK_ROWS = int(os.environ.get("KPGNN_SPILL_CHUNK_ROWS", "64"))
SPILL_WBLOCKS = int(os.environ.get("KPGNN_SPILL_WBLOCKS", "8"))


@struct.dataclass
class HopCSR:
    """Fused-hop live edges, receiver-sorted, tile-aligned.

    Rows live in the hop-major virtual space [0, n_hops * n_nodes); row
    k*N + i is node i's hop-k slot.  Receiver (output) and sender (input)
    spaces may differ (`n_rows` vs `n_cols` — the node-sharded backend
    gathers from a halo-extended table while scattering only to owned
    rows).  Null alignment edges point at row `n_cols`, one past the
    sender table — the kernel pads x with `wblock` zero rows, so they
    contribute nothing."""

    indptr: jnp.ndarray        # (R+1,) int32 into the padded edge list
    senders2d: jnp.ndarray     # (E_pad/TILE_E, TILE_E) int32
    row_starts: jnp.ndarray    # (R, 1) int32 == indptr[:-1]
    row_ends: jnp.ndarray      # (R, 1) int32 == indptr[1:]
    # per receiver tile: 128-aligned start of the sender-id window that
    # covers every live edge of the tile, and the number of wblock-row
    # sub-blocks the kernel must contract for this tile.  Batches are
    # graph-sorted and edges intra-graph, so windows are ~TILE_R + one
    # graph instead of the whole node table — and each tile only pays
    # for its own span.
    win_lo: jnp.ndarray        # (n_tiles,) int32
    win_blk: jnp.ndarray       # (n_tiles,) int32
    # static: a traced chunk bound would lower to Mosaic's serializing
    # while-loop (see _kernel)
    max_chunks: int = struct.field(pytree_node=False)
    max_wblocks: int = struct.field(pytree_node=False)
    wblock: int = struct.field(pytree_node=False, default=WBLOCK)
    # chunks fused per matmul pair: the sender contraction becomes
    # (egroup*tile_e, wblock) @ (wblock, D) — bigger matmuls lift MXU
    # utilization out of the small-matmul regime at the cost of more
    # null-edge padding per tile (segments pad to egroup*tile_e)
    egroup: int = struct.field(pytree_node=False, default=1)
    # tile geometry (tile_e is also encoded in senders2d.shape[1]); both
    # must be multiples of 128 — lane width for the edge axis, and the
    # window-start `pl.multiple_of` hint for rows
    tile_r: int = struct.field(pytree_node=False, default=TILE_R)
    # sender-table rows (x.shape[0]); 0 means "same as n_rows" (square)
    n_cols_static: int = struct.field(pytree_node=False, default=0)
    # padded-edge offset at each hop boundary (indptr[(k+1)*N]); lets
    # slice_hops cut the flat arrays with static shapes
    hop_ends: Tuple[int, ...] = struct.field(pytree_node=False,
                                             default=())
    # degree-skew spill: edges a hub tile could not keep on the kernel
    # path (beyond SPILL_CHUNK_ROWS chunks or SPILL_WBLOCKS window
    # blocks) as a plain COO list; gather_segment_sum adds them with one
    # XLA segment-sum.  None for the (typical) spill-free plan.  Row-
    # sorted, so slice_hops can cut a static prefix via spill_hop_ends.
    spill_senders: Optional[jnp.ndarray] = None    # (S,) int32
    spill_rows: Optional[jnp.ndarray] = None       # (S,) int32
    spill_hop_ends: Tuple[int, ...] = struct.field(pytree_node=False,
                                                   default=())

    @property
    def n_rows(self) -> int:
        return self.row_starts.shape[0]

    @property
    def n_cols(self) -> int:
        return self.n_cols_static or self.n_rows


def _buf_rows(max_chunks: int) -> int:
    """Scratch height for one tile's sender-chunk window: max_chunks
    rounded up to 8 sublanes (Mosaic dynamic-slice alignment).
    _build_one pads senders2d with this many null tail rows so the
    copies stay in bounds."""
    return max(8, ((max_chunks + 7) // 8) * 8)


def _kernel(max_chunks, max_wblocks, wblock, precision, tile_r, tile_e,
            egroup, x_resident,
            indptr_ref, wlo_ref, wblk_ref,
            senders2d_hbm, x_hbm, starts_ref, ends_ref, out_ref,
            *scratch):
    # CRITICAL Mosaic behavior (measured): a fori_loop with a *traced*
    # trip count lowers to a serializing while-loop at ~1 ms/iteration;
    # the same body under a static python loop with pl.when predication
    # runs orders of magnitude faster.  So every loop below has a static
    # bound and empty iterations are predicated off.
    if x_resident:
        sbuf, ssem = scratch
        xbuf = xsem = None
    else:
        sbuf, xbuf, ssem, xsem = scratch
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    buf = sbuf.shape[0] // 2           # sender rows per slot
    n_sb = buf // 8                    # 8-row sender sub-copies per slot
    xrows = 0 if x_resident else xbuf.shape[0] // 2  # window rows per slot

    def tile_dmas(slot, t):
        """The (copy, live-predicate) list for tile t into buffer slot
        `slot` — reconstructed identically at start and wait time."""
        r0 = t * tile_r
        e_lo = indptr_ref[r0]
        chunks = (indptr_ref[r0 + tile_r] - e_lo) // tile_e
        nsb = (chunks + 7) // 8
        row0 = e_lo // tile_e
        s_off = slot * buf
        dmas = [(pltpu.make_async_copy(
                    senders2d_hbm.at[pl.ds(row0 + sb * 8, 8), :],
                    sbuf.at[pl.ds(s_off + sb * 8, 8), :],
                    ssem.at[slot, sb]), sb < nsb)
                for sb in range(n_sb)]
        if not x_resident:
            # node table in HBM: copy this tile's window blocks too
            w_lo = pl.multiple_of(wlo_ref[t], 128)
            nb = wblk_ref[t]
            x_off = slot * xrows
            dmas += [(pltpu.make_async_copy(
                        x_hbm.at[pl.ds(w_lo + b * wblock, wblock), :],
                        xbuf.at[pl.ds(x_off + b * wblock, wblock), :],
                        xsem.at[slot, b]), b < nb)
                     for b in range(max_wblocks)]
        return dmas

    def start_tile(slot, t):
        for dma, live in tile_dmas(slot, t):
            pl.when(live)(dma.start)

    def wait_tile(slot, t):
        for dma, live in tile_dmas(slot, t):
            pl.when(live)(dma.wait)

    slot = jax.lax.rem(i, 2)

    # double-buffer: tile i+1's sender chunks and x window start copying
    # before tile i's matmuls run, so every step's DMA latency hides
    # behind the previous step's compute (except the warm-up tile)
    @pl.when(i == 0)
    def _():
        start_tile(0, 0)

    @pl.when(i + 1 < nt)
    def _():
        start_tile(jax.lax.rem(i + 1, 2), i + 1)

    wait_tile(slot, i)

    r0 = i * tile_r
    e_lo = indptr_ref[r0]              # multiple of tile_e by construction
    e_hi = indptr_ref[r0 + tile_r]
    w_lo = pl.multiple_of(wlo_ref[i], 128)
    nb = wblk_ref[i]
    s_off = slot * buf
    x_off = slot * xrows
    starts_col = starts_ref[...]                              # (tile_r, 1)
    ends_col = ends_ref[...]                                  # (tile_r, 1)

    def x_block(b):
        # resident: slice the VMEM node table at the tile's window; DMA'd:
        # read the prefetched copy (block b sits at x_off + b*wblock)
        if x_resident:
            return x_hbm[pl.ds(w_lo + b * wblock, wblock), :]
        return xbuf[pl.ds(x_off + b * wblock, wblock), :]

    out_ref[...] = jnp.zeros_like(out_ref)

    ge = egroup * tile_e               # edges per matmul pair
    for c in range(max_chunks // egroup):
        off = e_lo + c * ge

        @pl.when(off < e_hi)
        def _(c=c, off=off):
            # sender gather as a one-hot matmul against this tile's
            # window of the node table, one wblock sub-block at a time —
            # per-tile cost is proportional to the tile's own span, not
            # to the widest tile in the batch.  Senders outside every
            # copied block miss all iota columns and contribute zero
            # (that is also the null-padding path).
            codes_col = jnp.concatenate(
                [jnp.transpose(sbuf[pl.ds(s_off + c * egroup + j, 1), :])
                 for j in range(egroup)], axis=0) - w_lo       # (ge, 1)
            # receiver membership as a pure elementwise range test —
            # row r owns edges [indptr[r], indptr[r+1]); no cross-lane
            # reductions anywhere in the kernel
            eidx = off + jax.lax.broadcasted_iota(
                jnp.int32, (1, ge), 1)                        # (1, ge)
            ohr_t = ((eidx >= starts_col) & (eidx < ends_col)
                     ).astype(jnp.float32)                    # (tile_r, ge)
            # everything below is a pure value chain (no scratch refs):
            # Mosaic keeps the intermediates in vregs and pipelines the
            # two matmuls per block — routing the sender gather through
            # a VMEM accumulator measured ~20% slower
            for b in range(max_wblocks):
                @pl.when(b < nb)
                def _(b=b):
                    xb = x_block(b)
                    cc = codes_col - b * wblock
                    s_oh = (cc == jax.lax.broadcasted_iota(
                        jnp.int32, (ge, wblock), 1)
                            ).astype(xb.dtype)   # exact in bf16 (0/1)
                    sx = jax.lax.dot_general(
                        s_oh, xb,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=precision,
                        preferred_element_type=jnp.float32)   # (tile_e, D)
                    out_ref[...] += jax.lax.dot_general(
                        ohr_t, sx,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=precision,
                        preferred_element_type=jnp.float32)


def gather_segment_sum(x: jnp.ndarray, csr: HopCSR,
                       interpret: Optional[bool] = None,
                       precision=jax.lax.Precision.DEFAULT) -> jnp.ndarray:
    """out[i, :] = sum of x[sender(e), :] over csr edges with receiver i.

    x: (csr.n_cols, D) float32; output is (csr.n_rows, D) with
    csr.n_rows % csr.tile_r == 0.  The feature dim pads to the 128-lane
    tile and the row dim gains `wblock` zero rows internally (window
    overhang; null alignment edges point at the first pad row).
    """
    if interpret is None:
        # Mosaic only lowers on TPU; on CPU run the kernel in interpret
        # mode so --backend pallas stays debuggable everywhere
        interpret = jax.default_backend() == "cpu"
    vma = frozenset().union(
        *(getattr(getattr(a, "aval", None), "vma", frozenset()) or
          frozenset() for a in (x, csr.indptr)))
    if interpret and vma:
        # inside shard_map(check_vma=True) the interpreter can't evaluate
        # the kernel body (program_id-derived indices carry no vma); the
        # jnp reference is semantically identical.  Compiled Mosaic
        # (real TPU) takes the kernel path.
        return _gather_reference(x, csr)
    tile_r = csr.tile_r
    tile_e = csr.senders2d.shape[1]
    n = csr.n_rows
    x_orig = x
    D_in = x.shape[1]
    D = ((D_in + 127) // 128) * 128
    assert n % tile_r == 0, f"n_rows {n} must divide by {tile_r}"
    assert x.shape[0] == csr.n_cols, (x.shape, csr.n_cols)
    # `wblock` zero overhang rows: per-tile windows are block-quantized,
    # so the last block of a tile near the table end may read past the
    # end (and null alignment edges point at the first pad row)
    x = jnp.pad(x, ((0, csr.wblock), (0, D - D_in)))
    if precision in (jax.lax.Precision.DEFAULT, None) and not interpret:
        # the MXU rounds f32 inputs to bf16 at DEFAULT precision anyway,
        # so bf16 storage is bit-identical while halving VMEM and DMA
        # (interpret mode keeps f32: CPU dots don't round, and tests
        # compare against f32 oracles)
        x = x.astype(jnp.bfloat16)
    xbytes = x.dtype.itemsize

    buf = _buf_rows(csr.max_chunks)
    # keep the whole node table VMEM-resident when it fits (no per-tile
    # window DMA at all — the hot path for molecule-scale batches);
    # otherwise it stays in HBM and per-tile windows are double-buffered
    x_resident = (n + csr.wblock) * D * xbytes <= VMEM_X_RESIDENT_LIMIT
    scratch_shapes = [pltpu.VMEM((2 * buf, tile_e), jnp.int32)]
    if not x_resident:
        scratch_shapes.append(
            pltpu.VMEM((2 * csr.max_wblocks * csr.wblock, D), x.dtype))
    scratch_shapes.append(pltpu.SemaphoreType.DMA((2, buf // 8)))
    if not x_resident:
        scratch_shapes.append(
            pltpu.SemaphoreType.DMA((2, csr.max_wblocks)))
    scratch_bytes = (2 * buf * tile_e * 4
                     + (0 if x_resident
                        else 2 * csr.max_wblocks * csr.wblock * D * xbytes))
    if scratch_bytes > VMEM_SCRATCH_LIMIT:
        # a single hub tile (huge edge segment or sender span) can blow
        # the double-buffered scratch budget; rather than fail the whole
        # train step, run this aggregation through the bit-compatible
        # XLA gather/segment-sum path and tell the user why it is slow.
        # (Fires at trace time — once per compiled shape, not per step.)
        warnings.warn(
            f"pallas plan scratch {scratch_bytes/2**20:.1f} MiB exceeds "
            f"{VMEM_SCRATCH_LIMIT/2**20:.0f} MiB (max_chunks="
            f"{csr.max_chunks}, max_wblocks={csr.max_wblocks}, "
            f"wblock={csr.wblock}, D={D}): one receiver tile has a huge "
            "edge segment or sender span — falling back to the XLA "
            "segment-sum path for this aggregation.  Reorder nodes "
            "(BFS/RCM) to shrink spans, raise wblock, or use the COO "
            "backend to avoid the fallback.", stacklevel=2)
        return _gather_reference(x_orig, csr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n // tile_r,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # senders2d
            pl.BlockSpec(memory_space=(pltpu.VMEM if x_resident
                                       else pl.ANY)),        # node table
            pl.BlockSpec((tile_r, 1), lambda i, *_: (i, 0)),  # row starts
            pl.BlockSpec((tile_r, 1), lambda i, *_: (i, 0)),  # row ends
        ],
        out_specs=pl.BlockSpec((tile_r, D), lambda i, *_: (i, 0)),
        # two slots each (double buffering): sender-id chunks and (HBM
        # mode) the node-table window; rank-2 with slot row offsets
        # (dynamic leading-index rank-3 addressing is shakier in Mosaic)
        scratch_shapes=scratch_shapes,
    )
    # under shard_map(check_vma=True) the output must declare how it
    # varies across mesh axes: exactly like its inputs (the node axis on
    # the sharded backend); outside shard_map vma stays unset
    out_shape = (jax.ShapeDtypeStruct((n, D), jnp.float32, vma=vma)
                 if vma else jax.ShapeDtypeStruct((n, D), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_kernel, csr.max_chunks, csr.max_wblocks,
                          csr.wblock, precision, tile_r, tile_e,
                          csr.egroup, x_resident),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(csr.indptr, csr.win_lo, csr.win_blk, csr.senders2d, x,
      csr.row_starts, csr.row_ends)
    out = _add_spill(out, x, csr)
    return out[:, :D_in] if D != D_in else out


def _add_spill(out: jnp.ndarray, x: jnp.ndarray, csr: HopCSR
               ) -> jnp.ndarray:
    """Add the hub-spill edges (the few a skewed tile could not keep on
    the kernel path) with one XLA gather + segment-sum.  `x` is the
    (already padded/cast) node table; spill rows are receiver-sorted."""
    if csr.spill_senders is None:
        return out
    gathered = x[csr.spill_senders].astype(out.dtype)
    return out + jax.ops.segment_sum(
        gathered, csr.spill_rows, num_segments=csr.n_rows,
        indices_are_sorted=True)


def _gather_reference(x: jnp.ndarray, csr: HopCSR) -> jnp.ndarray:
    """Pure-jnp semantics of the kernel (oracle + the shard_map interpret
    path): gather the padded edge list, assign each edge to the row whose
    [start, end) range contains it, segment-sum."""
    n = csr.n_rows
    sf = csr.senders2d.reshape(-1)
    e_pad = sf.shape[0]
    xp = jnp.pad(x, ((0, csr.wblock), (0, 0)))    # null senders -> zeros
    gathered = xp[sf]                             # (E_pad, D)
    eidx = jnp.arange(e_pad, dtype=jnp.int32)
    ends = csr.row_ends.reshape(-1)
    ids = jnp.searchsorted(ends, eidx, side="right").astype(jnp.int32)
    idc = jnp.clip(ids, 0, n - 1)
    valid = ((eidx >= csr.row_starts.reshape(-1)[idc])
             & (eidx < ends[idc]) & (ids < n))
    out = jax.ops.segment_sum(
        gathered * valid[:, None].astype(x.dtype), idc, num_segments=n)
    return _add_spill(out, x, csr)


def _build_one(receivers, senders, n_nodes, tile_r=TILE_R,
               tile_e=TILE_E, wblock=WBLOCK, egroup=1, aux=(),
               n_cols=None, hop_rows=0) -> HopCSR:
    """Receiver-sorted CSR whose per-row-tile edge segments are padded to
    TILE_E multiples with null edges (sender = n_cols, pointing into the
    kernel's zero overhang rows so they contribute nothing).

    `n_cols`: sender-table rows when different from the receiver space
    (rectangular gather — the node-sharded halo-extended table).
    `aux`: optional [(array, pad_value), ...] of per-edge metadata sorted
    and padded alongside the senders; returns
    (csr, [flat_aux, ...], [spill_aux, ...]) then.
    `hop_rows`: receiver rows per hop (for the spill hop cut points used
    by slice_hops); 0 leaves spill_hop_ends empty.
    """
    assert tile_r % 128 == 0 and tile_e % 128 == 0, (tile_r, tile_e)
    assert wblock % 128 == 0, wblock
    if n_cols is None:
        n_cols = n_nodes
    order = np.argsort(receivers, kind="stable")
    receivers = np.asarray(receivers)[order]
    senders = np.asarray(senders)[order]
    aux = [(np.asarray(a)[order], pad) for a, pad in aux]
    raw_indptr = np.searchsorted(receivers, np.arange(n_nodes + 1))

    n_tiles = n_nodes // tile_r

    # ---- degree-skew spill (hub tiles) ----
    # cap each tile's kernel work: at most `ccap` sender-chunk rows and
    # `wcap` window sub-blocks; edges beyond either cap leave the kernel
    # path and are added by one XLA segment-sum instead (the caps bound
    # VMEM scratch AND the kernel's unrolled body count).  Removing
    # edges from a receiver-sorted list keeps it receiver-sorted, so the
    # row ranges below stay contiguous.
    ccap = max(egroup, (SPILL_CHUNK_ROWS // egroup) * egroup)
    wcap = max(1, SPILL_WBLOCKS)
    keep = np.ones(len(senders), dtype=bool)
    for t in range(n_tiles):
        lo, hi = raw_indptr[t * tile_r], raw_indptr[(t + 1) * tile_r]
        if hi - lo <= tile_e and hi > lo:
            # a tile this small cannot exceed the chunk cap; check only
            # its window span
            seg = senders[lo:hi]
            w0 = (int(seg.min()) // 128) * 128
            if int(seg.max()) < w0 + wcap * wblock:
                continue
        elif hi == lo:
            continue
        seg = senders[lo:hi]
        w0 = (int(seg.min()) // 128) * 128
        k = seg < w0 + wcap * wblock
        n_keep = int(k.sum())
        if n_keep > ccap * tile_e:
            idx = np.flatnonzero(k)
            k[idx[ccap * tile_e:]] = False
        keep[lo:hi] = k
    spill = None
    if not keep.all():
        sp = ~keep
        spill = (senders[sp].astype(np.int32),
                 receivers[sp].astype(np.int32),
                 [a[sp].astype(np.int32) for a, _ in aux])
        receivers = receivers[keep]
        senders = senders[keep]
        aux = [(a[keep], pad) for a, pad in aux]
        raw_indptr = np.searchsorted(receivers, np.arange(n_nodes + 1))
    seg_senders: List[np.ndarray] = []
    seg_aux: List[List[np.ndarray]] = [[] for _ in aux]
    # vectorized tile bookkeeping (this runs per batch per hop per
    # direction — python-per-row loops were the collate hot spot)
    tile_lo = raw_indptr[:-1:tile_r]                        # (n_tiles,)
    tile_hi = raw_indptr[tile_r::tile_r]                    # (n_tiles,)
    seg_len = tile_hi - tile_lo
    pad_len = (-seg_len) % (tile_e * egroup)
    starts_padded = np.zeros(n_tiles, np.int64)
    if n_tiles:
        starts_padded[1:] = np.cumsum(seg_len + pad_len)[:-1]
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    shift = (starts_padded - tile_lo)                       # per tile
    indptr[:n_nodes] = raw_indptr[:n_nodes] + np.repeat(shift, tile_r)
    pos = int((seg_len + pad_len).sum())
    indptr[n_nodes] = pos
    # per-tile sender window (graph-sorted batches make these narrow);
    # win_blk quantizes each tile's span to wblock rows so kernel work is
    # proportional to the tile's own span (the x array carries a wblock
    # zero overhang, so no clamping near the table end is needed)
    wlo_raw = np.zeros(n_tiles, np.int64)
    wblk = np.zeros(n_tiles, np.int64)
    for t in range(n_tiles):
        seg = senders[tile_lo[t]:tile_hi[t]]
        if len(seg):
            wlo_raw[t] = (int(seg.min()) // 128) * 128
            span = int(seg.max()) + 1 - wlo_raw[t]
            wblk[t] = -(-span // wblock)
        seg_senders.append(seg)
        if pad_len[t]:
            seg_senders.append(np.full(pad_len[t], n_cols,
                                       senders.dtype))
        for j, (a, pv) in enumerate(aux):
            seg_aux[j].append(a[tile_lo[t]:tile_hi[t]])
            if pad_len[t]:
                seg_aux[j].append(np.full(pad_len[t], pv, a.dtype))
    max_wblocks = int(max(1, wblk.max() if n_tiles else 1))
    flat = (np.concatenate(seg_senders) if seg_senders
            else np.zeros(0, np.int64))
    flat_aux = [np.concatenate(s) if s else np.zeros(0, np.int64)
                for s in seg_aux]
    if len(flat) == 0:
        flat = np.full(tile_e * egroup, n_cols, np.int64)
        flat_aux = [np.full(tile_e * egroup, pv, np.int64) for _, pv in aux]
        pos = tile_e * egroup
        indptr[n_nodes] = 0
    # tile t's padded segment length = next tile start - this tile start
    # (a multiple of egroup*tile_e, so max_chunks divides by egroup)
    starts = [int(indptr[t * tile_r]) for t in range(n_tiles)] + [int(pos)]
    max_chunks = max(max(
        (starts[t + 1] - starts[t]) // tile_e for t in range(n_tiles)),
        egroup)
    # null tail rows so every tile's sender-chunk copies
    # [e_lo/tile_e, e_lo/tile_e + _buf_rows(max_chunks)) are in bounds
    extra = _buf_rows(max_chunks) * tile_e
    flat = np.concatenate([flat, np.full(extra, n_cols, np.int64)])
    flat_aux = [np.concatenate([a, np.full(extra, pv, np.int64)])
                for a, (_, pv) in zip(flat_aux, aux)]
    spill_senders = spill_rows = None
    spill_hop_ends: Tuple[int, ...] = ()
    spill_aux: List[jnp.ndarray] = []
    if spill is not None:
        sps, spr, spa = spill
        spill_senders = jnp.asarray(sps)
        spill_rows = jnp.asarray(spr)
        spill_aux = [jnp.asarray(a) for a in spa]
        if hop_rows:
            # spill rows are receiver-sorted, so each hop's spill edges
            # form a prefix-contiguous run: record static cut points for
            # slice_hops (hop k owns rows [k*hop_rows, (k+1)*hop_rows))
            n_h = n_nodes // hop_rows
            spill_hop_ends = tuple(
                int(np.searchsorted(spr, (k + 1) * hop_rows))
                for k in range(n_h))
    csr = HopCSR(
        indptr=jnp.asarray(indptr.astype(np.int32)),
        senders2d=jnp.asarray(flat.astype(np.int32).reshape(-1, tile_e)),
        row_starts=jnp.asarray(indptr[:-1].astype(np.int32)
                               .reshape(n_nodes, 1)),
        row_ends=jnp.asarray(indptr[1:].astype(np.int32)
                             .reshape(n_nodes, 1)),
        win_lo=jnp.asarray(wlo_raw.astype(np.int32)),
        win_blk=jnp.asarray(wblk.astype(np.int32)),
        max_chunks=max_chunks,
        max_wblocks=max_wblocks,
        wblock=wblock,
        tile_r=tile_r,
        egroup=egroup,
        n_cols_static=(0 if n_cols == n_nodes else n_cols),
        spill_senders=spill_senders,
        spill_rows=spill_rows,
        spill_hop_ends=spill_hop_ends,
    )
    if aux:
        return (csr, [jnp.asarray(a.astype(np.int32)) for a in flat_aux],
                spill_aux)
    return csr


@struct.dataclass
class KHopPallasPlan:
    """Fused forward/backward CSRs + embedding count histograms.

    Doubles as a GraphBatch adjacency backend ("pallas" collate mode).
    """

    fwd: HopCSR                     # fused hops, receiver-sorted
    bwd: HopCSR                     # fused transpose (sender-sorted)
    counts1: jnp.ndarray            # (N, V1) hop-1 attr histogram
    countsk: Optional[jnp.ndarray]  # (N, K-1, Vk) | None
    # aligned with fwd.senders2d.reshape(-1): hop-major receiver row id
    # and attr code of every padded edge (pad: receiver K*N-1, code 0) —
    # only needed for sender-scaled embeddings (GCN norm)
    edge_recv: jnp.ndarray
    edge_code: jnp.ndarray
    # (N,) union in-degree over real edges regardless of hop mask (the
    # reference's PyG mean denominator); slice_hops keeps it because the
    # union edge list does not shrink when hop columns are sliced
    union_deg: Optional[jnp.ndarray] = None
    # (N, K) per-hop live in-degree (CSR row extents are tile-padded on
    # the last row of each tile, so the exact counts are stored directly)
    hop_deg: Optional[jnp.ndarray] = None
    # attr codes of the fwd spill edges (aligned with fwd.spill_senders;
    # feeds the GCN weighted-histogram path)
    spill_code: Optional[jnp.ndarray] = None
    n_hops: int = struct.field(pytree_node=False, default=1)

    @property
    def K(self) -> int:
        return self.n_hops

    def slice_hops(self, k: int) -> "KHopPallasPlan":
        n = self.counts1.shape[0]
        cn = self.fwd.n_cols // self.n_hops    # per-hop sender rows
        tile_e = self.fwd.senders2d.shape[1]

        def cut(csr: HopCSR, rows_per_hop: int, cols_per_hop: int
                ) -> HopCSR:
            rows = (csr.hop_ends[k - 1] // tile_e
                    + _buf_rows(csr.max_chunks))
            nr = k * rows_per_hop
            nt = nr // csr.tile_r
            sp_end = (csr.spill_hop_ends[k - 1]
                      if csr.spill_hop_ends else 0)
            return csr.replace(
                indptr=csr.indptr[:nr + 1],
                senders2d=csr.senders2d[:rows],
                row_starts=csr.row_starts[:nr],
                row_ends=csr.row_ends[:nr],
                win_lo=csr.win_lo[:nt],
                win_blk=csr.win_blk[:nt],
                n_cols_static=(0 if cols_per_hop == rows_per_hop
                               else k * cols_per_hop),
                hop_ends=csr.hop_ends[:k],
                # spill rows are receiver-sorted: hop prefix is static
                spill_senders=(None if csr.spill_senders is None or
                               sp_end == 0
                               else csr.spill_senders[:sp_end]),
                spill_rows=(None if csr.spill_rows is None or sp_end == 0
                            else csr.spill_rows[:sp_end]),
                spill_hop_ends=csr.spill_hop_ends[:k])

        fwd = cut(self.fwd, n, cn)
        flat_len = fwd.senders2d.shape[0] * tile_e
        sp_end = (self.fwd.spill_hop_ends[k - 1]
                  if self.fwd.spill_hop_ends else 0)
        return KHopPallasPlan(
            fwd=fwd, bwd=cut(self.bwd, cn, n),
            counts1=self.counts1,
            countsk=(self.countsk[:, :k - 1] if k > 1 else None),
            edge_recv=self.edge_recv[:flat_len],
            edge_code=self.edge_code[:flat_len],
            spill_code=(None if self.spill_code is None or sp_end == 0
                        else self.spill_code[:sp_end]),
            union_deg=self.union_deg,
            hop_deg=(self.hop_deg[:, :k]
                     if self.hop_deg is not None else None),
            n_hops=k,
        )

    def degree(self) -> jnp.ndarray:
        return self.hop_deg


def build_plan(receivers, senders, attr, n_nodes: int, v1: int, vk: int,
               tile_r: int = TILE_R, tile_e: int = TILE_E,
               wblock: int = WBLOCK, egroup: int = EGROUP,
               for_interpret: bool = False,
               n_cols_nodes: Optional[int] = None) -> KHopPallasPlan:
    """Host-side plan: filter live edges per hop, fuse them into one
    hop-major CSR per direction, histogram attr codes per receiver.
    tile_r sets the kernel's grid geometry and wblock the window
    sub-block height (multiples of 128; sweepable for throughput tuning
    — n_pad must divide by tile_r).

    tile_e is hardware-constrained to 128: the kernel DMAs senders2d
    rows in 8-row blocks, and Mosaic only lowers a dynamic HBM slice at
    an unaligned row offset when each row spans exactly ONE (8, 128)
    lane tile (measured on v5e; interpret mode accepts wider rows, so
    pass for_interpret=True to build a wide-tile_e plan for interpret-
    mode debugging on any backend)."""
    if (tile_e != 128 and not for_interpret
            and jax.default_backend() != "cpu"):
        raise ValueError(
            f"tile_e={tile_e}: Mosaic only lowers 128-wide sender rows "
            "(single lane tile) for the chunk DMA; sweep tile_r/wblock "
            "instead (or pass for_interpret=True for interpret mode)")
    receivers = np.asarray(receivers)
    senders = np.asarray(senders)
    attr = np.asarray(attr)
    K = attr.shape[1]
    cn = n_cols_nodes if n_cols_nodes is not None else n_nodes
    assert (K * cn) % tile_r == 0, (
        f"sender space {K}*{cn} must divide by tile_r={tile_r} "
        "(the backward CSR's output rows live there)")
    R = K * n_nodes
    C = K * cn
    rs, ss, cs = [], [], []
    for k in range(K):
        live = attr[:, k] > 0
        rs.append(receivers[live].astype(np.int64) + k * n_nodes)
        ss.append(senders[live].astype(np.int64) + k * cn)
        cs.append(np.clip(attr[live, k], 0, (v1 if k == 0 else vk) - 1)
                  .astype(np.int64))
    r_all = np.concatenate(rs) if rs else np.zeros(0, np.int64)
    s_all = np.concatenate(ss) if ss else np.zeros(0, np.int64)
    c_all = np.concatenate(cs) if cs else np.zeros(0, np.int64)
    fwd, (recv_f, code_f), spill_aux = _build_one(
        r_all, s_all, R, tile_r, tile_e, wblock, egroup,
        aux=[(r_all, R), (c_all, 0)], n_cols=C, hop_rows=n_nodes)
    bwd = _build_one(s_all, r_all, C, tile_r, tile_e, wblock, egroup,
                     n_cols=R, hop_rows=cn)
    spill_code = spill_aux[1] if spill_aux else None
    fwd = fwd.replace(hop_ends=tuple(
        int(fwd.indptr[(k + 1) * n_nodes]) for k in range(K)))
    bwd = bwd.replace(hop_ends=tuple(
        int(bwd.indptr[(k + 1) * cn]) for k in range(K)))
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
        fwd=fwd, bwd=bwd,
        counts1=jnp.asarray(counts1),
        countsk=jnp.asarray(countsk) if countsk is not None else None,
        edge_recv=recv_f, edge_code=code_f,
        spill_code=spill_code,
        union_deg=jnp.asarray(union_deg),
        hop_deg=jnp.asarray(hop_deg),
        n_hops=K,
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
    # the empty residual only carries the primal dtype (a bare dtype is
    # not a valid JAX residual type)
    return gather_segment_sum(x, csr_fwd), (csr_fwd, csr_bwd,
                                            jnp.zeros((0,), x.dtype))


def _gs_bwd(res, g):
    csr_fwd, csr_bwd, like = res
    # cotangent dtype must match the primal's (bf16 models feed the
    # kernel bf16 tables while the kernel always accumulates f32)
    dx = gather_segment_sum(g, csr_bwd).astype(like.dtype)
    return dx, _float0_like(csr_fwd), _float0_like(csr_bwd)


_gather_segment.defvjp(_gs_fwd, _gs_bwd)


def _weighted_hists(plan: KHopPallasPlan, sender_scale: jnp.ndarray,
                    V: int) -> jnp.ndarray:
    """(K, N, V) histograms of per-hop attr codes weighted by the
    sender-side scale: W[k, i, v] = sum over live hop-k edges e -> i with
    code v of s[sender(e), k].  Padding edges carry code 0 or an
    out-of-range receiver id (dropped by XLA scatter semantics), so they
    contribute nothing.  sender_scale is sized to the sender table
    (extended, for rectangular sharded plans); the histogram is over the
    receiver space."""
    K = sender_scale.shape[1]
    n = plan.counts1.shape[0]
    s_flat = jnp.transpose(sender_scale).reshape(-1)        # (K*Cn,)
    senders_flat = plan.fwd.senders2d.reshape(-1)
    idx = plan.edge_recv * V + plan.edge_code
    if plan.fwd.spill_senders is not None:
        # hub-spill edges contribute to the weighted histograms too
        senders_flat = jnp.concatenate(
            [senders_flat, plan.fwd.spill_senders])
        idx = jnp.concatenate(
            [idx, plan.fwd.spill_rows * V + plan.spill_code])
    s_e = s_flat[senders_flat]
    return jax.ops.segment_sum(s_e, idx, num_segments=K * n * V
                               ).reshape(K, n, V)


def khop_spmm(x: jnp.ndarray, table1: jnp.ndarray,
              tablek: Optional[jnp.ndarray],
              plan: KHopPallasPlan,
              *,
              scale: Optional[jnp.ndarray] = None,         # (N, K) s_i
              sender_scale: Optional[jnp.ndarray] = None,  # (N, K) s_j
              aggr: str = "add",
              hop_major: bool = False) -> jnp.ndarray:
    """Full differentiable k-hop aggregation via the Pallas kernel.

    x: (N, K, D); returns (N, K, D).  Matches ops.adjacency's
    khop_aggregate_adj on the COO backend, including GCN's factored
    s_i * s_j norm (sender side pre-scales the gathered table, receiver
    side post-scales the output) and SAGE's union-denominator mean.

    All K hops run in ONE kernel dispatch forward (and one backward):
    x is laid out hop-major (K*N, D) to match the fused CSR.  With
    ``hop_major=True`` x arrives as (K, N, D) and the result returns
    (K, N, D): the kernel-boundary flattenings become free reshapes —
    zero layout copies end to end (the hop-major fast path GNNPlus
    feeds; hop-major embedding sums are stacked per hop instead of
    concatenated on axis 1).

    Rectangular (node-sharded) plans gather from a halo-extended sender
    table: x is then (n_ext, K, D) while the output stays (n_local, K, D)
    (and sender_scale is sized to the extended table).
    """
    if hop_major:
        K, cn, D = x.shape
    else:
        cn, K, D = x.shape      # sender-table nodes (== N for square)
    n = plan.counts1.shape[0]   # receiver (output) nodes
    assert K * cn == plan.fwd.n_cols, (x.shape, plan.fwd.n_cols)
    out_dtype = x.dtype
    if sender_scale is not None:
        ss = (jnp.transpose(sender_scale)[..., None] if hop_major
              else sender_scale[..., None])
        x = x * ss.astype(x.dtype)
    # the kernel stores its table in bf16 anyway (MXU DEFAULT-precision
    # rounding, the only precision this wrapper drives it at); casting
    # BEFORE the hop-major transpose halves the relayout traffic, which
    # the large-graph step trace showed as one of the biggest non-kernel
    # costs.  CPU interpret keeps f32 so tests compare exactly against
    # f32 oracles.
    x = x.astype(jnp.float32 if jax.default_backend() == "cpu"
                 else jnp.bfloat16)
    xs = (x.reshape(K * cn, D) if hop_major
          else jnp.transpose(x, (1, 0, 2)).reshape(K * cn, D))
    outf = _gather_segment(xs, plan.fwd, plan.bwd)
    if out_dtype == jnp.bfloat16:
        # bf16 models cast the result right back down; do it before the
        # un-transpose so that relayout moves half the bytes too
        outf = outf.astype(jnp.bfloat16)
    out = (outf.reshape(K, n, D) if hop_major
           else jnp.transpose(outf.reshape(K, n, D), (1, 0, 2)))
    t1 = table1.at[0].set(0.0)
    hi = jax.lax.Precision.HIGHEST     # counts are exact integers; keep f32
    hop_axis = 0 if hop_major else 1

    def _hop_stack(parts):
        # (N, D) per hop -> (K, N, D) | (N, K, D)
        return jnp.stack(parts, axis=hop_axis)

    if sender_scale is None:
        parts = [jnp.matmul(plan.counts1, t1, precision=hi)]   # (N, D)
        if tablek is not None and K > 1:
            tk = tablek.at[0].set(0.0)
            parts += [jnp.matmul(plan.countsk[:, k - 1], tk, precision=hi)
                      for k in range(1, K)]
        emb_all = _hop_stack(parts)
    else:
        # counts were built unweighted; rebuild per hop weighted by s_j
        # (scalar scatter per edge, then the table matmul rides the MXU)
        V = max(t1.shape[0],
                tablek.shape[0] if tablek is not None else 0)
        hists = _weighted_hists(plan, sender_scale, V)
        parts = [jnp.matmul(hists[0, :, :t1.shape[0]], t1, precision=hi)]
        if tablek is not None and K > 1:
            tk = tablek.at[0].set(0.0)
            for k in range(1, K):
                parts.append(jnp.matmul(hists[k, :, :tk.shape[0]], tk,
                                        precision=hi))
        emb_all = _hop_stack(parts)
    out = out + emb_all.astype(out.dtype)
    if scale is not None:
        sc = jnp.transpose(scale)[..., None] if hop_major \
            else scale[..., None]
        out = out * sc.astype(out.dtype)
    if aggr == "mean":
        deg = jnp.maximum(plan.union_deg, 1.0)
        deg = (deg[None, :, None] if hop_major else deg[:, None, None])
        out = out / deg.astype(out.dtype)
    elif aggr != "add":
        # the kernel's one-hot matmul formulation is sum-shaped; max
        # does not factor through it — SAGE aggr='max' runs on the coo
        # or dense backend instead
        raise ValueError(f"pallas backend does not support aggr={aggr!r}:"
                         " the one-hot matmul kernel is sum-only; use "
                         "the coo or dense backend for max")
    return out.astype(out_dtype)
