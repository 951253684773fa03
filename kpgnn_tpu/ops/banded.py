"""Banded dense backend: k-hop aggregation for locally-ordered large graphs.

Large sparse graphs with a narrow bandwidth under their node order
(polymer chains, meshes, road networks, anything BFS/RCM-ordered) admit
a formulation strictly cheaper than both dense n² tiles (infeasible at
n ≫ 10³) and the one-hot Pallas kernel (which spends ~2·wblock·D MACs
per edge routing arbitrary sparsity through the MXU): tile the receiver
axis and contract each tile against a *static* halo window of the node
table,

    out[k, t·tr+i] = Σ_w live[k, t, i, w] · x[k, t·tr − h + w]

one batched ``(tile, win) @ (win, D)`` masked matmul per (hop, tile) —
pure XLA, no gathers, no scatters, no custom kernel.  The windows are
built with reshape/slice tricks (pad-front / core / pad-back views), so
the whole aggregation is einsum-shaped and differentiates cleanly.

FLOP accounting vs the Pallas one-hot kernel on the polymer benchmark
(n=8192·2, K=3, bandwidth ≤ 12): one-hot pays
2·(wblock·D + tile_r·D/egroup) ≈ 98 kFLOP per union edge; banded pays
2·win·D per *receiver row* (win = tile + 2h = 384 at h=64), i.e.
~27 kFLOP per edge at 3.6 edges/row — and the halo h tracks the graph's
actual bandwidth instead of a worst-case sender span.

Edges outside the halo (long-range chords, cross-graph noise) spill to
a COO side list added with one XLA gather + segment-sum, exactly like
the Pallas kernel's hub spill — the backend degrades per edge, never
per batch.

Semantics are identical to every other backend
(reference: layers/KPGIN.py:100,115-118): per hop k,
out[i,k] = aggr_j live(attr[k,i,j]) · s_i (x[j,k] + emb_k(attr)), with
the embedding part collapsed into precomputed `counts @ table` matmuls.
Sender-side scales are supported when structural: KPGCN's deg^-0.5 is a
pure function of the adjacency, so it folds into the live mask, the
histograms, and the spill weights at build time (``sender_weights`` /
``collate_banded(gcn_norm=True)``); arbitrary dynamic sender scales
belong on the pallas/coo backends.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

BANDED_TILE = 256          # receiver rows per tile (matches pallas tile_r)
HALO_ALIGN = 64            # halo rounds up to this (win stays MXU-friendly)
DEFAULT_HALO_CAP = 512     # edges reaching further than this spill to COO


@struct.dataclass
class BandedAdj:
    """Banded k-hop adjacency plan (host-built, device-resident).

    ``live[k, t, i, w]`` is 1 iff the union edge from sender
    ``t·tile − halo + w`` into receiver ``t·tile + i`` is live at hop k
    and in-band.  counts1/countsk histogram the attr codes of ALL edges
    (spill included), so the embedding sum never depends on the band.
    """

    live: jnp.ndarray               # (K, T, tile, win) int8 | f32 scaled
    counts1: jnp.ndarray            # (N, V1) float32
    countsk: Optional[jnp.ndarray]  # (N, K-1, Vk) float32 | None
    union_deg: jnp.ndarray          # (N,) float32
    hop_deg: jnp.ndarray            # (N, K) float32
    # out-of-band edges, hop-major (row = k·N + receiver), row-sorted
    spill_senders: Optional[jnp.ndarray] = None   # (S,) int32, k·N + sender
    spill_rows: Optional[jnp.ndarray] = None      # (S,) int32
    # per-spill-edge sender weight (sender-scaled plans only)
    spill_weights: Optional[jnp.ndarray] = None   # (S,) float32
    spill_hop_ends: Tuple[int, ...] = struct.field(pytree_node=False,
                                                   default=())
    # True when a structural sender-side scale s_j (GCN's deg^-0.5) was
    # folded into `live`, the histograms, and spill_weights at build
    # time — callers must then NOT pass sender_scale (KPGCNConv detects
    # this and passes only the receiver-side scale)
    sender_scaled: bool = struct.field(pytree_node=False, default=False)
    # build_banded emits row-sorted spill lists; the resident
    # BandedStore's on-device batch assembly (train/resident.py)
    # interleaves per-graph lists across the hop-major row space, so it
    # clears this and the spill segment_sum drops the sortedness hint
    spill_sorted: bool = struct.field(pytree_node=False, default=True)
    tile: int = struct.field(pytree_node=False, default=BANDED_TILE)
    halo: int = struct.field(pytree_node=False, default=0)
    n_hops: int = struct.field(pytree_node=False, default=1)
    # sender-table rows when different from the receiver space (the
    # node-sharded halo-extended table); 0 means square.  Windows only
    # ever cover the leading [0, n_nodes) block — senders beyond it (the
    # halo rows) always travel via the spill list.
    n_cols_static: int = struct.field(pytree_node=False, default=0)

    @property
    def K(self) -> int:
        return self.n_hops

    @property
    def n_nodes(self) -> int:
        return self.live.shape[1] * self.tile

    @property
    def n_cols(self) -> int:
        return self.n_cols_static or self.n_nodes

    def degree(self) -> jnp.ndarray:
        return self.hop_deg

    def slice_hops(self, k: int) -> "BandedAdj":
        return self._slice(k, lead=0)

    def _slice(self, k: int, lead: int) -> "BandedAdj":
        """Hop-slice with `lead` extra leading axes on every array field
        (lead=1 for shard-stacked plans inside ShardedCOOAdj) — ONE
        implementation for both layouts."""
        if k == self.n_hops:
            return self
        ix = (slice(None),) * lead
        if self.spill_senders is not None and not self.spill_hop_ends:
            # padded/stacked spill lists have no static hop cut points:
            # keep the whole list — rows of hops >= k land outside
            # [0, k*N) and segment_sum drops them (their clamped gathers
            # never land anywhere)
            sp_s, sp_r, sp_w = (self.spill_senders, self.spill_rows,
                                self.spill_weights)
        else:
            sp_end = (self.spill_hop_ends[k - 1]
                      if self.spill_hop_ends else 0)
            cut = ix + (slice(None, sp_end),)
            dead = self.spill_senders is None or sp_end == 0
            sp_s = None if dead else self.spill_senders[cut]
            sp_r = None if dead else self.spill_rows[cut]
            sp_w = (None if dead or self.spill_weights is None
                    else self.spill_weights[cut])
        return self.replace(
            live=self.live[ix + (slice(None, k),)],
            countsk=(self.countsk[ix + (slice(None), slice(None, k - 1))]
                     if k > 1 else None),
            hop_deg=self.hop_deg[ix + (slice(None), slice(None, k))],
            spill_senders=sp_s,
            spill_rows=sp_r,
            spill_weights=sp_w,
            spill_hop_ends=self.spill_hop_ends[:k],
            n_hops=k,
        )


def build_banded(receivers, senders, attr, n_nodes: int, v1: int, vk: int,
                 tile: int = BANDED_TILE, halo: Optional[int] = None,
                 halo_cap: int = DEFAULT_HALO_CAP,
                 n_cols: Optional[int] = None,
                 spill_pad: Optional[int] = None,
                 sender_weights=None,
                 as_numpy: bool = False) -> BandedAdj:
    """Host-side plan: per-hop live masks over static halo windows,
    attr-code histograms, out-of-band spill.

    ``halo`` is auto-sized to the edges' actual reach (rounded up to
    HALO_ALIGN, capped at ``halo_cap`` and at ``tile``); edges reaching
    further spill.  n_nodes must divide by ``tile``.

    ``n_cols``: sender-table rows when larger than the receiver space
    (the node-sharded halo-extended table [owned | halo rows]); senders
    at rows >= n_nodes sit outside every window and spill, which is
    exactly the O(boundary) cross-shard edge set.

    ``spill_pad``: pad the spill list to this fixed length with dropped
    entries (row -> one past the output) so batches of varying spill
    counts share one compiled shape (loaders pin this; the static hop
    cut points are then dropped in favor of out-of-range row dropping).

    ``sender_weights``: optional (n_cols, K) structural sender-side
    scale s_j (GCN's deg^-0.5 — a pure function of the adjacency, so it
    folds into the plan): the live mask becomes float (mask · s_j), the
    histograms weight each attr code by s_j, and spill edges carry
    per-edge weights.  The aggregate must then be called WITHOUT
    sender_scale (KPGCNConv handles this).  TPU numerics note: the
    in-band mask (and so the folded s_j) rounds to bf16 with the rest
    of the matmul inputs at DEFAULT precision — one extra rounding of
    s_j vs the coo/pallas paths (which scale x in f32 first), ≤ ~0.4%
    relative, the same order as the MXU's own input rounding; spill
    and histogram terms stay exact f32.
    """
    receivers = np.asarray(receivers)
    senders = np.asarray(senders)
    attr = np.asarray(attr)
    K = attr.shape[1]
    assert n_nodes % tile == 0, (n_nodes, tile)
    T = n_nodes // tile
    cn = n_cols if n_cols is not None else n_nodes

    t_of = receivers // tile
    # reach beyond the receiver's own tile, per edge (0 when the sender
    # sits inside [t·tile, (t+1)·tile))
    reach = np.maximum(t_of * tile - senders,
                       senders - ((t_of + 1) * tile - 1))
    reach = np.maximum(reach, 0)
    live_any = (attr > 0).any(axis=1)
    cap = min(halo_cap, tile)
    if halo is None:
        windowable = live_any & (senders < n_nodes)
        need = int(reach[windowable].max()) if windowable.any() else 0
        halo = min(-(-need // HALO_ALIGN) * HALO_ALIGN, cap)
    if halo > tile:
        raise ValueError(
            f"halo={halo} exceeds tile={tile}: the window views overlap "
            "adjacent tiles only — raise tile (collate with node_multiple "
            ">= tile) or lower halo; edges reaching further spill anyway")
    win = tile + 2 * halo

    if sender_weights is not None:
        sender_weights = np.asarray(sender_weights, np.float32)
        assert sender_weights.shape == (cn, K), (sender_weights.shape,
                                                 (cn, K))
    in_band = (reach <= halo) & (senders < n_nodes)
    live = np.zeros((K, T, tile, win),
                    dtype=np.float32 if sender_weights is not None
                    else np.int8)
    sp_r, sp_s, sp_w = [], [], []
    for k in range(K):
        lk = attr[:, k] > 0
        kb = lk & in_band
        i, j = receivers[kb], senders[kb]
        # add (not assign): duplicate (i, j) pairs keep their multiplicity
        w = (1 if sender_weights is None else sender_weights[j, k])
        np.add.at(live, (k, i // tile, i % tile,
                         j - (i // tile) * tile + halo), w)
        out = lk & ~in_band
        if out.any():
            sp_r.append(k * n_nodes + receivers[out])
            sp_s.append(k * cn + senders[out])
            if sender_weights is not None:
                sp_w.append(sender_weights[senders[out], k])

    spill_senders = spill_rows = spill_weights = None
    spill_hop_ends: Tuple[int, ...] = ()
    if sp_r or spill_pad:
        rows = (np.concatenate(sp_r).astype(np.int64) if sp_r
                else np.zeros(0, np.int64))
        cols = (np.concatenate(sp_s).astype(np.int64) if sp_r
                else np.zeros(0, np.int64))
        wts = None
        if sender_weights is not None:
            wts = (np.concatenate(sp_w).astype(np.float32) if sp_w
                   else np.zeros(0, np.float32))
        order = np.argsort(rows, kind="stable")
        rows, cols = rows[order], cols[order]
        wts = wts[order] if wts is not None else None
        if spill_pad is not None:
            if len(rows) > spill_pad:
                raise ValueError(
                    f"spill_pad={spill_pad} < actual spill {len(rows)}; "
                    "raise the pad (loaders size it from the worst-case "
                    "batch)")
            pad = spill_pad - len(rows)
            # dropped entries: row one past the output, harmless sender
            rows = np.concatenate([rows, np.full(pad, K * n_nodes)])
            cols = np.concatenate([cols, np.zeros(pad, np.int64)])
            if wts is not None:
                wts = np.concatenate([wts, np.zeros(pad, np.float32)])
        wrap = (lambda a: a) if as_numpy else jnp.asarray
        spill_rows = wrap(rows.astype(np.int32))
        spill_senders = wrap(cols.astype(np.int32))
        spill_weights = wrap(wts) if wts is not None else None
        if spill_pad is None:
            spill_hop_ends = tuple(
                int(np.searchsorted(rows, (k + 1) * n_nodes))
                for k in range(K))
        # padded lists keep no static hop cuts: slice_hops relies on
        # out-of-range rows dropping instead (see slice_hops)

    def hop_w(k):
        return (1.0 if sender_weights is None
                else sender_weights[senders, k])

    counts1 = np.zeros((n_nodes, v1), np.float32)
    np.add.at(counts1, (receivers, np.clip(attr[:, 0], 0, v1 - 1)),
              hop_w(0))
    counts1[:, 0] = 0.0
    countsk = None
    if K > 1:
        countsk = np.zeros((n_nodes, K - 1, vk), np.float32)
        for k in range(1, K):
            np.add.at(countsk[:, k - 1],
                      (receivers, np.clip(attr[:, k], 0, vk - 1)),
                      hop_w(k))
        countsk[:, :, 0] = 0.0
    union_deg = np.bincount(receivers, minlength=n_nodes).astype(np.float32)
    hop_deg = np.stack(
        [np.bincount(receivers[attr[:, k] > 0], minlength=n_nodes)
         for k in range(K)], axis=1).astype(np.float32)

    # as_numpy: host-side plan (the resident BandedStore stacks many
    # per-graph plans into one device transfer — per-plan jnp.asarray
    # would round-trip the device G times)
    wrap = (lambda a: a) if as_numpy else jnp.asarray
    return BandedAdj(
        live=wrap(live),
        counts1=wrap(counts1),
        countsk=wrap(countsk) if countsk is not None else None,
        union_deg=wrap(union_deg),
        hop_deg=wrap(hop_deg),
        spill_senders=spill_senders,
        spill_rows=spill_rows,
        spill_weights=spill_weights,
        spill_hop_ends=spill_hop_ends,
        tile=tile,
        halo=halo,
        n_hops=K,
        n_cols_static=(0 if cn == n_nodes else cn),
        sender_scaled=sender_weights is not None,
    )


def _windows(xs: jnp.ndarray, tile: int, halo: int) -> jnp.ndarray:
    """(K, N, D) -> (K, T, tile + 2·halo, D) overlapping halo windows,
    built from three reshaped views (no gather): window w of tile t is
    node row t·tile − halo + w, zero outside [0, N)."""
    K, N, D = xs.shape
    T = N // tile
    core = xs.reshape(K, T, tile, D)
    if halo == 0:
        return core
    xf = jnp.pad(xs, ((0, 0), (halo, 0), (0, 0)))[:, :N]
    left = xf.reshape(K, T, tile, D)[:, :, :halo]
    xb = jnp.pad(xs, ((0, 0), (0, tile), (0, 0)))[:, tile:tile + N]
    right = xb.reshape(K, T, tile, D)[:, :, :halo]
    return jnp.concatenate([left, core, right], axis=2)


def banded_khop_aggregate(
    x: jnp.ndarray,                     # (N, K, D) | (K, N, D) hop-major
    table1: jnp.ndarray,
    tablek: Optional[jnp.ndarray],
    adj: BandedAdj,
    *,
    scale: Optional[jnp.ndarray] = None,          # (N, K) receiver-side
    sender_scale: Optional[jnp.ndarray] = None,
    aggr: str = "add",
    hop_major: bool = False,
) -> jnp.ndarray:
    """Matches ops.adjacency's khop_aggregate_adj contract on the banded
    plan.  Natively hop-major — (K, N, D) in and out runs with zero
    layout copies; node-major callers pay one transpose each way.

    Sender-side scales are structural (GCN's deg^-0.5) and must be
    folded into the plan at build time (``sender_weights``); a dynamic
    ``sender_scale`` argument is rejected either way."""
    if sender_scale is not None:
        raise ValueError(
            "banded backend takes no dynamic sender_scale: GCN's "
            "structural deg^-0.5 folds into the plan — collate with "
            "gcn_norm=True (KPGCNConv then passes only the receiver "
            "scale); other sender scales need the pallas or coo backend")
    if not hop_major:
        out = banded_khop_aggregate(
            jnp.transpose(x, (1, 0, 2)), table1, tablek, adj,
            scale=scale, aggr=aggr, hop_major=True)
        return jnp.transpose(out, (1, 0, 2))

    K, cn, D = x.shape                 # cn >= N on halo-extended tables
    N = adj.n_nodes
    assert K == adj.n_hops and cn == adj.n_cols, (x.shape, adj.n_hops,
                                                  adj.n_cols)
    out_dtype = x.dtype
    # MXU DEFAULT precision rounds f32 inputs to bf16 anyway; storing the
    # windows in bf16 halves the window-build traffic (same convention as
    # the pallas kernel).  CPU (tests) keeps f32 for exact oracles.
    cdtype = (jnp.float32 if jax.default_backend() == "cpu"
              else jnp.bfloat16)
    xs = x.astype(cdtype)
    xw = _windows(xs[:, :N], adj.tile, adj.halo)     # (K, T, win, D)
    live = adj.live.astype(cdtype)
    out = jax.lax.dot_general(
        live, xw,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32).reshape(K, N, D)

    if adj.spill_senders is not None:
        xf = xs.reshape(K * cn, D)
        gathered = xf[adj.spill_senders].astype(out.dtype)
        if adj.spill_weights is not None:
            gathered = gathered * adj.spill_weights[:, None].astype(
                out.dtype)
        out = out.reshape(K * N, D) + jax.ops.segment_sum(
            gathered, adj.spill_rows, num_segments=K * N,
            indices_are_sorted=adj.spill_sorted)
        out = out.reshape(K, N, D)

    # histogram matmul at full precision like the pallas epilogue (exact
    # integer counts; exact-f32 weighted sums on gcn_norm plans — the
    # bf16 rounding note in build_banded applies to the mask only)
    hi = jax.lax.Precision.HIGHEST
    t1 = table1.at[0].set(0.0)
    parts = [jnp.matmul(adj.counts1, t1, precision=hi)]
    if tablek is not None and K > 1:
        tk = tablek.at[0].set(0.0)
        parts += [jnp.matmul(adj.countsk[:, k - 1], tk, precision=hi)
                  for k in range(1, K)]
    out = out + jnp.stack(parts, axis=0).astype(out.dtype)

    if scale is not None:
        out = out * jnp.transpose(scale)[..., None].astype(out.dtype)
    if aggr == "mean":
        deg = jnp.maximum(adj.union_deg, 1.0)[None, :, None]
        out = out / deg.astype(out.dtype)
    elif aggr != "add":
        # max needs per-pair attr codes to build each message; the
        # banded plan deliberately stores only attr histograms (the
        # counts @ table fold that makes it fast) — SAGE aggr='max'
        # runs on the coo or dense backend instead
        raise ValueError(f"banded backend does not support aggr={aggr!r}:"
                         " the plan keeps attr histograms, not per-edge "
                         "codes; use the coo or dense backend for max")
    return out.astype(out_dtype)
