"""Node-sharded COO adjacency with halo exchange — the graph-parallel
backend (SURVEY §2.7(b)).

The node axis is partitioned into `n_shards` contiguous ranges over a
device mesh axis; each device owns the output rows of its range plus the
contiguous span of receiver-sorted edges that point into it.  The only
cross-device traffic per layer is the *boundary*: node rows a device's
edge shard reads from other devices' ranges.  Those are exchanged with a
single `all_to_all` of a fixed (n_shards, halo) index plan built host
side (parallel/partition.py), after which aggregation is the ordinary
local gather -> mask -> segment-sum.  Communication per layer is
O(boundary * K * D), not O(N * K * D) — a full-table psum is never
formed, and for batches partitioned at graph boundaries the halo is
empty so the exchange degenerates to a no-op.

The replicated-parameter model runs entirely inside `jax.shard_map`
(check_vma on), so gradients through the exchange are handled by the
all_to_all/psum transposes; see parallel/partition.py for the step
functions and spec trees.

Reference counterpart: the torch DataParallel call is the reference's
only parallelism (reference: train_ZINC.py:90-92); this backend is the
net-new scale-out axis for graphs too large for one chip.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .segment import khop_aggregate


@struct.dataclass
class ShardedCOOAdj:
    """Receiver-sorted COO edges partitioned into per-device shards.

    Stacked (host) layout carries a leading `n_shards` axis on every edge
    field; inside shard_map each field arrives with that axis split to 1
    and `local()` drops it.  Senders are pre-remapped into the extended
    local table: [0, n_local) = owned rows, n_local + j*halo + t = t-th
    row of the halo block received from shard j.
    """

    senders: jnp.ndarray        # (P, E_s) int32, remapped (see above)
    receivers: jnp.ndarray      # (P, E_s) int32 in [0, n_local)
    edge_attr: jnp.ndarray      # (P, E_s, K) int32, 0 = hop absent
    edge_mask: jnp.ndarray      # (P, E_s) bool
    send_rows: jnp.ndarray      # (P, P, B) int32: [i, j, t] = local row on
                                # shard i of the t-th node i sends to j
    n_local: int = struct.field(pytree_node=False)
    n_shards: int = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False)
    # static accounting: per-pair boundary sizes (row-major (i, j): rows
    # receiver shard i needs FROM owner shard j, i.e. len(uniq[i][j]) in
    # partition_adj), before padding to the common halo width B
    boundary: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    # optional stacked per-shard Pallas plans (rectangular fused CSRs over
    # the halo-extended sender table, uniform statics across shards); when
    # present the local aggregation runs through the SpMM kernel instead
    # of XLA segment-sum.  Built by parallel.partition.attach_pallas_plans.
    plan: Optional[object] = None
    # extended sender-table rows the plans were built for (n_local + P*B
    # rounded up to the kernel tile); x_ext pads to this before the kernel
    n_ext_pad: int = struct.field(pytree_node=False, default=0)
    # optional {k: stacked plan over the first k hop columns} for the
    # hop windows the model requests via slice_hops (GNNPlus sliding
    # windows); without it a sliced view falls back to XLA segment-sum
    plan_by_k: Optional[dict] = None
    # optional stacked per-shard BANDED plans (ops/banded.py) over the
    # halo-extended sender table: in-shard banded edges run as window
    # matmuls, every cross-shard (halo) edge travels the plan's spill
    # list — O(boundary) of them by construction.  Unlike the pallas
    # plans, banded plans hop-slice statically, so GNNPlus windows keep
    # the fast path with no plan_by_k copies.
    banded: Optional[object] = None

    @property
    def K(self) -> int:
        return self.edge_attr.shape[-1]

    @property
    def n_nodes(self) -> int:
        return self.n_local * self.n_shards

    @property
    def halo(self) -> int:
        return self.send_rows.shape[-1]

    def slice_hops(self, k: int) -> "ShardedCOOAdj":
        if k >= self.K:
            return self
        # the full-K stacked pallas plans are not hop-sliceable in place
        # (per-shard hop offsets differ, so the slice points are not
        # static); windows pre-built by attach_pallas_plans(hop_windows=
        # ...) keep the kernel, anything else falls back to XLA
        # segment-sum.  Banded plans DO slice statically (live[:k]; the
        # padded spill list self-drops via out-of-range rows).
        sub = self.plan_by_k.get(k) if self.plan_by_k else None
        return self.replace(edge_attr=self.edge_attr[..., :k], plan=sub,
                            plan_by_k=None,
                            banded=_slice_banded(self.banded, k))

    def local(self) -> "ShardedCOOAdj":
        """Drop the (split-to-1) leading shard axis inside shard_map."""
        if self.senders.ndim == 1:
            return self
        return self.replace(
            senders=self.senders[0], receivers=self.receivers[0],
            edge_attr=self.edge_attr[0], edge_mask=self.edge_mask[0],
            send_rows=(self.send_rows[0]
                       if self.send_rows.ndim == 3 else self.send_rows),
            plan=(None if self.plan is None
                  else jax.tree.map(lambda a: a[0], self.plan)),
            # window plans get the same treatment so slice_hops after
            # local() installs a correctly-shaped (non-stacked) plan
            plan_by_k=(None if self.plan_by_k is None else {
                k: jax.tree.map(lambda a: a[0], p)
                for k, p in self.plan_by_k.items()}),
            banded=(None if self.banded is None
                    else jax.tree.map(lambda a: a[0], self.banded)))

    # --- accounting -------------------------------------------------
    def boundary_total(self) -> int:
        return sum(self.boundary)

    def comm_elems_per_layer(self, K: int, D: int) -> int:
        """Per-device all_to_all payload (elements) for one aggregation:
        n_shards halo blocks of B rows, (K, D) each — O(boundary)."""
        return self.n_shards * self.halo * K * D

    def psum_elems_per_layer(self, K: int, D: int) -> int:
        """What the replicate-and-psum design would move per device:
        a reduce-scatter + all-gather of the full (N, K, D) output."""
        return 2 * self.n_nodes * K * D


def _slice_banded(b, k: int):
    """Hop-slice a (possibly shard-stacked) banded plan: stacked plans
    carry a leading shard axis on every array field, so the hop axis
    shifts by one (BandedAdj._slice owns the logic for both layouts)."""
    if b is None:
        return None
    return b._slice(k, lead=0 if b.live.ndim == 4 else 1)


def node_axis(adj_or_batch) -> Optional[str]:
    """The mesh axis the node dimension is sharded over, or None."""
    adj = getattr(adj_or_batch, "adj", adj_or_batch)
    return adj.axis if isinstance(adj, ShardedCOOAdj) else None


def halo_exchange(adj: ShardedCOOAdj, payload: jnp.ndarray) -> jnp.ndarray:
    """Exchange boundary rows: (n_local, ...) -> (n_local + P*B, ...)
    extended table [owned | halo from shard 0 | ... | shard P-1].

    One all_to_all over `adj.axis` moves P*B rows per device — the entire
    per-layer communication of the sharded backend.
    """
    d = adj.local()
    P_, B = d.send_rows.shape
    send = payload[d.send_rows.reshape(-1)]
    send = send.reshape((P_, B) + payload.shape[1:])
    halo = jax.lax.all_to_all(send, adj.axis, split_axis=0, concat_axis=0)
    halo = halo.reshape((P_ * B,) + payload.shape[1:])
    return jnp.concatenate([payload, halo], axis=0)


def sharded_khop_aggregate(
    adj: ShardedCOOAdj,
    x: jnp.ndarray,                     # (n_local, K, D)
    table1: jnp.ndarray,                # (V1, D), row 0 already zeroed
    tablek: Optional[jnp.ndarray],
    *,
    scale: Optional[jnp.ndarray] = None,         # (n_local, K) receiver side
    sender_scale: Optional[jnp.ndarray] = None,  # (n_local, K) sender side
    aggr: str = "add",
) -> jnp.ndarray:
    """Same contract as khop_aggregate_adj's COO path, with senders read
    from the halo-extended table and the scatter bounded to owned rows."""
    d = adj.local()
    K = d.edge_attr.shape[-1]
    n_local = x.shape[0]

    payload = x
    if sender_scale is not None:
        # piggyback the sender-side scale on the same exchange
        payload = jnp.concatenate(
            [x, sender_scale[..., None].astype(x.dtype)], axis=-1)
    ext = halo_exchange(adj, payload)
    if sender_scale is not None:
        x_ext, ss_ext = ext[..., :-1], ext[..., -1]     # (n_ext, K, D), (n_ext, K)
    else:
        x_ext, ss_ext = ext, None

    if d.banded is not None and ss_ext is None:
        # local aggregation through the banded window matmuls: in-shard
        # edges ride the masked-matmul path, cross-shard (halo) edges
        # travel the plan's spill list — both read the same extended
        # table the exchange just built
        from .banded import banded_khop_aggregate

        pad = d.banded.n_cols - x_ext.shape[0]
        xp = jnp.pad(x_ext, ((0, pad), (0, 0), (0, 0)))
        return banded_khop_aggregate(xp, table1, tablek, d.banded,
                                     scale=scale, aggr=aggr)

    if d.plan is not None:
        # local aggregation through the fused Pallas SpMM kernel: the
        # halo exchange composes with the fast backend instead of XLA
        # segment-sum (pad the extended table to the plan's tile-aligned
        # sender space first)
        from .pallas_spmm import khop_spmm

        pad = adj.n_ext_pad - x_ext.shape[0]
        xp = jnp.pad(x_ext.astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
        ssp = (jnp.pad(ss_ext.astype(jnp.float32), ((0, pad), (0, 0)))
               if ss_ext is not None else None)
        return khop_spmm(xp, table1.astype(jnp.float32),
                         (tablek.astype(jnp.float32)
                          if tablek is not None else None),
                         d.plan, scale=scale, sender_scale=ssp,
                         aggr=aggr).astype(x.dtype)

    e1 = table1[d.edge_attr[:, :1]]
    e_emb = (jnp.concatenate([e1, tablek[d.edge_attr[:, 1:]]], axis=-2)
             if K > 1 else e1)
    edge_scale = None
    if scale is not None or ss_ext is not None:
        s_i = scale[d.receivers] if scale is not None else 1.0
        s_j = ss_ext[d.senders] if ss_ext is not None else 1.0
        edge_scale = s_i * s_j
    return khop_aggregate(x_ext, d.senders, d.receivers, e_emb,
                          d.edge_attr, scale=edge_scale, aggr=aggr,
                          edge_mask=d.edge_mask, num_segments=n_local)


def sharded_degree(adj: ShardedCOOAdj, add_self_loop: bool = False
                   ) -> jnp.ndarray:
    """(n_local, K) per-hop in-degree — purely local: every edge into an
    owned node lives in the local shard."""
    d = adj.local()
    live = (d.edge_attr > 0).astype(jnp.float32)
    deg = jax.ops.segment_sum(live, d.receivers,
                              num_segments=adj.n_local,
                              indices_are_sorted=True)
    if add_self_loop:
        deg = deg + 1.0
    return deg


def sharded_union_in_degree(adj: ShardedCOOAdj) -> jnp.ndarray:
    d = adj.local()
    return jax.ops.segment_sum(
        d.edge_mask.astype(jnp.float32), d.receivers,
        num_segments=adj.n_local, indices_are_sorted=True)
