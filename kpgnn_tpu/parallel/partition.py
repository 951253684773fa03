"""Node/edge-partitioned ("graph parallel") training over a device mesh.

The batched union-graph is partitioned by node range: each device owns a
contiguous slice of node slots, the contiguous span of receiver-sorted
edges pointing into it, and the output rows it produces.  Per layer, the
only communication is a single all_to_all of *boundary* node rows (the
halo plan built here; device math in ops/sharded_adjacency.py) plus
O(G·D)/O(D) psums for per-graph statistics — never a full (N, K, D)
collective, so the wire cost scales with the partition quality instead
of the model size.

The whole training step runs inside one `jax.shard_map` (check_vma on):
parameters replicated, node-dimension arrays sharded, per-graph arrays
replicated.  Gradients come out replicated automatically through the
psum/all_to_all transposes — there is no hand-written gradient exchange
to get wrong.

This is the SURVEY §2.7(b) component; the reference's nearest analog is
its DataParallel call (reference: train_ZINC.py:90-92), which cannot
split a single large graph at all.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.batch import GraphBatch
from ..ops.adjacency import COOAdj
from ..ops.sharded_adjacency import ShardedCOOAdj
from ..train.state import TrainState
from ..train.loop import _batch_target_mask, _masked_loss

shard_map = jax.shard_map


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def partition_adj(adj: COOAdj, n_shards: int,
                  axis: str = "node") -> ShardedCOOAdj:
    """Host-side partition plan: COOAdj -> ShardedCOOAdj.

    Node slots split into `n_shards` equal contiguous ranges; the
    receiver-sorted edge list splits into the matching spans (padded to a
    common length with masked edges); for every shard pair the boundary
    senders are deduplicated into the all_to_all send plan and the edge
    senders are remapped into the [local | halo] extended table.

    Batches collated graph-blocked (dense slotting or single large
    graphs) whose graphs align with shard boundaries get an all-zero
    boundary — the halo exchange then carries only padding.
    """
    if not isinstance(adj, COOAdj):
        raise ValueError("partition_adj needs the COO backend")
    n_pad = adj.n_nodes
    if n_pad % n_shards:
        raise ValueError(f"n_nodes={n_pad} not divisible by {n_shards} "
                         "(collate with node_multiple >= n_shards)")
    n_local = n_pad // n_shards
    senders = np.asarray(adj.senders)
    receivers = np.asarray(adj.receivers)
    attr = np.asarray(adj.edge_attr)
    emask = np.asarray(adj.edge_mask)
    K = attr.shape[1]

    # masked (padding) edges contribute nothing — point their senders at
    # the receiving shard so they never generate halo traffic
    senders = np.where(emask, senders, receivers)

    bounds = np.arange(n_shards + 1) * n_local
    spans = np.searchsorted(receivers, bounds)
    e_shard = max(8, _round_up(int(np.max(np.diff(spans))), 8))

    # per-(receiver-shard i, owner j) unique boundary senders
    uniq = [[np.empty(0, np.int64)] * n_shards for _ in range(n_shards)]
    for i in range(n_shards):
        s = senders[spans[i]:spans[i + 1]]
        owner = s // n_local
        for j in range(n_shards):
            if j != i:
                uniq[i][j] = np.unique(s[owner == j])
    halo = max(1, max((len(u) for row in uniq for u in row), default=1))

    S = np.zeros((n_shards, e_shard), np.int32)
    # pad receivers with the LAST local slot, not 0: real receivers are
    # sorted ascending and downstream segment ops promise
    # indices_are_sorted=True — a 0 after real indices breaks that
    R = np.full((n_shards, e_shard), n_local - 1, np.int32)
    A = np.zeros((n_shards, e_shard, K), np.int32)
    M = np.zeros((n_shards, e_shard), bool)
    send_rows = np.zeros((n_shards, n_shards, halo), np.int32)
    boundary = []
    for i in range(n_shards):
        lo, hi = spans[i], spans[i + 1]
        e = hi - lo
        s = senders[lo:hi].astype(np.int64)
        owner = s // n_local
        s_new = s - i * n_local          # local by default
        for j in range(n_shards):
            u = uniq[i][j]
            boundary.append(len(u))
            if j == i or not len(u):
                continue
            send_rows[j, i, :len(u)] = u - j * n_local
            sel = owner == j
            s_new[sel] = n_local + j * halo + np.searchsorted(u, s[sel])
        S[i, :e] = s_new
        R[i, :e] = receivers[lo:hi] - i * n_local
        A[i, :e] = attr[lo:hi]
        M[i, :e] = emask[lo:hi]

    return ShardedCOOAdj(
        senders=jnp.asarray(S), receivers=jnp.asarray(R),
        edge_attr=jnp.asarray(A), edge_mask=jnp.asarray(M),
        send_rows=jnp.asarray(send_rows),
        n_local=n_local, n_shards=n_shards, axis=axis,
        boundary=tuple(boundary))


def _stacked_plan(adj: ShardedCOOAdj, k: int, v1: int, vk: int,
                  tile_r: int, wblock: int, egroup: int, n_ext_pad: int):
    """One rectangular fused-CSR plan per shard over the first `k` hop
    columns (senders in the halo-extended table, receivers in the owned
    range), statics unified to the per-shard maxima so the plans stack
    into one pytree (the kernel predicates off unused slots)."""
    from ..ops.pallas_spmm import _buf_rows, build_plan

    S = np.asarray(adj.senders)
    R = np.asarray(adj.receivers)
    A = np.asarray(adj.edge_attr)
    M = np.asarray(adj.edge_mask)
    plans = []
    for i in range(adj.n_shards):
        m = M[i]
        # all union edges are passed (not just those live in hops <= k):
        # dead rows contribute nothing to the per-hop CSRs, and the
        # union in-degree (the mean denominator) must keep counting
        # them, exactly like slicing edge_attr columns on the COO path
        plans.append(build_plan(
            R[i][m], S[i][m], A[i][m][:, :k], adj.n_local, v1, vk,
            tile_r=tile_r, wblock=wblock, egroup=egroup,
            n_cols_nodes=n_ext_pad))
    for attr_name in ("fwd", "bwd"):
        csrs = [getattr(p, attr_name) for p in plans]
        mc = max(c.max_chunks for c in csrs)
        mw = max(c.max_wblocks for c in csrs)
        te = csrs[0].senders2d.shape[1]
        rows = max(int(c.indptr[-1]) // te + _buf_rows(mc) for c in csrs)
        for j, c in enumerate(csrs):
            null = c.n_cols
            pad_rows = rows - c.senders2d.shape[0]
            s2d = (jnp.concatenate(
                [c.senders2d,
                 jnp.full((pad_rows, te), null, jnp.int32)])
                if pad_rows > 0 else c.senders2d[:rows])
            plans[j] = plans[j].replace(**{attr_name: c.replace(
                senders2d=s2d, max_chunks=mc, max_wblocks=mw,
                hop_ends=())})
    flat_len = plans[0].fwd.senders2d.size
    for j, p in enumerate(plans):
        pad = flat_len - p.edge_recv.shape[0]
        plans[j] = p.replace(
            edge_recv=jnp.concatenate(
                [p.edge_recv[:flat_len],
                 jnp.full((max(pad, 0),), k * adj.n_local, jnp.int32)]),
            edge_code=jnp.concatenate(
                [p.edge_code[:flat_len],
                 jnp.zeros((max(pad, 0),), jnp.int32)]))
    # hub-spill edge lists are ragged across shards: pad to the common
    # length with null entries (sender -> one past the table, row -> one
    # past the output: segment_sum drops out-of-range rows)
    for attr_name in ("fwd", "bwd"):
        csrs = [getattr(p, attr_name) for p in plans]
        sl = max((0 if c.spill_senders is None
                  else int(c.spill_senders.shape[0])) for c in csrs)
        for j, c in enumerate(csrs):
            cur = 0 if c.spill_senders is None else int(
                c.spill_senders.shape[0])
            if sl == 0:
                newc = c.replace(spill_hop_ends=())
            else:
                def padded(a, fill, cur=cur):
                    base = (a if a is not None
                            else jnp.zeros((0,), jnp.int32))
                    return jnp.concatenate(
                        [base, jnp.full((sl - cur,), fill, jnp.int32)])
                newc = c.replace(
                    spill_senders=padded(c.spill_senders, c.n_cols),
                    spill_rows=padded(c.spill_rows, c.n_rows),
                    spill_hop_ends=())
            upd = {attr_name: newc}
            if attr_name == "fwd" and sl:
                upd["spill_code"] = padded(plans[j].spill_code, 0)
            plans[j] = plans[j].replace(**upd)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *plans)


def attach_pallas_plans(adj: ShardedCOOAdj, v1: int, vk: int,
                        tile_r: Optional[int] = None,
                        wblock: Optional[int] = None,
                        egroup: Optional[int] = None,
                        hop_windows=None) -> ShardedCOOAdj:
    """Attach stacked per-shard Pallas plans so the node-sharded
    aggregation runs through the SpMM kernel after the halo exchange
    instead of XLA segment-sum.

    `hop_windows`: hop-window sizes k < K the model will request via
    `slice_hops` (GNNPlus layer l uses k = min(l+1, K), reference:
    models/GNNs.py:419); a stacked plan is built per window so sliced
    adjacencies keep the kernel instead of falling back to segment-sum.
    Pass True for every window 1..K-1.
    """
    from ..ops.pallas_spmm import EGROUP, TILE_R, WBLOCK

    tile_r = tile_r or TILE_R
    wblock = wblock or WBLOCK
    egroup = egroup or EGROUP
    if adj.n_local % tile_r:
        raise ValueError(
            f"n_local={adj.n_local} must divide by tile_r={tile_r} for "
            "the sharded Pallas path (collate with node_multiple = "
            "n_shards * tile_r)")
    K = adj.K
    n_ext = adj.n_local + adj.n_shards * adj.halo
    n_ext_pad = _round_up(n_ext, tile_r)
    stacked = _stacked_plan(adj, K, v1, vk, tile_r, wblock, egroup,
                            n_ext_pad)
    plan_by_k = None
    if hop_windows:
        if hop_windows is True:
            hop_windows = range(1, K)
        ks = sorted({int(k) for k in hop_windows if 0 < int(k) < K})
        plan_by_k = {k: _stacked_plan(adj, k, v1, vk, tile_r, wblock,
                                      egroup, n_ext_pad)
                     for k in ks} or None
    return adj.replace(plan=stacked, n_ext_pad=n_ext_pad,
                       plan_by_k=plan_by_k)


def attach_banded_plans(adj: ShardedCOOAdj, v1: int, vk: int,
                        tile: Optional[int] = None,
                        halo: Optional[int] = None) -> ShardedCOOAdj:
    """Attach stacked per-shard banded plans (ops/banded.py) so the
    node-sharded aggregation runs as window matmuls after the halo
    exchange.  In-shard edges of a bandwidth-ordered graph land in the
    windows; every cross-shard edge (sender remapped to a halo row
    >= n_local) spills to the plan's COO side list — O(boundary) edges.
    Banded plans hop-slice statically, so GNNPlus windows keep the fast
    path with no extra per-window plans."""
    import math

    from ..ops.banded import BANDED_TILE, build_banded

    if tile is None:
        # largest power-of-two-ish divisor of n_local up to the default
        tile = math.gcd(adj.n_local, BANDED_TILE)
        if tile < 32:
            # a degenerate tile caps the halo at tile rows, classifying
            # nearly every edge out-of-band: that is a gather+segment-sum
            # in a banded costume, strictly slower than plain COO
            raise ValueError(
                f"auto tile gcd(n_local={adj.n_local}, {BANDED_TILE}) = "
                f"{tile} is too small to be useful; collate with "
                "node_multiple = n_shards * 256 (or pass an explicit "
                "tile that divides n_local)")
    if adj.n_local % tile:
        raise ValueError(
            f"n_local={adj.n_local} must divide by tile={tile} for the "
            "sharded banded path (collate with node_multiple = "
            "n_shards * tile)")
    n_ext = adj.n_local + adj.n_shards * adj.halo
    S = np.asarray(adj.senders)
    R = np.asarray(adj.receivers)
    A = np.asarray(adj.edge_attr)
    M = np.asarray(adj.edge_mask)
    K = adj.K

    def build(i, h):
        m = M[i]
        return build_banded(R[i][m], S[i][m], A[i][m], adj.n_local, v1,
                            vk, tile=tile, halo=h, n_cols=n_ext)

    plans = [build(i, halo) for i in range(adj.n_shards)]
    h = max(p.halo for p in plans)
    plans = [p if p.halo == h else build(i, h)
             for i, p in enumerate(plans)]
    # spill lists are ragged across shards: pad to the common length with
    # dropped entries (row -> one past the output — segment_sum ignores
    # out-of-range rows; the clamped sender gather then lands nowhere)
    sl = max((0 if p.spill_senders is None else int(p.spill_senders.shape[0]))
             for p in plans)
    if sl:
        for j, p in enumerate(plans):
            cur = (0 if p.spill_senders is None
                   else int(p.spill_senders.shape[0]))
            base_s = (p.spill_senders if p.spill_senders is not None
                      else jnp.zeros((0,), jnp.int32))
            base_r = (p.spill_rows if p.spill_rows is not None
                      else jnp.zeros((0,), jnp.int32))
            plans[j] = p.replace(
                spill_senders=jnp.concatenate(
                    [base_s, jnp.zeros((sl - cur,), jnp.int32)]),
                spill_rows=jnp.concatenate(
                    [base_r, jnp.full((sl - cur,), K * adj.n_local,
                                      jnp.int32)]),
                spill_hop_ends=())
    return adj.replace(banded=jax.tree.map(lambda *xs: jnp.stack(xs),
                                           *plans))


def partition_batch(batch: GraphBatch, n_shards: int,
                    axis: str = "node",
                    pallas: Optional[dict] = None,
                    banded: Optional[dict] = None) -> GraphBatch:
    """Partition a collated batch for the node-sharded training path.

    pallas: optional {"v1": ..., "vk": ..., [geometry keys]} — when given,
    per-shard Pallas plans are attached so the local aggregation runs on
    the SpMM kernel (ops/sharded_adjacency.py).
    banded: optional {"v1": ..., "vk": ..., ["tile"/"halo"]} — per-shard
    banded window plans instead (large bandwidth-ordered graphs)."""
    adj = partition_adj(batch.adj, n_shards, axis)
    if pallas is not None:
        adj = attach_pallas_plans(adj, **pallas)
    if banded is not None:
        adj = attach_banded_plans(adj, **banded)
    return batch.replace(adj=adj)


def batch_pspecs(batch: GraphBatch, axis: str = "node",
                 node_level: bool = False) -> GraphBatch:
    """PartitionSpec tree matching a partitioned GraphBatch: node-dim
    arrays and edge shards split over `axis`, per-graph arrays
    replicated."""
    node, rep = P(axis), P()

    def ns(v):
        return node if v is not None else None

    def stacked(v):
        return None if v is None else jax.tree.map(lambda _: node, v)

    adj = batch.adj.replace(
        senders=node, receivers=node, edge_attr=node, edge_mask=node,
        send_rows=node, plan=stacked(batch.adj.plan),
        plan_by_k=stacked(batch.adj.plan_by_k),
        banded=stacked(batch.adj.banded))
    return batch.replace(
        x=node, node_mask=node, node_graph_ids=node,
        pe_attr=ns(batch.pe_attr),
        peripheral_edge_attr=ns(batch.peripheral_edge_attr),
        peripheral_config_attr=ns(batch.peripheral_config_attr),
        rd=ns(batch.rd), z=ns(batch.z), pos=ns(batch.pos),
        adj=adj,
        y=(None if batch.y is None else (node if node_level else rep)),
        graph_mask=rep)


def make_sharded_train_step(model, tx, mesh: Mesh, loss: str = "l1",
                            node_level: bool = False, axis: str = "node",
                            donate: bool = True):
    """Jitted (state, partitioned batch, rng) -> (state, metrics) where
    the forward/backward runs node-sharded over `axis`.

    Gradient correctness needs no manual psum: the pooling / norm psums
    inside the forward transpose to the right broadcasts and sums under
    shard_map's vma tracking, so params and metrics come out replicated.
    """

    def per_device(state: TrainState, batch: GraphBatch, rng):
        # The dropout rng stays REPLICATED (no axis_index fold): graph-
        # level values (virtual-node state, pooled readouts) are
        # replicated across node shards, and a device-varying rng would
        # de-replicate them through dropout, tripping check_vma.  Cost:
        # masks repeat across shards at equal local positions — dropout
        # stays unbiased, just correlated across the node partition.

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            if mutable:
                pred, updates = model.apply(
                    variables, batch, train=True,
                    rngs={"dropout": rng}, mutable=mutable)
            else:
                pred, updates = model.apply(
                    variables, batch, train=True,
                    rngs={"dropout": rng}), {}
            mask = _batch_target_mask(batch, node_level)
            lsum, cnt = _masked_loss(pred, batch.y, mask, loss)
            if node_level:       # graph-level preds are already replicated
                lsum = jax.lax.psum(lsum, axis)
                cnt = jax.lax.psum(cnt, axis)
            return lsum / jnp.maximum(cnt, 1.0), (updates, lsum, cnt)

        (_, (updates, lsum, cnt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        up, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, up)
        new_state = state.replace(
            params=new_params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss_sum": lsum, "count": cnt}

    def step(state, batch, rng):
        fn = shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), batch_pspecs(batch, axis, node_level), P()),
            out_specs=(P(), P()))
        return fn(state, batch, rng)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sharded_eval_step(model, mesh: Mesh, loss: str = "l1",
                           node_level: bool = False, metric: str = "same",
                           axis: str = "node", bn_train_mode: bool = False):
    """Per-batch metric sums (same keys as train.loop.make_eval_step),
    computed node-sharded; node-level sums psum over the axis, graph-level
    ones are replicated already."""

    def per_device(state: TrainState, batch: GraphBatch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        if bn_train_mode:
            pred = model.apply(variables, batch, train=True,
                               rngs={"dropout": jax.random.PRNGKey(0)},
                               mutable=["batch_stats"])[0]
        else:
            pred = model.apply(variables, batch, train=False)
        mask = _batch_target_mask(batch, node_level)

        def done(v):
            return jax.lax.psum(v, axis) if node_level else v

        lsum, cnt = _masked_loss(pred, batch.y, mask, loss)
        out = {"loss_sum": done(lsum), "count": done(cnt)}
        which = loss if metric == "same" else metric
        if which == "accuracy" or loss == "cross_entropy":
            y = batch.y.astype(jnp.int32)
            correct = (jnp.argmax(pred, -1) == y) & mask
            out["correct"] = done(jnp.sum(correct))
        if which in ("mae", "l1") and loss not in ("l1",):
            msum, _ = _masked_loss(pred, batch.y, mask, "l1")
            out["mae_sum"] = done(msum)
        if which in ("mse",) and loss not in ("mse",):
            msum, _ = _masked_loss(pred, batch.y, mask, "mse")
            out["mse_sum"] = done(msum)
        return out

    def step(state, batch):
        fn = shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), batch_pspecs(batch, axis, node_level)),
            out_specs=P())
        return fn(state, batch)

    return jax.jit(step)


def partition_loader(loader, n_shards: int, axis: str = "node",
                     pallas: Optional[dict] = None,
                     banded: Optional[dict] = None):
    """Wrap a GraphLoader stream, partitioning every batch."""
    for b in loader:
        yield partition_batch(b, n_shards, axis, pallas=pallas,
                              banded=banded)


class PartitionedLoader:
    """Re-iterable node-partitioned view of a loader (what Trainer hands
    to evaluate() every epoch).  Deterministic loaders are partitioned
    once and replayed; shuffled ones re-partition each epoch."""

    def __init__(self, loader, n_shards: int, axis: str = "node",
                 pallas: Optional[dict] = None,
                 banded: Optional[dict] = None):
        self.loader, self.n_shards, self.axis = loader, n_shards, axis
        self.pallas, self.banded = pallas, banded
        self._cache = None

    def __iter__(self):
        if getattr(self.loader, "shuffle", True):
            return partition_loader(self.loader, self.n_shards, self.axis,
                                    self.pallas, self.banded)
        if self._cache is None:
            self._cache = list(
                partition_loader(self.loader, self.n_shards, self.axis,
                                 self.pallas, self.banded))
        return iter(self._cache)
