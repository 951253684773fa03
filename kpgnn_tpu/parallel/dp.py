"""Data-parallel training over a device mesh with shard_map.

Each device holds one full GraphBatch (stacked on a leading axis sharded
over the mesh's data axis); parameters are replicated.  The step computes
local loss sums, psums the counts for an exact global mean (padded slots
don't dilute it), psums gradients over ICI, and pmeans the BatchNorm
statistics — the TPU-native replacement for the reference's
DataParallel scatter/gather (reference: train_ZINC.py:15-17,90-92).
"""
from __future__ import annotations

from functools import partial
from typing import Iterable, Iterator, List

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..graph.batch import GraphBatch
from ..train.state import TrainState
from ..train.loop import _masked_loss, _batch_target_mask


def stack_batches(batches: List[GraphBatch]) -> GraphBatch:
    """Stack per-device GraphBatches along a new leading device axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def mask_empty_batch(b: GraphBatch) -> GraphBatch:
    """Same-shape batch with every node/graph slot masked out: it
    contributes zero to losses, metrics and (count-weighted) BN stats, so
    it can pad a trailing partial super-batch without skewing anything."""
    return b.replace(node_mask=jnp.zeros_like(b.node_mask),
                     graph_mask=jnp.zeros_like(b.graph_mask))


def shard_loader(loader: Iterable[GraphBatch], n_shards: int
                 ) -> Iterator[GraphBatch]:
    """Group a batch stream into stacked super-batches of n_shards; a
    trailing partial group is padded with masked-empty batches (not
    dropped), so every graph in the stream is seen every epoch."""
    buf: List[GraphBatch] = []
    for b in loader:
        buf.append(b)
        if len(buf) == n_shards:
            yield stack_batches(buf)
            buf = []
    if buf:
        pad = mask_empty_batch(buf[-1])
        buf.extend([pad] * (n_shards - len(buf)))
        yield stack_batches(buf)


class ShardStream:
    """Re-iterable view of a loader grouped into n_shards super-batches
    (what Trainer hands to evaluate() every epoch)."""

    def __init__(self, loader, n_shards: int):
        self.loader, self.n_shards = loader, n_shards

    def __iter__(self):
        return shard_loader(self.loader, self.n_shards)


def parallel_train_step_body(model, tx, loss: str = "l1",
                             node_level: bool = False, axis: str = "data"):
    """Per-device (inside shard_map) train step: (state, local batch, rng)
    -> (state, psum'd metrics).  Shared by the stacked-super-batch step
    below and the resident one-dispatch scan epoch
    (train/resident.py make_parallel_resident_train_epoch)."""
    axes = (axis,) if isinstance(axis, str) else tuple(axis)

    def step(state: TrainState, batch: GraphBatch, rng):
        for a in axes:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(a))

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
            total_cnt = jax.lax.psum(cnt, axes)
            return lsum / jnp.maximum(total_cnt, 1.0), (updates, lsum, cnt)

        (_, (updates, lsum, cnt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.psum(grads, axes)
        new_bs = state.batch_stats
        if new_bs is not None and updates:
            # cross-replica mean of the updated running stats, matching a
            # single-device pass over the union batch up to momentum order;
            # weighted by liveness so masked-empty padding batches (the
            # trailing-group fill from shard_loader) don't dilute them
            live = (cnt > 0).astype(jnp.float32)
            n_live = jnp.maximum(jax.lax.psum(live, axes), 1.0)
            new_bs = jax.tree.map(
                lambda u: jax.lax.psum(u * live, axes) / n_live,
                updates["batch_stats"])
        updates_tx, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates_tx)
        new_state = state.replace(params=new_params, batch_stats=new_bs,
                                  opt_state=new_opt, step=state.step + 1)
        metrics = {
            "loss_sum": jax.lax.psum(lsum, axes),
            "count": jax.lax.psum(cnt, axes),
        }
        return new_state, metrics

    return step


def make_parallel_train_step(model, tx, mesh: Mesh, loss: str = "l1",
                             node_level: bool = False, axis: str = "data"):
    """Returns a jitted step: (replicated TrainState, stacked GraphBatch,
    rng) -> (TrainState, metrics).  Gradient psum rides ICI."""

    # a tuple axis (e.g. ("dcn", "data") from parallel.multihost) shards
    # the super-batch over both mesh axes; psums name the pair and XLA
    # reduces hierarchically (ICI inside a host, DCN across hosts)
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    body = parallel_train_step_body(model, tx, loss, node_level, axis)

    def per_device(state: TrainState, batch: GraphBatch, rng):
        # shard_map keeps the (now size-1) leading device axis; drop it
        return body(state, jax.tree.map(lambda a: a[0], batch), rng)

    # params/opt replicated; the stacked batch splits on its leading axis
    state_spec = P()
    batch_spec = P(axes if len(axes) > 1 else axes[0])
    smapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(state_spec, batch_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(0,))


def parallel_eval_step_body(model, loss: str = "l1",
                            node_level: bool = False, metric: str = "same",
                            bn_train_mode: bool = False, axis: str = "data"):
    """Per-device (inside shard_map) eval step: (state, local batch) ->
    psum'd metric sums.  Shared with the resident scan eval."""
    axes = (axis,) if isinstance(axis, str) else tuple(axis)

    def step(state: TrainState, batch: GraphBatch):
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
        lsum, cnt = _masked_loss(pred, batch.y, mask, loss)
        out = {"loss_sum": lsum, "count": cnt}
        which = loss if metric == "same" else metric
        if which == "accuracy" or loss == "cross_entropy":
            y = batch.y.astype(jnp.int32)
            out["correct"] = jnp.sum(
                (jnp.argmax(pred, -1) == y) & mask)
        if which in ("mae", "l1") and loss not in ("l1",):
            out["mae_sum"] = _masked_loss(pred, batch.y, mask, "l1")[0]
        if which in ("mse",) and loss not in ("mse",):
            out["mse_sum"] = _masked_loss(pred, batch.y, mask, "mse")[0]
        # per-target absolute error (multi-target regression, e.g. QM9) —
        # keyed like the single-device eval step so summarize_eval_sums
        # reports mae_per_target under --parallel too
        if not node_level and batch.y is not None and batch.y.ndim == 2 \
                and loss in ("l1", "mse"):
            m = mask.astype(pred.dtype)[:, None]
            out["abs_per_target"] = jnp.sum(jnp.abs(pred - batch.y) * m, 0)
        return jax.tree.map(lambda v: jax.lax.psum(v, axes), out)

    return step


def make_parallel_eval_step(model, mesh: Mesh, loss: str = "l1",
                            node_level: bool = False, metric: str = "same",
                            bn_train_mode: bool = False, axis: str = "data"):
    """Data-parallel eval: each device evaluates its batch of the stacked
    super-batch, per-batch sums psum over the axis — the same keys as
    train.loop.make_eval_step, so evaluate() aggregates identically."""
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    body = parallel_eval_step_body(model, loss, node_level, metric,
                                   bn_train_mode, axis)

    def per_device(state: TrainState, batch: GraphBatch):
        return body(state, jax.tree.map(lambda a: a[0], batch))

    smapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(axes if len(axes) > 1 else axes[0])),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(smapped)
