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


def shard_loader(loader: Iterable[GraphBatch], n_shards: int
                 ) -> Iterator[GraphBatch]:
    """Group a batch stream into stacked super-batches of n_shards."""
    buf: List[GraphBatch] = []
    for b in loader:
        buf.append(b)
        if len(buf) == n_shards:
            yield stack_batches(buf)
            buf = []
    # trailing partial super-batch is dropped: every shard must have a
    # batch of identical shape (masked-empty batches would still be valid,
    # callers can pad the stream if they need exact coverage)


def make_parallel_train_step(model, tx, mesh: Mesh, loss: str = "l1",
                             node_level: bool = False, axis: str = "data"):
    """Returns a jitted step: (replicated TrainState, stacked GraphBatch,
    rng) -> (TrainState, metrics).  Gradient psum rides ICI."""

    def per_device(state: TrainState, batch: GraphBatch, rng):
        # shard_map keeps the (now size-1) leading device axis; drop it
        batch = jax.tree.map(lambda a: a[0], batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

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
            total_cnt = jax.lax.psum(cnt, axis)
            return lsum / jnp.maximum(total_cnt, 1.0), (updates, lsum, cnt)

        (_, (updates, lsum, cnt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.psum(grads, axis)
        new_bs = state.batch_stats
        if new_bs is not None and updates:
            # cross-replica mean of the updated running stats, matching a
            # single-device pass over the union batch up to momentum order
            new_bs = jax.lax.pmean(updates["batch_stats"], axis)
        updates_tx, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates_tx)
        new_state = state.replace(params=new_params, batch_stats=new_bs,
                                  opt_state=new_opt, step=state.step + 1)
        metrics = {
            "loss_sum": jax.lax.psum(lsum, axis),
            "count": jax.lax.psum(cnt, axis),
        }
        return new_state, metrics

    # params/opt replicated; the stacked batch splits on its leading axis
    state_spec = P()
    batch_spec = P(axis)
    smapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(state_spec, batch_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(0,))
