"""Jitted train/eval steps and the epoch-level Trainer.

Losses and metrics are computed under the batch masks: padded graph/node
slots contribute zero to sums and zero to counts, so a padded epoch is
numerically identical to the reference's ragged epochs.
"""
from __future__ import annotations

import dataclasses
import math
import time
from functools import partial
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..graph.batch import GraphBatch
from .config import TrainConfig
from .lr import ReduceLROnPlateau
from .state import TrainState, create_train_state, get_lr, set_lr


def _masked_loss(pred, y, mask, loss: str):
    """Returns (sum of per-item losses over real items, item count)."""
    pred = pred.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    if loss == "cross_entropy":
        y = y.astype(jnp.int32)
        item = optax.softmax_cross_entropy_with_integer_labels(pred, y)
    else:
        y = y.astype(pred.dtype)
        if y.shape != pred.shape:
            if y.size == pred.size:
                y = y.reshape(pred.shape)
            else:
                raise ValueError(f"pred {pred.shape} vs y {y.shape}")
        diff = pred - y
        item = jnp.abs(diff) if loss == "l1" else diff * diff
        if item.ndim > 1:
            item = item.mean(axis=tuple(range(1, item.ndim)))
    return jnp.sum(item * m), jnp.sum(m)


def _batch_target_mask(batch: GraphBatch, node_level: bool):
    return (batch.node_mask if node_level else batch.graph_mask)


def train_step_body(model, tx, loss: str = "l1", node_level: bool = False):
    """The un-jitted train step: (state, batch, rng) -> (state, metrics).

    Shared by the per-batch jitted step (make_train_step) and the
    resident scan epoch (train/resident.py), so both paths run the
    identical XLA computation."""
    def step(state: TrainState, batch: GraphBatch, rng):
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
            return lsum / jnp.maximum(cnt, 1.0), (updates, lsum, cnt)

        (lval, (updates, lsum, cnt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt = _apply(tx, grads, state.opt_state, state.params)
        new_state = state.replace(
            params=new_params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, {"loss_sum": lsum, "count": cnt}

    return step


def make_train_step(model, tx, loss: str = "l1", node_level: bool = False,
                    donate: bool = True):
    step = train_step_body(model, tx, loss, node_level)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _apply(tx, grads, opt_state, params):
    updates, new_opt = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt


def eval_step_body(model, loss: str = "l1", node_level: bool = False,
                   metric: str = "same", bn_train_mode: bool = False):
    """Un-jitted eval step returning per-batch sums for exact epoch
    aggregation (shared with the resident scan eval).

    metric: "same" (the loss), "mae", "mse", "accuracy", or "none".
    bn_train_mode keeps BatchNorm in batch-statistics mode during eval —
    the SR25 protocol (reference: train_SR.py:46-47).
    """
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
            correct = (jnp.argmax(pred, -1) == y) & mask
            out["correct"] = jnp.sum(correct)
        if which in ("mae", "l1") and loss not in ("l1",):
            msum, _ = _masked_loss(pred, batch.y, mask, "l1")
            out["mae_sum"] = msum
        if which in ("mse",) and loss not in ("mse",):
            msum, _ = _masked_loss(pred, batch.y, mask, "mse")
            out["mse_sum"] = msum
        # per-target absolute error (multi-target regression, e.g. QM9)
        if not node_level and batch.y is not None and batch.y.ndim == 2 \
                and loss in ("l1", "mse"):
            m = mask.astype(pred.dtype)[:, None]
            out["abs_per_target"] = jnp.sum(jnp.abs(pred - batch.y) * m, 0)
        return out

    return step


def make_eval_step(model, loss: str = "l1", node_level: bool = False,
                   metric: str = "same", bn_train_mode: bool = False):
    return jax.jit(eval_step_body(model, loss, node_level, metric,
                                  bn_train_mode))


def device_prefetch(iterable, depth: int = 2):
    """Move host->device batch transfer off the dispatch thread.

    A helper thread jax.device_put's upcoming batches so the tunnel
    write (~25 ms/MB on the remote-TPU link) overlaps both the python
    dispatch loop and device compute.  Single-device streams only —
    parallel modes reshard inside their shard_map steps.  Cancellation-
    safe via background_iter: abandoning the generator (interrupt, step
    error) stops the thread instead of stranding it and its HBM batches.
    """
    from .loader import background_iter

    return background_iter(
        lambda: (jax.device_put(b) for b in iterable), maxsize=depth)


class DeviceCacheLoader:
    """Eval loader that keeps its (deterministic) batches device-resident.

    Val/test sets are re-iterated every epoch with identical batches;
    re-shipping them over the host->device link each time costs ~25 ms/MB
    on the tunnel-attached TPU.  First pass device_puts and records up to
    `max_bytes` of batches; later passes replay from HBM.  Falls back to
    plain prefetch beyond the cap.
    """

    def __init__(self, loader, max_bytes: int = 1 << 30, depth: int = 2):
        self.loader = loader
        self.max_bytes = max_bytes
        self.depth = depth
        self._cache = None

    @staticmethod
    def _nbytes(batch) -> int:
        return sum(x.nbytes for x in jax.tree_util.tree_leaves(batch)
                   if hasattr(x, "nbytes"))

    def __iter__(self):
        if self._cache is not None:
            return iter(self._cache)
        return self._fill()

    def _fill(self):
        cache, used, overflow = [], 0, False
        for b in device_prefetch(iter(self.loader), self.depth):
            if not overflow:
                used += self._nbytes(b)
                if used <= self.max_bytes:
                    cache.append(b)
                else:
                    cache, overflow = None, True
            yield b
        if not overflow:
            self._cache = cache

    def __len__(self):
        return len(self.loader)


def train_epoch(train_step, state, loader, rng) -> tuple:
    # Accumulate metrics as device arrays and materialize ONCE at epoch
    # end: a per-step float() would block the host on every step's
    # result, serializing batch transfer against device compute (on the
    # remote-tunnel TPU that is the difference between a pipelined epoch
    # and paying full RTT per step).  Async dispatch queues step N+1's
    # transfer while step N computes.
    losses, counts = [], []
    for batch in loader:
        rng, sub = jax.random.split(rng)
        state, m = train_step(state, batch, sub)
        losses.append(m["loss_sum"])
        counts.append(m["count"])
    if not losses:
        return state, 0.0
    total = float(np.sum(np.asarray(jax.device_get(losses), np.float64)))
    count = float(np.sum(np.asarray(jax.device_get(counts), np.float64)))
    return state, total / max(count, 1.0)


def evaluate(eval_step, state, loader) -> Dict[str, float]:
    dev: Dict[str, list] = {}
    for batch in loader:
        m = eval_step(state, batch)
        for k, v in m.items():
            dev.setdefault(k, []).append(v)
    # one host sync for the whole eval pass
    sums = {k: np.sum(np.asarray(jax.device_get(v), np.float64), axis=0)
            for k, v in dev.items()}
    return summarize_eval_sums(sums)


def summarize_eval_sums(sums: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Epoch metric dict from summed per-batch eval-step outputs."""
    cnt = max(float(sums.get("count", 0.0)), 1.0)
    out = {"loss": float(sums.get("loss_sum", 0.0)) / cnt, "count": cnt}
    if "correct" in sums:
        out["accuracy"] = float(sums["correct"]) / cnt
    if "mae_sum" in sums:
        out["mae"] = float(sums["mae_sum"]) / cnt
    if "mse_sum" in sums:
        out["mse"] = float(sums["mse_sum"]) / cnt
    if "abs_per_target" in sums:
        out["mae_per_target"] = (np.asarray(sums["abs_per_target"]) / cnt)
    return out


@dataclasses.dataclass
class Trainer:
    """Epoch loop with plateau LR, best-val gating, and optional min-lr
    stopping — the shared shape of every reference train script
    (reference: train_ZINC.py:245-276)."""

    model: object
    cfg: TrainConfig
    loss: str = "l1"
    node_level: bool = False
    metric_mode: str = "min"            # "min" tracks loss, "max" accuracy
    sched_on: str = "metric"            # "metric" | "loss": what drives the
                                        # plateau LR; "loss" = val-loss min
                                        # mode even on accuracy tasks
    use_scheduler: bool = True          # False = constant LR, like the
                                        # reference expressiveness scripts
                                        # (train_EXP/CSL/SR have no
                                        # scheduler, only best-epoch gating)
    eval_metric: str = "same"
    bn_train_mode_eval: bool = False
    logger: Optional[object] = None
    checkpoint_dir: Optional[str] = None
    max_checkpoints: int = 3
    mesh: Optional[object] = None       # jax Mesh -> parallel steps
    parallel_mode: str = "data"         # with mesh: "data" = one batch per
                                        # device (dp.py), "node" = each batch
                                        # node-sharded over the mesh with
                                        # halo exchange (parallel/partition)
    resident: str = "auto"              # "auto"|"on"|"off": keep the whole
                                        # dense-mode dataset in HBM and run
                                        # each epoch as ONE lax.scan dispatch
                                        # (train/resident.py). auto = on for
                                        # single-device dense loaders whose
                                        # store fits KPGNN_RESIDENT_MAX_BYTES
                                        # (default 4 GiB)
    partition_plans: Optional[dict] = None  # node mode: {"pallas": {...}} or
                                        # {"banded": {...}} kwargs forwarded
                                        # to partition_batch so the local
                                        # aggregation runs on the fast
                                        # backend after the halo exchange

    def log(self, msg):
        if self.logger:
            self.logger.info(msg)

    def fit(self, train_loader, val_loader=None, test_loader=None,
            rng=None, epoch_callback=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        rng, init_rng = jax.random.split(rng)
        # loader.example() collates one probe batch without starting the
        # shuffled producer thread (which would leak, blocked on its queue)
        example = (train_loader.example()
                   if hasattr(train_loader, "example")
                   else next(iter(train_loader)))
        state, tx = create_train_state(
            self.model, example, init_rng, self.cfg.lr, self.cfg.l2_wd)
        if self.cfg.load_path:
            from .checkpoint import load_checkpoint
            state, _ = load_checkpoint(self.cfg.load_path, state)
            self.log(f"warm start from {self.cfg.load_path}")
        n_dev = (int(np.prod(self.mesh.devices.shape))
                 if self.mesh is not None else 1)

        # --- resident dense store: one-scan epochs, zero per-epoch
        # host->device data motion (train/resident.py) ---
        def _dense_loader(l):
            return (getattr(l, "mode", None) == "dense"
                    and hasattr(l, "graphs") and hasattr(l, "n_slot"))

        def _coo_loader(l):
            return (getattr(l, "mode", None) == "coo"
                    and hasattr(l, "graphs"))

        def _banded_loader(l):
            return (getattr(l, "mode", None) == "banded"
                    and hasattr(l, "graphs"))

        def _resident_loader(l):
            return _dense_loader(l) or _coo_loader(l) or _banded_loader(l)

        use_resident = ((self.mesh is None or self.parallel_mode == "data")
                        and self.resident != "off"
                        and _resident_loader(train_loader))
        if use_resident and self.resident == "auto":
            import os as _os
            from .resident import (banded_store_nbytes, coo_store_nbytes,
                                   plan_banded_store_shapes, store_nbytes)
            cap = float(_os.environ.get("KPGNN_RESIDENT_MAX_BYTES",
                                        4 << 30))
            gs = train_loader.graphs
            if _dense_loader(train_loader):
                nbytes = store_nbytes(gs, train_loader.n_slot)
                use_resident = nbytes <= cap
            elif _banded_loader(train_loader):
                bt, bh, bn, bs_ = plan_banded_store_shapes(gs)
                nbytes = banded_store_nbytes(gs, bn, bt, bh, bs_,
                                             train_loader.v1,
                                             train_loader.vk)
                use_resident = nbytes <= cap
            else:
                ns = max(g.num_nodes for g in gs)
                es = max(g.num_edges for g in gs)
                nbytes = coo_store_nbytes(gs, ns, es)
                # per-graph slots waste compute when sizes are skewed
                # (compact COO packing is the whole point of coo mode);
                # auto only engages when slots are mostly full
                eff = min(
                    sum(g.num_nodes for g in gs) / (len(gs) * ns),
                    sum(g.num_edges for g in gs) / max(len(gs) * es, 1))
                use_resident = nbytes <= cap and eff >= 0.5
        resident_train_fn = resident_eval_fn = None
        train_store = None
        stores: Dict[int, object] = {}
        resident_axes = None
        if use_resident:
            from .resident import (build_coo_store, build_dense_store,
                                   epoch_index_chunks,
                                   make_parallel_resident_eval,
                                   make_parallel_resident_train_epoch,
                                   make_resident_eval,
                                   make_resident_train_epoch)

            # COO/banded stores need uniform slots across train/val/test
            # so the scan bodies compile once per split shape
            coo_mode = _coo_loader(train_loader)
            banded_mode = _banded_loader(train_loader)
            if coo_mode or banded_mode:
                check = _coo_loader if coo_mode else _banded_loader
                all_graphs = list(train_loader.graphs)
                for l in (val_loader, test_loader):
                    if l is not None and check(l):
                        all_graphs += list(l.graphs)
            if coo_mode:
                coo_n_slot = max(g.num_nodes for g in all_graphs)
                coo_e_slot = max(g.num_edges for g in all_graphs)
            if banded_mode:
                from .resident import (build_banded_store,
                                       plan_banded_store_shapes)
                banded_shapes = plan_banded_store_shapes(all_graphs)

            def store_for(loader):
                key = id(loader.graphs)
                if key not in stores:
                    if coo_mode:
                        stores[key] = build_coo_store(
                            loader.graphs, coo_n_slot, coo_e_slot,
                            loader.y_is_node_level)
                    elif banded_mode:
                        stores[key] = build_banded_store(
                            loader.graphs, loader.v1, loader.vk,
                            loader.y_is_node_level,
                            gcn_norm=loader.banded_gcn_norm,
                            shapes=banded_shapes)
                    else:
                        stores[key] = build_dense_store(
                            loader.graphs, loader.n_slot, loader.v1,
                            loader.vk, loader.y_is_node_level)
                return stores[key]

            train_store = store_for(train_loader)
            if self.mesh is not None:
                resident_axes = (self.mesh.axis_names
                                 if len(self.mesh.axis_names) > 1
                                 else self.mesh.axis_names[0])
                resident_train_fn = make_parallel_resident_train_epoch(
                    self.model, tx, self.mesh, self.loss, self.node_level,
                    axis=resident_axes)
                resident_eval_fn = make_parallel_resident_eval(
                    self.model, self.mesh, self.loss, self.node_level,
                    self.eval_metric, self.bn_train_mode_eval,
                    axis=resident_axes)
            else:
                resident_train_fn = make_resident_train_epoch(
                    self.model, tx, self.loss, self.node_level)
                resident_eval_fn = make_resident_eval(
                    self.model, self.loss, self.node_level,
                    self.eval_metric, self.bn_train_mode_eval)
            self.log(f"resident store: {len(train_loader.graphs)} graphs "
                     f"in HBM, one-scan epochs"
                     + (f" over {n_dev} devices" if self.mesh is not None
                        else ""))

        def resident_chunks(order, batch_size, pad_idx):
            from .resident import (epoch_index_chunks,
                                   parallel_epoch_index_chunks)
            if self.mesh is not None:
                return jnp.asarray(parallel_epoch_index_chunks(
                    order, batch_size, n_dev, pad_idx))
            return jnp.asarray(epoch_index_chunks(order, batch_size,
                                                  pad_idx))

        wrap_eval_loader = lambda l: l
        if self.mesh is not None and self.parallel_mode == "node":
            from ..parallel.partition import (PartitionedLoader,
                                              make_sharded_eval_step,
                                              make_sharded_train_step)
            axis = self.mesh.axis_names[0]
            train_step = make_sharded_train_step(
                self.model, tx, self.mesh, self.loss, self.node_level,
                axis=axis)
            eval_step = make_sharded_eval_step(
                self.model, self.mesh, self.loss, self.node_level,
                self.eval_metric, axis=axis,
                bn_train_mode=self.bn_train_mode_eval)
            wrap_eval_loader = lambda l: PartitionedLoader(
                l, n_dev, axis, **(self.partition_plans or {}))
        elif self.mesh is not None:
            from ..parallel.dp import (ShardStream, make_parallel_eval_step,
                                       make_parallel_train_step)
            train_step = make_parallel_train_step(
                self.model, tx, self.mesh, self.loss, self.node_level)
            eval_step = make_parallel_eval_step(
                self.model, self.mesh, self.loss, self.node_level,
                self.eval_metric, self.bn_train_mode_eval)
            wrap_eval_loader = lambda l: ShardStream(l, n_dev)
        else:
            train_step = make_train_step(self.model, tx, self.loss,
                                         self.node_level)
            eval_step = make_eval_step(
                self.model, self.loss, self.node_level,
                self.eval_metric, self.bn_train_mode_eval)
            wrap_eval_loader = DeviceCacheLoader
        def make_eval_closure(loader):
            if loader is None:
                return None
            if use_resident and _resident_loader(loader) \
                    and loader.mode == train_loader.mode:
                store = store_for(loader)
                chunks = resident_chunks(
                    np.arange(len(loader.graphs)), loader.batch_size,
                    store.num_graphs)

                def run(state):
                    sums = jax.device_get(
                        resident_eval_fn(state, store, chunks))
                    return summarize_eval_sums(
                        {k: np.asarray(v, np.float64)
                         for k, v in sums.items()})
                return run
            wrapped = wrap_eval_loader(loader)
            return lambda state: evaluate(eval_step, state, wrapped)

        val_eval = make_eval_closure(val_loader)
        test_eval = make_eval_closure(test_loader)
        sched_mode = "min" if self.sched_on == "loss" else self.metric_mode
        sched = ReduceLROnPlateau(
            factor=self.cfg.factor, patience=self.cfg.patience,
            min_lr=self.cfg.min_lr, mode=sched_mode)

        saver = None
        ckpt_dir = self.checkpoint_dir
        if ckpt_dir is None and self.cfg.save_checkpoints and self.cfg.save_dir:
            import os
            ckpt_dir = os.path.join(self.cfg.save_dir, "checkpoints")
        if ckpt_dir is not None:
            from .checkpoint import CheckpointSaver
            saver = CheckpointSaver(
                ckpt_dir, max_checkpoints=self.max_checkpoints,
                maximize_metric=self.metric_mode == "max",
                logger=self.logger)

        key = ("accuracy" if self.metric_mode == "max" else "loss")
        best_val = -math.inf if self.metric_mode == "max" else math.inf
        best_test: Dict[str, float] = {}
        best_epoch = -1
        history = []
        interrupted = False
        for epoch in range(self.cfg.num_epochs):
          try:
            t0 = time.time()
            rng, sub = jax.random.split(rng)
            if use_resident:
                G = len(train_loader.graphs)
                order = (train_loader.rng.permutation(G)
                         if train_loader.shuffle else np.arange(G))
                if getattr(train_loader, "drop_last", False):
                    bs = train_loader.batch_size
                    order = order[: (len(order) // bs) * bs]
                chunks = resident_chunks(order, train_loader.batch_size,
                                         train_store.num_graphs)
                run_epoch = lambda: resident_train_fn(
                    state, train_store, chunks, sub)
            else:
                if self.mesh is not None and self.parallel_mode == "node":
                    from ..parallel.partition import partition_loader
                    stream = partition_loader(
                        train_loader, n_dev, self.mesh.axis_names[0],
                        **(self.partition_plans or {}))
                elif self.mesh is not None:
                    from ..parallel.dp import shard_loader
                    stream = shard_loader(train_loader, n_dev)
                else:
                    stream = device_prefetch(iter(train_loader))
                run_epoch = lambda: train_epoch(train_step, state, stream,
                                                sub)
            # trace the second epoch (past compile); first if there is
            # only one, so --num_epochs 1 still produces a trace
            profile_epoch = 1 if self.cfg.num_epochs > 1 else 0
            if self.cfg.profile_dir and epoch == profile_epoch:
                from ..utils.profiling import trace
                with trace(self.cfg.profile_dir):
                    out = run_epoch()
                self.log(f"profiler trace of epoch {epoch} -> "
                         f"{self.cfg.profile_dir}")
            else:
                out = run_epoch()
            if use_resident:
                state, lsum, cnt = out
                train_loss = (float(lsum) / max(float(cnt), 1.0))
            else:
                state, train_loss = out
            row = {"epoch": epoch, "train_loss": train_loss,
                   "lr": get_lr(state), "seconds": time.time() - t0}
            if val_eval is not None:
                val = val_eval(state)
                row.update({f"val_{k}": v for k, v in val.items()
                            if k != "count"})
                metric = val[key]
                if self.use_scheduler:
                    lr = get_lr(state)
                    sched_metric = (val["loss"] if self.sched_on == "loss"
                                    else metric)
                    new_lr = sched.step(sched_metric, lr)
                    if new_lr != lr:
                        state = set_lr(state, new_lr)
                better = (metric > best_val if self.metric_mode == "max"
                          else metric < best_val)
                if better:
                    best_val = metric
                    best_epoch = epoch
                    if saver is not None:
                        saver.save(epoch, state, metric)
                    if test_eval is not None:
                        best_test = test_eval(state)
                        row.update({f"test_{k}": v for k, v in
                                    best_test.items() if k != "count"})
            history.append(row)
            self.log(" ".join(
                f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items() if not isinstance(v, np.ndarray)))
            if epoch_callback is not None:
                epoch_callback(epoch, state, row)
            # f32-stored lr can round a hair above min_lr; compare with a
            # relative tolerance so the floor is still recognized
            if (self.cfg.stop_at_min_lr
                    and get_lr(state) <= self.cfg.min_lr * (1 + 1e-5)):
                self.log(f"lr reached min_lr at epoch {epoch}; stopping")
                break
          except KeyboardInterrupt:
            # exit gracefully but still report the summary
            # (reference: train_ZINC.py:274-276)
            self.log(f"interrupted at epoch {epoch}")
            interrupted = True
            break
        return state, {
            "best_val": best_val, "best_epoch": best_epoch,
            "best_test": best_test, "history": history,
            "interrupted": interrupted,
        }
