"""Train state: params + batch stats + optimizer state in one pytree.

The learning rate lives inside optax's inject_hyperparams state so the
plateau scheduler can update it between epochs without recompiling the
jitted step.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def make_optimizer(lr: float, l2_wd: float = 0.0) -> optax.GradientTransformation:
    """Adam with optional decoupled weight decay, lr exposed as a mutable
    hyperparameter (torch optim.Adam equivalent)."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.adamw(learning_rate, weight_decay=l2_wd)
        if l2_wd > 0 else optax.adam(learning_rate)
    )(learning_rate=lr)


def create_train_state(model, example_batch, rng, lr: float,
                       l2_wd: float = 0.0) -> tuple[TrainState, optax.GradientTransformation]:
    # jit the init: eager init dispatches hundreds of tiny ops one by one,
    # which is pathological over a remote-dispatch TPU link
    init_fn = jax.jit(lambda rng, b: model.init(rng, b, train=False))
    variables = init_fn(rng, example_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    tx = make_optimizer(lr, l2_wd)
    opt_state = tx.init(params)
    return TrainState(
        params=params, batch_stats=batch_stats, opt_state=opt_state,
        step=jnp.asarray(0),
    ), tx


def get_lr(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    opt_state = state.opt_state._replace(hyperparams=hp)
    return state.replace(opt_state=opt_state)


def count_parameters(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
