"""Checkpointing: best-k saver + simple save/load.

The reference ships a CheckpointSaver (priority-queue best-k eviction,
reference: train_utils.py:94-195) that no script calls; here it is live.
State serializes via flax.serialization msgpack — params, batch stats and
optimizer state round-trip exactly, so training resumes bit-identically.
"""
from __future__ import annotations

import heapq
import os
import pickle
from typing import Any, Optional

import jax
from flax import serialization

from .state import TrainState


def save_checkpoint(path: str, state: TrainState, meta: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "state": serialization.to_bytes(jax.device_get(state)),
        "meta": meta or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: TrainState):
    """Restore into a template state (from create_train_state) so the
    pytree structure and shard placement are defined by the caller."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = serialization.from_bytes(template, payload["state"])
    return state, payload.get("meta", {})


class CheckpointSaver:
    """Keep the best `max_checkpoints` states by a scalar metric."""

    def __init__(self, save_dir: str, max_checkpoints: int = 3,
                 maximize_metric: bool = False, logger=None):
        self.save_dir = save_dir
        self.max_checkpoints = max_checkpoints
        self.maximize = maximize_metric
        self.logger = logger
        self.best: Optional[float] = None
        self._heap: list = []          # (priority, uid, path); min-heap
        self._uid = 0
        os.makedirs(save_dir, exist_ok=True)

    def is_best(self, metric: Optional[float]) -> bool:
        if metric is None:
            return False
        if self.best is None:
            return True
        return metric > self.best if self.maximize else metric < self.best

    def save(self, step: int, state: TrainState, metric: float):
        path = os.path.join(self.save_dir, f"step_{step}.ckpt")
        save_checkpoint(path, state, {"step": step, "metric": metric})
        if self.is_best(metric):
            self.best = metric
            best_path = os.path.join(self.save_dir, "best.ckpt")
            save_checkpoint(best_path, state, {"step": step, "metric": metric})
            if self.logger:
                self.logger.info(f"new best ({metric}) at step {step}")
        priority = metric if self.maximize else -metric
        heapq.heappush(self._heap, (priority, self._uid, path))
        self._uid += 1
        while len(self._heap) > self.max_checkpoints:
            _, _, worst = heapq.heappop(self._heap)
            try:
                os.remove(worst)
            except OSError:
                pass
        return path
