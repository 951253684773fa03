"""Exponential moving average of params (reference: train_utils.py:44-91,
defined-but-dormant there; live here)."""
from __future__ import annotations

import jax


class EMA:
    def __init__(self, params, decay: float = 0.999):
        self.decay = decay
        self.shadow = jax.tree.map(lambda p: p, params)

    def update(self, params):
        d = self.decay
        self.shadow = jax.tree.map(
            lambda s, p: d * s + (1.0 - d) * p, self.shadow, params)
        return self.shadow
