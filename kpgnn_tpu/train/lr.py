"""Learning-rate controllers driven by epoch-level metrics.

ReduceLROnPlateau mirrors torch's semantics used by the reference
(reference: train_ZINC.py:245-252): factor, patience in epochs, floor at
min_lr.  StepDecay mirrors the TU script's every-50-epochs halving
(reference: train_TU.py:119-121).  Both are host-side: they mutate the lr
hyperparameter inside the optimizer state between jitted steps.
"""
from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass
class ReduceLROnPlateau:
    factor: float = 0.5
    patience: int = 10
    min_lr: float = 1e-6
    mode: str = "min"
    threshold: float = 1e-4

    best: float = None  # type: ignore[assignment]  # set per-mode below
    num_bad: int = 0

    def __post_init__(self):
        if self.best is None:
            self.best = math.inf if self.mode == "min" else -math.inf

    def step(self, metric: float, lr: float) -> float:
        # torch's rel threshold_mode: best*(1-thr) for min, best*(1+thr)
        # for max; the per-mode init above makes the first metric always
        # count as an improvement (torch _init_is_better semantics)
        improved = (metric < self.best * (1 - self.threshold)
                    if self.mode == "min"
                    else metric > self.best * (1 + self.threshold))
        if improved:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr

    @property
    def bottomed(self) -> bool:
        return False  # caller compares lr against min_lr


@dataclasses.dataclass
class StepDecay:
    every: int = 50
    factor: float = 0.5

    def lr_at(self, base_lr: float, epoch: int) -> float:
        return base_lr * (self.factor ** (epoch // self.every))
