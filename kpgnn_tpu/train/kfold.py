"""Cross-validation splits (reference: train_utils.py:323-356).

k_fold: stratified 10-fold where fold i's validation set is fold i-1's
test set, matching the reference protocol exactly.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _stratified_folds(labels: np.ndarray, folds: int, seed: int = 12345):
    """Deterministic stratified fold assignment (per-class round-robin
    after a seeded shuffle) — sklearn-free."""
    rng = np.random.default_rng(seed)
    assign = np.zeros(len(labels), dtype=np.int64)
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        rng.shuffle(idx)
        for i, j in enumerate(idx):
            assign[j] = i % folds
    return assign


def k_fold(n: int, labels: Sequence, folds: int = 10, seed: int = 12345
           ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Returns [(train_idx, val_idx, test_idx)] per fold; val = previous
    fold's test (reference: train_utils.py:323-338)."""
    if folds < 3:
        raise ValueError(f"k_fold needs folds >= 3: val is the previous "
                         f"fold's test, so folds={folds} leaves no "
                         "training data")
    labels = np.asarray(labels)
    assign = _stratified_folds(labels, folds, seed)
    test_sets = [np.flatnonzero(assign == f) for f in range(folds)]
    out = []
    for f in range(folds):
        test = test_sets[f]
        val = test_sets[f - 1]
        mask = np.ones(n, dtype=bool)
        mask[test] = False
        mask[val] = False
        out.append((np.flatnonzero(mask), val, test))
    return out


def k_fold_unstratified(n: int, folds: int = 10, seed: int = 12345):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    test_sets = np.array_split(perm, folds)
    out = []
    for f in range(folds):
        test = np.sort(test_sets[f])
        val = np.sort(test_sets[f - 1])
        mask = np.ones(n, dtype=bool)
        mask[test] = False
        mask[val] = False
        out.append((np.flatnonzero(mask), val, test))
    return out
