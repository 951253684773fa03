#!/usr/bin/env python
"""Synthesize a qm9_v3.pt-format QM9 stand-in with STRUCTURAL targets.

The real QM9 artifact cannot be downloaded in this environment (no
egress), so the 12-target sweep (VERDICT r5 / reference
run_qm9_targets.py:15-19) runs on this fixture: molecule-shaped graphs
whose 19 targets are distinct deterministic functions of the graph
(atom counts, ring membership, degree moments, ...) plus small noise —
so every per-target run has a learnable signal and a meaningful MAE,
and the reorder/convert bookkeeping (train_qm9.py --convert) is
exercised on target-dependent scales.

Format matches PyG's preprocessed dump (the contract
kpgnn_tpu/data/molecules.py:86-116 parses): a list of dicts with x
(n, 11) float, z (n,) int, pos (n, 3), edge_index (2, e), edge_attr
(e, 4) one-hot bond codes, y (1, 19) float32 "already reordered and
converted".

Usage: python tools/make_qm9_fixture.py --out /tmp/qm9fix --n 640
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import torch


def make_molecule(rng):
    """Chain/ring/branched molecule, 6..18 heavy atoms."""
    n = int(rng.integers(6, 19))
    kind = rng.integers(0, 3)
    edges = [(i, i + 1) for i in range(n - 1)]
    if kind == 1:                       # ring
        edges.append((n - 1, 0))
    elif kind == 2:                     # branched: extra chords
        for _ in range(int(rng.integers(1, 3))):
            a = int(rng.integers(0, n - 3))
            b = a + int(rng.integers(2, min(5, n - a)))
            edges.append((a, b % n))
    edges = sorted(set((min(a, b), max(a, b)) for a, b in edges
                       if a != b))
    ei = np.array([(a, b) for a, b in edges] +
                  [(b, a) for a, b in edges]).T
    z = rng.choice([1, 6, 7, 8, 9], size=n,
                   p=[0.3, 0.45, 0.1, 0.1, 0.05]).astype(np.int64)
    bond = rng.integers(0, 4, ei.shape[1] // 2)
    bond = np.concatenate([bond, bond])          # symmetric bond types
    return n, ei, z, bond


def targets(n, ei, z, bond, rng):
    """19 distinct structural targets, varied scales."""
    deg = np.bincount(ei[0], minlength=n)
    A = np.zeros((n, n))
    A[ei[0], ei[1]] = 1
    tri = np.trace(A @ A @ A) / 6.0
    vals = [
        ei.shape[1] / 2.0,                 # 0 mu      ~ bond count
        float(n),                          # 1 alpha   ~ heavy atoms
        z.mean(),                          # 2 homo
        -z.mean() / 2.0,                   # 3 lumo
        z.std() + 1.0,                     # 4 gap
        (z ** 2).sum() / 10.0,             # 5 r2
        tri + deg.mean(),                  # 6 zpve
        z.sum() * 1.0,                     # 7 U0
        z.sum() + n / 2.0,                 # 8 U
        z.sum() - n / 3.0,                 # 9 H
        z.sum() * 0.8 + tri,               # 10 G
        deg.var() + 2.0,                   # 11 Cv
        # 12..18: the thermo-derived extras (unused by the sweep)
        float(bond.sum()), deg.max() * 1.0, float((z == 6).sum()),
        float((z == 1).sum()), n * z.mean(), tri * 2.0, deg.sum() / 2.0,
    ]
    y = np.asarray(vals, np.float64)
    y = y * (1.0 + rng.normal(0, 0.02, y.shape))     # 2% noise
    return y.astype(np.float32)[None, :]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="dataset root dir")
    p.add_argument("--n", type=int, default=640)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()
    rng = np.random.default_rng(args.seed)
    data_list = []
    for _ in range(args.n):
        n, ei, z, bond = make_molecule(rng)
        data_list.append({
            "x": torch.tensor(np.eye(11)[np.clip(z, 0, 10)]
                              .astype(np.float32)),
            "z": torch.tensor(z),
            "pos": torch.tensor(rng.normal(size=(n, 3))
                                .astype(np.float32)),
            "edge_index": torch.tensor(ei),
            "edge_attr": torch.tensor(np.eye(4)[bond].astype(np.float32)),
            "y": torch.tensor(targets(n, ei, z, bond, rng)),
        })
    raw = os.path.join(args.out, "QM9", "raw")
    os.makedirs(raw, exist_ok=True)
    torch.save(data_list, os.path.join(raw, "qm9_v3.pt"))
    print(f"wrote {len(data_list)} molecules to {raw}/qm9_v3.pt")


if __name__ == "__main__":
    main()
