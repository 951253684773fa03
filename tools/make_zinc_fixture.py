#!/usr/bin/env python
"""Synthesize a ZINC-format molecules bundle with a structural target.

The real ZINC artifact cannot be downloaded here (no egress), so the
matched reference-vs-rebuild ZINC run (tools/match_reference_run.py
--task zinc) trains both sides on this stand-in: random connected
molecule-shaped graphs whose "logP_SA_cycle_normalized" is a
deterministic structural function (atom counts, bond-type mix,
triangles, degree moments) plus 5% noise — a learnable regression
target on the reference's exact raw format.

Format (what datasets/ZINC_dataset.py:101-124 and
kpgnn_tpu/data/molecules.py:40-77 both parse):
  <root>/raw/{train,val,test}.pickle : list of dicts with
      atom_type  LongTensor (n,)        codes 0..20
      bond_type  LongTensor (n, n)      0 = no bond, 1..3 = bond code
      logP_SA_cycle_normalized  FloatTensor scalar
  <root>/raw/{split}.index : comma-separated subset indices

Usage: python tools/make_zinc_fixture.py --out /tmp/zincfix
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np
import torch


def _random_connected(n, rng):
    """Random spanning tree + extra chords (molecule-ish sparsity)."""
    edges = set()
    order = rng.permutation(n)
    for i in range(1, n):
        a, b = order[i], order[rng.integers(0, i)]
        edges.add((min(a, b), max(a, b)))
    for _ in range(int(rng.integers(0, n // 3 + 1))):
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def make_mol(rng):
    n = int(rng.integers(9, 38))
    edges = _random_connected(n, rng)
    atom = rng.integers(0, 21, n)
    bond = np.zeros((n, n), np.int64)
    for a, b in edges:
        t = int(rng.integers(1, 4))
        bond[a, b] = bond[b, a] = t
    A = (bond > 0).astype(np.float64)
    deg = A.sum(1)
    tri = np.trace(A @ A @ A) / 6.0
    y = (0.08 * n + 0.02 * atom.sum() - 0.4 * tri
         + 0.3 * deg.var() + 0.15 * (bond == 2).sum() / 2.0)
    y = y * (1.0 + rng.normal(0, 0.05))
    return {
        "atom_type": torch.tensor(atom, dtype=torch.long),
        "bond_type": torch.tensor(bond, dtype=torch.long),
        "logP_SA_cycle_normalized": torch.tensor(float(y)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n_train", type=int, default=2000)
    p.add_argument("--n_val", type=int, default=300)
    p.add_argument("--n_test", type=int, default=300)
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args()
    rng = np.random.default_rng(args.seed)
    raw = os.path.join(args.out, "raw")
    os.makedirs(raw, exist_ok=True)
    for split, count in (("train", args.n_train), ("val", args.n_val),
                         ("test", args.n_test)):
        mols = [make_mol(rng) for _ in range(count)]
        with open(os.path.join(raw, f"{split}.pickle"), "wb") as f:
            pickle.dump(mols, f)
        with open(os.path.join(raw, f"{split}.index"), "w") as f:
            f.write(",".join(str(i) for i in range(count)) + ",")
    print(f"wrote {args.n_train}/{args.n_val}/{args.n_test} molecules "
          f"to {raw}")


if __name__ == "__main__":
    main()
