"""Cross-framework activation parity, executed end-to-end.

Two layers of guarantee:

* ``test_bundle_replay`` — this framework reproduces every committed
  golden bundle bit-for-bit (prep + init + forward determinism), so a
  refactor that silently changes activations fails here even without
  torch.
* ``test_reference_side_parity`` — the REAL reference code
  (/root/reference, run on CPU torch via tools/pyg_shim.py) is rebuilt
  with the bundle's parameters, preprocesses the same raw graph with
  its own data_utils pipeline, and every hooked module output must
  match this framework's captured activations.  This is the
  per-layer-activations-allclose north star (BASELINE.md) actually
  executing.
"""
import glob
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "kpgnn_tpu", "data", "parity_golden")
REFERENCE = "/root/reference"

BUNDLES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))


def test_bundles_exist():
    names = {os.path.basename(b) for b in BUNDLES}
    assert {"kpgin_spd.npz", "kpgcn.npz", "kpsage.npz", "kpginplus.npz",
            "kpginprime.npz", "kpgin_gd.npz", "kpgin_attn.npz"} <= names


@pytest.mark.slow
@pytest.mark.parametrize("bundle", BUNDLES,
                         ids=[os.path.basename(b) for b in BUNDLES])
def test_bundle_replay(bundle):
    from kpgnn_tpu.scripts.make_parity_golden import replay_bundle

    worst = replay_bundle(bundle, atol=1e-6)
    assert worst <= 1e-6


@pytest.mark.parametrize("bundle", BUNDLES,
                         ids=[os.path.basename(b) for b in BUNDLES])
def test_reference_side_parity(bundle):
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity_reference_side as prs

    prs.ensure_pyg()
    worst = prs.check_bundle(bundle, REFERENCE, atol=1e-4)
    assert worst <= 1e-4, f"{os.path.basename(bundle)}: {worst:.3e}"


def test_shim_scatter_matches_manual():
    """The shim's MessagePassing must scatter exactly like a hand loop."""
    import torch
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import pyg_shim

    rng = np.random.default_rng(0)
    n, e, d = 7, 20, 3
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.normal(size=(n, d)).astype(np.float32)

    class Conv(pyg_shim.MessagePassing):
        def message(self, x_j):
            return x_j * 2.0

    out = Conv(aggr="add").propagate(
        torch.tensor(np.stack([src, dst])), x=torch.tensor(x)).numpy()
    want = np.zeros((n, d), np.float32)
    for s, t in zip(src, dst):
        want[t] += 2.0 * x[s]
    assert np.allclose(out, want, atol=1e-6)

    out_m = Conv(aggr="mean").propagate(
        torch.tensor(np.stack([src, dst])), x=torch.tensor(x)).numpy()
    cnt = np.bincount(dst, minlength=n).clip(min=1)
    assert np.allclose(out_m, want / cnt[:, None], atol=1e-6)
