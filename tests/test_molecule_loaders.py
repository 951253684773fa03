"""ZINC/QM9 raw-file parsing against synthetic fixtures shaped like the
real artifacts (torch-tensor pickles / tensor dumps)."""
import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from kpgnn_tpu.data import load_qm9, load_zinc


def test_zinc_loader(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    mols = []
    for i in range(6):
        n = int(rng.integers(4, 8))
        adj = np.zeros((n, n), np.int64)
        for j in range(n - 1):        # chain with bond types 1..3
            t = int(rng.integers(1, 4))
            adj[j, j + 1] = adj[j + 1, j] = t
        mols.append({
            "atom_type": torch.tensor(rng.integers(0, 21, n)),
            "bond_type": torch.tensor(adj),
            "logP_SA_cycle_normalized": torch.tensor([float(i)]),
        })
    for split in ("train", "val", "test"):
        with open(raw / f"{split}.pickle", "wb") as f:
            pickle.dump(mols, f)
    (raw / "train.index").write_text("0,2,4")

    out = load_zinc(str(tmp_path), subset=True)
    assert len(out["train"]) == 3          # subset via index file
    assert len(out["val"]) == 6            # no index -> full split
    g = out["train"][1]                    # mol #2
    assert g["y"][0] == 2.0
    assert g["edge_attr"].min() >= 2       # +1 offset applied
    assert g["edge_index"].shape[0] == 2


def test_qm9_loader(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(1)
    data_list = []
    for i in range(3):
        n = int(rng.integers(3, 6))
        e = 2 * (n - 1)
        ei = []
        for j in range(n - 1):
            ei += [(j, j + 1), (j + 1, j)]
        ei = np.array(ei).T
        data_list.append({
            "x": torch.tensor(rng.normal(size=(n, 11)).astype(np.float32)),
            "z": torch.tensor(rng.integers(1, 10, n)),
            "pos": torch.tensor(rng.normal(size=(n, 3)).astype(np.float32)),
            "edge_index": torch.tensor(ei),
            "edge_attr": torch.tensor(np.eye(4)[rng.integers(0, 4, e)]
                                      .astype(np.float32)),
            "y": torch.tensor(rng.normal(size=(1, 19)).astype(np.float32)),
        })
    torch.save(data_list, raw / "qm9_v3.pt")

    graphs = load_qm9(str(tmp_path))
    assert len(graphs) == 3
    g = graphs[0]
    assert g["edge_attr"].min() >= 2       # one-hot -> code + 2
    assert g["y"].shape == (19,)
    assert g["z"].dtype == np.int64 and g["pos"].shape[1] == 3

    # default: qm9_v3.pt ships y already reordered/converted and the
    # reference's non-rdkit branch loads it untouched
    # (reference: datasets/QM9Dataset.py:197-211) — no double transform
    raw_y = data_list[0]["y"].numpy().reshape(-1)[:19].astype(np.float64)
    np.testing.assert_allclose(g["y"], raw_y.astype(np.float32), rtol=1e-6)

    # raw-order dumps: y column i == reorder([3:] + [:3]) of the raw row,
    # scaled by the per-target unit conversion indexed in the NEW order
    # (reference: datasets/QM9Dataset.py:20-26,222-223)
    from kpgnn_tpu.data.molecules import QM9_CONVERSION
    conv = load_qm9(str(tmp_path), targets_raw_order=True)
    expect = np.concatenate([raw_y[3:], raw_y[:3]]) * QM9_CONVERSION
    np.testing.assert_allclose(conv[0]["y"], expect.astype(np.float32),
                               rtol=1e-6)
    for i in (0, 5, 16):
        assert conv[0]["y"][i] == np.float32(expect[i])


def test_missing_files_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_zinc(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        load_qm9(str(tmp_path))


def test_qm9_atomref():
    """Same contract as the reference's QM9.atomref
    (reference: datasets/QM9Dataset.py:152-157)."""
    from kpgnn_tpu.data.molecules import QM9_ATOMREFS, qm9_atomref

    assert qm9_atomref(0) is None and qm9_atomref(12) is None
    for t in (6, 7, 8, 9, 10, 11):
        ref = qm9_atomref(t)
        assert ref.shape == (100, 1)
        np.testing.assert_allclose(ref[[1, 6, 7, 8, 9], 0],
                                   QM9_ATOMREFS[t], rtol=1e-7)
        assert ref[0, 0] == 0.0 and ref[2, 0] == 0.0
    # U0 (target 7): H2O atomization sanity — total minus per-atom refs
    # is a small molecular residual, not thousands of eV
    z = np.array([1, 1, 8])
    assert abs(-2080.0 - qm9_atomref(7)[z].sum()) < 30.0
