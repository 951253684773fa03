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


def _write_qm9_raw_fixture(root):
    """Two tiny molecules in byte-format gdb9 artifacts (V2000 SDF +
    target CSV + uncharacterized skip list)."""
    raw = root / "QM9" / "raw"
    raw.mkdir(parents=True, exist_ok=True)

    def molblock(name, atoms, bonds):
        lines = [name, "  toy", ""]
        lines.append(f"{len(atoms):3d}{len(bonds):3d}  0  0  0  0  0  0  "
                     "0  0999 V2000")
        for (x, y, z, s) in atoms:
            lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {s:<3s} 0  0  0  0"
                         "  0  0  0  0  0  0  0  0")
        for (a, b, t) in bonds:
            lines.append(f"{a:3d}{b:3d}{t:3d}  0  0  0  0")
        lines.append("M  END")
        return "\n".join(lines) + "\n"

    # methane-ish (C + 2 H) and an O=C fragment with a triple-bond N
    m1 = molblock("mol1", [(0, 0, 0, "C"), (1, 0, 0, "H"), (0, 1, 0, "H")],
                  [(1, 2, 1), (1, 3, 1)])
    m2 = molblock("mol2", [(0, 0, 0, "C"), (1.2, 0, 0, "O"),
                           (-1.2, 0, 0, "N")],
                  [(1, 2, 2), (1, 3, 3)])
    m3 = molblock("skipme", [(0, 0, 0, "F"), (1, 0, 0, "H")], [(1, 2, 1)])
    (raw / "gdb9.sdf").write_text("$$$$\n".join([m1, m2, m3]) + "$$$$\n")
    rows = ["tag,A,B,C,mu,alpha,homo,lumo,gap,r2,zpve,u0,u298,h298,g298,"
            "cv,u0_atom,u298_atom,h298_atom,g298_atom"]
    for i in range(3):
        rows.append(",".join(["gdb_%d" % (i + 1)] +
                             [str(float(i + 1))] * 19))
    (raw / "gdb9.sdf.csv").write_text("\n".join(rows) + "\n")
    # uncharacterized.txt: 9 header lines, entries, 2 footer lines
    unc = [""] * 9 + ["3   something"] + ["", ""]
    (raw / "uncharacterized.txt").write_text("\n".join(unc))


def test_qm9_raw_sdf_loader(tmp_path):
    from kpgnn_tpu.data.molecules import QM9_CONVERSION, load_qm9_raw
    _write_qm9_raw_fixture(tmp_path)
    graphs = load_qm9_raw(str(tmp_path / "QM9"))
    assert len(graphs) == 2            # third molecule skipped
    g1, g2 = graphs
    assert g1["num_nodes"] == 3
    # atom features: one-hot type + [z, aromatic, sp, sp2, sp3, num_hs]
    assert g1["x"].shape == (3, 11)
    np.testing.assert_array_equal(g1["z"], [6, 1, 1])
    assert g1["x"][0, 1] == 1.0        # C one-hot
    assert g1["x"][0, 10] == 2.0       # carbon has 2 H neighbors
    # bond codes: single=0 -> +2 offset
    np.testing.assert_array_equal(np.unique(g1["edge_attr"]), [2])
    np.testing.assert_array_equal(np.unique(g2["edge_attr"]), [3, 4])
    # edges sorted by sender-major order, both directions present
    ei = g1["edge_index"]
    assert (ei[0] * 3 + ei[1] == np.sort(ei[0] * 3 + ei[1])).all()
    assert ei.shape[1] == 4
    # y: reordered [3:]+[ :3] and unit-converted — row i is constant
    # (i+1) pre-conversion, so y == (i+1) * conversion
    np.testing.assert_allclose(g1["y"], 1.0 * QM9_CONVERSION, rtol=1e-6)
    np.testing.assert_allclose(g2["y"], 2.0 * QM9_CONVERSION, rtol=1e-6)


def test_qm9_script_from_raw_sdf(tmp_path):
    """train_qm9 end-to-end from raw gdb9 artifacts (no qm9_v3.pt)."""
    # need more molecules than the tiny parser fixture for a train run
    raw = tmp_path / "QM9" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(4)
    recs, rows = [], ["tag," + ",".join(f"t{i}" for i in range(19))]
    for i in range(20):
        n = int(rng.integers(3, 6))
        lines = [f"mol{i}", "  toy", "",
                 f"{n:3d}{n - 1:3d}  0  0  0  0  0  0  0  0999 V2000"]
        syms = ["C"] + list(rng.choice(["C", "N", "O", "H"], n - 1))
        for j in range(n):
            lines.append(f"{j:10.4f}{0.0:10.4f}{0.0:10.4f} {syms[j]:<3s}"
                         " 0  0")
        for j in range(n - 1):
            t = int(rng.integers(1, 4))
            lines.append(f"{j + 1:3d}{j + 2:3d}{t:3d}  0")
        lines.append("M  END")
        recs.append("\n".join(lines) + "\n")
        rows.append(",".join([f"gdb_{i+1}"] +
                             [f"{rng.normal():.6f}"] * 19))
    (raw / "gdb9.sdf").write_text("$$$$\n".join(recs) + "$$$$\n")
    (raw / "gdb9.sdf.csv").write_text("\n".join(rows) + "\n")

    from kpgnn_tpu.scripts.train_qm9 import main
    mae = main(["--num_epochs", "2", "--K", "2", "--num_layer", "2",
                "--hidden_size", "16", "--batch_size", "4", "--task", "3",
                "--save_dir", str(tmp_path), "--dataset_dir",
                str(tmp_path)])
    assert np.isfinite(mae)
