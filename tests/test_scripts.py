"""Fast end-to-end smoke runs of ALL 11 CLI entry points (tiny configs).

Mirrors the reference's script surface (train_ZINC/qm9/TU/EXP/CSL/SR/
structure_counting/graph_property/node_property + run_simulation +
run_*_search); every main() must run end-to-end on CPU fixtures."""
import os
import pickle

import numpy as np
import pytest

DATA = "/root/reference/data"   # shipped raw files for EXP/SR25 (read-only)


def _linked_data(tmp_path, name):
    """Symlink a shipped raw dataset into tmp so the prep cache lands in
    tmp, never inside the read-only reference tree."""
    (tmp_path / name).symlink_to(os.path.join(DATA, name))
    return str(tmp_path)


def test_counting_script(tmp_path):
    from kpgnn_tpu.scripts.train_counting import main
    mae = main(["--runs", "1", "--n_graphs", "60", "--num_epochs", "2", "--K", "2",
                "--hidden_size", "16", "--num_layer", "2",
                "--save_dir", str(tmp_path), "--dataset_dir", str(tmp_path)])
    assert mae == mae  # finite, not NaN


@pytest.mark.skipif(not os.path.exists(DATA), reason="no shipped data")
def test_sr_script(tmp_path):
    from kpgnn_tpu.scripts.train_sr import main
    acc = main(["--num_epochs", "3", "--hidden_size", "16", "--K", "2",
                "--num_layer", "1", "--max_hop_num", "2",
                "--save_dir", str(tmp_path),
                "--dataset_dir", _linked_data(tmp_path, "sr25")])
    assert 0.0 <= acc <= 1.0


def test_simulation_script():
    from kpgnn_tpu.scripts.run_simulation import main
    rate = main(["--n", "20", "--r", "3", "--graphs", "2", "--K", "2",
                 "--hidden_size", "16"])
    assert 0.0 <= rate <= 1.0


def write_gin_dataset(root, name="TOY2", n_graphs=24):
    """Synthesize a GIN-format TU dataset + 10-fold index files."""
    import numpy as np
    rng = np.random.default_rng(0)
    d = root / name
    d.mkdir()
    lines = [str(n_graphs)]
    for i in range(n_graphs):
        n = int(rng.integers(5, 9))
        label = i % 2
        adj = {u: set() for u in range(n)}
        for _ in range(n + 2 + 4 * label):
            u, v = rng.integers(0, n, 2)
            if u != v:
                adj[int(u)].add(int(v))
                adj[int(v)].add(int(u))
        lines.append(f"{n} {label}")
        for u in range(n):
            nbrs = sorted(adj[u])
            lines.append(f"0 {len(nbrs)} " + " ".join(map(str, nbrs)))
    (d / f"{name}.txt").write_text("\n".join(lines) + "\n")
    idx = d / "10fold_idx"
    idx.mkdir()
    allidx = np.arange(n_graphs)
    for f in range(1, 11):
        te = allidx[(allidx % 10) == (f - 1) % 10]
        tr = allidx[(allidx % 10) != (f - 1) % 10]
        (idx / f"train_idx-{f}.txt").write_text("\n".join(map(str, tr)))
        (idx / f"test_idx-{f}.txt").write_text("\n".join(map(str, te)))


def test_tu_script_gin_format(tmp_path):
    write_gin_dataset(tmp_path)
    from kpgnn_tpu.scripts.train_tu import main
    acc = main(["--dataset_name", "TOY2", "--dataset_dir", str(tmp_path),
                "--num_epochs", "2", "--folds", "2", "--K", "2",
                "--hidden_size", "16", "--num_layer", "1",
                "--save_dir", str(tmp_path)])
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_tu_script_dense_resident_matches_standard(tmp_path):
    """The resident fold loop is the dense per-batch fold loop (same
    protocol, same rng) — accuracies must match with shuffle fixed."""
    write_gin_dataset(tmp_path)
    from kpgnn_tpu.scripts.train_tu import main
    res = {}
    for mode in ("on", "off"):
        res[mode] = main([
            "--dataset_name", "TOY2", "--dataset_dir", str(tmp_path),
            "--num_epochs", "3", "--folds", "2", "--K", "2",
            "--hidden_size", "16", "--num_layer", "1",
            "--backend", "dense", "--resident", mode,
            "--save_dir", str(tmp_path / f"r_{mode}")])
    assert 0.0 <= res["on"] <= 1.0


def _write_zinc_fixture(root):
    torch = pytest.importorskip("torch")
    raw = root / "ZINC" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    mols = []
    for i in range(8):
        n = int(rng.integers(4, 8))
        adj = np.zeros((n, n), np.int64)
        for j in range(n - 1):
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
    (raw / "train.index").write_text("0,2,4,6")


def test_zinc_script(tmp_path):
    _write_zinc_fixture(tmp_path)
    from kpgnn_tpu.scripts.train_zinc import main
    mae = main(["--num_epochs", "2", "--runs", "1", "--K", "2",
                "--num_layer", "2", "--hidden_size", "16",
                "--batch_size", "4", "--save_dir", str(tmp_path),
                "--dataset_dir", str(tmp_path)])
    assert np.isfinite(mae)


def _write_qm9_fixture(root):
    torch = pytest.importorskip("torch")
    raw = root / "QM9" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(1)
    data_list = []
    for _ in range(20):
        n = int(rng.integers(3, 6))
        ei = []
        for j in range(n - 1):
            ei += [(j, j + 1), (j + 1, j)]
        ei = np.array(ei).T
        e = ei.shape[1]
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


@pytest.mark.slow
def test_qm9_script(tmp_path):
    _write_qm9_fixture(tmp_path)
    from kpgnn_tpu.scripts.train_qm9 import main
    mae = main(["--num_epochs", "2", "--K", "2", "--num_layer", "2",
                "--hidden_size", "16", "--batch_size", "4", "--task", "3",
                "--save_dir", str(tmp_path), "--dataset_dir", str(tmp_path)])
    assert np.isfinite(mae)


@pytest.mark.skipif(not os.path.exists(DATA), reason="no shipped data")
@pytest.mark.slow
def test_exp_script(tmp_path):
    from kpgnn_tpu.scripts.train_exp import main
    acc = main(["--folds", "2", "--num_epochs", "1", "--K", "2",
                "--num_layer", "1", "--hidden_size", "16",
                "--max_hop_num", "2", "--save_dir", str(tmp_path),
                "--dataset_dir", _linked_data(tmp_path, "EXP")])
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_csl_script(tmp_path):
    from kpgnn_tpu.scripts.train_csl import main
    acc = main(["--num_epochs", "1", "--K", "2", "--num_layer", "1",
                "--hidden_size", "16", "--max_hop_num", "2", "--folds", "3",
                "--save_dir", str(tmp_path), "--dataset_dir", str(tmp_path)])
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_graph_property_script(tmp_path):
    from kpgnn_tpu.scripts.train_graph_property import main
    score = main(["--data_scale", "0.02", "--runs", "1", "--num_epochs", "2", "--K", "2",
                  "--num_layer", "2", "--hidden_size", "16",
                  "--batch_size", "32", "--task", "1",
                  "--save_dir", str(tmp_path), "--dataset_dir",
                  str(tmp_path)])
    assert np.isfinite(score)


def test_node_property_script(tmp_path):
    from kpgnn_tpu.scripts.train_node_property import main
    score = main(["--data_scale", "0.02", "--runs", "1", "--num_epochs", "2", "--K", "2",
                  "--num_layer", "2", "--hidden_size", "16",
                  "--batch_size", "32", "--task", "0",
                  "--save_dir", str(tmp_path), "--dataset_dir",
                  str(tmp_path)])
    assert np.isfinite(score)


@pytest.mark.slow
def test_search_script(tmp_path):
    from kpgnn_tpu.scripts.run_search import main
    res = main(["--preset", "structure_counting", "--limit", "1",
                "--base", f"--n_graphs 40 --runs 1 --num_epochs 1 "
                          f"--hidden_size 16 --save_dir {tmp_path} "
                          f"--dataset_dir {tmp_path}"])
    assert len(res) == 1 and res[0]["script"] == "counting"
    res = main(["counting", "--grid", '{"K": [2]}',
                "--base", f"--n_graphs 40 --num_epochs 1 --hidden_size 16 "
                          f"--num_layer 2 --save_dir {tmp_path} "
                          f"--dataset_dir {tmp_path}"])
    assert len(res) == 1 and "metric" in res[0]


def write_standard_tu_dataset(root, name="TOYSTD", n_graphs=20):
    """Synthesize a standard-format TU tree (DS_A.txt /
    DS_graph_indicator.txt / DS_graph_labels.txt / DS_node_labels.txt,
    1-based ids, comma-separated edges — byte-format of the TU zips,
    reference: datasets/tu_dataset.py:233-324)."""
    rng = np.random.default_rng(3)
    d = root / name
    d.mkdir()
    a, ind, glab, nlab = [], [], [], []
    node0 = 1
    for g in range(n_graphs):
        n = int(rng.integers(4, 8))
        label = g % 2
        for u in range(n):
            ind.append(g + 1)
            nlab.append(int(rng.integers(0, 3)))
        for u in range(n - 1):          # chain backbone
            a.append((node0 + u, node0 + u + 1))
            a.append((node0 + u + 1, node0 + u))
        for _ in range(1 + 2 * label):  # label-correlated extra edges
            u, v = rng.integers(0, n, 2)
            if u != v:
                a.append((node0 + int(u), node0 + int(v)))
                a.append((node0 + int(v), node0 + int(u)))
        glab.append(label)
        node0 += n
    (d / f"{name}_A.txt").write_text(
        "\n".join(f"{u}, {v}" for u, v in a) + "\n")
    (d / f"{name}_graph_indicator.txt").write_text(
        "\n".join(map(str, ind)) + "\n")
    (d / f"{name}_graph_labels.txt").write_text(
        "\n".join(map(str, glab)) + "\n")
    (d / f"{name}_node_labels.txt").write_text(
        "\n".join(map(str, nlab)) + "\n")


@pytest.mark.slow
def test_tu_script_standard_format(tmp_path):
    """train_tu from a raw standard-format tree (stratified k-fold path,
    no GIN index files)."""
    write_standard_tu_dataset(tmp_path)
    from kpgnn_tpu.scripts.train_tu import main
    acc = main(["--dataset_name", "TOYSTD", "--dataset_dir",
                str(tmp_path), "--num_epochs", "2", "--folds", "3",
                "--K", "2", "--hidden_size", "16", "--num_layer", "1",
                "--save_dir", str(tmp_path)])
    assert 0.0 <= acc <= 1.0
