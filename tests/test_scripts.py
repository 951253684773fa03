"""Fast end-to-end smoke runs of the CLI entry points (tiny configs)."""
import os

import pytest

DATA = "/root/reference/data"   # shipped raw files for EXP/SR25


def test_counting_script(tmp_path):
    from kpgnn_tpu.scripts.train_counting import main
    mae = main(["--n_graphs", "60", "--num_epochs", "2", "--K", "2",
                "--hidden_size", "16", "--num_layer", "2",
                "--save_dir", str(tmp_path), "--dataset_dir", str(tmp_path)])
    assert mae == mae  # finite, not NaN


@pytest.mark.skipif(not os.path.exists(DATA), reason="no shipped data")
def test_sr_script(tmp_path):
    from kpgnn_tpu.scripts.train_sr import main
    acc = main(["--num_epochs", "3", "--hidden_size", "16", "--K", "2",
                "--num_layer", "1", "--max_hop_num", "2",
                "--save_dir", str(tmp_path), "--dataset_dir", DATA])
    assert 0.0 <= acc <= 1.0


def test_simulation_script():
    from kpgnn_tpu.scripts.run_simulation import main
    rate = main(["--n", "20", "--r", "3", "--graphs", "2", "--K", "2",
                 "--hidden_size", "16"])
    assert 0.0 <= rate <= 1.0


def test_tu_script_gin_format(tmp_path):
    # synthesize a GIN-format dataset on the fly
    import numpy as np
    rng = np.random.default_rng(0)
    d = tmp_path / "TOY2"
    d.mkdir()
    lines = ["24"]
    for i in range(24):
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
    (d / "TOY2.txt").write_text("\n".join(lines) + "\n")
    idx = d / "10fold_idx"
    idx.mkdir()
    allidx = np.arange(24)
    for f in range(1, 11):
        te = allidx[(allidx % 10) == (f - 1) % 10]
        tr = allidx[(allidx % 10) != (f - 1) % 10]
        (idx / f"train_idx-{f}.txt").write_text("\n".join(map(str, tr)))
        (idx / f"test_idx-{f}.txt").write_text("\n".join(map(str, te)))

    from kpgnn_tpu.scripts.train_tu import main
    acc = main(["--dataset_name", "TOY2", "--dataset_dir", str(tmp_path),
                "--num_epochs", "2", "--folds", "2", "--K", "2",
                "--hidden_size", "16", "--num_layer", "1",
                "--save_dir", str(tmp_path)])
    assert 0.0 <= acc <= 1.0
