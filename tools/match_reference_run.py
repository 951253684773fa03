#!/usr/bin/env python
"""Run the ACTUAL reference training scripts end-to-end and record their
final metrics — the benchmark-level parity check (BASELINE.md north
star: "ZINC test MAE: match reference run").

The per-layer activation parity harness (tools/parity_reference_side.py)
already executes the reference's *model* on golden bundles; this tool
executes the reference's *training protocol* — its own main(), its own
optimizer/scheduler/seeding/eval gates — to convergence, on the same
data the TPU rebuild trains on, and writes a JSON result for the
comparison table.

Tasks:
  counting  /root/reference/train_structure_counting.py  (task 0,
            triangles).  The upstream randomgraph.mat is a missing
            blob, so the rebuild's generator
            (kpgnn_tpu/data/counting.py, seed 1234) is written into a
            reference-format .mat first: both sides then train on
            byte-identical graphs and the reference computes its own
            closed-form labels (datasets/GraphCountDataset.py:44-58).
  exp       /root/reference/train_EXP.py on the SHIPPED
            data/EXP/raw/GRAPHSAT.pkl — same raw file the rebuild's
            loader reads, no synthesis needed.

Usage (run from anywhere; heavy, run under nohup):
    python tools/match_reference_run.py --task counting \
        --workdir /tmp/match_ref_counting --out MATCHRUN_counting.json

The reference code runs UNMODIFIED via tools/pyg_shim.py.  Final
metrics are parsed from the reference's own log file.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_shim():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import pyg_shim

    pyg_shim.install()


def make_counting_mat(workdir: str, n_graphs: int) -> None:
    """Write the rebuild's counting graphs as a reference-format
    randomgraph.mat (cell array A + split indices; F is loaded but
    unused — labels are recomputed closed-form by the reference)."""
    import numpy as np
    import scipy.io as sio

    sys.path.insert(0, REPO)
    from kpgnn_tpu.data.counting import generate_counting_dataset

    data = generate_counting_dataset(n_graphs, seed=1234)
    graphs = data["train"] + data["val"] + data["test"]
    A = np.empty(len(graphs), dtype=object)
    for i, g in enumerate(graphs):
        n = g["num_nodes"]
        a = np.zeros((n, n))
        ei = g["edge_index"]
        a[ei[0], ei[1]] = 1.0
        A[i] = a
    n_tr, n_va = len(data["train"]), len(data["val"])
    raw = os.path.join(workdir, "data", "subgraphcount", "raw")
    os.makedirs(raw, exist_ok=True)
    sio.savemat(os.path.join(raw, "randomgraph.mat"), {
        "A": A.reshape(1, -1),
        "F": np.zeros((len(graphs), 5)),
        "train_idx": np.arange(n_tr)[None],
        "val_idx": np.arange(n_tr, n_tr + n_va)[None],
        "test_idx": np.arange(n_tr + n_va, len(graphs))[None],
    })


def run_reference_main(module_name: str, argv: list, workdir: str) -> str:
    """chdir into the sandbox, import the reference script, run its
    main() verbatim.  Returns the save dir it logged into."""
    ensure_shim()
    sys.path.insert(0, "/root/reference")
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    sys.argv = [module_name + ".py"] + argv
    import importlib

    mod = importlib.import_module(module_name)
    t0 = time.time()
    mod.main()
    print(f"[match] reference main() finished in {time.time() - t0:.0f}s",
          file=sys.stderr)
    # newest run dir under save/
    save = os.path.join(workdir, "save")
    runs = []
    for root, _dirs, files in os.walk(save):
        runs += [os.path.join(root, f) for f in files
                 if f.endswith(".log") or f == "log.txt"]
    return max(runs, key=os.path.getmtime)


def parse_counting_log(log_path: str) -> dict:
    """Reference log lines:  'Run 001, Vali: 0.1234, Test: 0.1234, ...'
    and 'Final Val: m ± s, Final Test: m ± s,...'."""
    txt = open(log_path).read()
    runs = re.findall(r"Run (\d+), Vali: ([\d.]+), Test: ([\d.]+)", txt)
    final = re.search(
        r"Final Val: ([\d.]+) ± ([\d.]+), Final Test: ([\d.]+) ± ([\d.]+)",
        txt)
    return {
        "runs": [{"run": int(r), "val": float(v), "test": float(t)}
                 for r, v, t in runs],
        "final_val_mean": float(final.group(1)) if final else None,
        "final_val_std": float(final.group(2)) if final else None,
        "final_test_mean": float(final.group(3)) if final else None,
        "final_test_std": float(final.group(4)) if final else None,
    }


def parse_zinc_log(log_path: str) -> dict:
    """'Run: r,  Best Val:v, Best Test: t,...' + 'Final Vali: m ± s,
    Final Test: m ± s' (train_ZINC.py:279-288)."""
    txt = open(log_path).read()
    runs = re.findall(r"Run: (\d+),\s+Best Val:([\d.]+), "
                      r"Best Test: ([\d.]+)", txt)
    final = re.search(r"Final Vali: ([\d.]+) ± ([\d.nan]+), "
                      r"Final Test: ([\d.]+) ± ([\d.nan]+)", txt)
    fl = lambda s: None if s is None or "nan" in s else float(s)
    return {
        "runs": [{"run": int(r), "val": float(v), "test": float(t)}
                 for r, v, t in runs],
        "final_val_mean": fl(final.group(1)) if final else None,
        "final_val_std": fl(final.group(2)) if final else None,
        "final_test_mean": fl(final.group(3)) if final else None,
        "final_test_std": fl(final.group(4)) if final else None,
    }


def parse_exp_log(log_path: str) -> dict:
    """'Fold i, best train: x, best test: y' + 'Test result: Mean: m,
    Std :s'."""
    txt = open(log_path).read()
    folds = re.findall(r"Fold (\d+), best train: ([\d.]+), "
                       r"best test: ([\d.]+)", txt)
    mean = re.search(r"Test result: Mean: ([\d.e+-]+), Std :([\d.e+-]+|nan)",
                     txt)
    return {
        "folds": [{"fold": int(f), "train": float(tr), "test": float(te)}
                  for f, tr, te in folds],
        "final_test_mean": float(mean.group(1)) if mean else None,
        "final_test_std": (float(mean.group(2))
                           if mean and mean.group(2) != "nan" else None),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=("counting", "exp", "zinc"),
                   required=True)
    p.add_argument("--zinc_fixture", default="/tmp/zincfix",
                   help="root written by tools/make_zinc_fixture.py")
    p.add_argument("--workdir", required=True)
    p.add_argument("--out", required=True, help="JSON result path")
    p.add_argument("--n_graphs", type=int, default=5000)
    p.add_argument("--runs", type=int, default=2,
                   help="counting repeat runs (reference default 4)")
    p.add_argument("--num_epochs", type=int, default=0,
                   help="override epochs (0 = reference default)")
    args = p.parse_args()
    out_path = os.path.abspath(args.out)
    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)

    if args.task == "counting":
        make_counting_mat(workdir, args.n_graphs)
        argv = ["--task", "0", "--runs", str(args.runs)]
        if args.num_epochs:
            argv += ["--num_epochs", str(args.num_epochs)]
        log = run_reference_main("train_structure_counting", argv, workdir)
        res = parse_counting_log(log)
    elif args.task == "zinc":
        # link the fixture's raw bundle into the per-config dataset root
        # the reference constructs (train_ZINC.py:204-207)
        for k, kern in (("8", "spd"),):
            raw = os.path.join(workdir, "data", f"ZINC_{k}_{kern}", "raw")
            os.makedirs(os.path.dirname(raw), exist_ok=True)
            if not os.path.exists(raw):
                os.symlink(os.path.join(os.path.abspath(args.zinc_fixture),
                                        "raw"), raw)
        argv = ["--runs", str(args.runs)]
        if args.num_epochs:
            argv += ["--num_epochs", str(args.num_epochs)]
        log = run_reference_main("train_ZINC", argv, workdir)
        res = parse_zinc_log(log)
    else:
        # EXP reads data/EXP/raw/GRAPHSAT.pkl relative to cwd: link the
        # shipped raw file into the sandbox (reference dir is read-only)
        raw = os.path.join(workdir, "data", "EXP", "raw")
        os.makedirs(raw, exist_ok=True)
        dst = os.path.join(raw, "GRAPHSAT.pkl")
        if not os.path.exists(dst):
            os.symlink("/root/reference/data/EXP/raw/GRAPHSAT.pkl", dst)
        argv = []
        if args.num_epochs:
            argv += ["--num_epochs", str(args.num_epochs)]
        log = run_reference_main("train_EXP", argv, workdir)
        res = parse_exp_log(log)

    res.update(task=args.task, log=log,
               protocol="reference main() verbatim via pyg_shim")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
