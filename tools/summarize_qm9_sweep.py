#!/usr/bin/env python
"""Aggregate a run_search --preset qm9_targets log into the 12-row
markdown table (per target: KP-GIN+ and KP-GIN' converted-unit MAE),
mirroring the reference's sweep aggregation (run_qm9_targets.py:15-19 +
train_qm9.py:303-312).

Usage: python tools/summarize_qm9_sweep.py /tmp/qm9_sweep.log
"""
from __future__ import annotations

import json
import sys

TARGETS = ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve", "U0",
           "U", "H", "G", "Cv"]


def main(path):
    rows = {}
    for line in open(path):
        line = line.strip()
        if not line.startswith('{"script"'):
            continue
        rec = json.loads(line)
        cfg = rec["config"]
        task = int(cfg[cfg.index("--task") + 1])
        variant = ("KPGINPrime" if "KPGINPrime" in cfg else "KPGINPlus")
        rows.setdefault(task, {})[variant] = rec["metric"]
    print("| # | target | KP-GIN+ (vn+rd) MAE | KP-GIN' K=16 MAE |")
    print("|---|---|---|---|")
    for t in sorted(rows):
        r = rows[t]
        name = TARGETS[t] if t < len(TARGETS) else str(t)
        fmt = lambda v: f"{v:.4f}" if isinstance(v, float) else "—"
        print(f"| {t} | {name} | {fmt(r.get('KPGINPlus'))} "
              f"| {fmt(r.get('KPGINPrime'))} |")
    n = sum(len(v) for v in rows.values())
    print(f"\n{n}/24 runs parsed")


if __name__ == "__main__":
    main(sys.argv[1])
