"""Grid-search launcher (reference: run_*_search.py).

Runs a script's main() in-process over the cartesian product of a flag
grid; collects the returned headline metric per config.
"""
from __future__ import annotations

import argparse
import itertools
import json
from typing import Dict, List

SCRIPTS = {
    "exp": "kpgnn_tpu.scripts.train_exp",
    "csl": "kpgnn_tpu.scripts.train_csl",
    "sr": "kpgnn_tpu.scripts.train_sr",
    "tu": "kpgnn_tpu.scripts.train_tu",
    "zinc": "kpgnn_tpu.scripts.train_zinc",
    "qm9": "kpgnn_tpu.scripts.train_qm9",
    "counting": "kpgnn_tpu.scripts.train_counting",
    "graph_property": "kpgnn_tpu.scripts.train_graph_property",
    "node_property": "kpgnn_tpu.scripts.train_node_property",
}


def main(argv=None):
    p = argparse.ArgumentParser(description="grid search launcher")
    p.add_argument("script", choices=sorted(SCRIPTS))
    p.add_argument("--grid", type=str, required=True,
                   help='JSON dict of flag -> list, e.g. '
                        '\'{"K": [2, 3], "kernel": ["spd", "gd"]}\'')
    p.add_argument("--base", type=str, default="",
                   help="extra flags passed to every run")
    args = p.parse_args(argv)

    import importlib
    mod = importlib.import_module(SCRIPTS[args.script])

    grid: Dict[str, List] = json.loads(args.grid)
    keys = sorted(grid)
    results = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        flags = args.base.split() if args.base else []
        for k, v in zip(keys, combo):
            flags += [f"--{k}", str(v)]
        print(f"=== run {dict(zip(keys, combo))} ===", flush=True)
        metric = mod.main(flags)
        results.append({"config": dict(zip(keys, combo)), "metric": metric})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
