"""Graph property regression (reference: train_graph_property.py).

Tasks 0..2: is_connected / diameter / spectral_radius.  MSE loss,
reported as log10(MSE) (reference: train_graph_property.py:49-63).
"""
from __future__ import annotations

import math

import numpy as np
import jax

from ..data import generate_property_dataset
from ..models import make_model
from ..train import GraphLoader, Trainer
from .common import (base_parser, loader_kwargs, model_config,
                     parallel_kwargs,
                     prepare, setup_run, train_config)


def main(argv=None):
    p = base_parser("graph property", model_name="KPGINPlus", K=6,
                    hidden_size=96, num_layer=6, num_epochs=250,
                    batch_size=128, max_pe_num=50, max_hop_num=5,
                    max_edge_type=1, max_edge_count=50,
                    max_distance_count=100, lr=1e-2, patience=10, runs=4,
                    l2_wd=3e-7)
    p.add_argument("--task", type=int, default=0, choices=range(3))
    p.add_argument("--data_scale", type=float, default=1.0,
                   help="shrink the generated splits (smoke runs)")
    args = p.parse_args(argv)
    save_dir, logger = setup_run(args, f"gprop{args.task}")

    data = generate_property_dataset(seed=1234, scale=args.data_scale)
    t = args.task
    for split in data.values():
        for g in split:
            g["y"] = np.array([g["y"][t]], np.float32)
            g.pop("node_y", None)
    prepped = {k: prepare(v, args, f"gprop_{k}_s{args.data_scale}") for k, v in data.items()}

    mcfg = model_config(args, input_encoder=("linear", 2),
                        task="graph_regression", output_size=1)
    model = make_model(mcfg)
    lk = loader_kwargs(args, mcfg, prepped["train"])

    scores = []
    for run in range(args.runs):
        tl = GraphLoader(prepped["train"], args.batch_size, shuffle=True,
                         seed=args.seed + run, **lk)
        vl = GraphLoader(prepped["val"], args.batch_size, **lk)
        el = GraphLoader(prepped["test"], args.batch_size, **lk)
        trainer = Trainer(model, train_config(args, "mse", stop_at_min_lr=True),
                          loss="mse", metric_mode="min", logger=logger,
                          **parallel_kwargs(args, mcfg))
        _, res = trainer.fit(tl, vl, el,
                             rng=jax.random.PRNGKey(args.seed + run))
        mse = res["best_test"].get("loss", float("nan"))
        scores.append(math.log10(mse) if mse > 0 else float("-inf"))
        logger.info(f"run {run}: test log10(MSE) {scores[-1]:.4f}")
    logger.info(f"task {t} log10(MSE): "
                f"{np.mean(scores):.4f} +- {np.std(scores):.4f}")
    return float(np.mean(scores))


if __name__ == "__main__":
    main()
