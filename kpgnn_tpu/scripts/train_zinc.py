"""ZINC-subset penalized-logP regression (reference: train_ZINC.py).

Canonical headline configs (reference: README.md:127-128):
  KPGINPlus  K=8  L=8  h=104 --residual --JK concat
  KPGINPrime K=16 L=17 h=96  --residual
L1 loss, plateau LR with stop-at-min-lr, best-val -> test MAE over runs.
"""
from __future__ import annotations

import os

import numpy as np
import jax

from ..data import load_zinc
from ..models import make_model
from ..train import GraphLoader, Trainer
from .common import (base_parser, loader_kwargs, model_config,
                     parallel_kwargs,
                     prepare, setup_run, train_config)


def main(argv=None):
    p = base_parser("ZINC regression", model_name="KPGINPlus", K=8,
                    hidden_size=104, num_layer=8, num_epochs=500,
                    batch_size=64, JK="concat", num_hop1_edge=3,
                    max_pe_num=50, max_edge_type=3, max_edge_count=50,
                    max_hop_num=6, max_distance_count=50, patience=10,
                    runs=4)
    p.add_argument("--full", action="store_true",
                   help="full 250k ZINC instead of the 12k subset")
    args = p.parse_args(argv)
    save_dir, logger = setup_run(args, "ZINC")

    splits = load_zinc(os.path.join(args.dataset_dir, "ZINC"),
                       subset=not args.full)
    prepped = {k: prepare(v, args, f"ZINC_{k}") for k, v in splits.items()}

    mcfg = model_config(args, input_encoder=("embedding", 21),
                        task="graph_regression", output_size=1)
    model = make_model(mcfg)
    lk = loader_kwargs(args, mcfg, prepped["train"])

    maes = []
    for run in range(args.runs):
        tl = GraphLoader(prepped["train"], args.batch_size, shuffle=True,
                         seed=args.seed + run, **lk)
        vl = GraphLoader(prepped["val"], args.batch_size, **lk)
        el = GraphLoader(prepped["test"], args.batch_size, **lk)
        trainer = Trainer(model, train_config(args, "l1", stop_at_min_lr=True),
                          loss="l1", metric_mode="min", logger=logger,
                          **parallel_kwargs(args, mcfg))
        _, res = trainer.fit(tl, vl, el,
                             rng=jax.random.PRNGKey(args.seed + run))
        mae = res["best_test"].get("loss", float("nan"))
        maes.append(mae)
        logger.info(f"run {run}: test MAE {mae:.5f}")
    logger.info(f"ZINC test MAE: {np.mean(maes):.5f} +- {np.std(maes):.5f}")
    return float(np.mean(maes))


if __name__ == "__main__":
    main()
