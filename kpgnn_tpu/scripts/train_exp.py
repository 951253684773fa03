"""EXP / CEXP 1-WL-pair discrimination (reference: train_EXP.py).

Each consecutive pair of graphs is 1-WL-indistinguishable with opposite
SAT labels; a KP-GNN with adequate K must reach ~100% accuracy, so this
doubles as an expressiveness correctness check.
"""
from __future__ import annotations

import numpy as np
import jax

from ..data import load_exp_pickle, load_exp_txt
from ..models import make_model
from ..train import GraphLoader, Trainer
from .common import (base_parser, loader_kwargs, model_config,
                     parallel_kwargs,
                     prepare, setup_run, train_config)


def load_raw(args):
    import os
    if args.dataset_name == "EXP":
        return load_exp_pickle(
            os.path.join(args.dataset_dir, "EXP", "raw", "GRAPHSAT.pkl"))
    return load_exp_txt(
        os.path.join(args.dataset_dir, "CEXP", "GRAPHSAT.txt"))


def main(argv=None):
    p = base_parser("EXP expressiveness", model_name="KPGIN", K=3,
                    hidden_size=48, num_layer=3, num_epochs=40,
                    batch_size=128, max_pe_num=1, max_edge_type=1,
                    max_edge_count=1000, max_hop_num=5,
                    max_distance_count=1000, l2_wd=3e-7,
                    matmul_precision="highest")
    p.add_argument("--dataset_name", type=str, default="EXP",
                   choices=("EXP", "CEXP"))
    p.add_argument("--folds", type=int, default=10)
    args = p.parse_args(argv)
    save_dir, logger = setup_run(args, args.dataset_name)

    raw = load_raw(args)
    graphs = prepare(raw, args, args.dataset_name)
    mcfg = model_config(args, input_encoder=("embedding", 2),
                        task="graph_classification", output_size=2)
    model = make_model(mcfg)
    lk = loader_kwargs(args, mcfg, graphs)

    if args.folds < 2:
        # fold f's test is 1/folds of the data and the train split is
        # the rest: folds=1 would leave the train split empty
        raise SystemExit("--folds must be >= 2")
    # contiguous block folds keep each 1-WL pair intact and both classes
    # in every split (reference: train_EXP.py:260-282)
    n = len(graphs)
    idx = np.arange(n)
    accs = []
    per = n // args.folds
    for fold in range(args.folds):
        test = idx[fold * per:(fold + 1) * per]
        rest = np.concatenate([idx[:fold * per], idx[(fold + 1) * per:]])
        vn = len(rest) // args.folds
        val = rest[fold * vn:(fold + 1) * vn]
        train = np.concatenate([rest[:fold * vn], rest[(fold + 1) * vn:]])
        tl = GraphLoader([graphs[i] for i in train], args.batch_size,
                         shuffle=True, seed=args.seed + fold, **lk)
        vl = GraphLoader([graphs[i] for i in val], args.batch_size, **lk)
        el = GraphLoader([graphs[i] for i in test], args.batch_size, **lk)
        # best epoch gated on lowest val loss, constant LR
        # (reference: train_EXP.py:298-301; no scheduler in its loop)
        trainer = Trainer(model, train_config(args, "cross_entropy"),
                          loss="cross_entropy", metric_mode="min",
                          use_scheduler=False, logger=logger,
                          **parallel_kwargs(args, mcfg))
        _, res = trainer.fit(tl, vl, el,
                             rng=jax.random.PRNGKey(args.seed + fold))
        acc = res["best_test"].get("accuracy", 0.0)
        accs.append(acc)
        logger.info(f"fold {fold}: test acc {acc:.4f}")
    logger.info(f"{args.dataset_name}: {np.mean(accs):.4f} +- {np.std(accs):.4f}")
    return float(np.mean(accs))


if __name__ == "__main__":
    main()
