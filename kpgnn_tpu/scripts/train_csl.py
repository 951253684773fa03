"""CSL circular-skip-link classification (reference: train_CSL.py).

10 isomorphism classes of C_41 + skip links, 1-WL-indistinguishable;
stratified 10-fold CV.
"""
from __future__ import annotations

import numpy as np
import jax

from ..data import generate_csl
from ..models import make_model
from ..train import GraphLoader, Trainer, k_fold
from .common import (base_parser, loader_kwargs, model_config,
                     parallel_kwargs,
                     prepare, setup_run, train_config)


def main(argv=None):
    p = base_parser("CSL expressiveness", model_name="KPGIN", K=4,
                    hidden_size=48, num_layer=4, num_epochs=200,
                    batch_size=64, max_pe_num=1000, max_hop_num=4,
                    max_edge_type=1, max_edge_count=1000,
                    max_distance_count=1000, patience=5, l2_wd=3e-6,
                    matmul_precision="highest")
    # the reference hardcodes 10 folds (train_CSL.py); default matches,
    # fewer folds are for smoke tests / quick probes
    p.add_argument("--folds", type=int, default=10)
    args = p.parse_args(argv)
    save_dir, logger = setup_run(args, "CSL")

    raw = generate_csl()
    for g in raw:
        g["x"] = np.ones((g["num_nodes"], 1), dtype=np.float32)
    graphs = prepare(raw, args, "CSL")
    labels = [int(g.y[0]) for g in graphs]

    mcfg = model_config(args, input_encoder=("linear", 1),
                        task="graph_classification", output_size=10)
    model = make_model(mcfg)
    lk = loader_kwargs(args, mcfg, graphs)

    accs = []
    for fold, (tr, va, te) in enumerate(
            k_fold(len(graphs), labels, folds=args.folds,
                   seed=args.seed)):
        tl = GraphLoader([graphs[i] for i in tr], args.batch_size,
                         shuffle=True, seed=args.seed + fold, **lk)
        vl = GraphLoader([graphs[i] for i in va], args.batch_size, **lk)
        el = GraphLoader([graphs[i] for i in te], args.batch_size, **lk)
        # best epoch gated on highest val accuracy, constant LR
        # (reference: train_CSL.py:250-254; no scheduler in its loop)
        trainer = Trainer(model, train_config(args, "cross_entropy"),
                          loss="cross_entropy", metric_mode="max",
                          use_scheduler=False, logger=logger,
                          **parallel_kwargs(args, mcfg))
        _, res = trainer.fit(tl, vl, el,
                             rng=jax.random.PRNGKey(args.seed + fold))
        acc = res["best_test"].get("accuracy", 0.0)
        accs.append(acc)
        logger.info(f"fold {fold}: test acc {acc:.4f}")
    logger.info(f"CSL: {np.mean(accs):.4f} +- {np.std(accs):.4f}")
    return float(np.mean(accs))


if __name__ == "__main__":
    main()
