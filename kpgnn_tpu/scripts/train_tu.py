"""TU graph-kernel benchmarks (reference: train_TU.py).

Two protocols:
  * GIN split (MUTAG/PTC/PROTEINS/IMDB-B): canonical 10-fold index files,
    step-decay LR every 50 epochs, report mean-of-fold-max /
    cross-epoch-max / final-epoch accuracy
    (reference: train_TU.py:72-148);
  * stratified k-fold (DD or any standard-format TU dataset) with
    val = previous fold's test (reference: train_TU.py:151-229).
"""
from __future__ import annotations

import os

import numpy as np
import jax

from ..data import load_tu_gin_split, load_tu_standard, num_tag_classes
from ..models import make_model
from ..train import GraphLoader, k_fold
from ..train.loop import evaluate, make_eval_step, make_train_step, train_epoch
from ..train.state import create_train_state, set_lr
from .common import (base_parser, loader_kwargs, model_config, prepare,
                     setup_run, train_config)

GIN_SPLIT_SETS = ("MUTAG", "PTC", "PROTEINS", "IMDBBINARY", "IMDBMULTI",
                  "NCI1", "COLLAB", "REDDITBINARY", "REDDITMULTI5K")


def one_hot_x(graphs, n_classes):
    for g in graphs:
        oh = np.zeros((g["num_nodes"], n_classes), dtype=np.float32)
        oh[np.arange(g["num_nodes"]), g["x"][:, 0]] = 1.0
        g["x"] = oh
    return graphs


def run_fold(model, args, logger, fold, train_graphs, val_graphs,
             test_graphs, lk, n_classes):
    tl = GraphLoader(train_graphs, args.batch_size, shuffle=True,
                     seed=args.seed + fold, **lk)
    vl = GraphLoader(val_graphs, args.batch_size, **lk) if val_graphs else None
    el = GraphLoader(test_graphs, args.batch_size, **lk)
    rng = jax.random.PRNGKey(args.seed + fold)
    rng, init_rng = jax.random.split(rng)
    state, tx = create_train_state(model, tl.example(), init_rng,
                                   args.lr, args.l2_wd)
    train_step = make_train_step(model, tx, "cross_entropy")
    eval_step = make_eval_step(model, "cross_entropy")
    accs, vals = [], []
    for epoch in range(args.num_epochs):
        # step decay by --factor every 50 epochs
        # (reference: train_TU.py:82,119-121,330)
        state = set_lr(state, args.lr * (args.factor ** (epoch // 50)))
        rng, sub = jax.random.split(rng)
        state, tr_loss = train_epoch(train_step, state, tl, sub)
        test = evaluate(eval_step, state, el)
        accs.append(test["accuracy"])
        if vl is not None:
            vals.append(evaluate(eval_step, state, vl)["accuracy"])
        if (epoch + 1) % 25 == 0:
            logger.info(f"fold {fold} epoch {epoch}: "
                        f"lr {args.lr * (args.factor ** (epoch // 50)):.6f} "
                        f"loss {tr_loss:.4f} test acc {accs[-1]:.4f}")
    return np.array(accs), (np.array(vals) if vals else None)


def main(argv=None):
    p = base_parser("TU classification", model_name="KPGIN", K=2,
                    hidden_size=32, num_layer=3, num_epochs=350,
                    batch_size=32, lr=1e-2, max_pe_num=30, max_hop_num=3,
                    max_edge_type=1, max_edge_count=10,
                    max_distance_count=10, drop_prob=0.5, l2_wd=3e-4)
    p.add_argument("--dataset_name", type=str, default="MUTAG")
    p.add_argument("--folds", type=int, default=10)
    args = p.parse_args(argv)
    save_dir, logger = setup_run(args, args.dataset_name)

    name = args.dataset_name
    gin_txt = os.path.join(args.dataset_dir, name, f"{name}.txt")
    if os.path.exists(gin_txt) or name.upper().replace("_", "") in GIN_SPLIT_SETS:
        raw, folds = load_tu_gin_split(args.dataset_dir, name)
    else:
        raw, folds = load_tu_standard(args.dataset_dir, name), []
    n_tag = num_tag_classes(raw)
    n_classes = int(max(int(g["y"][0]) for g in raw)) + 1
    raw = one_hot_x(raw, n_tag)
    graphs = prepare(raw, args, name)
    labels = [int(g.y[0]) for g in graphs]

    # hidden 33 when K=3 so hidden % K == 0 (reference: train_TU.py:395-398)
    if args.hidden_size % args.K:
        args.hidden_size += args.K - args.hidden_size % args.K
    mcfg = model_config(args, input_encoder=("linear", n_tag),
                        task="graph_classification", output_size=n_classes)
    model = make_model(mcfg)
    lk = loader_kwargs(args, mcfg, graphs)

    fold_accs = []
    if folds:
        for fold, (tr, te) in enumerate(folds[:args.folds]):
            accs, _ = run_fold(model, args, logger, fold,
                               [graphs[i] for i in tr], None,
                               [graphs[i] for i in te], lk, n_classes)
            fold_accs.append(accs)
    else:
        for fold, (tr, va, te) in enumerate(
                k_fold(len(graphs), labels, folds=args.folds,
                       seed=args.seed)):
            tr = np.concatenate([tr, va])   # reference combines train+val
            accs, _ = run_fold(model, args, logger, fold,
                               [graphs[i] for i in tr], None,
                               [graphs[i] for i in te], lk, n_classes)
            fold_accs.append(accs)

    acc = np.stack(fold_accs)               # (folds, epochs)
    per_fold_max = acc.max(axis=1)
    epoch_mean = acc.mean(axis=0)
    best_epoch = int(epoch_mean.argmax())
    logger.info(
        f"{name}: fold-max {per_fold_max.mean():.4f} +- {per_fold_max.std():.4f}; "
        f"cross-epoch-max {epoch_mean.max():.4f} +- {acc[:, best_epoch].std():.4f}; "
        f"final-epoch {acc[:, -1].mean():.4f} +- {acc[:, -1].std():.4f}")
    return float(epoch_mean.max())


if __name__ == "__main__":
    main()
