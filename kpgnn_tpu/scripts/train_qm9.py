"""QM9 per-target regression (reference: train_qm9.py).

One of 19 targets (the paper reports 12); MSE train loss on standardized
targets, eval MAE x std (reference: train_qm9.py:96-115); 10/10/80
val/test/train split after a seeded shuffle
(reference: train_qm9.py:244-263).  Canonical config: KPGINPlus K=8 L=8
h=128 attention combine/pool --virtual_node --use_rd.
"""
from __future__ import annotations

import os

import numpy as np
import jax

from ..data import load_qm9
from ..models import make_model
from ..train import GraphLoader, Trainer
from .common import (base_parser, loader_kwargs, model_config,
                     parallel_kwargs,
                     prepare, setup_run, train_config)


def main(argv=None):
    p = base_parser("QM9 regression", model_name="KPGINPlus", K=8,
                    hidden_size=128, num_layer=8, num_epochs=200,
                    batch_size=128, JK="last", combine="attention",
                    pooling_method="attention", num_hop1_edge=4,
                    max_pe_num=50, max_edge_type=4, max_edge_count=20,
                    max_hop_num=5, max_distance_count=15, lr=1e-3,
                    patience=5)
    p.add_argument("--task", type=int, default=0, choices=range(19))
    p.add_argument("--use_pos", action="store_true")
    # "post": train in converted (eV) units, log MAE/conversion too;
    # "pre": divide targets back to original units before training
    # (reference: train_qm9.py:61-70,185-187)
    p.add_argument("--convert", type=str, default="post",
                   choices=("pre", "post"))
    # PyG's qm9_v3.pt ships y already reordered/converted (the default);
    # set this only for a dump still in raw gdb9 CSV order/units
    p.add_argument("--qm9_raw_targets", action="store_true")
    args = p.parse_args(argv)
    save_dir, logger = setup_run(args, f"QM9t{args.task}")

    qm9_root = os.path.join(args.dataset_dir, "QM9")
    if (not os.path.exists(os.path.join(qm9_root, "raw", "qm9_v3.pt"))
            and os.path.exists(os.path.join(qm9_root, "raw", "gdb9.sdf"))):
        # no preprocessed dump but raw gdb9 artifacts present: build from
        # raw with the pure-python SDF parser (no rdkit needed)
        from ..data.molecules import load_qm9_raw
        raw = load_qm9_raw(qm9_root)
    else:
        raw = load_qm9(qm9_root, targets_raw_order=args.qm9_raw_targets)
    graphs = prepare(raw, args, "QM9")

    t = args.task
    if args.convert == "pre":
        from ..data.molecules import QM9_CONVERSION
        graphs = [g.replace(y=np.asarray(
            g.y / np.float32(QM9_CONVERSION[t]), np.float32))
            for g in graphs]
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(graphs))
    n = len(graphs)
    n_val, n_test = n // 10, n // 10
    val_idx = order[:n_val]
    test_idx = order[n_val:n_val + n_test]
    train_idx = order[n_val + n_test:]

    ys = np.array([float(np.asarray(graphs[i].y).reshape(-1)[t])
                   for i in train_idx])
    mean, std = ys.mean(), ys.std()

    def with_target(idx):
        out = []
        for i in idx:
            g = graphs[i]
            yv = (float(np.asarray(g.y).reshape(-1)[t]) - mean) / std
            out.append(g.replace(y=np.array([yv], np.float32)))
        return out

    mcfg = model_config(args, input_encoder=("qm9", int(args.use_pos)),
                        task="graph_regression", output_size=1)
    model = make_model(mcfg)
    train_graphs = with_target(train_idx)
    lk = loader_kwargs(args, mcfg, train_graphs)

    tl = GraphLoader(train_graphs, args.batch_size, shuffle=True,
                     seed=args.seed, **lk)
    vl = GraphLoader(with_target(val_idx), args.batch_size, **lk)
    el = GraphLoader(with_target(test_idx), args.batch_size, **lk)
    trainer = Trainer(model, train_config(args, "mse", stop_at_min_lr=True),
                      loss="mse", metric_mode="min", eval_metric="mae",
                      logger=logger,
                      **parallel_kwargs(args, mcfg))
    _, res = trainer.fit(tl, vl, el, rng=jax.random.PRNGKey(args.seed))
    # reference log line: MAE in dataset units, /std (normalized), and
    # /conversion back to original units when training post-conversion
    # (reference: train_qm9.py:303-312)
    from ..data.molecules import QM9_CONVERSION
    mae = res["best_test"].get("mae", float("nan")) * std
    mae_norm = mae / std
    mae_convert = (mae / float(QM9_CONVERSION[t])
                   if args.convert == "post" else 0.0)
    logger.info(f"QM9 target {t}: test MAE {mae:.5f}, "
                f"MAE norm {mae_norm:.5f}, MAE convert {mae_convert:.5f}")
    return float(mae)


if __name__ == "__main__":
    main()
