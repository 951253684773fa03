"""Expressive-power collision simulation (reference: run_simulation.py).

Untrained KP-GIN embeddings of random r-regular graphs; the fraction of
node-embedding collisions is compared with the paper's theoretical bound
0.5 * log(2n) / log(r - 1) on the hops needed to distinguish nodes.
"""
from __future__ import annotations

import math

import networkx as nx
import numpy as np
import jax
import jax.numpy as jnp

from ..graph.batch import collate
from ..models import ModelConfig, make_model
from ..prep import KHopConfig, extract_khop
from .common import base_parser


def generate_k_regular(n, r, count, seed):
    out = []
    for i in range(count):
        g = nx.random_regular_graph(r, n, seed=seed + i)
        edges = [(u, v) for u, v in g.edges] + [(v, u) for u, v in g.edges]
        ei = np.array(sorted(edges), dtype=np.int64).T
        out.append({"num_nodes": n, "edge_index": ei,
                    "x": np.ones((n, 1), np.int64),
                    "y": np.array([0], np.int64)})
    return out


def collision_rate(embeddings, tol=1e-8):
    n = embeddings.shape[0]
    d = np.linalg.norm(embeddings[:, None] - embeddings[None], axis=-1)
    coll = (d < tol).sum() - n
    return coll / (n * (n - 1))


def main(argv=None):
    p = base_parser("expressiveness simulation", model_name="KPGIN",
                    hidden_size=64, num_layer=1, K=2, max_pe_num=10)
    p.add_argument("--n", type=int, default=50)
    p.add_argument("--r", type=int, default=3)
    p.add_argument("--graphs", type=int, default=10)
    p.add_argument("--sweep", action="store_true",
                   help="sweep n and K, write collision plot (reference: "
                        "run_simulation.py:143-162)")
    p.add_argument("--plot_path", type=str, default="simulation.png")
    args = p.parse_args(argv)

    if args.sweep:
        return sweep(args)

    kcfg = KHopConfig(K=args.K, kernel="spd", max_edge_attr_num=10,
                      max_hop_num=1, max_edge_type=1, max_edge_count=1,
                      max_distance_count=1)
    raw = generate_k_regular(args.n, args.r, args.graphs, args.seed)
    graphs = [extract_khop(g["num_nodes"], g["edge_index"], None, kcfg,
                           x=g["x"], y=g["y"]) for g in raw]

    mcfg = ModelConfig(
        model_name="KPGIN", hidden_size=args.hidden_size,
        num_layer=1, K=args.K, num_hop1_edge=1, max_pe_num=10,
        JK="last", combine="geometric", virtual_node=False,
        wo_peripheral_edge=True, wo_peripheral_configuration=True,
        input_encoder=("embedding", 2), task="node_classification",
        output_size=args.hidden_size)
    model = make_model(mcfg)

    rates = []
    for i, g in enumerate(graphs):
        b = collate([g])
        v = jax.jit(lambda r, bb: model.init(r, bb, train=False))(
            jax.random.PRNGKey(args.seed + i), b)
        emb = np.asarray(model.apply(v, b, train=False))
        emb = emb[np.asarray(b.node_mask)]
        rates.append(collision_rate(emb))
    bound = 0.5 * math.log(2 * args.n) / math.log(max(args.r - 1, 2))
    print(f"n={args.n} r={args.r} K={args.K}: "
          f"collision rate {np.mean(rates):.4f} "
          f"(theory: K needed ~ {bound:.2f})")
    return float(np.mean(rates))


def sweep(args):
    """Collision rate vs graph size for K = 1..4, against the paper's
    bound on hops needed: 0.5 * log(2n) / log(r-1)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    kcfg0 = dict(kernel="spd", max_edge_attr_num=10, max_hop_num=1,
                 max_edge_type=1, max_edge_count=1, max_distance_count=1)
    ns = [20, 40, 80, 160]
    fig, ax = plt.subplots(figsize=(6, 4))
    for K in (1, 2, 3, 4):
        rates = []
        for n in ns:
            kcfg = KHopConfig(K=K, **kcfg0)
            raw = generate_k_regular(n, args.r, args.graphs, args.seed)
            gs = [extract_khop(g["num_nodes"], g["edge_index"], None, kcfg,
                               x=g["x"], y=g["y"]) for g in raw]
            mcfg = ModelConfig(
                model_name="KPGIN", hidden_size=args.hidden_size // K * K,
                num_layer=1, K=K, num_hop1_edge=1, max_pe_num=10,
                JK="last", combine="geometric", virtual_node=False,
                wo_peripheral_edge=True, wo_peripheral_configuration=True,
                input_encoder=("embedding", 2), task="node_classification",
                output_size=args.hidden_size // K * K)
            model = make_model(mcfg)
            rr = []
            for i, g in enumerate(gs):
                b = collate([g])
                v = jax.jit(lambda r, bb: model.init(r, bb, train=False))(
                    jax.random.PRNGKey(args.seed + i), b)
                emb = np.asarray(model.apply(v, b, train=False))
                rr.append(collision_rate(emb[np.asarray(b.node_mask)]))
            rates.append(float(np.mean(rr)))
        ax.plot(ns, rates, marker="o", label=f"K={K}")
    bound_ns = np.array(ns, float)
    ax.set_xscale("log")
    ax.set_xlabel("graph size n (r-regular, r=%d)" % args.r)
    ax.set_ylabel("node embedding collision rate")
    ax.legend()
    ax.set_title("untrained KP-GIN collisions "
                 "(theory: K needed ~ 0.5 log(2n)/log(r-1))")
    fig.tight_layout()
    fig.savefig(args.plot_path, dpi=120)
    print(f"wrote {args.plot_path}")
    return args.plot_path


if __name__ == "__main__":
    main()
