"""Banded-backend autotuner: sweep the receiver tile on-device.

Times the device-resident hop-major banded aggregation (fwd and
fwd+bwd) for each tile on the large-graph polymer workload, with the
same dependent-chained-inside-one-jit methodology as tune_pallas /
bench.py (see MEASUREMENT TRAPS 2-3 in CLAUDE.md).  The halo is
auto-sized per plan, so the swept variable is the FLOP/pipeline trade:
per-row cost is 2·(tile + 2·halo)·D MACs vs the matmul efficiency of
the smaller batched contractions.  On v5e at halo 64, tile=128 wins
both the bare op (518 M vs 468 M fwd edges/s) and the clean-process
full step (160.8 M vs 143.9 M) — collate_banded auto-picks it when the
halo fits.  Full-step comparisons MUST run one tile per process:
sequential in-process timing understated tile=128 by 2× (see
BASELINE.md and MEASUREMENT TRAP 4).

No reference counterpart (upstream has no kernels).
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.timing import chained_throughput as _chained_throughput


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_nodes", type=int, default=8192)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--K", type=int, default=3)
    p.add_argument("--hidden_size", type=int, default=102)
    p.add_argument("--iters", type=int, default=96)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--tiles", default="128,256,512")
    args = p.parse_args(argv)

    from kpgnn_tpu.data.synthetic import synthetic_polymers
    from kpgnn_tpu.graph.batch import collate, collate_banded
    from kpgnn_tpu.ops.banded import banded_khop_aggregate
    from kpgnn_tpu.prep import KHopConfig  # noqa: F401  (env parity)

    graphs = synthetic_polymers(args.batch, args.n_nodes, K=args.K, seed=0)
    union_edges = int(np.asarray(collate(graphs).adj.edge_mask).sum())
    v1, vk = 5, 32
    rng = np.random.default_rng(0)
    D = args.hidden_size

    results = {}
    for tile_s in args.tiles.split(","):
        tile = int(tile_s)
        b = collate_banded(graphs, v1=v1, vk=vk, tile=tile)
        adj = b.adj
        n = b.x.shape[0]
        x0 = jnp.asarray(rng.normal(
            size=(args.K, n, D)).astype(np.float32))
        t1 = jnp.asarray(rng.normal(size=(v1, D)).astype(np.float32))
        tk = jnp.asarray(rng.normal(size=(vk, D)).astype(np.float32))

        def fwd_chain(x, adj=adj):
            for _ in range(args.chain):
                x = banded_khop_aggregate(x, t1, tk, adj, hop_major=True)
            return x

        def fwdbwd_chain(x, adj=adj):
            return jax.grad(lambda x: jnp.sum(fwd_chain(x, adj) ** 2))(x)

        f = _chained_throughput(fwd_chain, x0, union_edges, args.iters,
                                args.chain)
        fb = _chained_throughput(fwdbwd_chain, x0, union_edges,
                                 args.iters, args.chain)
        row = {
            "fwd_edges_per_s": round(f, 1),
            "fwdbwd_edges_per_s": round(fb, 1),
            "halo": adj.halo,
            "win": tile + 2 * adj.halo,
            "n_pad": n,
            "spill": (0 if adj.spill_senders is None
                      else int(adj.spill_senders.shape[0])),
        }
        results[tile_s] = row
        print(json.dumps({"tile": tile, **row}), flush=True)

    best = max(results, key=lambda t: results[t]["fwdbwd_edges_per_s"])
    print(json.dumps({"best_tile": int(best), **results[best]}))


if __name__ == "__main__":
    main()
