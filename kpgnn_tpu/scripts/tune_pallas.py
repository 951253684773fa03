"""Pallas k-hop SpMM autotuner: sweep kernel grid geometry on-device.

Builds the same flagship-shaped batch once per (tile_r, tile_e)
geometry, times the device-resident forward and backward of
`khop_spmm`, and reports union-edges/s for each point plus the winner.
Use it to pick `--pallas_tile_r/--pallas_tile_e` (or the collate
defaults) for a new chip or a new batch shape.

The sweep exists because the right geometry is hardware-dependent: the
128x128 default fills one MXU pass per chunk, larger edge tiles amortize
per-chunk bookkeeping (window offset math, predication) but pad more
null edges, and larger row tiles cut grid steps but grow the sender
window.  None of that is predictable from first principles across
generations — measure it.

No reference counterpart (upstream has no kernels); this is the TPU
analog of a CUDA occupancy/tile tuner.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _throughput(fn, args, edges, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = max(best, iters * edges / (time.perf_counter() - t0))
    return best


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--hidden_size", type=int, default=104)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--iters", type=int, default=100)
    # tile_e is pinned to 128 by a Mosaic DMA-lowering constraint (see
    # ops/pallas_spmm.py build_plan); the sweepable axes are tile_r, the
    # window sub-block height wblock, and the chunks-per-matmul egroup
    # (geometry = tile_r x wblock x egroup)
    p.add_argument("--geometries", default="128x512x1,128x512x4,"
                   "256x512x2,256x512x4,256x512x8,256x1024x4")
    args = p.parse_args(argv)

    from kpgnn_tpu.data.synthetic import synthetic_molecules
    from kpgnn_tpu.graph.batch import collate, collate_pallas
    from kpgnn_tpu.ops.pallas_spmm import khop_spmm
    from kpgnn_tpu.prep import KHopConfig

    kcfg = KHopConfig(K=args.K, kernel="spd", max_edge_attr_num=30,
                      max_hop_num=6, max_edge_type=3, max_edge_count=20,
                      max_distance_count=30)
    graphs = synthetic_molecules(args.batch_size, kcfg, seed=0)
    v1, vk = 5, 32
    union_edges = int(np.asarray(collate(graphs).adj.edge_mask).sum())

    rng = np.random.default_rng(0)
    results = {}
    for geom in args.geometries.split(","):
        dims = [int(v) for v in geom.split("x")]
        tr, wb = dims[0], dims[1]
        eg = dims[2] if len(dims) > 2 else 1
        b = collate_pallas(graphs, v1=v1, vk=vk, tile_r=tr, wblock=wb,
                           egroup=eg)
        plan = b.adj
        n = b.x.shape[0]
        x = jnp.asarray(rng.normal(
            size=(n, args.K, args.hidden_size)).astype(np.float32))
        t1 = jnp.asarray(rng.normal(
            size=(v1, args.hidden_size)).astype(np.float32))
        tk = jnp.asarray(rng.normal(
            size=(vk, args.hidden_size)).astype(np.float32))
        fwd = jax.jit(lambda x, t1, tk: khop_spmm(x, t1, tk, plan))

        def loss(x, t1, tk):
            return khop_spmm(x, t1, tk, plan).sum()

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        f = _throughput(fwd, (x, t1, tk), union_edges, args.iters)
        bw = _throughput(bwd, (x, t1, tk), union_edges, args.iters)
        # a train step runs one forward + one backward per aggregation and
        # the backward is ~2x the forward's work, so rank geometries by
        # the combined step time (1/f + 1/b), not forward alone
        row = {
            "fwd_edges_per_s": round(f, 1),
            "bwd_edges_per_s": round(bw, 1),
            "step_edges_per_s": round(1.0 / (1.0 / f + 1.0 / bw), 1),
            "n_pad": n,
            "max_wblocks": plan.fwd.max_wblocks,
            "max_chunks": plan.fwd.max_chunks,
        }
        results[geom] = row
        print(json.dumps({"geometry": geom, **row}), flush=True)

    best = max(results, key=lambda g: results[g]["step_edges_per_s"])
    print(json.dumps({"best_geometry": best, **results[best]}))


if __name__ == "__main__":
    main()
