"""Pallas k-hop SpMM autotuner: sweep kernel grid geometry on-device.

Builds the same flagship-shaped batch once per geometry, times the
device-resident forward and forward+backward of the kernel, and reports
union-edges/s for each point plus the winner.  Use it to pick
`--pallas_tile_r/--pallas_wblock/--pallas_egroup` (or trust the collate
auto-pick) for a new chip or a new batch shape.

Timing methodology (MUST match bench.py's `_bench_pallas_spmm`): chain
`--chain` dependent applications inside ONE jit and divide by the chain
length.  Two traps this avoids on a tunnel-attached chip:

  * a standalone jitted call pays a ~250 us host-dispatch floor that
    swamps a ~200 us kernel (CLAUDE.md MEASUREMENT TRAP 2);
  * repeated dispatches **with identical inputs** get result-cached by
    the remote executor and report up to ~1.8x the real device rate —
    this is exactly the round-3 90.2M (chained bench) vs 160.8M
    (per-dispatch tuner) discrepancy.  Dependent chaining feeds each
    application the previous output, so nothing can be cached away.

The sweep exists because the right geometry is hardware-dependent:
larger row tiles cut grid steps but grow the sender window, larger
egroups amortize per-matmul cost but pad more null edges.  None of that
is predictable from first principles across generations — measure it.

No reference counterpart (upstream has no kernels); this is the TPU
analog of a CUDA occupancy/tile tuner.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


from kpgnn_tpu.utils.timing import chained_throughput as _chained_throughput


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--hidden_size", type=int, default=104)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--iters", type=int, default=96)
    p.add_argument("--chain", type=int, default=8,
                   help="dependent applications fused per jit dispatch")
    # tile_e is pinned to 128 by a Mosaic DMA-lowering constraint (see
    # ops/pallas_spmm.py build_plan); the sweepable axes are tile_r, the
    # window sub-block height wblock, and the chunks-per-matmul egroup
    # (geometry = tile_r x wblock x egroup)
    p.add_argument("--geometries", default="128x512x1,128x512x4,"
                   "256x512x2,256x512x4,256x512x8,256x1024x4")
    args = p.parse_args(argv)

    from kpgnn_tpu.data.synthetic import synthetic_molecules
    from kpgnn_tpu.graph.batch import collate, collate_pallas
    from kpgnn_tpu.ops.pallas_spmm import _gather_segment, gather_segment_sum
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
        # the bare fused-hop kernel on the hop-major flat layout — the
        # exact op bench.py's pallas_spmm_fwd_edges_per_s times
        x0 = jnp.asarray(rng.normal(
            size=(args.K * n, args.hidden_size)).astype(np.float32))

        def fwd_chain(x, plan=plan):
            for _ in range(args.chain):
                x = gather_segment_sum(x, plan.fwd)
            return x

        # fwd+bwd: grad of a chained scalar loss runs `chain` forward
        # kernels and `chain` transpose kernels, all dependent
        # (_gather_segment is the custom-vjp wrapper khop_spmm uses)
        def loss(x, plan=plan):
            for _ in range(args.chain):
                x = _gather_segment(x, plan.fwd, plan.bwd)
            return jnp.sum(x * x)

        def fwdbwd_chain(x, plan=plan):
            return jax.grad(loss)(x)

        f = _chained_throughput(fwd_chain, x0, union_edges, args.iters,
                                args.chain)
        fb = _chained_throughput(fwdbwd_chain, x0, union_edges,
                                 args.iters, args.chain)
        # fb runs 2*chain kernels per chain unit of edges: per-kernel
        # rate for the step estimate is 2*fb; a train step runs one fwd
        # + one bwd, so step rate = 1 / (1/f + 1/(2*fb)) ... simpler and
        # honest: report fwd and fwd+bwd-combined rates directly
        row = {
            "fwd_edges_per_s": round(f, 1),
            "fwdbwd_edges_per_s": round(fb, 1),
            "n_pad": n,
            "max_wblocks": plan.fwd.max_wblocks,
            "max_chunks": plan.fwd.max_chunks,
        }
        results[geom] = row
        print(json.dumps({"geometry": geom, **row}), flush=True)

    best = max(results, key=lambda g: results[g]["fwdbwd_edges_per_s"])
    print(json.dumps({"best_geometry": best, **results[best]}))


if __name__ == "__main__":
    main()
