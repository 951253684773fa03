"""Benchmark: k-hop aggregation throughput on the flagship training step.

Measures steady-state fwd+bwd+update time for the ZINC headline config
(KPGINPlus K=8 L=8 h=104, reference: README.md:127) on synthetic
molecule-shaped batches, and reports REAL (non-padded) union edges
processed per second per chip.  Every hop of every union edge is one
message, so the aggregate work is edges * K messages — we report edge/s
to match BASELINE.md's north-star metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 2.0e6 edges/s — an order-of-magnitude estimate of
the PyG reference's scatter-add throughput on one datacenter GPU (the
reference repo publishes no numbers, BASELINE.md:3-7).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_EDGES_PER_S = 2.0e6


def main():
    from kpgnn_tpu.data.synthetic import synthetic_molecules
    from kpgnn_tpu.graph.batch import collate_dense
    from kpgnn_tpu.models import ModelConfig, make_model
    from kpgnn_tpu.prep import KHopConfig
    from kpgnn_tpu.train import create_train_state, make_train_step

    K, L, hidden, batch_size = 8, 8, 104, 64
    kcfg = KHopConfig(K=K, kernel="spd", max_edge_attr_num=30,
                      max_hop_num=6, max_edge_type=3, max_edge_count=20,
                      max_distance_count=30)
    graphs = synthetic_molecules(4 * batch_size, kcfg, seed=0)
    mcfg = ModelConfig(
        model_name="KPGINPlus", hidden_size=hidden, num_layer=L, K=K,
        num_hop1_edge=3, max_pe_num=30, max_edge_type=3,
        max_edge_count=20, max_hop_num=6, max_distance_count=30,
        JK="concat", combine="attention", residual=True,
        input_encoder=("embedding", 21),
        task="graph_regression", pooling_method="sum")
    model = make_model(mcfg)

    # dense MXU backend: one fixed (B, K, n_slot, n_slot) shape
    n_slot = 40
    batches = [collate_dense(graphs[i:i + batch_size], n_slot=n_slot,
                             v1=3 + 2, vk=30 + 2, g_pad=batch_size)
               for i in range(0, len(graphs), batch_size)]
    real_edges = [int((np.asarray(b.adj.hop_attr) > 0).any(1).sum())
                  for b in batches]

    state, tx = create_train_state(model, batches[0], jax.random.PRNGKey(0),
                                   1e-3)
    step = make_train_step(model, tx, loss="l1", donate=True)

    rng = jax.random.PRNGKey(1)
    # warmup / compile (touch every batch once)
    for b in batches:
        state, m = step(state, b, rng)
    jax.block_until_ready(m["loss_sum"])

    # the remote-dispatch link is noisy: take the best of three rounds
    iters = 100
    eps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        edges = 0
        for i in range(iters):
            b = batches[i % len(batches)]
            state, m = step(state, b, rng)
            edges += real_edges[i % len(batches)]
        jax.block_until_ready(m["loss_sum"])
        dt = time.perf_counter() - t0
        eps = max(eps, edges / dt)
    print(json.dumps({
        "metric": "khop_train_edges_per_s_per_chip",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps / BASELINE_EDGES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
