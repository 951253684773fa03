"""Data-parallel shard_map training on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpgnn_tpu.graph import Graph, collate
from kpgnn_tpu.models import ModelConfig, make_model
from kpgnn_tpu.parallel import make_mesh, make_parallel_train_step, stack_batches
from kpgnn_tpu.train import GraphLoader, create_train_state, make_train_step


def toy_graphs(n_graphs, K=2, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_graphs):
        n = int(rng.integers(4, 8))
        e = int(rng.integers(4, 12))
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        ea = rng.integers(0, 4, size=(e, K))
        ea[:, 0] = rng.integers(2, 4, size=e)
        out.append(Graph(
            num_nodes=n, edge_index=ei, edge_attr=ea,
            x=rng.integers(0, 3, size=(n, 1)),
            y=np.array([rng.normal()], np.float32),
            pe_attr=np.zeros((n, K - 1), np.int32)))
    return out


def cfg(K=2):
    return ModelConfig(
        model_name="KPGIN", hidden_size=16, num_layer=2, K=K,
        num_hop1_edge=2, max_pe_num=4, norm_type="Layer",
        virtual_node=False, drop_prob=0.0,
        input_encoder=("embedding", 3),
        task="graph_regression", pooling_method="sum")


def test_parallel_step_matches_single_device():
    assert len(jax.devices()) >= 4
    n_dev = 4
    graphs = toy_graphs(16)
    model = make_model(cfg())

    # one big batch on one device
    big = collate(graphs, n_pad=256, e_pad=512, g_pad=17)
    state, tx = create_train_state(model, big, jax.random.PRNGKey(0), 1e-2)
    single_step = make_train_step(model, tx, loss="mse", donate=False)
    s1, m1 = single_step(state, big, jax.random.PRNGKey(1))

    # same graphs split over 4 devices
    shards = [collate(graphs[i * 4:(i + 1) * 4], n_pad=64, e_pad=128, g_pad=5)
              for i in range(n_dev)]
    stacked = stack_batches(shards)
    mesh = make_mesh(n_dev)
    par_step = make_parallel_train_step(model, tx, mesh, loss="mse")
    state2, tx2 = create_train_state(model, big, jax.random.PRNGKey(0), 1e-2)
    s2, m2 = par_step(state2, stacked, jax.random.PRNGKey(1))

    loss1 = float(m1["loss_sum"]) / float(m1["count"])
    loss2 = float(m2["loss_sum"]) / float(m2["count"])
    assert float(m2["count"]) == 16.0
    assert np.isclose(loss1, loss2, atol=1e-5), (loss1, loss2)

    # identical param updates (no BN/dropout -> exact data-parallel math)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_parallel_step_runs_8_devices():
    graphs = toy_graphs(16, seed=3)
    model = make_model(cfg())
    shards = [collate(graphs[i * 2:(i + 1) * 2], n_pad=32, e_pad=64, g_pad=3)
              for i in range(8)]
    stacked = stack_batches(shards)
    mesh = make_mesh(8)
    big = shards[0]
    state, tx = create_train_state(model, big, jax.random.PRNGKey(0), 1e-2)
    step = make_parallel_train_step(model, tx, mesh, loss="mse")
    for _ in range(3):
        state, m = step(state, stacked, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss_sum"]))


def test_edge_partition_aggregate_matches_single():
    from kpgnn_tpu.ops.adjacency import COOAdj
    from kpgnn_tpu.ops.segment import khop_aggregate
    from kpgnn_tpu.parallel.edge_partition import (
        make_edge_parallel_aggregate, partition_edges)

    rng = np.random.default_rng(0)
    n, e, K, D = 64, 200, 3, 8
    senders = rng.integers(0, n - 1, e).astype(np.int32)
    receivers = np.sort(rng.integers(0, n - 1, e)).astype(np.int32)
    attr = rng.integers(0, 5, size=(e, K)).astype(np.int32)
    adj = COOAdj(senders=jnp.asarray(senders),
                 receivers=jnp.asarray(receivers),
                 edge_attr=jnp.asarray(attr),
                 edge_mask=jnp.ones(e, bool), n_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, K, D)).astype(np.float32))
    e_emb = jnp.asarray(rng.normal(size=(e, K, D)).astype(np.float32))

    expect = khop_aggregate(x, adj.senders, adj.receivers, e_emb,
                            adj.edge_attr)

    n_shards = 4
    sharded = partition_edges(adj, n_shards)
    per = sharded.senders.shape[1]
    e_emb_pad = jnp.zeros((n_shards * per, K, D)).at[:e].set(e_emb)
    e_emb_sh = e_emb_pad.reshape(n_shards, per, K, D)

    from kpgnn_tpu.parallel import make_mesh
    mesh = make_mesh(n_shards, axis_names=("edge",))
    agg = make_edge_parallel_aggregate(mesh)
    out = agg(x, sharded.senders, sharded.receivers, sharded.edge_attr,
              e_emb_sh)
    assert np.allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_trainer_with_mesh(tmp_path):
    from kpgnn_tpu.train import TrainConfig, Trainer
    graphs = toy_graphs(32, seed=9)
    model = make_model(cfg())
    mesh = make_mesh(4)
    tl = GraphLoader(graphs, batch_size=4, shuffle=True, seed=0)
    vl = GraphLoader(graphs, batch_size=8)
    trainer = Trainer(model, TrainConfig(lr=1e-2, num_epochs=2, batch_size=4,
                                         loss="mse"),
                      loss="mse", mesh=mesh)
    state, res = trainer.fit(tl, vl, rng=jax.random.PRNGKey(0))
    assert np.isfinite(res["history"][-1]["train_loss"])
