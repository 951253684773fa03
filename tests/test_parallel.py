"""Data-parallel shard_map training on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _jit_smap(*a, **k):
    """jax.jit(jax.shard_map(...)): the eager shard_map impl
    dispatches primitive-by-primitive (~50 ms each on this CPU)
    and dominated the suite wall-clock; compiled numerics are
    identical."""
    import jax as _jax
    return _jax.jit(_jax.shard_map(*a, **k))

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


def random_coo(n=64, e=200, K=3, seed=0):
    from kpgnn_tpu.ops.adjacency import COOAdj
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, n - 1, e).astype(np.int32)
    receivers = np.sort(rng.integers(0, n - 1, e)).astype(np.int32)
    attr = rng.integers(0, 5, size=(e, K)).astype(np.int32)
    mask = rng.random(e) < 0.9
    attr[~mask] = 0          # collate invariant: masked edge -> attr 0
    return COOAdj(senders=jnp.asarray(senders),
                  receivers=jnp.asarray(receivers),
                  edge_attr=jnp.asarray(attr),
                  edge_mask=jnp.asarray(mask), n_nodes=n), rng


@pytest.mark.parametrize("mode", ["add", "scale", "mean"])
def test_sharded_aggregate_matches_coo(mode):
    """Bare node-sharded aggregation (halo exchange) vs the COO path."""
    from jax.sharding import PartitionSpec as P
    from kpgnn_tpu.ops.adjacency import khop_aggregate_adj
    from kpgnn_tpu.parallel import make_mesh, partition_adj

    n, K, D, V = 64, 3, 8, 6
    adj, rng = random_coo(n=n, K=K)
    x = jnp.asarray(rng.normal(size=(n, K, D)).astype(np.float32))
    t1 = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    tk = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    scale = sender_scale = None
    aggr = "mean" if mode == "mean" else "add"
    if mode == "scale":
        scale = jnp.asarray(rng.random((n, K)), jnp.float32)
        sender_scale = jnp.asarray(rng.random((n, K)), jnp.float32)
    expect = khop_aggregate_adj(adj, x, t1, tk, scale=scale,
                                sender_scale=sender_scale, aggr=aggr)

    n_shards = 4
    sharded = partition_adj(adj, n_shards)
    mesh = make_mesh(n_shards, axis_names=("node",))
    node = P("node")
    sh_specs = sharded.replace(senders=node, receivers=node,
                               edge_attr=node, edge_mask=node,
                               send_rows=node)
    opt = lambda v: node if v is not None else None

    def per_device(adj_s, x_s, s, ss):
        return khop_aggregate_adj(adj_s, x_s, t1, tk, scale=s,
                                  sender_scale=ss, aggr=aggr)

    fn = _jit_smap(per_device, mesh=mesh,
                       in_specs=(sh_specs, node, opt(scale),
                                 opt(sender_scale)),
                       out_specs=node)
    out = fn(sharded, x, scale, sender_scale)
    assert np.allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_sharded_comm_is_boundary_not_full_table():
    """The halo all_to_all payload must scale with the boundary, not the
    node table (the round-1 demo psummed the full (N, K, D) output)."""
    from kpgnn_tpu.parallel import partition_adj
    K, D = 3, 16
    # worst case: a uniformly random graph — even then the exchange is
    # strictly cheaper than the replicate-and-psum design
    adj, _ = random_coo(n=256, e=1000, K=K)
    sharded = partition_adj(adj, 4)
    assert sharded.comm_elems_per_layer(K, D) < \
        sharded.psum_elems_per_layer(K, D)
    assert sharded.boundary_total() > 0
    assert sharded.halo <= 256 // 4

    # best case: block-diagonal (graphs aligned to shard boundaries) ->
    # zero boundary, the exchange carries only a single padding row/pair
    from kpgnn_tpu.ops.adjacency import COOAdj
    rng = np.random.default_rng(21)
    blocks = []
    for b in range(4):
        s = rng.integers(16 * b, 16 * (b + 1), 50)
        r = np.sort(rng.integers(16 * b, 16 * (b + 1), 50))
        blocks.append((s, r))
    senders = np.concatenate([s for s, _ in blocks]).astype(np.int32)
    receivers = np.concatenate([r for _, r in blocks]).astype(np.int32)
    attr = rng.integers(1, 5, size=(200, K)).astype(np.int32)
    block = COOAdj(senders=jnp.asarray(senders),
                   receivers=jnp.asarray(receivers),
                   edge_attr=jnp.asarray(attr),
                   edge_mask=jnp.ones(200, bool), n_nodes=64)
    aligned = partition_adj(block, 4)
    assert aligned.boundary_total() == 0
    assert aligned.halo == 1
    assert aligned.comm_elems_per_layer(K, D) <= 4 * K * D


def test_sharded_train_step_matches_single_device():
    from kpgnn_tpu.parallel import (make_mesh, make_sharded_train_step,
                                    partition_batch)
    graphs = toy_graphs(16)
    model = make_model(cfg())
    big = collate(graphs, n_pad=256, e_pad=512, g_pad=17)
    state, tx = create_train_state(model, big, jax.random.PRNGKey(0), 1e-2)
    single = make_train_step(model, tx, loss="mse", donate=False)
    s1, m1 = single(state, big, jax.random.PRNGKey(1))

    mesh = make_mesh(4, axis_names=("node",))
    pb = partition_batch(big, 4)
    step = make_sharded_train_step(model, tx, mesh, loss="mse")
    state2, _ = create_train_state(model, big, jax.random.PRNGKey(0), 1e-2)
    s2, m2 = step(state2, pb, jax.random.PRNGKey(1))

    l1 = float(m1["loss_sum"]) / float(m1["count"])
    l2 = float(m2["loss_sum"]) / float(m2["count"])
    assert np.isclose(l1, l2, atol=1e-5), (l1, l2)
    # gradients agree to float noise; Adam's sign-like first step can
    # amplify near-zero-grad noise, so compare with a loose bound only
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2.1e-2)


def test_sharded_train_step_dropout_virtual_node():
    """Dropout + virtual node under node sharding: the dropout rng must
    stay replicated or the (replicated) vn state diverges across shards
    and shard_map's check_vma rejects the trace."""
    from kpgnn_tpu.parallel import (make_mesh, make_sharded_train_step,
                                    partition_batch)
    graphs = toy_graphs(16)
    import dataclasses
    c = dataclasses.replace(cfg(), virtual_node=True, drop_prob=0.5)
    model = make_model(c)
    big = collate(graphs, n_pad=256, e_pad=512, g_pad=17)
    state, tx = create_train_state(model, big, jax.random.PRNGKey(0), 1e-2)
    mesh = make_mesh(4, axis_names=("node",))
    step = make_sharded_train_step(model, tx, mesh, loss="mse")
    s2, m2 = step(state, partition_batch(big, 4), jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss_sum"]))
    assert float(m2["count"]) == 16.0


def test_sharded_eval_step_matches_single_device():
    from kpgnn_tpu.parallel import (make_mesh, make_sharded_eval_step,
                                    partition_batch)
    from kpgnn_tpu.train import make_eval_step
    graphs = toy_graphs(12, seed=5)
    model = make_model(cfg())
    big = collate(graphs, n_pad=128, e_pad=256, g_pad=13)
    state, _ = create_train_state(model, big, jax.random.PRNGKey(0), 1e-2)
    m1 = make_eval_step(model, loss="mse")(state, big)

    mesh = make_mesh(4, axis_names=("node",))
    step = make_sharded_eval_step(model, mesh, loss="mse")
    m2 = step(state, partition_batch(big, 4))
    assert np.isclose(float(m1["loss_sum"]), float(m2["loss_sum"]),
                      atol=1e-4)
    assert float(m1["count"]) == float(m2["count"])


@pytest.mark.slow
def test_trainer_node_parallel(tmp_path):
    from kpgnn_tpu.train import GraphLoader, TrainConfig, Trainer
    graphs = toy_graphs(16, seed=11)
    model = make_model(cfg())
    mesh = make_mesh(4, axis_names=("node",))
    tl = GraphLoader(graphs, batch_size=8, shuffle=True, seed=0)
    vl = GraphLoader(graphs, batch_size=8)
    trainer = Trainer(model, TrainConfig(lr=1e-2, num_epochs=2, batch_size=8,
                                         loss="mse"),
                      loss="mse", mesh=mesh, parallel_mode="node")
    state, res = trainer.fit(tl, vl, rng=jax.random.PRNGKey(0))
    assert np.isfinite(res["history"][-1]["train_loss"])
    # every graph counted during eval despite node sharding
    assert res["history"][-1]["val_loss"] is not None


def test_shard_loader_pads_trailing_group():
    """No training data is dropped: 5 batches over 4 devices -> 2 stacked
    groups, the second padded with masked-empty batches; total live count
    equals the dataset size."""
    from kpgnn_tpu.parallel.dp import shard_loader
    graphs = toy_graphs(20, seed=7)
    batches = [collate(graphs[i * 4:(i + 1) * 4], n_pad=64, e_pad=128,
                       g_pad=5) for i in range(5)]
    groups = list(shard_loader(batches, 4))
    assert len(groups) == 2
    live = sum(int(np.sum(np.asarray(g.graph_mask))) for g in groups)
    assert live == 20


def test_parallel_eval_counts_every_graph():
    from kpgnn_tpu.parallel.dp import ShardStream, make_parallel_eval_step
    graphs = toy_graphs(20, seed=13)
    model = make_model(cfg())
    batches = [collate(graphs[i * 4:(i + 1) * 4], n_pad=64, e_pad=128,
                       g_pad=5) for i in range(5)]
    state, _ = create_train_state(model, batches[0], jax.random.PRNGKey(0),
                                  1e-2)
    mesh = make_mesh(4)
    step = make_parallel_eval_step(model, mesh, loss="mse")
    total = 0.0
    for g in ShardStream(batches, 4):
        total += float(step(state, g)["count"])
    assert total == 20.0


def test_parallel_eval_per_target_mae():
    """Multi-target regression (QM9 shape): the parallel eval step must
    emit the same abs_per_target sums as the single-device step."""
    from kpgnn_tpu.parallel.dp import make_parallel_eval_step
    from kpgnn_tpu.train import make_eval_step
    import dataclasses
    graphs = toy_graphs(8, seed=17)
    rng = np.random.default_rng(17)
    for g in graphs:
        g.y = rng.normal(size=(3,)).astype(np.float32)
    model = make_model(dataclasses.replace(cfg(), output_size=3))
    big = collate(graphs, n_pad=128, e_pad=256, g_pad=9)
    state, _ = create_train_state(model, big, jax.random.PRNGKey(0), 1e-2)
    m1 = make_eval_step(model, loss="l1")(state, big)
    shards = [collate(graphs[i * 2:(i + 1) * 2], n_pad=32, e_pad=64, g_pad=3)
              for i in range(4)]
    mesh = make_mesh(4)
    m2 = make_parallel_eval_step(model, mesh, loss="l1")(
        state, stack_batches(shards))
    assert "abs_per_target" in m2
    np.testing.assert_allclose(np.asarray(m2["abs_per_target"]),
                               np.asarray(m1["abs_per_target"]), rtol=1e-4)


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


# ---- multi-host (DCN) input sharding, simulated single-process ----

def test_host_shard_partition():
    from kpgnn_tpu.parallel.multihost import host_shard
    items = list(range(23))
    shards = [host_shard(items, pi, 4) for pi in range(4)]
    assert sorted(sum(shards, [])) == items            # disjoint + covering
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1
    assert host_shard(items, 2, 4) == shards[2]        # deterministic


def test_multihost_dcn_step_matches_single_device():
    """2 hosts x 4 chips on the virtual mesh; the hierarchical
    ("dcn", "data") step must equal the single-device step exactly."""
    from kpgnn_tpu.parallel.multihost import dcn_mesh, make_global_super_batch

    graphs = toy_graphs(16, seed=5)
    model = make_model(cfg())
    big = collate(graphs, n_pad=256, e_pad=512, g_pad=17)
    state, tx = create_train_state(model, big, jax.random.PRNGKey(0), 1e-2)
    single = make_train_step(model, tx, loss="mse", donate=False)
    s1, m1 = single(state, big, jax.random.PRNGKey(1))

    mesh = dcn_mesh(n_hosts=2)
    assert mesh.devices.shape == (2, 4)
    shards = [collate(graphs[i * 2:(i + 1) * 2], n_pad=32, e_pad=64, g_pad=3)
              for i in range(8)]
    gbatch = make_global_super_batch(shards, mesh)
    step = make_parallel_train_step(model, tx, mesh, loss="mse",
                                    axis=("dcn", "data"))
    state2, _ = create_train_state(model, big, jax.random.PRNGKey(0), 1e-2)
    s2, m2 = step(state2, gbatch, jax.random.PRNGKey(1))

    assert float(m2["count"]) == 16.0
    loss1 = float(m1["loss_sum"]) / float(m1["count"])
    loss2 = float(m2["loss_sum"]) / float(m2["count"])
    assert np.isclose(loss1, loss2, atol=1e-5), (loss1, loss2)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_host_shard_loader_covers_every_graph():
    """A partial trailing group pads with masked-empty batches; the total
    live-graph count across the global stream equals the dataset size."""
    from kpgnn_tpu.parallel.multihost import dcn_mesh, host_shard_loader

    graphs = toy_graphs(11, seed=7)   # 11 graphs, 2-graph batches -> 6
    mesh = dcn_mesh(n_hosts=2)        # batches over 4 local slots -> pad
    batches = [collate(graphs[i:i + 2], n_pad=32, e_pad=64, g_pad=3)
               for i in range(0, 11, 2)]
    seen = 0.0
    for gb in host_shard_loader(batches, mesh):
        # single-process simulation: every device is local, so the global
        # stack equals the local stack
        assert gb.graph_mask.shape[0] == mesh.local_mesh.size
        seen += float(np.asarray(gb.graph_mask).sum())
    assert seen == 11.0


def test_host_shard_loader_lockstep_groups():
    """A short host must pad whole masked groups up to the lockstep count
    so every host joins the same number of collective steps."""
    from kpgnn_tpu.parallel.multihost import (dcn_mesh, host_shard,
                                              host_shard_loader,
                                              lockstep_group_count)

    graphs = toy_graphs(17, seed=9)
    # single-process simulation: all 8 devices are local, so groups hold
    # 8 batches; host 0's shard has 9 batches -> 2 groups, host 1's 8 -> 1
    mesh = dcn_mesh(n_hosts=2)
    n_groups = lockstep_group_count(len(graphs), batch_size=1, mesh=mesh)
    assert n_groups == 2

    counts, live = [], []
    for pi in range(2):
        shard = host_shard(graphs, pi, 2)
        batches = [collate([g], n_pad=32, e_pad=64, g_pad=2) for g in shard]
        groups = list(host_shard_loader(batches, mesh, n_groups=n_groups))
        counts.append(len(groups))
        live.append(sum(float(np.asarray(gb.graph_mask).sum())
                        for gb in groups))
    assert counts == [n_groups, n_groups]   # lockstep, no desync
    assert sum(live) == 17.0                # padding contributes nothing

    # producing more groups than the lockstep count is a caller error
    shard0 = [collate([g], n_pad=32, e_pad=64, g_pad=2)
              for g in host_shard(graphs, 0, 2)]
    with pytest.raises(ValueError):
        list(host_shard_loader(shard0, mesh, n_groups=1))


@pytest.mark.parametrize("mode", [
    pytest.param("add", marks=pytest.mark.slow),
    "scale",
    pytest.param("mean", marks=pytest.mark.slow),
])
def test_sharded_pallas_aggregate_matches_coo(mode):
    """Halo exchange composed with the local Pallas SpMM kernel (the
    large-graph multi-chip path) vs the unsharded COO reference,
    including gradients through the exchange + kernel.  Interpret-mode
    kernels under shard_map are the suite's slowest programs, so only
    the most complete mode (scale epilogue + grads) runs by default;
    add/mean differ only in the epilogue and run with -m ''."""
    from jax.sharding import PartitionSpec as P
    from kpgnn_tpu.ops.adjacency import khop_aggregate_adj
    from kpgnn_tpu.parallel import make_mesh, partition_adj
    from kpgnn_tpu.parallel.partition import attach_pallas_plans

    # small on purpose: interpret-mode kernels under shard_map are the
    # suite's slowest programs and this config already covers two tiles
    # per shard, halo senders, and both epilogue paths
    n, K, D, V = 256, 2, 8, 6
    adj, rng = random_coo(n=n, K=K, e=220)
    x = jnp.asarray(rng.normal(size=(n, K, D)).astype(np.float32))
    t1 = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    tk = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    scale = sender_scale = None
    aggr = "mean" if mode == "mean" else "add"
    if mode == "scale":
        scale = jnp.asarray(rng.random((n, K)), jnp.float32)
        sender_scale = jnp.asarray(rng.random((n, K)), jnp.float32)
    expect = khop_aggregate_adj(adj, x, t1, tk, scale=scale,
                                sender_scale=sender_scale, aggr=aggr)

    n_shards = 2
    sharded = attach_pallas_plans(partition_adj(adj, n_shards), v1=V, vk=V)
    assert sharded.plan is not None
    mesh = make_mesh(n_shards, axis_names=("node",))
    node = P("node")
    sh_specs = sharded.replace(
        senders=node, receivers=node, edge_attr=node, edge_mask=node,
        send_rows=node,
        plan=jax.tree.map(lambda _: node, sharded.plan))
    opt = lambda v: node if v is not None else None

    def per_device(adj_s, x_s, s, ss):
        return khop_aggregate_adj(adj_s, x_s, t1, tk, scale=s,
                                  sender_scale=ss, aggr=aggr)

    fn = _jit_smap(per_device, mesh=mesh,
                       in_specs=(sh_specs, node, opt(scale),
                                 opt(sender_scale)),
                       out_specs=node)
    out = fn(sharded, x, scale, sender_scale)
    assert np.allclose(np.asarray(out), np.asarray(expect), atol=1e-4), \
        np.abs(np.asarray(out) - np.asarray(expect)).max()

    # gradients flow through the exchange + kernel transpose (one mode
    # suffices; the grad program is mode-independent apart from scales)
    if mode != "scale":
        return
    w = jnp.asarray(np.cos(np.arange(expect.size)).reshape(expect.shape),
                    jnp.float32)
    g_ref = jax.grad(
        lambda xx: jnp.sum(khop_aggregate_adj(
            adj, xx, t1, tk, scale=scale, sender_scale=sender_scale,
            aggr=aggr) * w))(x)
    loss_sh = _jit_smap(
        lambda adj_s, x_s, s, ss, w_s: jax.lax.psum(
            jnp.sum(per_device(adj_s, x_s, s, ss) * w_s), "node"),
        mesh=mesh,
        in_specs=(sh_specs, node, opt(scale), opt(sender_scale), node),
        out_specs=P())
    g_sh = jax.grad(
        lambda xx: loss_sh(sharded, xx, scale, sender_scale, w))(x)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-4), \
        np.abs(np.asarray(g_sh) - np.asarray(g_ref)).max()


def test_sharded_pallas_hop_windows_keep_kernel():
    """slice_hops on a window-planned sharded adjacency must install the
    pre-built k-hop plan (not fall back to segment-sum) and match the
    unsharded COO reference, gradients included (the GNNPlus sliding
    window under node sharding: layer l slices to k = min(l+1, K))."""
    from jax.sharding import PartitionSpec as P
    from kpgnn_tpu.ops.adjacency import khop_aggregate_adj
    from kpgnn_tpu.parallel import make_mesh, partition_adj
    from kpgnn_tpu.parallel.partition import attach_pallas_plans

    n, K, D, V = 256, 3, 8, 6
    adj, rng = random_coo(n=n, K=K, e=200)
    x = jnp.asarray(rng.normal(size=(n, K, D)).astype(np.float32))
    t1 = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    tk = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))

    n_shards = 2
    sharded = attach_pallas_plans(partition_adj(adj, n_shards), v1=V, vk=V,
                                  hop_windows=True)
    assert set(sharded.plan_by_k) == {1, 2}
    mesh = make_mesh(n_shards, axis_names=("node",))
    node = P("node")
    stacked_spec = lambda v: (None if v is None
                              else jax.tree.map(lambda _: node, v))
    sh_specs = sharded.replace(
        senders=node, receivers=node, edge_attr=node, edge_mask=node,
        send_rows=node, plan=stacked_spec(sharded.plan),
        plan_by_k=stacked_spec(sharded.plan_by_k))

    for k in (1, 2, 3):
        expect = khop_aggregate_adj(adj.slice_hops(k), x[:, :k], t1,
                                    tk if k > 1 else None)

        def per_device(adj_s, x_s, k=k):
            sl = adj_s.slice_hops(k)
            assert sl.plan is not None          # kernel path kept
            return khop_aggregate_adj(sl, x_s[:, :k], t1,
                                      tk if k > 1 else None)

        fn = _jit_smap(per_device, mesh=mesh,
                           in_specs=(sh_specs, node), out_specs=node)
        out = fn(sharded, x)
        assert np.allclose(np.asarray(out), np.asarray(expect),
                           atol=1e-4), (k, np.abs(
                               np.asarray(out) - np.asarray(expect)).max())

    # gradients through a sliced window plan under shard_map
    k = 2
    w = jnp.asarray(np.cos(np.arange(n * k * D)).reshape(n, k, D),
                    jnp.float32)
    g_ref = jax.grad(lambda xx: jnp.sum(khop_aggregate_adj(
        adj.slice_hops(k), xx[:, :k], t1, tk) * w))(x)
    loss_sh = _jit_smap(
        lambda adj_s, x_s, w_s: jax.lax.psum(
            jnp.sum(khop_aggregate_adj(
                adj_s.slice_hops(k), x_s[:, :k], t1, tk) * w_s), "node"),
        mesh=mesh, in_specs=(sh_specs, node, node), out_specs=P())
    g_sh = jax.grad(lambda xx: loss_sh(sharded, xx, w))(x)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-4), \
        np.abs(np.asarray(g_sh) - np.asarray(g_ref)).max()

    # and the slice matches the segment-sum fallback (no plan attached)
    plain = partition_adj(adj, n_shards)
    pl_specs = plain.replace(senders=node, receivers=node, edge_attr=node,
                             edge_mask=node, send_rows=node)
    out_fb = _jit_smap(
        lambda adj_s, x_s: khop_aggregate_adj(
            adj_s.slice_hops(k), x_s[:, :k], t1, tk),
        mesh=mesh, in_specs=(pl_specs, node), out_specs=node)(plain, x)
    expect2 = khop_aggregate_adj(adj.slice_hops(k), x[:, :k], t1, tk)
    assert np.allclose(np.asarray(out_fb), np.asarray(expect2), atol=1e-4)


def test_sharded_local_strips_window_plans():
    """local() must strip the stacked shard axis from plan_by_k so a
    local()-then-slice call order installs correctly-shaped plans."""
    from kpgnn_tpu.parallel import partition_adj
    from kpgnn_tpu.parallel.partition import attach_pallas_plans

    adj, _ = random_coo(n=256, K=3, e=200)
    sharded = attach_pallas_plans(partition_adj(adj, 2), v1=6, vk=6,
                                  hop_windows=[2])
    one = jax.tree.map(lambda a: a[:1], sharded)    # shard 0's slice
    loc = one.local()
    assert loc.plan_by_k[2].fwd.senders2d.ndim == 2
    sl = loc.slice_hops(2)
    assert sl.plan is not None
    assert sl.plan.fwd.senders2d.ndim == 2
