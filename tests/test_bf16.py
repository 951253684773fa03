"""bfloat16 mixed precision: activations bf16, params/stats/losses f32."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kpgnn_tpu.graph import Graph, collate
from kpgnn_tpu.models import ModelConfig, make_model
from kpgnn_tpu.train import GraphLoader, create_train_state, make_train_step


def toy(n, e, K, rng):
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    ea = rng.integers(0, 4, size=(e, K))
    ea[:, 0] = rng.integers(2, 4, size=e)
    return Graph(num_nodes=n, edge_index=ei, edge_attr=ea,
                 x=rng.integers(0, 5, size=(n, 1)),
                 y=np.array([rng.normal()], np.float32),
                 pe_attr=np.zeros((n, K - 1), np.int32))


def cfg(dtype):
    return ModelConfig(
        model_name="KPGIN", hidden_size=24, num_layer=2, K=3,
        num_hop1_edge=2, max_pe_num=4, JK="concat", combine="attention",
        virtual_node=True, input_encoder=("embedding", 5),
        task="graph_regression", pooling_method="sum",
        compute_dtype=dtype)


@pytest.mark.slow
def test_bf16_close_to_f32_and_trains():
    rng = np.random.default_rng(0)
    gs = [toy(6, 10, 3, rng) for _ in range(4)]
    b = collate(gs, n_pad=64, e_pad=128, g_pad=5)

    m32 = make_model(cfg("float32"))
    m16 = make_model(cfg("bfloat16"))
    v = m32.init(jax.random.PRNGKey(0), b, train=False)

    out32 = np.asarray(m32.apply(v, b, train=False))
    out16 = np.asarray(m16.apply(v, b, train=False)).astype(np.float32)
    scale = max(np.abs(out32).max(), 1.0)
    assert np.allclose(out32, out16, atol=0.05 * scale), \
        np.abs(out32 - out16).max()

    # params stay f32; training runs and loss decreases
    state, tx = create_train_state(m16, b, jax.random.PRNGKey(0), 1e-2)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))
    step = make_train_step(m16, tx, loss="mse", donate=False)
    losses = []
    for i in range(20):
        state, met = step(state, b, jax.random.PRNGKey(i))
        losses.append(float(met["loss_sum"]) / float(met["count"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])
