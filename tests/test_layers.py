"""Layer parity against independent numpy/torch oracles.

The oracles re-derive the reference math (masked gather/scatter over the
union edge set) in plain numpy — structurally nothing like the framework's
padded segment-sum path — so agreement checks both the math and the
padding story.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpgnn_tpu.graph import Graph, collate
from kpgnn_tpu.nn import KPGCNConv, KPGINConv, MaskedBatchNorm


def make_case(seed=0, n=7, e=14, K=3, dk=4):
    rng = np.random.default_rng(seed)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    ea = rng.integers(0, 5, size=(e, K))
    ea[:, 0] = rng.integers(2, 5, size=e)
    x = rng.normal(size=(n, K * dk)).astype(np.float32)
    pe = rng.integers(0, 4, size=(n, K - 1)).astype(np.int32)
    peripheral = rng.normal(size=(n, K, dk)).astype(np.float32)
    return ei, ea, x, pe, peripheral


def geometric_thetas(alphas, K):
    a = 1.0 / (1.0 + np.exp(-alphas))
    t = np.stack([a * (1 - a) ** i for i in range(K)])
    ex = np.exp(t - t.max(0))
    return ex / ex.sum(0)


def test_kpgin_matches_numpy_oracle():
    n, e, K, dk = 7, 14, 3, 4
    ei, ea, x, pe, peripheral = make_case(0, n, e, K, dk)

    g = Graph(num_nodes=n, edge_index=ei, edge_attr=ea, x=x,
              pe_attr=pe, y=np.zeros(1, np.float32))
    b = collate([g], n_pad=16, e_pad=32, g_pad=2)

    conv = KPGINConv(hidden_size=K * dk, K=K, num_hop1_edge=4, num_pe=6)
    pa = jnp.zeros((16, K, dk)).at[:n].set(peripheral)
    v = conv.init(jax.random.PRNGKey(1), b.x, b.adj, b.pe_attr, pa)
    out = np.asarray(conv.apply(v, b.x, b.adj, b.pe_attr, pa))[:n]

    p = jax.tree.map(np.asarray, v["params"])
    emb = p

    def tab(t):  # padding row 0 forced to zero
        t = t.copy()
        t[0] = 0
        return t

    hop1 = tab(emb["hop1_edge_emb"])
    hopk = tab(emb["hopk_edge_emb"])
    pemb = tab(emb["hopk_node_path_emb"])

    xh = x.reshape(n, K, dk).copy()
    xh[:, 1:] += pemb[pe]
    eemb = np.concatenate([hop1[ea[:, :1]], hopk[ea[:, 1:]]], axis=1)
    msg = xh[ei[0]] + eemb
    msg[ea == 0] = 0.0
    agg = np.zeros_like(xh)
    np.add.at(agg, ei[1], msg)
    agg += peripheral
    h = agg + xh                                 # eps = 0
    h = np.maximum(np.einsum("nki,kio->nko", h, p["hop_proj1"]) +
                   p["hop_bias1"][None], 0)
    h = np.maximum(np.einsum("nki,kio->nko", h, p["hop_proj2"]) +
                   p["hop_bias2"][None], 0)
    thetas = geometric_thetas(p["combine"]["alphas"], K)     # (K, dk)
    comb = (h * thetas[None]).sum(1)
    expect = comb @ p["combine_proj"]["kernel"] + p["combine_proj"]["bias"]

    assert np.allclose(out, expect, atol=1e-5), np.abs(out - expect).max()


def test_kpgcn_matches_explicit_self_loop_oracle():
    """The framework folds the self-loop in analytically; the oracle appends
    explicit (i, i) edges with attr 1 like the reference
    (layers/KPGCN.py:85-89) — both must agree."""
    n, e, K, dk = 7, 14, 3, 4
    ei, ea, x, pe, peripheral = make_case(3, n, e, K, dk)

    g = Graph(num_nodes=n, edge_index=ei, edge_attr=ea, x=x,
              pe_attr=pe, y=np.zeros(1, np.float32))
    b = collate([g], n_pad=16, e_pad=64, g_pad=2)

    conv = KPGCNConv(hidden_size=K * dk, K=K, num_hop1_edge=4, num_pe=6)
    pa = jnp.zeros((16, K, dk)).at[:n].set(peripheral)
    v = conv.init(jax.random.PRNGKey(2), b.x, b.adj, b.pe_attr, pa)
    out = np.asarray(conv.apply(v, b.x, b.adj, b.pe_attr, pa))[:n]

    p = jax.tree.map(np.asarray, v["params"])
    emb = p

    def tab(t):
        t = t.copy()
        t[0] = 0
        return t

    hop1 = tab(emb["hop1_edge_emb"])
    hopk = tab(emb["hopk_edge_emb"])
    pemb = tab(emb["hopk_node_path_emb"])

    # explicit self-loop edges
    ei2 = np.concatenate([ei, np.stack([np.arange(n)] * 2)], axis=1)
    ea2 = np.concatenate([ea, np.ones((n, K), dtype=ea.dtype)], axis=0)

    xp = x @ p["hop_proj"]["kernel"] + p["hop_proj"]["bias"]
    xh = xp.reshape(n, K, dk).copy()
    xh[:, 1:] += pemb[pe]
    eemb = np.concatenate([hop1[ea2[:, :1]], hopk[ea2[:, 1:]]], axis=1)

    deg = np.zeros((n, K))
    np.add.at(deg, ei2[1], (ea2 > 0).astype(float))
    dis = deg ** -0.5
    norm = dis[ei2[0]] * dis[ei2[1]]                        # (E+n, K)

    msg = norm[..., None] * (xh[ei2[0]] + eemb)
    msg[ea2 == 0] = 0.0
    agg = np.zeros_like(xh)
    np.add.at(agg, ei2[1], msg)
    h = np.maximum(agg, 0)
    h += peripheral
    thetas = geometric_thetas(p["combine"]["alphas"], K)
    comb = (h * thetas[None]).sum(1)
    expect = comb @ p["combine_proj"]["kernel"] + p["combine_proj"]["bias"]

    assert np.allclose(out, expect, atol=1e-5), np.abs(out - expect).max()


def test_bilstm_matches_torch():
    torch = pytest.importorskip("torch")
    from kpgnn_tpu.ops import BiLSTM

    B, T, F, H = 5, 4, 6, 3
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, F)).astype(np.float32)

    m = BiLSTM(H)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(m.apply(v, jnp.asarray(x)))

    ref = torch.nn.LSTM(F, H, 1, batch_first=True, bidirectional=True)
    p = jax.tree.map(np.asarray, v["params"])
    with torch.no_grad():
        ref.weight_ih_l0.copy_(torch.from_numpy(p["w_ih_fwd"]))
        ref.weight_hh_l0.copy_(torch.from_numpy(p["w_hh_fwd"]))
        ref.bias_ih_l0.copy_(torch.from_numpy(p["b_ih_fwd"]))
        ref.bias_hh_l0.copy_(torch.from_numpy(p["b_hh_fwd"]))
        ref.weight_ih_l0_reverse.copy_(torch.from_numpy(p["w_ih_bwd"]))
        ref.weight_hh_l0_reverse.copy_(torch.from_numpy(p["w_hh_bwd"]))
        ref.bias_ih_l0_reverse.copy_(torch.from_numpy(p["b_ih_bwd"]))
        ref.bias_hh_l0_reverse.copy_(torch.from_numpy(p["b_hh_bwd"]))
        expect = ref(torch.from_numpy(x))[0].numpy()

    assert np.allclose(out, expect, atol=1e-5), np.abs(out - expect).max()


def test_masked_batchnorm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    n_real, n_pad, f = 11, 16, 5
    x = np.zeros((n_pad, f), np.float32)
    x[:n_real] = rng.normal(size=(n_real, f))
    mask = np.zeros(n_pad, bool)
    mask[:n_real] = True

    bn = MaskedBatchNorm()
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                mask=jnp.asarray(mask), use_running_average=False)
    out, upd = bn.apply(v, jnp.asarray(x), mask=jnp.asarray(mask),
                        use_running_average=False, mutable=["batch_stats"])
    out = np.asarray(out)

    ref = torch.nn.BatchNorm1d(f)
    with torch.no_grad():
        expect = ref(torch.from_numpy(x[:n_real])).numpy()
    assert np.allclose(out[:n_real], expect, atol=1e-5)
    # running stats must only see real rows
    assert np.allclose(np.asarray(upd["batch_stats"]["mean"]),
                       ref.running_mean.numpy(), atol=1e-5)
    assert np.allclose(np.asarray(upd["batch_stats"]["var"]),
                       ref.running_var.numpy(), atol=1e-4)


def test_padding_invariance():
    """Same graph, different pad sizes -> identical real-node outputs."""
    n, e, K, dk = 7, 14, 3, 4
    ei, ea, x, pe, peripheral = make_case(5, n, e, K, dk)
    g = Graph(num_nodes=n, edge_index=ei, edge_attr=ea, x=x,
              pe_attr=pe, y=np.zeros(1, np.float32))
    conv = KPGINConv(hidden_size=K * dk, K=K, num_hop1_edge=4, num_pe=6)

    outs = []
    v = None
    for n_pad, e_pad in [(16, 32), (64, 128)]:
        b = collate([g], n_pad=n_pad, e_pad=e_pad, g_pad=2)
        pa = jnp.zeros((n_pad, K, dk)).at[:n].set(peripheral)
        if v is None:
            v = conv.init(jax.random.PRNGKey(7), b.x, b.adj, b.pe_attr, pa)
        outs.append(np.asarray(conv.apply(v, b.x, b.adj, b.pe_attr, pa))[:n])
    assert np.allclose(outs[0], outs[1], atol=1e-5)


def test_kpsage_mean_denominator_matches_reference_semantics():
    """PyG mean divides by ALL union in-edges regardless of hop mask
    (reference: layers/KPGraphSAGE.py aggr='mean' within propagate over
    the union edge set) — check against a numpy oracle doing exactly
    that."""
    from kpgnn_tpu.nn import KPGraphSAGEConv

    n, e, K, dk = 7, 14, 3, 4
    ei, ea, x, pe, peripheral = make_case(11, n, e, K, dk)
    g = Graph(num_nodes=n, edge_index=ei, edge_attr=ea, x=x,
              pe_attr=pe, y=np.zeros(1, np.float32))
    b = collate([g], n_pad=16, e_pad=32, g_pad=2)

    conv = KPGraphSAGEConv(hidden_size=K * dk, K=K, aggr="mean",
                           num_hop1_edge=4, num_pe=6)
    pa = jnp.zeros((16, K, dk)).at[:n].set(peripheral)
    v = conv.init(jax.random.PRNGKey(3), b.x, b.adj, b.pe_attr, pa)
    out = np.asarray(conv.apply(v, b.x, b.adj, b.pe_attr, pa))[:n]

    p = jax.tree.map(np.asarray, v["params"])

    def tab(t):
        t = t.copy()
        t[0] = 0
        return t

    hop1 = tab(p["hop1_edge_emb"])
    hopk = tab(p["hopk_edge_emb"])
    pemb = tab(p["hopk_node_path_emb"])

    xh = x.reshape(n, K, dk).copy()
    xh[:, 1:] += pemb[pe]
    eemb = np.concatenate([hop1[ea[:, :1]], hopk[ea[:, 1:]]], axis=1)
    msg = xh[ei[0]] + eemb
    msg[ea == 0] = 0.0
    num = np.zeros_like(xh)
    np.add.at(num, ei[1], msg)
    den = np.zeros(n)
    np.add.at(den, ei[1], 1.0)          # every union edge counts
    x_n = num / np.maximum(den, 1.0)[:, None, None]
    x_n += peripheral

    h = np.concatenate([xh, x_n], axis=-1)
    h = np.einsum("nki,kio->nko", h, p["hop_proj"]) + p["hop_bias"][None]
    h = np.maximum(h, 0)
    h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    thetas = geometric_thetas(p["combine"]["alphas"], K)
    comb = (h * thetas[None]).sum(1)
    expect = comb @ p["combine_proj"]["kernel"] + p["combine_proj"]["bias"]
    assert np.allclose(out, expect, atol=1e-5), np.abs(out - expect).max()


def test_gine_matches_numpy_oracle():
    """GINE (reference: layers/gine.py): masked 1-hop message + (1+eps)x
    + BN MLP — oracle with torch BatchNorm for the MLP stats."""
    torch = pytest.importorskip("torch")
    from kpgnn_tpu.nn import GINEConv

    n, e = 7, 14
    rng = np.random.default_rng(21)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    ea = rng.integers(2, 5, size=(e, 1))
    x = rng.normal(size=(n, 8)).astype(np.float32)
    g = Graph(num_nodes=n, edge_index=ei, edge_attr=ea, x=x,
              y=np.zeros(1, np.float32))
    b = collate([g], n_pad=16, e_pad=32, g_pad=2)

    conv = GINEConv(hidden_size=8, num_hop1_edge=4)
    v = conv.init(jax.random.PRNGKey(5), b.x, b.adj.slice_hops(1),
                  b.node_mask)
    out, _ = conv.apply(v, b.x, b.adj.slice_hops(1), b.node_mask,
                        True, mutable=["batch_stats"])
    out = np.asarray(out)[:n]

    p = jax.tree.map(np.asarray, v["params"])
    t1 = p["hop1_edge_emb"].copy()
    t1[0] = 0
    msg = x[ei[0]] + t1[ea[:, 0]]
    agg = np.zeros_like(x)
    np.add.at(agg, ei[1], msg)
    h = agg + x                               # eps = 0

    def torch_lin_bn_relu(h, lin, bn_affine):
        z = h @ lin["kernel"] + lin["bias"]
        ref = torch.nn.BatchNorm1d(z.shape[1])
        with torch.no_grad():
            ref.weight.copy_(torch.from_numpy(bn_affine["scale"]))
            ref.bias.copy_(torch.from_numpy(bn_affine["bias"]))
            z = ref(torch.from_numpy(z.astype(np.float32))).numpy()
        return np.maximum(z, 0)

    mlp = p["mlp"]
    h = torch_lin_bn_relu(h, mlp["lin0"], mlp["bn0"])
    h = torch_lin_bn_relu(h, mlp["lin1"], mlp["bn1"])
    assert np.allclose(out, h, atol=1e-4), np.abs(out - h).max()


def test_feature_concat_encoder_folded_equals_naive():
    """The folded histogram contraction must equal the reference
    formulation proj(concat_i(T_i[x_i])) exactly (same params)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from kpgnn_tpu.nn.encoders import FeatureConcatEncoder

    rng = np.random.default_rng(0)
    dims = [5, 21, 7]
    H = 16
    x = rng.integers(0, 5, size=(11, 2, 3)).astype(np.int32)
    for padding in (False, True):
        enc = FeatureConcatEncoder(dims, H, padding=padding)
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = np.asarray(enc.apply(v, jnp.asarray(x)))

        p = v["params"]
        naive = []
        for i, dim in enumerate(dims):
            t = np.asarray(p[f"emb{i}"]["embedding"]).copy()
            if padding:
                t[0] = 0.0
            naive.append(t[x[..., i]])
        cat = np.concatenate(naive, axis=-1)
        want = cat @ np.asarray(p["proj"]["kernel"]) + np.asarray(
            p["proj"]["bias"])
        assert np.allclose(out, want, atol=1e-5), np.abs(out - want).max()

        # sum_axis folds the reduction in (bias once per summed element)
        out_s = np.asarray(enc.apply(v, jnp.asarray(x), sum_axis=1))
        assert np.allclose(out_s, want.sum(axis=1), atol=1e-4)
