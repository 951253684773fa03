"""K-hop message-passing convolutions.

All four KP layers share one skeleton (reference: layers/): reshape node
state to (N, K, d_k), embed per-hop edge attrs, add the hop-k path
encoding to node state, aggregate the union edge set once with per-hop
masking (a single gather -> mask -> segment-sum implements all K hops at
once — `ops.khop_aggregate`), add the peripheral embedding, apply the
per-hop transform, and combine across hops.

TPU-first departures from the reference:
  * the GCN self-loop is handled analytically (deg^-1 * (x + self_emb))
    instead of appending E += N self-loop edges
    (reference: layers/KPGCN.py:85-89) — the edge arrays keep their static
    padded shape and the math is identical;
  * per-hop projections are (K, d_in, d_out) einsums so XLA batches them
    onto the MXU in one call;
  * BatchNorms inside layer MLPs are masked so padding never pollutes the
    statistics.
"""
from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import khop_aggregate, multi_hop_degree
from .basic import MLP, TorchLinear
from .combine import make_combine
from .embed import PaddedEmbed
from .inits import fan_in_uniform_bias, kaiming_uniform
from .norms import MaskedBatchNorm


def _l2_normalize(x, axis=-1, eps=1e-12):
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class _KPEdgeEmbeds(nn.Module):
    """Shared edge/path embedding block: hop-1 edge type + hop-k walk
    encodings + node path encoding (reference: layers/KPGIN.py:49-53).

    With `with_self_loop`, also returns the (K, width) embedding of attr
    value 1 on each hop column (the GCN self-loop row), reusing the same
    tables.
    """

    K: int
    width: int
    num_hop1_edge: int
    num_pe: int
    with_self_loop: bool = False

    @nn.compact
    def __call__(self, x_hops, edge_attr, pe_attr):
        hop1 = PaddedEmbed(self.num_hop1_edge + 2, self.width,
                           name="hop1_edge_emb")
        e1 = hop1(edge_attr[:, :1])
        self_emb = None
        one = jnp.asarray(1, jnp.int32)
        if self.K > 1:
            if pe_attr is not None:
                pe = PaddedEmbed(self.num_pe, self.width,
                                 name="hopk_node_path_emb")(pe_attr)
                x_hops = x_hops.at[:, 1:].add(pe)
            hopk = PaddedEmbed(self.num_pe + 2, self.width,
                               name="hopk_edge_emb")
            ek = hopk(edge_attr[:, 1:])
            e_emb = jnp.concatenate([e1, ek], axis=-2)
            if self.with_self_loop:
                self_emb = jnp.concatenate(
                    [hop1(one)[None],
                     jnp.tile(hopk(one)[None], (self.K - 1, 1))], axis=0)
        else:
            e_emb = e1
            if self.with_self_loop:
                self_emb = hop1(one)[None]
        if self.with_self_loop:
            return x_hops, e_emb, self_emb
        return x_hops, e_emb


class KPGINConv(nn.Module):
    """KP-GNN with GIN kernel (reference: layers/KPGIN.py:12-121).

    Hidden is split across hops (d_k = hidden / K); per-hop 2-layer MLP as
    batched 3-D weight tensors; GIN update x_n + (1 + eps) * x.
    """

    hidden_size: int
    K: int
    num_hop1_edge: int = 1
    num_pe: int = 1
    combine: str = "geometric"
    train_eps: bool = False

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr,
                 pe_attr=None, peripheral_attr=None,
                 node_mask=None, edge_mask=None, train: bool = False):
        K, H = self.K, self.hidden_size
        assert H % K == 0, "hidden_size must divide by K"
        dk = H // K
        x = x.reshape(-1, K, dk)

        x, e_emb = _KPEdgeEmbeds(K, dk, self.num_hop1_edge, self.num_pe,
                                 name="edge_embeds")(x, edge_attr, pe_attr)
        x_n = khop_aggregate(x, senders, receivers, e_emb, edge_attr)
        if peripheral_attr is not None:
            x_n = x_n + peripheral_attr

        if self.train_eps:
            eps = self.param("eps", nn.initializers.zeros, ())
        else:
            eps = 0.0
        h = x_n + (1.0 + eps) * x

        w1 = self.param("hop_proj1", kaiming_uniform(), (K, dk, dk))
        b1 = self.param("hop_bias1", fan_in_uniform_bias(dk * dk), (K, dk))
        w2 = self.param("hop_proj2", kaiming_uniform(), (K, dk, dk))
        b2 = self.param("hop_bias2", fan_in_uniform_bias(dk * dk), (K, dk))
        h = nn.relu(jnp.einsum("nki,kio->nko", h, w1) + b1[None])
        h = nn.relu(jnp.einsum("nki,kio->nko", h, w2) + b2[None])

        if K > 1:
            h = make_combine(self.combine, K, dk)(h)
            h = TorchLinear(H, name="combine_proj")(h)
        else:
            h = h[:, 0]
        return h


class KPGCNConv(nn.Module):
    """KP-GNN with GCN kernel (reference: layers/KPGCN.py:28-126).

    Multi-hop symmetric degree norm; the self-loop (attr 1 on every hop)
    enters analytically as deg^-1 * (x + emb(1)) per hop.
    """

    hidden_size: int
    K: int
    num_hop1_edge: int = 1
    num_pe: int = 1
    combine: str = "geometric"

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr,
                 pe_attr=None, peripheral_attr=None,
                 node_mask=None, edge_mask=None, train: bool = False):
        K, H = self.K, self.hidden_size
        assert H % K == 0
        dk = H // K
        n = x.shape[0]

        x = TorchLinear(H, name="hop_proj")(x).reshape(n, K, dk)
        x, e_emb, self_emb = _KPEdgeEmbeds(
            K, dk, self.num_hop1_edge, self.num_pe, with_self_loop=True,
            name="edge_embeds")(x, edge_attr, pe_attr)

        deg = multi_hop_degree(edge_attr, receivers, n, add_self_loop=True)
        dis = jax.lax.rsqrt(deg)                                   # (N, K)
        norm = dis[senders] * dis[receivers]                       # (E, K)
        agg = khop_aggregate(x, senders, receivers, e_emb, edge_attr,
                             scale=norm)
        # analytic self-loop: edge (i, i) with attr 1 on every hop column
        agg = agg + (1.0 / deg)[..., None] * (x + self_emb[None])
        h = nn.relu(agg)

        if peripheral_attr is not None:
            h = h + peripheral_attr
        if K > 1:
            h = make_combine(self.combine, K, dk)(h)
            h = TorchLinear(H, name="combine_proj")(h)
        else:
            h = h[:, 0]
        return h


class KPGraphSAGEConv(nn.Module):
    """KP-GNN with GraphSAGE kernel (reference: layers/KPGraphSAGE.py:12-106).

    Mean aggregation by default; concat [x, x_n] -> per-hop linear -> ReLU
    -> L2 normalize.
    """

    hidden_size: int
    K: int
    aggr: str = "mean"
    num_hop1_edge: int = 1
    num_pe: int = 1
    combine: str = "geometric"

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr,
                 pe_attr=None, peripheral_attr=None,
                 node_mask=None, edge_mask=None, train: bool = False):
        K, H = self.K, self.hidden_size
        assert H % K == 0
        dk = H // K
        x = x.reshape(-1, K, dk)
        x, e_emb = _KPEdgeEmbeds(K, dk, self.num_hop1_edge, self.num_pe,
                                 name="edge_embeds")(x, edge_attr, pe_attr)
        x_n = khop_aggregate(x, senders, receivers, e_emb, edge_attr,
                             aggr=self.aggr, edge_mask=edge_mask)
        if peripheral_attr is not None:
            x_n = x_n + peripheral_attr

        h = jnp.concatenate([x, x_n], axis=-1)                    # (N, K, 2dk)
        w = self.param("hop_proj", kaiming_uniform(), (K, 2 * dk, dk))
        b = self.param("hop_bias", fan_in_uniform_bias(2 * dk * dk), (K, dk))
        h = jnp.einsum("nki,kio->nko", h, w) + b[None]
        h = _l2_normalize(nn.relu(h), axis=-1)

        if K > 1:
            h = make_combine(self.combine, K, dk)(h)
            h = TorchLinear(H, name="combine_proj")(h)
        else:
            h = h[:, 0]
        return h


class KPGINPlusConv(nn.Module):
    """KP-GIN+ (reference: layers/KPGINplus.py:10-88).

    Full hidden width per hop; the caller supplies x as the (N, k, H)
    sliding window of previous layer outputs; GELU after aggregation, then
    combine and a shared BN MLP.
    """

    hidden_size: int
    K: int
    num_hop1_edge: int = 1
    num_pe: int = 1
    combine: str = "geometric"

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr,
                 pe_attr=None, peripheral_attr=None,
                 node_mask=None, edge_mask=None, train: bool = False):
        K, H = self.K, self.hidden_size
        x, e_emb = _KPEdgeEmbeds(K, H, self.num_hop1_edge, self.num_pe,
                                 name="edge_embeds")(x, edge_attr, pe_attr)
        x_n = khop_aggregate(x, senders, receivers, e_emb, edge_attr)
        x_n = jax.nn.gelu(x_n, approximate=False)
        if peripheral_attr is not None:
            x_n = x_n + peripheral_attr
        h = make_combine(self.combine, K, H)(x_n) if K > 1 else x_n[:, 0]
        h = MLP([H, H], use_batchnorm=True, name="mlp")(
            h, mask=node_mask, train=train)
        return h


class GINEConv(nn.Module):
    """Plain 1-hop GINE for GNNPrime's upper layers
    (reference: layers/gine.py:9-59)."""

    hidden_size: int
    num_hop1_edge: int = 1
    eps_init: float = 0.0
    train_eps: bool = False

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr,
                 node_mask=None, edge_mask=None, train: bool = False):
        H = self.hidden_size
        x = x.reshape(-1, 1, H)
        e_emb = PaddedEmbed(self.num_hop1_edge + 2, H,
                            name="hop1_edge_emb")(edge_attr)
        out = khop_aggregate(x, senders, receivers, e_emb, edge_attr)
        if self.train_eps:
            eps = self.param(
                "eps", lambda *_: jnp.asarray(self.eps_init, jnp.float32), ())
        else:
            eps = self.eps_init
        out = out + (1.0 + eps) * x
        return MLP([H, H], use_batchnorm=True, name="mlp")(
            out[:, 0], mask=node_mask, train=train)


GNNLayerSpec = Union[nn.Module, List[nn.Module]]


def make_gnn_layer(
    model_name: str,
    hidden_size: int,
    K: int,
    num_layer: int = 1,
    num_hop1_edge: int = 1,
    num_pe: int = 1,
    combine: str = "geometric",
    aggr: str = "mean",
    train_eps: bool = False,
):
    """Layer factory (reference: layers/layer_utils.py:10-34).

    For KPGINPlus, returns per-layer constructor kwargs with hop count
    k_l = min(l, K); other families return one prototype config that the
    backbone instantiates per layer.
    """
    if model_name == "KPGCN":
        return lambda name: KPGCNConv(hidden_size, K, num_hop1_edge, num_pe,
                                      combine, name=name)
    if model_name in ("KPGIN", "KPGINPrime"):
        return lambda name: KPGINConv(hidden_size, K, num_hop1_edge, num_pe,
                                      combine, train_eps, name=name)
    if model_name == "KPGraphSAGE":
        return lambda name: KPGraphSAGEConv(hidden_size, K, aggr,
                                            num_hop1_edge, num_pe, combine,
                                            name=name)
    if model_name == "KPGINPlus":
        def make(l, name):          # noqa: E741
            return KPGINPlusConv(hidden_size, min(l + 1, K), num_hop1_edge,
                                 num_pe, combine, name=name)
        return make
    raise ValueError("Not supported GNN type")
