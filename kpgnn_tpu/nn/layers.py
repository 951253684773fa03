"""K-hop message-passing convolutions.

All four KP layers share one skeleton (reference: layers/): reshape node
state to (N, K, d_k), add the hop-k path encoding to node state, run ONE
k-hop aggregation over the union edge set with per-hop masking and
per-edge embeddings folded in (`ops.adjacency.khop_aggregate_adj` — a
gather/segment-sum on the COO backend or pure batched MXU matmuls on the
dense backend), add the peripheral embedding, apply the per-hop
transform, and combine across hops.

TPU-first departures from the reference:
  * the GCN self-loop is handled analytically (deg^-1 * (x + self_emb))
    instead of appending E += N self-loop edges
    (reference: layers/KPGCN.py:85-89) — edge arrays keep their static
    padded shape and the math is identical (verified in tests);
  * GCN's symmetric norm deg_i^-1/2 * deg_j^-1/2 is kept factored as
    receiver-side and sender-side scales so the dense backend stays a
    pure matmul;
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

from ..ops.sharded_adjacency import node_axis
from ..ops.adjacency import (
    Adjacency,
    degree,
    hop_major_native,
    khop_aggregate_adj,
)
from .basic import MLP, TorchLinear
from .combine import make_combine
from .embed import small_table_lookup
from .inits import fan_in_uniform_bias, kaiming_uniform, normal_init


def _l2_normalize(x, axis=-1, eps=1e-12):
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _edge_tables(mod: nn.Module, K: int, width: int, num_hop1_edge: int,
                 num_pe: int):
    """Edge/path embedding tables (reference: layers/KPGIN.py:49-53).
    Row 0 is the mask value and is zeroed at use (padding_idx semantics)."""
    t1 = mod.param("hop1_edge_emb", normal_init(), (num_hop1_edge + 2, width))
    tk = tpe = None
    if K > 1:
        tk = mod.param("hopk_edge_emb", normal_init(), (num_pe + 2, width))
        tpe = mod.param("hopk_node_path_emb", normal_init(), (num_pe, width))
    return t1, tk, tpe


def _add_path_encoding(x_hops, tpe, pe_attr):
    """x[:, 1:] += pe_emb(pe_attr) (reference: layers/KPGIN.py:92-94)."""
    if tpe is None or pe_attr is None:
        return x_hops
    table = tpe.at[0].set(0.0).astype(x_hops.dtype)
    return x_hops.at[:, 1:].add(small_table_lookup(table, pe_attr))


def _add_path_encoding_hm(x_hops, tpe, pe_attr):
    """Hop-major variant: x_hops (k, N, H), pe built per hop column and
    stacked on axis 0 — no layout copies."""
    if tpe is None or pe_attr is None or x_hops.shape[0] == 1:
        return x_hops
    table = tpe.at[0].set(0.0).astype(x_hops.dtype)
    pe = jnp.stack([small_table_lookup(table, pe_attr[:, i])
                    for i in range(x_hops.shape[0] - 1)], axis=0)
    return x_hops.at[1:].add(pe)


def _self_loop_row(t1, tk, K):
    """(K, width) embedding of attr value 1 on every hop column."""
    if K > 1:
        return jnp.concatenate(
            [t1[1][None], jnp.tile(tk[1][None], (K - 1, 1))], axis=0)
    return t1[1][None]


def _hop_mlp(mod, h, K, d_in, d_out, hm):
    """Per-hop 2-layer-MLP weights applied in either layout: batched
    (K, d_in, d_out) einsums so XLA runs them as one MXU call."""
    w1 = mod.param("hop_proj1", kaiming_uniform(), (K, d_in, d_out))
    b1 = mod.param("hop_bias1", fan_in_uniform_bias(d_in * d_out),
                   (K, d_out))
    w2 = mod.param("hop_proj2", kaiming_uniform(), (K, d_out, d_out))
    b2 = mod.param("hop_bias2", fan_in_uniform_bias(d_out * d_out),
                   (K, d_out))
    eq = "kni,kio->kno" if hm else "nki,kio->nko"
    badd = (lambda b: b[:, None]) if hm else (lambda b: b[None])
    h = nn.relu(jnp.einsum(eq, h, w1.astype(h.dtype))
                + badd(b1).astype(h.dtype))
    return nn.relu(jnp.einsum(eq, h, w2.astype(h.dtype))
                   + badd(b2).astype(h.dtype))


class KPGINConv(nn.Module):
    """KP-GNN with GIN kernel (reference: layers/KPGIN.py:12-121).

    Hidden is split across hops (d_k = hidden / K); per-hop 2-layer MLP as
    batched 3-D weight tensors; GIN update x_n + (1 + eps) * x.

    On hop-major-native backends (pallas, banded) the whole layer body
    runs in the (K, N, dk) layout — one transpose at entry, none at the
    aggregation boundary; the backbone supplies hop-major
    peripheral_attr to match (ops.adjacency.hop_major_native).
    """

    hidden_size: int
    K: int
    num_hop1_edge: int = 1
    num_pe: int = 1
    combine: str = "geometric"
    train_eps: bool = False

    @nn.compact
    def __call__(self, x, adj: Adjacency, pe_attr=None, peripheral_attr=None,
                 node_mask=None, train: bool = False):
        K, H = self.K, self.hidden_size
        assert H % K == 0, "hidden_size must divide by K"
        dk = H // K
        hm = hop_major_native(adj)
        x = x.reshape(-1, K, dk)
        if hm:
            x = jnp.transpose(x, (1, 0, 2))                  # (K, N, dk)

        t1, tk, tpe = _edge_tables(self, K, dk, self.num_hop1_edge,
                                   self.num_pe)
        x = (_add_path_encoding_hm if hm else _add_path_encoding)(
            x, tpe, pe_attr)
        x_n = khop_aggregate_adj(adj, x, t1, tk, hop_major=hm)
        if peripheral_attr is not None:
            x_n = x_n + peripheral_attr

        eps = (self.param("eps", nn.initializers.zeros, ())
               if self.train_eps else 0.0)
        h = x_n + (1.0 + eps) * x
        h = _hop_mlp(self, h, K, dk, dk, hm)

        if K > 1:
            h = make_combine(self.combine, K, dk, hop_major=hm)(h)
            h = TorchLinear(H, name="combine_proj")(h)
        else:
            h = h[0] if hm else h[:, 0]
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
    def __call__(self, x, adj: Adjacency, pe_attr=None, peripheral_attr=None,
                 node_mask=None, train: bool = False):
        K, H = self.K, self.hidden_size
        assert H % K == 0
        dk = H // K
        n = x.shape[0]
        hm = hop_major_native(adj)

        x = TorchLinear(H, name="hop_proj")(x).reshape(n, K, dk)
        if hm:
            x = jnp.transpose(x, (1, 0, 2))                  # (K, N, dk)
        t1, tk, tpe = _edge_tables(self, K, dk, self.num_hop1_edge,
                                   self.num_pe)
        x = (_add_path_encoding_hm if hm else _add_path_encoding)(
            x, tpe, pe_attr)

        deg = degree(adj, add_self_loop=True)               # (N, K)
        dis = jax.lax.rsqrt(deg)
        from ..ops.banded import BandedAdj
        if isinstance(adj, BandedAdj):
            # the structural sender scale deg^-0.5 is folded into the
            # plan at collate time (collate_banded(gcn_norm=True)); only
            # the receiver side stays dynamic
            if not adj.sender_scaled:
                raise ValueError(
                    "KPGCN on the banded backend needs a gcn_norm plan: "
                    "collate_banded(..., gcn_norm=True) (the loader sets "
                    "this for KPGCN models)")
            agg = khop_aggregate_adj(adj, x, t1, tk, scale=dis,
                                     hop_major=hm)
        else:
            agg = khop_aggregate_adj(adj, x, t1, tk,
                                     scale=dis, sender_scale=dis,
                                     hop_major=hm)
        # analytic self-loop: edge (i, i) with attr 1 on every hop column
        self_emb = _self_loop_row(t1.at[0].set(0.0),
                                  tk.at[0].set(0.0) if tk is not None else None,
                                  K)
        inv = 1.0 / deg
        if hm:
            agg = agg + (jnp.transpose(inv)[..., None]
                         * (x + self_emb[:, None]))
        else:
            agg = agg + inv[..., None] * (x + self_emb[None])
        h = nn.relu(agg)

        if peripheral_attr is not None:
            h = h + peripheral_attr
        if K > 1:
            h = make_combine(self.combine, K, dk, hop_major=hm)(h)
            h = TorchLinear(H, name="combine_proj")(h)
        else:
            h = h[0] if hm else h[:, 0]
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
    def __call__(self, x, adj: Adjacency, pe_attr=None, peripheral_attr=None,
                 node_mask=None, train: bool = False):
        K, H = self.K, self.hidden_size
        assert H % K == 0
        dk = H // K
        hm = hop_major_native(adj)
        x = x.reshape(-1, K, dk)
        if hm:
            x = jnp.transpose(x, (1, 0, 2))                  # (K, N, dk)
        t1, tk, tpe = _edge_tables(self, K, dk, self.num_hop1_edge,
                                   self.num_pe)
        x = (_add_path_encoding_hm if hm else _add_path_encoding)(
            x, tpe, pe_attr)
        x_n = khop_aggregate_adj(adj, x, t1, tk, aggr=self.aggr,
                                 hop_major=hm)
        if peripheral_attr is not None:
            x_n = x_n + peripheral_attr

        h = jnp.concatenate([x, x_n], axis=-1)          # (..., K|N, 2dk)
        w = self.param("hop_proj", kaiming_uniform(), (K, 2 * dk, dk))
        b = self.param("hop_bias", fan_in_uniform_bias(2 * dk * dk), (K, dk))
        if hm:
            h = jnp.einsum("kni,kio->kno", h, w.astype(h.dtype)) \
                + b[:, None].astype(h.dtype)
        else:
            h = jnp.einsum("nki,kio->nko", h, w.astype(h.dtype)) \
                + b[None].astype(h.dtype)
        h = _l2_normalize(nn.relu(h), axis=-1)

        if K > 1:
            h = make_combine(self.combine, K, dk, hop_major=hm)(h)
            h = TorchLinear(H, name="combine_proj")(h)
        else:
            h = h[0] if hm else h[:, 0]
        return h


class KPGINPlusConv(nn.Module):
    """KP-GIN+ (reference: layers/KPGINplus.py:10-88).

    Full hidden width per hop; the caller supplies x as the HOP-MAJOR
    (k, N, H) sliding window of previous layer outputs (GNNPlus stacks
    the last k layer outputs on axis 0 — a free concat), along with
    hop-major peripheral_attr (k, N, H).  The whole layer — path
    encoding, aggregation, GELU, combine — runs hop-major with zero
    layout copies; GELU after aggregation, then combine and a shared BN
    MLP.
    """

    hidden_size: int
    K: int
    num_hop1_edge: int = 1
    num_pe: int = 1
    combine: str = "geometric"

    @nn.compact
    def __call__(self, x, adj: Adjacency, pe_attr=None, peripheral_attr=None,
                 node_mask=None, train: bool = False):
        K, H = self.K, self.hidden_size
        t1, tk, tpe = _edge_tables(self, K, H, self.num_hop1_edge,
                                   self.num_pe)
        x = _add_path_encoding_hm(x, tpe, pe_attr)
        x_n = khop_aggregate_adj(adj, x, t1, tk, hop_major=True)
        x_n = jax.nn.gelu(x_n, approximate=False)
        if peripheral_attr is not None:
            x_n = x_n + peripheral_attr
        h = (make_combine(self.combine, K, H, hop_major=True)(x_n)
             if K > 1 else x_n[0])
        h = MLP([H, H], use_batchnorm=True, name="mlp")(
            h, mask=node_mask, train=train, axis_name=node_axis(adj))
        return h


class GINEConv(nn.Module):
    """Plain 1-hop GINE for GNNPrime's upper layers
    (reference: layers/gine.py:9-59)."""

    hidden_size: int
    num_hop1_edge: int = 1
    eps_init: float = 0.0
    train_eps: bool = False

    @nn.compact
    def __call__(self, x, adj: Adjacency, node_mask=None,
                 train: bool = False):
        H = self.hidden_size
        x = x.reshape(-1, 1, H)
        t1 = self.param("hop1_edge_emb", normal_init(),
                        (self.num_hop1_edge + 2, H))
        adj1 = adj.slice_hops(1)
        out = khop_aggregate_adj(adj1, x, t1, None)
        if self.train_eps:
            eps = self.param(
                "eps", lambda *_: jnp.asarray(self.eps_init, jnp.float32), ())
        else:
            eps = self.eps_init
        out = out + (1.0 + eps) * x
        return MLP([H, H], use_batchnorm=True, name="mlp")(
            out[:, 0], mask=node_mask, train=train,
            axis_name=node_axis(adj))


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
