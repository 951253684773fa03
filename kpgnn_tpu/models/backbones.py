"""GNN backbones: the generalized K-hop frameworks.

Three families (reference: models/GNNs.py:22,238,478):
  * GNN       — stack of identical KP layers (hidden split across hops);
  * GNNPlus   — KP-GIN+ layers whose "hop" axis is the sliding window of
                the last k = min(l, K) layer outputs;
  * GNNPrime  — num_l1_layer K-hop layers followed by plain 1-hop GINE
                layers.

Shared machinery (peripheral embeddings computed once, virtual node,
jumping knowledge, norms, residual/dropout plumbing) lives in this module
as helpers; every statistic is masked so padding never leaks
(see nn/norms.py docstring).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph.batch import GraphBatch
from ..ops.adjacency import hop_major_native
from ..ops.lstm import BiLSTM
from ..ops.segment import segment_sum
from ..ops.sharded_adjacency import node_axis
from .. import nn as knn
from ..nn.basic import MLP, TorchLinear
from ..nn.encoders import FeatureConcatEncoder
from ..nn.inits import normal_init
from ..nn.norms import (
    GraphSizeNorm,
    MaskedBatchNorm,
    MaskedGraphLayerNorm,
    MaskedInstanceNorm,
    PairNorm,
)


def _dropout(module: nn.Module, x, rate: float, train: bool):
    """Functional dropout drawing from the caller's 'dropout' rng stream —
    usable from any module method (unlike an nn.Dropout submodule, which
    must be created in a compact context)."""
    if not train or rate <= 0.0:
        return x
    rng = module.make_rng("dropout")
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _apply_norm(norm_type: str, name: str, parent, x, batch: GraphBatch,
                train: bool):
    """Instantiate-and-apply one per-layer norm with the right masking
    inputs (reference switch: models/GNNs.py:103-114).  When the node
    axis is sharded, the norm's statistics psum over that axis so they
    equal the single-device ones."""
    gid, g = batch.node_graph_ids, batch.g_pad
    ax = node_axis(batch)
    if norm_type == "Batch":
        return MaskedBatchNorm(name=name, parent=parent)(
            x, mask=batch.node_mask, use_running_average=not train,
            axis_name=ax)
    if norm_type == "Layer":
        return MaskedGraphLayerNorm(name=name, parent=parent)(
            x, gid, g, mask=batch.node_mask, axis_name=ax)
    if norm_type == "Instance":
        return MaskedInstanceNorm(name=name, parent=parent)(
            x, gid, g, mask=batch.node_mask, axis_name=ax)
    if norm_type == "GraphSize":
        return GraphSizeNorm(name=name, parent=parent)(
            x, gid, g, mask=batch.node_mask, axis_name=ax)
    if norm_type == "Pair":
        return PairNorm(name=name, parent=parent)(
            x, mask=batch.node_mask, axis_name=ax)
    raise ValueError("Not supported norm method")


class _PeripheralEmbed(nn.Module):
    """Peripheral edge + configuration embeddings, computed once per
    forward and fed to every layer (reference: models/GNNs.py:90-98,172-179).

    `gate` chooses sigmoid (GNN / GNNPrime) or tanh (GNNPlus,
    reference: models/GNNs.py:396-400).
    """

    width: int
    num_hop1_edge: int
    max_edge_count: int
    max_hop_num: int
    max_distance_count: int
    wo_peripheral_edge: bool
    wo_peripheral_configuration: bool
    gate: str = "sigmoid"

    @nn.compact
    def __call__(self, batch: GraphBatch, K: int) -> jnp.ndarray:
        n = batch.n_pad
        gate_fn = jax.nn.sigmoid if self.gate == "sigmoid" else jnp.tanh
        out = jnp.zeros((n, K, self.width))
        # NOTE: the reference passes padding=0 (falsy) to these encoders
        # (models/GNNs.py:92-97), so row 0 is NOT zeroed — absent
        # peripheral slots contribute the (learned) row-0 embedding.
        # Matching that is required for activation parity; padded node
        # rows are masked out downstream either way.
        if not self.wo_peripheral_edge and batch.peripheral_edge_attr is not None:
            enc = FeatureConcatEncoder(
                [self.num_hop1_edge + 2, self.max_edge_count + 1],
                self.width, padding=False, name="peripheral_edge_embedding")
            # encoder(attr).sum over the component axis, fused through
            # the linear stack (histograms; no (N, K, T, W) intermediate)
            emb = enc(batch.peripheral_edge_attr, sum_axis=-1)  # (N, K, W)
            pew = self.param("pew", normal_init(), (1,))
            out = out + gate_fn(pew) * emb
        if not self.wo_peripheral_configuration and batch.peripheral_config_attr is not None:
            enc = FeatureConcatEncoder(
                [self.max_distance_count + 1] * (self.max_hop_num + 1),
                self.width, padding=False,
                name="peripheral_configuration_embedding")
            pcw = self.param("pcw", normal_init(), (1,))
            out = out + gate_fn(pcw) * enc(batch.peripheral_config_attr)
        return out


class _VirtualNode(nn.Module):
    """Virtual-node state and per-layer MLP update
    (reference: models/GNNs.py:74-88,180-213).  The embedding starts at
    zero; each update pools the layer input per graph, adds the current
    state, and runs a Linear-BN-ReLU x2 MLP whose BN is masked over real
    graphs."""

    hidden_size: int
    num_layer: int

    def setup(self):
        # zero-init single-row table, matching the reference's constant_ 0
        self.embedding = self.param(
            "virtualnode_embedding", nn.initializers.zeros,
            (1, self.hidden_size))
        self.mlps = [
            MLP([self.hidden_size, self.hidden_size], use_batchnorm=True,
                name=f"mlp_virtualnode_{i}")
            for i in range(self.num_layer - 1)
        ]

    def initial(self, num_graphs: int) -> jnp.ndarray:
        return jnp.tile(self.embedding, (num_graphs, 1))

    def update(self, layer: int, h_prev, vn, batch: GraphBatch,
               train: bool, residual: bool, drop_prob: float):
        pooled = segment_sum(
            h_prev * batch.node_mask[:, None].astype(h_prev.dtype),
            batch.node_graph_ids, batch.g_pad).astype(jnp.float32)
        ax = node_axis(batch)
        if ax is not None:
            pooled = jax.lax.psum(pooled, ax)
        tmp = pooled + vn
        out = self.mlps[layer](tmp, mask=batch.graph_mask, train=train)
        out = _dropout(self, out, drop_prob, train)
        return vn + out if residual else out


def _jumping_knowledge(parent, JK: str, h_list, hidden_size: int,
                       num_layer: int, train: bool):
    """Aggregate the per-layer node states (reference: models/GNNs.py:215-234)."""
    if JK == "concat":
        return jnp.concatenate(h_list, axis=1)
    if JK == "last":
        return h_list[-1]
    if JK == "max":
        return jnp.max(jnp.stack(h_list, axis=0), axis=0)
    if JK == "sum":
        return jnp.sum(jnp.stack(h_list, axis=0), axis=0)
    if JK == "attention":
        hs = jnp.stack(h_list, axis=1)           # (N, L+1, H)
        score = BiLSTM(num_layer, name="attention_lstm", parent=parent)(hs)
        att = jax.nn.softmax(score.sum(-1), axis=1)[..., None]
        return (hs * att).sum(axis=1)
    raise ValueError(f"unknown JK {JK!r}")


class GNN(nn.Module):
    """Stack of `num_layer` identical KP layers
    (reference: models/GNNs.py:22-235)."""

    num_layer: int
    hidden_size: int
    K: int
    layer_fn: Callable[[str], nn.Module]
    init_encoder: nn.Module
    num_hop1_edge: int = 1
    max_edge_count: int = 0
    max_hop_num: int = 0
    max_distance_count: int = 0
    JK: str = "last"
    norm_type: str = "Batch"
    virtual_node: bool = True
    residual: bool = False
    use_rd: bool = False
    wo_peripheral_edge: bool = False
    wo_peripheral_configuration: bool = False
    drop_prob: float = 0.1
    compute_dtype: str = "float32"        # activations dtype (params stay f32)
    peripheral_full_width: bool = False   # True for GNNPlus-style width

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> jnp.ndarray:
        H, K, L = self.hidden_size, self.K, self.num_layer
        dk = H if self.peripheral_full_width else H // K

        def dropout(v):
            return _dropout(self, v, self.drop_prob, train)

        x = self.init_encoder(batch)
        if x.ndim == 3 and x.shape[1] == 1:
            x = x[:, 0]
        if self.use_rd and batch.rd is not None:
            x = x + TorchLinear(H, name="rd_projection")(batch.rd)
        x = x.astype(jnp.dtype(self.compute_dtype))

        peripheral_attr = _PeripheralEmbed(
            dk, self.num_hop1_edge, self.max_edge_count, self.max_hop_num,
            self.max_distance_count, self.wo_peripheral_edge,
            self.wo_peripheral_configuration, gate="sigmoid",
            name="peripheral")(batch, K).astype(x.dtype)
        if hop_major_native(batch.adj):
            # hop-major backends: the layers run their whole body in
            # (K, N, dk); transpose the shared peripheral ONCE here
            peripheral_attr = jnp.transpose(peripheral_attr, (1, 0, 2))

        vn_mod = (_VirtualNode(H, L, name="virtualnode")
                  if self.virtual_node else None)
        vn = vn_mod.initial(batch.g_pad) if vn_mod is not None else None

        h_list = [x]
        for l in range(L):                                     # noqa: E741
            if vn_mod is not None:
                h_list[l] = h_list[l] + vn[batch.node_graph_ids].astype(h_list[l].dtype)
            layer = self.layer_fn(f"gnn{l}")
            h = layer(h_list[l], batch.adj, batch.pe_attr, peripheral_attr,
                      node_mask=batch.node_mask, train=train)
            h = _apply_norm(self.norm_type, f"norm{l}", self, h, batch, train)
            if l != L - 1:
                h = dropout(h)
            if self.residual:
                h = h + h_list[l]
            h_list.append(h)
            if vn_mod is not None and l < L - 1:
                vn = vn_mod.update(l, h_list[l], vn, batch, train,
                                   self.residual, self.drop_prob)

        rep = _jumping_knowledge(self, self.JK, h_list, H, L, train)
        width = H  # output proj always maps back to hidden
        rep = TorchLinear(width, name="output_proj")(rep)
        return dropout(nn.relu(rep))


class GNNPlus(nn.Module):
    """KP-GIN+ framework: layer l's hop axis is the window of the last
    k = min(l+1, K) layer outputs (reference: models/GNNs.py:238-474)."""

    num_layer: int
    hidden_size: int
    K: int
    layer_fn: Callable[[int, str], nn.Module]   # (layer_idx, name) -> conv
    init_encoder: nn.Module
    num_hop1_edge: int = 1
    max_edge_count: int = 0
    max_hop_num: int = 0
    max_distance_count: int = 0
    JK: str = "last"
    norm_type: str = "Batch"
    virtual_node: bool = True
    residual: bool = False
    use_rd: bool = False
    wo_peripheral_edge: bool = False
    wo_peripheral_configuration: bool = False
    drop_prob: float = 0.1
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> jnp.ndarray:
        H, K, L = self.hidden_size, self.K, self.num_layer
        assert L >= K, "GNNPlus needs num_layer >= K"

        def dropout(v):
            return _dropout(self, v, self.drop_prob, train)

        x = self.init_encoder(batch)
        if x.ndim == 3 and x.shape[1] == 1:
            x = x[:, 0]
        if self.use_rd and batch.rd is not None:
            x = x + TorchLinear(H, name="rd_projection")(batch.rd)
        x = x.astype(jnp.dtype(self.compute_dtype))

        peripheral_attr = _PeripheralEmbed(
            H, self.num_hop1_edge, self.max_edge_count, self.max_hop_num,
            self.max_distance_count, self.wo_peripheral_edge,
            self.wo_peripheral_configuration, gate="tanh",
            name="peripheral")(batch, K).astype(x.dtype)

        vn_mod = (_VirtualNode(H, L, name="virtualnode")
                  if self.virtual_node else None)
        vn = vn_mod.initial(batch.g_pad) if vn_mod is not None else None

        # hop-major peripheral view, transposed ONCE per forward — every
        # layer's window is then built hop-major (axis-0 stack, free) and
        # the whole KPGINPlusConv runs without layout copies
        peripheral_hm = jnp.transpose(peripheral_attr, (1, 0, 2))

        h_list = [x]
        last_h = x
        for l in range(L):                                     # noqa: E741
            if vn_mod is not None:
                h_list[l] = h_list[l] + vn[batch.node_graph_ids].astype(h_list[l].dtype)
            k = min(l + 1, K)
            window = jnp.stack([h_list[j] for j in range(l, l - k, -1)],
                               axis=0)                         # (k, N, H)
            layer = self.layer_fn(l, f"gnn{l}")
            h = layer(window, batch.adj.slice_hops(k),
                      batch.pe_attr[:, :k - 1] if batch.pe_attr is not None else None,
                      peripheral_hm[:k],
                      node_mask=batch.node_mask, train=train)
            h = _apply_norm(self.norm_type, f"norm{l}", self, h, batch, train)
            if l != L - 1:
                h = dropout(h)
            if self.residual:
                h = h + last_h
                last_h = h
            h_list.append(h)
            if vn_mod is not None and l < L - 1:
                vn = vn_mod.update(l, h_list[l], vn, batch, train,
                                   self.residual, self.drop_prob)

        rep = _jumping_knowledge(self, self.JK, h_list, H, L, train)
        rep = TorchLinear(H, name="output_proj")(rep)
        return dropout(nn.relu(rep))


class GNNPrime(nn.Module):
    """num_l1_layer K-hop layers then 1-hop GINE layers
    (reference: models/GNNs.py:478-722)."""

    num_layer: int
    hidden_size: int
    K: int
    layer_fn: Callable[[str], nn.Module]
    init_encoder: nn.Module
    num_l1_layer: int = 1
    num_hop1_edge: int = 1
    max_edge_count: int = 0
    max_hop_num: int = 0
    max_distance_count: int = 0
    JK: str = "last"
    norm_type: str = "Batch"
    virtual_node: bool = True
    residual: bool = False
    use_rd: bool = False
    wo_peripheral_edge: bool = False
    wo_peripheral_configuration: bool = False
    drop_prob: float = 0.1
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> jnp.ndarray:
        H, K, L = self.hidden_size, self.K, self.num_layer
        L1 = self.num_l1_layer
        assert L1 > 0 and L >= 2
        dk = H // K

        def dropout(v):
            return _dropout(self, v, self.drop_prob, train)

        x = self.init_encoder(batch)
        if x.ndim == 3 and x.shape[1] == 1:
            x = x[:, 0]
        if self.use_rd and batch.rd is not None:
            x = x + TorchLinear(H, name="rd_projection")(batch.rd)
        x = x.astype(jnp.dtype(self.compute_dtype))

        peripheral_attr = _PeripheralEmbed(
            dk, self.num_hop1_edge, self.max_edge_count, self.max_hop_num,
            self.max_distance_count, self.wo_peripheral_edge,
            self.wo_peripheral_configuration, gate="sigmoid",
            name="peripheral")(batch, K).astype(x.dtype)
        if hop_major_native(batch.adj):
            peripheral_attr = jnp.transpose(peripheral_attr, (1, 0, 2))

        vn_mod = (_VirtualNode(H, L, name="virtualnode")
                  if self.virtual_node else None)
        vn = vn_mod.initial(batch.g_pad) if vn_mod is not None else None

        h_list = [x]
        for l in range(L1):                                    # noqa: E741
            if vn_mod is not None:
                h_list[l] = h_list[l] + vn[batch.node_graph_ids].astype(h_list[l].dtype)
            layer = self.layer_fn(f"khop_gnn{l}")
            h = layer(h_list[l], batch.adj, batch.pe_attr, peripheral_attr,
                      node_mask=batch.node_mask, train=train)
            h = _apply_norm(self.norm_type, f"norm{l}", self, h, batch, train)
            # the reference applies dropout unconditionally in the l1 loop
            # (models/GNNs.py:657)
            h = dropout(h)
            if self.residual:
                h = h + h_list[l]
            h_list.append(h)
            if vn_mod is not None and l < L - 1:
                vn = vn_mod.update(l, h_list[l], vn, batch, train,
                                   self.residual, self.drop_prob)

        for l in range(L1, L):                                 # noqa: E741
            if vn_mod is not None:
                h_list[l] = h_list[l] + vn[batch.node_graph_ids].astype(h_list[l].dtype)
            gine = knn.GINEConv(H, self.num_hop1_edge, name=f"gine{l - L1}")
            h = gine(h_list[l], batch.adj,
                     node_mask=batch.node_mask, train=train)
            h = _apply_norm(self.norm_type, f"norm{l}", self, h, batch, train)
            if l != L - 1:
                h = dropout(h)
            if self.residual:
                h = h + h_list[l]
            h_list.append(h)
            if vn_mod is not None and l < L - 1:
                vn = vn_mod.update(l, h_list[l], vn, batch, train,
                                   self.residual, self.drop_prob)

        rep = _jumping_knowledge(self, self.JK, h_list, H, L, train)
        rep = TorchLinear(H, name="output_proj")(rep)
        return dropout(nn.relu(rep))
