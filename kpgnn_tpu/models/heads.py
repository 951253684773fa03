"""Task heads: pooling + linear readout (reference: models/Graph*.py,
models/Node*.py).  All pooling is masked segment reduction over
`node_graph_ids`; attention pooling is a gate network scored softmax
within each graph (PyG AttentionalAggregation equivalent)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph.batch import GraphBatch
from ..ops.segment import segment_max, segment_mean, segment_softmax, segment_sum
from ..nn.basic import TorchLinear


def pool_nodes(x, batch: GraphBatch, method: str, gate=None):
    gid, g = batch.node_graph_ids, batch.g_pad
    m = batch.node_mask.astype(x.dtype)[:, None]
    if method == "sum":
        return segment_sum(x * m, gid, g)
    if method == "mean":
        return segment_mean(x, gid, g, weights=batch.node_mask)
    if method == "max":
        xm = jnp.where(batch.node_mask[:, None], x, -jnp.inf)
        out = segment_max(xm, gid, g)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    if method == "attention":
        scores = gate(x)[:, 0]
        att = segment_softmax(scores, gid, g, mask=batch.node_mask)
        return segment_sum(x * att[:, None] * m, gid, g)
    raise ValueError("The pooling method not implemented")


class GraphClassification(nn.Module):
    embedding_model: nn.Module
    pooling_method: str
    output_size: int

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        x = self.embedding_model(batch, train=train)
        gate = (TorchLinear(1, name="pool_gate")
                if self.pooling_method == "attention" else None)
        pooled = pool_nodes(x, batch, self.pooling_method, gate)
        return TorchLinear(self.output_size, name="classifier")(pooled)


class GraphRegression(nn.Module):
    embedding_model: nn.Module
    pooling_method: str
    output_size: int = 1

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        x = self.embedding_model(batch, train=train)
        gate = (TorchLinear(1, name="pool_gate")
                if self.pooling_method == "attention" else None)
        pooled = pool_nodes(x, batch, self.pooling_method, gate)
        out = TorchLinear(self.output_size, name="regressor")(pooled)
        return out[:, 0] if self.output_size == 1 else out


class NodeClassification(nn.Module):
    embedding_model: nn.Module
    output_size: int

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        x = self.embedding_model(batch, train=train)
        return TorchLinear(self.output_size, name="classifier")(x)


class NodeRegression(nn.Module):
    embedding_model: nn.Module
    output_size: int = 1

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        x = self.embedding_model(batch, train=train)
        out = TorchLinear(self.output_size, name="regressor")(x)
        return out[:, 0] if self.output_size == 1 else out
