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
from ..ops.sharded_adjacency import node_axis
from ..nn.basic import TorchLinear


def pool_nodes(x, batch: GraphBatch, method: str, gate=None):
    """Masked per-graph pooling.  Graph slots are global, so under node
    sharding each device pools its local nodes into the full (G, ...)
    table and one psum/pmax over the node axis completes it — the pooled
    output (and everything downstream: heads, loss) is then replicated."""
    gid, g = batch.node_graph_ids, batch.g_pad
    ax = node_axis(batch)
    m = batch.node_mask.astype(x.dtype)[:, None]
    if method == "sum":
        out = segment_sum(x * m, gid, g)
        return jax.lax.psum(out, ax) if ax else out
    if method == "mean":
        if ax is None:
            return segment_mean(x, gid, g, weights=batch.node_mask)
        tot = jax.lax.psum(segment_sum(x * m, gid, g), ax)
        cnt = jax.lax.psum(segment_sum(m, gid, g), ax)
        return tot / jnp.maximum(cnt, 1.0)
    if method == "max":
        xm = jnp.where(batch.node_mask[:, None], x, -jnp.inf)
        out = segment_max(xm, gid, g)
        if ax is not None:
            # pmax has no VJP; recover the gradient path by psumming the
            # (zero-valued) residual on the device(s) holding the max
            gmax = jax.lax.pmax(jax.lax.stop_gradient(out), ax)
            res = jnp.where(out == gmax, out - jax.lax.stop_gradient(out),
                            0.0)
            out = gmax + jax.lax.psum(res, ax)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    if method == "attention":
        scores = gate(x)[:, 0]
        if ax is None:
            att = segment_softmax(scores, gid, g, mask=batch.node_mask)
            return segment_sum(x * att[:, None] * m, gid, g)
        s = jnp.where(batch.node_mask, scores, -jnp.inf)
        # stabilizer only — softmax is shift-invariant, no grad needed
        smax = jax.lax.pmax(jax.lax.stop_gradient(segment_max(s, gid, g)),
                            ax)
        smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
        ex = jnp.where(batch.node_mask, jnp.exp(s - smax[gid]), 0.0)
        denom = jax.lax.psum(segment_sum(ex, gid, g), ax)
        num = jax.lax.psum(segment_sum(x * ex[:, None] * m, gid, g), ax)
        return num / jnp.maximum(denom, 1e-16)[:, None]
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
