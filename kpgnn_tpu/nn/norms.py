"""Masked graph normalizations.

The subtlest parity issue in a padded-batch design (SURVEY.md §7.4): the
reference's norms see exactly the real nodes, so every statistic here is
computed under `node_mask` / per-graph segment sums, never over padding.

Implemented set mirrors the reference's norm switch
(reference: models/GNNs.py:103-114): Batch, Layer (PyG graph mode),
Instance, GraphSize, Pair.

Every norm takes an optional `axis_name`: when the node axis is sharded
over a device mesh (ops/sharded_adjacency.py), the masked sums /
per-graph segment sums are local partials and a psum over that axis
completes them — statistics stay exactly equal to the single-device
ones (graph slots are global, so per-graph partial tables just add).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.segment import segment_sum as _seg_sum
from flax import linen as nn


def _preduce(v, axis_name: Optional[str]):
    """Complete a local partial sum across the node-sharding axis."""
    return jax.lax.psum(v, axis_name) if axis_name else v


def _masked_moments(x, mask, axis):
    """mean/var over `axis` counting only mask==True rows."""
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    cnt = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    mean = jnp.sum(x * m, axis=axis) / cnt
    var = jnp.sum((x - mean) ** 2 * m, axis=axis) / cnt
    return mean, var


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the node axis with running stats, excluding padded
    rows from the statistics (torch defaults: eps 1e-5, momentum 0.1,
    affine, biased batch var for normalization / unbiased for the running
    estimate)."""

    momentum: float = 0.1
    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 use_running_average: bool = True,
                 axis_name: Optional[str] = None):
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,)))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                mask = jnp.ones(x.shape[:-1], dtype=bool)
            m = mask.astype(x.dtype)
            flat_x = x.reshape(-1, features)
            flat_m = m.reshape(-1)
            cnt = jnp.maximum(
                _preduce(flat_m.sum(), axis_name), 1.0)
            mean = _preduce((flat_x * flat_m[:, None]).sum(0),
                            axis_name) / cnt
            var = _preduce((((flat_x - mean) ** 2) * flat_m[:, None]).sum(0),
                           axis_name) / cnt
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (features,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (features,))
        return y.astype(in_dtype)


class MaskedGraphLayerNorm(nn.Module):
    """PyG LayerNorm(mode="graph"): per graph, normalize over all of its
    nodes and channels jointly, then elementwise affine."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, graph_ids, num_graphs: int,
                 mask: Optional[jnp.ndarray] = None,
                 axis_name: Optional[str] = None):
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        features = x.shape[-1]
        if mask is None:
            mask = jnp.ones(x.shape[:-1], dtype=bool)
        m = mask.astype(x.dtype)[:, None]
        cnt = _preduce(_seg_sum(
            jnp.full(x.shape[:1], float(features)) * m[:, 0],
            graph_ids, num_graphs), axis_name)
        cnt = jnp.maximum(cnt, 1.0)
        s = _preduce(_seg_sum(
            (x * m).sum(-1), graph_ids, num_graphs), axis_name)
        mean = (s / cnt)[graph_ids][:, None]
        xc = (x - mean) * m
        sq = _preduce(_seg_sum((xc ** 2).sum(-1), graph_ids, num_graphs), axis_name)
        var = (sq / cnt)[graph_ids][:, None]
        y = xc * jax.lax.rsqrt(var + self.eps)
        y = y * self.param("scale", nn.initializers.ones, (features,))
        y = y + self.param("bias", nn.initializers.zeros, (features,))
        return y.astype(in_dtype)


class MaskedInstanceNorm(nn.Module):
    """PyG InstanceNorm: per graph, per channel (no affine by default)."""

    eps: float = 1e-5
    affine: bool = False

    @nn.compact
    def __call__(self, x, graph_ids, num_graphs: int,
                 mask: Optional[jnp.ndarray] = None,
                 axis_name: Optional[str] = None):
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        features = x.shape[-1]
        if mask is None:
            mask = jnp.ones(x.shape[:-1], dtype=bool)
        m = mask.astype(x.dtype)[:, None]
        cnt = _preduce(_seg_sum(m, graph_ids, num_graphs), axis_name)
        cnt = jnp.maximum(cnt, 1.0)
        mean = _preduce(_seg_sum(x * m, graph_ids, num_graphs), axis_name) / cnt
        xc = (x - mean[graph_ids]) * m
        var = _preduce(_seg_sum(xc ** 2, graph_ids, num_graphs), axis_name) / cnt
        y = xc * jax.lax.rsqrt(var[graph_ids] + self.eps)
        if self.affine:
            y = y * self.param("scale", nn.initializers.ones, (features,))
            y = y + self.param("bias", nn.initializers.zeros, (features,))
        return y.astype(in_dtype)


class GraphSizeNorm(nn.Module):
    """x_i / sqrt(|G(i)|)."""

    @nn.compact
    def __call__(self, x, graph_ids, num_graphs: int,
                 mask: Optional[jnp.ndarray] = None,
                 axis_name: Optional[str] = None):
        if mask is None:
            mask = jnp.ones(x.shape[:-1], dtype=bool)
        cnt = _preduce(_seg_sum(mask.astype(x.dtype), graph_ids, num_graphs), axis_name)
        inv = jax.lax.rsqrt(jnp.maximum(cnt, 1.0))
        return x * inv[graph_ids][:, None]


class PairNorm(nn.Module):
    """PairNorm (scale mode PN): center over the batch, rescale rows to the
    average row norm."""

    scale: float = 1.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 axis_name: Optional[str] = None):
        if mask is None:
            mask = jnp.ones(x.shape[:-1], dtype=bool)
        m = mask.astype(x.dtype)[:, None]
        cnt = jnp.maximum(_preduce(m.sum(), axis_name), 1.0)
        mean = _preduce((x * m).sum(0), axis_name) / cnt
        xc = (x - mean) * m
        mean_sq = _preduce((xc ** 2).sum(), axis_name) / cnt
        return self.scale * xc * jax.lax.rsqrt(mean_sq + self.eps)


def make_norm(norm_type: str):
    """Factory keyed exactly like the reference's switch
    (reference: models/GNNs.py:103-114)."""
    table = {
        "Batch": MaskedBatchNorm,
        "Layer": MaskedGraphLayerNorm,
        "Instance": MaskedInstanceNorm,
        "GraphSize": GraphSizeNorm,
        "Pair": PairNorm,
    }
    if norm_type not in table:
        raise ValueError(f"Not supported norm method {norm_type!r}")
    return table[norm_type]
