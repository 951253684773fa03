"""Minimal torch_geometric stand-in for running the reference KP-GNN
(JiaruiFeng/KP-GNN) forward pass in environments without PyG.

The activation-parity north star (BASELINE.md) needs the REFERENCE model
executed on the same graph with the same parameters as the TPU rebuild.
The reference imports torch_geometric, which this container does not
ship — but the subset it actually uses is small and well-specified:

  * `data.Data` / `data.Batch`  — attribute containers
  * `loader.DataLoader`         — concat-and-offset collation
  * `nn.MessagePassing`         — gather(x_j) -> message -> scatter
  * `nn.BatchNorm` (+ the other norms), the global pools,
    `AttentionalAggregation`
  * `utils.add_self_loops`, `utils.to_scipy_sparse_matrix`

This module implements exactly that subset FROM THE DOCUMENTED API
CONTRACT (no PyG code involved) and registers itself as
`torch_geometric` via `install()`.  tools/parity_reference_side.py falls
back to it automatically, which makes the two-sided parity check
runnable end-to-end inside the TPU container:

    python tools/parity_reference_side.py --reference /root/reference \
        --golden kpgnn_tpu/data/parity_golden/<name>.npz

Scope: single-process CPU inference on small graphs (the parity
fixtures).  Not a general PyG replacement.
"""
from __future__ import annotations

import inspect
import sys
import types

import torch
import torch.nn as nn


# --------------------------------------------------------------- data --
class Data:
    """Attribute bag for one graph (torch_geometric.data.Data subset)."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)

    @property
    def keys(self):
        return [k for k, v in self.__dict__.items() if v is not None]

    def __contains__(self, key):
        return key in self.__dict__ and self.__dict__[key] is not None

    @property
    def num_nodes(self):
        if "__num_nodes__" in self.__dict__:
            return self.__dict__["__num_nodes__"]
        if getattr(self, "x", None) is not None:
            return self.x.shape[0]
        return int(self.edge_index.max()) + 1

    @num_nodes.setter
    def num_nodes(self, v):
        self.__dict__["__num_nodes__"] = v


class Batch(Data):
    """Concatenated graphs with a `batch` graph-id vector."""

    @classmethod
    def from_data_list(cls, data_list):
        out = cls()
        n_off = 0
        fields = {}
        batch_vec = []
        for i, d in enumerate(data_list):
            n = d.num_nodes
            batch_vec.append(torch.full((n,), i, dtype=torch.long))
            for k, v in d.__dict__.items():
                if k == "__num_nodes__" or v is None:
                    continue
                if k == "edge_index":
                    v = v + n_off
                fields.setdefault(k, []).append(
                    v if torch.is_tensor(v) else torch.tensor(v))
            n_off += n
        for k, vs in fields.items():
            dim = 1 if k == "edge_index" else 0
            out.__dict__[k] = (torch.cat(vs, dim=dim) if vs[0].dim()
                               else torch.stack(vs))
        out.batch = torch.cat(batch_vec)
        out.num_nodes = n_off
        out.num_graphs = len(data_list)
        return out


class DataLoader:
    """Minimal map-style loader: yields Batch.from_data_list chunks."""

    def __init__(self, dataset, batch_size=1, shuffle=False, **_):
        assert not shuffle, "shim DataLoader is deterministic-only"
        self.dataset, self.batch_size = list(dataset), batch_size

    def __iter__(self):
        for i in range(0, len(self.dataset), self.batch_size):
            yield Batch.from_data_list(self.dataset[i:i + self.batch_size])

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size


# ----------------------------------------------------------- scatter --
def _scatter(src, index, dim_size, reduce="add"):
    """scatter src (E, ...) into (dim_size, ...) rows by index (E,)."""
    shape = (dim_size,) + src.shape[1:]
    out = torch.zeros(shape, dtype=src.dtype)
    idx = index.reshape((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    out.scatter_add_(0, idx, src)
    if reduce == "mean":
        cnt = torch.zeros(dim_size, dtype=src.dtype)
        cnt.scatter_add_(0, index, torch.ones_like(index, dtype=src.dtype))
        out = out / cnt.clamp(min=1).reshape(
            (-1,) + (1,) * (src.dim() - 1))
    elif reduce == "max":
        out = torch.full(shape, float("-inf"), dtype=src.dtype)
        out.scatter_reduce_(0, idx, src, reduce="amax", include_self=True)
        out = torch.where(torch.isinf(out), torch.zeros_like(out), out)
    return out


# ---------------------------------------------------------------- nn --
class MessagePassing(nn.Module):
    """gather -> message -> scatter over edge_index, flow source->target
    (the only flow the reference uses).  Per-edge kwargs pass through;
    node tensors named `<x>_j` / `<x>_i` gather rows by sender/receiver.
    Aggregation honors `self.aggr` ("add" default; KPGraphSAGE sets
    "mean" after construction, reference: layers/KPGraphSAGE.py:28)."""

    def __init__(self, aggr="add", node_dim=0, flow="source_to_target"):
        super().__init__()
        assert node_dim == 0 and flow == "source_to_target"
        self.aggr = aggr
        self.node_dim = node_dim

    def message(self, x_j):                      # default: identity
        return x_j

    def update(self, aggr_out):                  # default: identity
        return aggr_out

    def propagate(self, edge_index, size=None, **kwargs):
        src, dst = edge_index[0], edge_index[1]
        n = None
        sig = inspect.signature(self.message)
        msg_kwargs = {}
        for name in sig.parameters:
            if name.endswith("_j") or name.endswith("_i"):
                base = kwargs[name[:-2]]
                n = base.shape[0]
                msg_kwargs[name] = base[src if name.endswith("_j") else dst]
            else:
                msg_kwargs[name] = kwargs[name]
        if n is None:
            n = size if size is not None else int(edge_index.max()) + 1
        out = self.message(**msg_kwargs)
        agg = _scatter(out, dst, n, reduce=self.aggr)
        return self.update(agg)


class BatchNorm(nn.Module):
    """PyG BatchNorm: a named `.module` BatchNorm1d wrapper."""

    def __init__(self, in_channels, **kw):
        super().__init__()
        self.module = nn.BatchNorm1d(in_channels, **kw)

    def reset_parameters(self):
        self.module.reset_parameters()

    def forward(self, x):
        return self.module(x)


class LayerNorm(nn.Module):
    def __init__(self, in_channels, **kw):
        super().__init__()
        self.module = nn.LayerNorm(in_channels, **kw)

    def reset_parameters(self):
        self.module.reset_parameters()

    def forward(self, x):
        return self.module(x)


class InstanceNorm(nn.Module):
    def __init__(self, in_channels, **kw):
        super().__init__()
        self.module = nn.InstanceNorm1d(in_channels, **kw)

    def reset_parameters(self):
        self.module.reset_parameters()

    def forward(self, x):
        return self.module(x.t().unsqueeze(0)).squeeze(0).t()


class PairNorm(nn.Module):
    def __init__(self, scale=1.0, **_):
        super().__init__()
        self.scale = scale

    def reset_parameters(self):
        pass

    def forward(self, x):
        x = x - x.mean(dim=0, keepdim=True)
        return self.scale * x / (1e-6 + x.pow(2).sum(-1).mean()).sqrt()


class GraphSizeNorm(nn.Module):
    def reset_parameters(self):
        pass

    def forward(self, x, batch=None):
        if batch is None:
            batch = torch.zeros(x.shape[0], dtype=torch.long)
        cnt = _scatter(torch.ones(x.shape[0]), batch,
                       int(batch.max()) + 1)
        return x * cnt.clamp(min=1).pow(-0.5)[batch].unsqueeze(-1)


def global_add_pool(x, batch, size=None):
    size = size if size is not None else int(batch.max()) + 1
    return _scatter(x, batch, size, reduce="add")


def global_mean_pool(x, batch, size=None):
    size = size if size is not None else int(batch.max()) + 1
    return _scatter(x, batch, size, reduce="mean")


def global_max_pool(x, batch, size=None):
    size = size if size is not None else int(batch.max()) + 1
    return _scatter(x, batch, size, reduce="max")


class AttentionalAggregation(nn.Module):
    """softmax(gate_nn(x)) per graph, weighted sum
    (reference use: models/GraphClassification.py:32)."""

    def __init__(self, gate_nn, nn=None):
        super().__init__()
        self.gate_nn, self.nn = gate_nn, nn

    def reset_parameters(self):
        self.gate_nn.reset_parameters()
        if self.nn is not None:
            self.nn.reset_parameters()

    def forward(self, x, batch, size=None):
        size = size if size is not None else int(batch.max()) + 1
        gate = self.gate_nn(x)
        m = _scatter(gate, batch, size, reduce="max")[batch]
        w = (gate - m).exp()
        den = _scatter(w, batch, size)[batch]
        w = w / den.clamp(min=1e-16)
        h = x if self.nn is None else self.nn(x)
        return _scatter(w * h, batch, size)


# ------------------------------------------------------------- utils --
def add_self_loops(edge_index, edge_attr=None, num_nodes=None):
    n = num_nodes if num_nodes is not None else int(edge_index.max()) + 1
    loops = torch.arange(n, dtype=edge_index.dtype).unsqueeze(0).repeat(2, 1)
    return torch.cat([edge_index, loops], dim=1), edge_attr


def to_scipy_sparse_matrix(edge_index, edge_attr=None, num_nodes=None):
    import numpy as np
    import scipy.sparse as ssp

    n = num_nodes if num_nodes is not None else int(edge_index.max()) + 1
    row = edge_index[0].numpy()
    col = edge_index[1].numpy()
    val = (edge_attr.numpy() if edge_attr is not None
           else np.ones(row.shape[0]))
    return ssp.coo_matrix((val, (row, col)), shape=(n, n))


def install():
    """Register this shim as `torch_geometric` (no-op if PyG exists)."""
    if "torch_geometric" in sys.modules:
        return sys.modules["torch_geometric"]
    pkg = types.ModuleType("torch_geometric")
    data_m = types.ModuleType("torch_geometric.data")
    data_m.Data, data_m.Batch, data_m.DataLoader = Data, Batch, DataLoader
    loader_m = types.ModuleType("torch_geometric.loader")
    loader_m.DataLoader = DataLoader
    nn_m = types.ModuleType("torch_geometric.nn")
    for name in ("MessagePassing", "BatchNorm", "LayerNorm",
                 "InstanceNorm", "PairNorm", "GraphSizeNorm",
                 "global_add_pool", "global_mean_pool", "global_max_pool",
                 "AttentionalAggregation"):
        setattr(nn_m, name, globals()[name])
    utils_m = types.ModuleType("torch_geometric.utils")
    utils_m.add_self_loops = add_self_loops
    utils_m.to_scipy_sparse_matrix = to_scipy_sparse_matrix
    pkg.data, pkg.loader, pkg.nn, pkg.utils = (data_m, loader_m, nn_m,
                                               utils_m)
    pkg.__shim__ = True
    for name, mod in (("torch_geometric", pkg),
                      ("torch_geometric.data", data_m),
                      ("torch_geometric.loader", loader_m),
                      ("torch_geometric.nn", nn_m),
                      ("torch_geometric.utils", utils_m)):
        sys.modules[name] = mod
    return pkg
