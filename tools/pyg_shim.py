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

    def to(self, device, **_):
        for k, v in self.__dict__.items():
            if torch.is_tensor(v):
                self.__dict__[k] = v.to(device)
        return self


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
    """Minimal map-style loader: yields Batch.from_data_list chunks.

    `shuffle=True` draws a fresh torch.randperm each epoch from the
    global torch RNG — the same RNG `seed_everything` seeds, matching
    the reference scripts' sampling protocol."""

    def __init__(self, dataset, batch_size=1, shuffle=False, **_):
        self.dataset, self.batch_size = list(dataset), batch_size
        self.shuffle = shuffle

    def __iter__(self):
        ds = self.dataset
        if self.shuffle:
            ds = [ds[i] for i in torch.randperm(len(ds)).tolist()]
        for i in range(0, len(ds), self.batch_size):
            yield Batch.from_data_list(ds[i:i + self.batch_size])

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size


# ----------------------------------------------------------- dataset --
class _Subset:
    """Index-view over an InMemoryDataset (what `dataset[mask]` returns).

    Supports the reference scripts' usage: len(), iteration, int
    indexing, and nested boolean/long-tensor subsetting
    (train_EXP.py:276-281 masks a subset of a subset)."""

    def __init__(self, dataset, indices):
        self.dataset, self.indices = dataset, list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        if isinstance(idx, int):
            return self.dataset[self.indices[idx]]
        sub = _resolve_indices(idx, len(self))
        return _Subset(self.dataset, [self.indices[i] for i in sub])

    def __iter__(self):
        for i in self.indices:
            yield self.dataset[i]


def _resolve_indices(idx, n):
    """bool mask / long tensor / list / slice -> python index list."""
    if isinstance(idx, slice):
        return list(range(n))[idx]
    if torch.is_tensor(idx):
        if idx.dtype == torch.bool:
            return idx.nonzero(as_tuple=False).view(-1).tolist()
        return idx.view(-1).tolist()
    return list(idx)


class InMemoryDataset:
    """torch_geometric.data.InMemoryDataset subset: process-once cache,
    collate/separate, indexing.  Storage format is shim-private (both
    the producer `self.collate` and the consumer `self.get` live here):
    per-key concatenated tensors + boundary slices, edge_index along
    dim 1 WITHOUT node offsets (so `get` is a pure slice)."""

    def __init__(self, root, transform=None, pre_transform=None,
                 pre_filter=None):
        import os

        self.root, self.transform = root, transform
        self.pre_transform, self.pre_filter = pre_transform, pre_filter
        self.data = self.slices = None
        os.makedirs(self.raw_dir, exist_ok=True)
        os.makedirs(self.processed_dir, exist_ok=True)
        # PyG contract: download only when raw files are missing (e.g.
        # the reference ZINC's download() rmtree's raw_dir and hits the
        # network — it must not fire when raw pickles are pre-placed)
        if not all(os.path.exists(p) for p in self.raw_paths):
            self.download()
        if not all(os.path.exists(p) for p in self.processed_paths):
            self.process()

    @property
    def raw_dir(self):
        import os
        return os.path.join(self.root, "raw")

    @property
    def processed_dir(self):
        import os
        return os.path.join(self.root, "processed")

    @property
    def raw_paths(self):
        import os
        names = self.raw_file_names
        if isinstance(names, str):
            names = [names]
        return [os.path.join(self.raw_dir, n) for n in names]

    @property
    def processed_paths(self):
        import os
        names = self.processed_file_names
        if isinstance(names, str):
            names = [names]
        return [os.path.join(self.processed_dir, n) for n in names]

    def download(self):
        pass

    def collate(self, data_list):
        data, slices = Data(), {}
        keys = [k for k in data_list[0].keys if k != "__num_nodes__"]
        for k in keys:
            vals = [d.__dict__[k] if torch.is_tensor(d.__dict__[k])
                    else torch.tensor(d.__dict__[k]) for d in data_list]
            if vals[0].dim() == 0:
                vals = [v.unsqueeze(0) for v in vals]
            dim = 1 if k == "edge_index" else 0
            data.__dict__[k] = torch.cat(vals, dim=dim)
            bounds = torch.zeros(len(vals) + 1, dtype=torch.long)
            torch.cumsum(torch.tensor([v.shape[dim] for v in vals]),
                         0, out=bounds[1:])
            slices[k] = bounds
        slices["__num_nodes__"] = torch.tensor(
            [d.num_nodes for d in data_list])
        return data, slices

    def get(self, idx):
        out = Data()
        for k, bounds in self.slices.items():
            if k == "__num_nodes__":
                out.num_nodes = int(bounds[idx])
                continue
            lo, hi = int(bounds[idx]), int(bounds[idx + 1])
            v = self.data.__dict__[k]
            out.__dict__[k] = v[:, lo:hi] if k == "edge_index" else v[lo:hi]
        return out

    def __len__(self):
        return int(self.slices["__num_nodes__"].shape[0])

    def __getitem__(self, idx):
        if isinstance(idx, int):
            d = self.get(idx)
            return d if self.transform is None else self.transform(d)
        return _Subset(self, _resolve_indices(idx, len(self)))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    @property
    def num_classes(self):
        return int(self.data.y.max()) + 1


class Compose:
    """torch_geometric.transforms.Compose."""

    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
        return data


def seed_everything(seed):
    """torch_geometric.seed.seed_everything."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    torch.manual_seed(seed)


class DataParallel(nn.Module):
    """Import-surface stub: reference scripts import it unconditionally
    but only construct it when --parallel with >1 GPU (never here)."""

    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError("pyg_shim is single-process CPU only")


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
    data_m.InMemoryDataset = InMemoryDataset

    def download_url(url, folder, **_):      # import surface only; no
        raise NotImplementedError(           # egress in this container
            "pyg_shim has no network access; pre-place raw files")

    def extract_zip(path, folder, **_):
        raise NotImplementedError("pyg_shim does not unpack archives")

    data_m.download_url = download_url
    data_m.extract_zip = extract_zip
    # old-PyG pickles (EXP's GRAPHSAT.pkl) reference
    # `torch_geometric.data.data Data`
    data_data_m = types.ModuleType("torch_geometric.data.data")
    data_data_m.Data = Data
    data_m.data = data_data_m
    loader_m = types.ModuleType("torch_geometric.loader")
    loader_m.DataLoader = DataLoader
    loader_m.DataListLoader = DataLoader
    nn_m = types.ModuleType("torch_geometric.nn")
    for name in ("MessagePassing", "BatchNorm", "LayerNorm",
                 "InstanceNorm", "PairNorm", "GraphSizeNorm",
                 "global_add_pool", "global_mean_pool", "global_max_pool",
                 "AttentionalAggregation", "DataParallel"):
        setattr(nn_m, name, globals()[name])
    utils_m = types.ModuleType("torch_geometric.utils")
    utils_m.add_self_loops = add_self_loops
    utils_m.to_scipy_sparse_matrix = to_scipy_sparse_matrix
    transforms_m = types.ModuleType("torch_geometric.transforms")
    transforms_m.Compose = Compose
    seed_m = types.ModuleType("torch_geometric.seed")
    seed_m.seed_everything = seed_everything
    pkg.data, pkg.loader, pkg.nn, pkg.utils = (data_m, loader_m, nn_m,
                                               utils_m)
    pkg.transforms, pkg.seed = transforms_m, seed_m
    pkg.seed_everything = seed_everything
    pkg.__shim__ = True
    for name, mod in (("torch_geometric", pkg),
                      ("torch_geometric.data", data_m),
                      ("torch_geometric.data.data", data_data_m),
                      ("torch_geometric.loader", loader_m),
                      ("torch_geometric.nn", nn_m),
                      ("torch_geometric.utils", utils_m),
                      ("torch_geometric.transforms", transforms_m),
                      ("torch_geometric.seed", seed_m)):
        sys.modules[name] = mod
    # torch>=2.6 defaults torch.load(weights_only=True); the reference
    # datasets torch.load their own torch.save'd (Data, slices) caches,
    # so the shim Data must be an allowed global
    try:
        torch.serialization.add_safe_globals([Data])
    except AttributeError:
        pass
    return pkg
