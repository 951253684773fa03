"""Multi-host (DCN) input sharding for data-parallel training.

Design note — how the multi-host story maps onto TPU fabric
===========================================================

A TPU pod slice is a two-level network: chips within a host (and within
an ICI domain) talk over ICI (~100s of GB/s), hosts talk over DCN
(~10s of GB/s).  The reference's only parallelism is single-process
DataParallel (reference: train_ZINC.py:90-92); the TPU-native design
extends the data axis across hosts with the standard JAX multi-controller
recipe:

* every host runs the same program and owns `jax.local_device_count()`
  chips;
* the *input pipeline* is sharded over hosts on DCN: host p loads only
  `host_shard(graphs, p, P)` — a strided 1/P slice of the dataset — and
  collates batches for its local chips only.  No training bytes ever
  cross DCN; only gradient psums do, and XLA lowers a psum over the
  ("dcn", "data") mesh hierarchically (reduce over ICI inside each host
  first, then the small per-host partial over DCN);
* per-host local arrays are assembled into one *global* jax.Array with
  `jax.make_array_from_process_local_data`, whose sharding places each
  host's stack of per-chip batches on that host's devices — the array is
  logically global, physically local (zero cross-host transfer at
  assembly time);
* the mesh is built host-major (`dcn_mesh`): axis 0 ("dcn") indexes
  hosts, axis 1 ("data") indexes chips within a host, so collectives
  over ("data",) stay on ICI and only collectives naming "dcn" touch
  the slow fabric.  The existing data-parallel step (parallel/dp.py)
  runs unchanged over the flattened ("dcn", "data") axis pair.

Single-process testing: with one controller, `process_count == 1` makes
`host_shard` the identity and `make_array_from_process_local_data`
consumes the full global batch — but the mesh can still be shaped
(n_hosts, per_host) with `xla_force_host_platform_device_count`, so the
hierarchical specs, the assembly, and the two-level psum all compile and
run exactly as they would on a real multi-host slice.  That simulated
path is what tests/test_parallel.py exercises.
"""
from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.batch import GraphBatch
from .dp import mask_empty_batch, stack_batches

DCN_AXIS = "dcn"
ICI_AXIS = "data"


def host_shard(items: Sequence, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> List:
    """The strided 1/P slice of the dataset this host is responsible for
    loading.  Strided (not contiguous) so any label ordering in the
    underlying dataset spreads evenly across hosts; deterministic, and
    the union over hosts is exactly the dataset (last shards may be one
    item shorter)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items[pi::pc])


def dcn_mesh(n_hosts: Optional[int] = None,
             devices: Optional[Sequence] = None) -> Mesh:
    """Host-major two-axis mesh (DCN_AXIS, ICI_AXIS).

    On a real slice the device list is ordered host-by-host (sorted by
    (process_index, id)), so axis 0 strides across hosts and axis 1 stays
    inside one — collectives over ICI_AXIS never leave the host."""
    devices = list(jax.devices()) if devices is None else list(devices)
    devices.sort(key=lambda d: (d.process_index, d.id))
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    assert len(devices) % n_hosts == 0, \
        f"{len(devices)} devices do not divide over {n_hosts} hosts"
    grid = np.array(devices).reshape(n_hosts, len(devices) // n_hosts)
    return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def global_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading super-batch axis split over (dcn, data); everything inside
    one per-device batch replicated along no axis."""
    return NamedSharding(mesh, P((DCN_AXIS, ICI_AXIS)))


def make_global_super_batch(local_batches: List[GraphBatch],
                            mesh: Mesh) -> GraphBatch:
    """Assemble this host's per-chip batches into the *global* stacked
    GraphBatch.  `local_batches` must hold exactly
    `mesh.local_mesh.size` batches (one per local chip); the returned
    pytree's arrays are global jax.Arrays whose addressable shards are
    this host's data — no cross-host transfer happens here."""
    stacked = stack_batches(local_batches)

    def lift(a):
        spec = P(*(((DCN_AXIS, ICI_AXIS),) + (None,) * (a.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(a))

    return jax.tree.map(lift, stacked)


def lockstep_group_count(n_items_global: int, batch_size: int,
                         mesh: Mesh) -> int:
    """The number of global super-batches EVERY host must step through so
    the collective step loop stays in lockstep.  host_shard gives host 0
    the largest shard (ceil(n/P)); its group count is the max over hosts,
    so shorter hosts pad whole masked groups up to this value."""
    n_hosts = mesh.devices.shape[0]
    n_local = mesh.local_mesh.size
    largest_shard = -(-n_items_global // n_hosts)
    n_batches = -(-largest_shard // batch_size)
    return -(-n_batches // n_local)


def host_shard_loader(loader: Iterable[GraphBatch], mesh: Mesh,
                      n_groups: Optional[int] = None
                      ) -> Iterator[GraphBatch]:
    """Group this host's batch stream into global super-batches over the
    (dcn, data) mesh.  Each host iterates its own `host_shard`-split
    loader; a trailing partial group pads with masked-empty batches.

    Hosts whose shards are one item shorter (host_shard guarantees ±1)
    can see one FEWER group than host 0, which would desynchronize the
    collective step loop (the long host blocks in a psum the short host
    never joins).  Pass `n_groups = lockstep_group_count(...)` on real
    multi-host runs: this host then pads extra whole masked groups (zero
    contribution) until every host has yielded exactly `n_groups`."""
    n_local = mesh.local_mesh.size
    buf: List[GraphBatch] = []
    last: Optional[GraphBatch] = None
    yielded = 0

    def check(yielded):
        # must fire BEFORE the over-quota group is yielded: once the
        # consumer feeds group n_groups+1 into a collective step it
        # deadlocks in a psum the other hosts never join, and control
        # never returns here
        if n_groups is not None and yielded >= n_groups:
            raise ValueError(
                f"host produced more than lockstep n_groups={n_groups} "
                "groups; recompute lockstep_group_count from the global "
                "dataset size")

    for b in loader:
        last = b
        buf.append(b)
        if len(buf) == n_local:
            check(yielded)
            yield make_global_super_batch(buf, mesh)
            yielded += 1
            buf = []
    if buf:
        check(yielded)
        pad = mask_empty_batch(buf[-1])
        buf.extend([pad] * (n_local - len(buf)))
        yield make_global_super_batch(buf, mesh)
        yielded += 1
    if n_groups is not None:
        if yielded < n_groups and last is None:
            raise ValueError("empty host shard: cannot build masked "
                             "padding groups without a template batch")
        while yielded < n_groups:
            pad = mask_empty_batch(last)
            yield make_global_super_batch([pad] * n_local, mesh)
            yielded += 1


class MultiHostShardStream:
    """Re-iterable view for Trainer eval loops (mirrors dp.ShardStream)."""

    def __init__(self, loader, mesh: Mesh, n_groups: Optional[int] = None):
        self.loader, self.mesh, self.n_groups = loader, mesh, n_groups

    def __iter__(self):
        return host_shard_loader(self.loader, self.mesh, self.n_groups)
