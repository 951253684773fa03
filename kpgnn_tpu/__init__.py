"""kpgnn_tpu — a TPU-native K-hop message-passing GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the KP-GNN
reference implementation ("How Powerful are K-hop Message Passing Graph
Neural Networks", NeurIPS 2022).  Not a port: graphs are batched into
statically-shaped padded containers, the k-hop aggregation runs either as a
sorted-COO segment-sum or as dense batched masked matmuls on the MXU, and
all training steps are pure jitted functions that shard over a
`jax.sharding.Mesh`.

Sub-packages
------------
graph     padded GraphBatch pytree + bucketing/collation
prep      offline k-hop neighborhood extraction (SPD / GD kernels)
ops       TPU compute primitives (segment ops, dense k-hop matmul, Pallas)
nn        flax.linen layers: KP convolutions, combines, encoders, norms
models    GNN / GNNPlus / GNNPrime backbones and task heads
train     typed config, optimizer, schedules, loops, k-fold, checkpointing
data      dataset builders and graph generators
parallel  device-mesh setup, data-parallel and edge-partitioned sharding
utils     logging, seeding, misc
"""

__version__ = "0.1.0"

from .graph import Graph, GraphBatch, collate, collate_dense  # noqa: E402
from .models import ModelConfig, make_model                   # noqa: E402
from .prep import KHopConfig, extract_khop                    # noqa: E402
from .train import GraphLoader, TrainConfig, Trainer          # noqa: E402
