from .mesh import make_mesh
from .dp import stack_batches, make_parallel_train_step, shard_loader
from .edge_partition import partition_edges, make_edge_parallel_aggregate

__all__ = ["make_mesh", "stack_batches", "make_parallel_train_step",
           "shard_loader", "partition_edges",
           "make_edge_parallel_aggregate"]
