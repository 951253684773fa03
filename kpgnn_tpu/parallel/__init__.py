from .mesh import make_mesh
from .dp import stack_batches, make_parallel_train_step, shard_loader

__all__ = ["make_mesh", "stack_batches", "make_parallel_train_step",
           "shard_loader"]
