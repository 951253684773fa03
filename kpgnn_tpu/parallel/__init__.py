from .mesh import make_mesh
from .dp import stack_batches, make_parallel_train_step, shard_loader
from .partition import (batch_pspecs, make_sharded_eval_step,
                        make_sharded_train_step, partition_adj,
                        partition_batch, partition_loader)

__all__ = ["make_mesh", "stack_batches", "make_parallel_train_step",
           "shard_loader", "partition_adj", "partition_batch",
           "partition_loader", "batch_pspecs", "make_sharded_train_step",
           "make_sharded_eval_step"]
