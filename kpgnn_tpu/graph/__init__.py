from .data import Graph
from .batch import GraphBatch, collate, pad_sizes, BucketSpec

__all__ = ["Graph", "GraphBatch", "collate", "pad_sizes", "BucketSpec"]
