from .data import Graph
from .batch import GraphBatch, collate, collate_banded, collate_dense, collate_pallas, pad_sizes, BucketSpec

__all__ = ["Graph", "GraphBatch", "collate", "collate_banded", "collate_dense", "collate_pallas", "pad_sizes", "BucketSpec"]
