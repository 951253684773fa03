from .segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    khop_aggregate,
    multi_hop_degree,
)
from .lstm import BiLSTM

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "khop_aggregate",
    "multi_hop_degree",
    "BiLSTM",
]
