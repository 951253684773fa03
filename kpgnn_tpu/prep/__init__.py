from .khop import (
    KHopConfig,
    extract_khop,
    adjacency_powers,
    bfs_apsp,
    resistance_distance,
    apply_ablation_clamps,
)
from .runner import preprocess_graphs

__all__ = [
    "KHopConfig",
    "extract_khop",
    "adjacency_powers",
    "bfs_apsp",
    "resistance_distance",
    "apply_ablation_clamps",
    "preprocess_graphs",
]
