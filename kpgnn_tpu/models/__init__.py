from .backbones import GNN, GNNPlus, GNNPrime
from .heads import (
    GraphClassification,
    GraphRegression,
    NodeClassification,
    NodeRegression,
)
from .factory import make_model, ModelConfig

__all__ = [
    "GNN", "GNNPlus", "GNNPrime",
    "GraphClassification", "GraphRegression",
    "NodeClassification", "NodeRegression",
    "make_model", "ModelConfig",
]
