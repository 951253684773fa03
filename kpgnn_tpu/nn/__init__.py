from .inits import torch_linear_kernel_init, torch_linear_bias_init, kaiming_uniform, normal_init
from .embed import PaddedEmbed
from .basic import TorchLinear, MLP
from .combine import AttentionCombine, GeometricCombine, make_combine
from .encoders import (
    FeatureSumEncoder,
    FeatureConcatEncoder,
    EmbeddingEncoder,
    LinearEncoder,
    QM9InputEncoder,
)
from .norms import MaskedBatchNorm, MaskedGraphLayerNorm, MaskedInstanceNorm, GraphSizeNorm, PairNorm, make_norm
from .layers import KPGINConv, KPGCNConv, KPGraphSAGEConv, KPGINPlusConv, GINEConv, make_gnn_layer

__all__ = [
    "torch_linear_kernel_init", "torch_linear_bias_init", "kaiming_uniform", "normal_init",
    "PaddedEmbed", "TorchLinear", "MLP",
    "AttentionCombine", "GeometricCombine", "make_combine",
    "FeatureSumEncoder", "FeatureConcatEncoder", "EmbeddingEncoder",
    "LinearEncoder", "QM9InputEncoder",
    "MaskedBatchNorm", "MaskedGraphLayerNorm", "MaskedInstanceNorm",
    "GraphSizeNorm", "PairNorm", "make_norm",
    "KPGINConv", "KPGCNConv", "KPGraphSAGEConv", "KPGINPlusConv", "GINEConv",
    "make_gnn_layer",
]
