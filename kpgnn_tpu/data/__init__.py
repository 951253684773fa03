from .synthetic import synthetic_molecules, synthetic_khop_graphs
from .generation import GraphType, generate_graph, adjacency_to_edge_index
from .property import generate_property_dataset
from .counting import generate_counting_dataset, TASKS as COUNTING_TASKS
from .expressiveness import (
    load_exp_pickle, load_exp_txt, load_sr25, generate_csl, CSL_SKIPS,
)
from .tu import load_tu_standard, load_tu_gin_split, num_tag_classes
from .molecules import (load_zinc, load_qm9, load_qm9_raw,
                        QM9_CONVERSION)
from .ogb import load_ogb_graphpred

__all__ = [
    "synthetic_molecules", "synthetic_khop_graphs",
    "GraphType", "generate_graph", "adjacency_to_edge_index",
    "generate_property_dataset", "generate_counting_dataset", "COUNTING_TASKS",
    "load_exp_pickle", "load_exp_txt", "load_sr25", "generate_csl", "CSL_SKIPS",
    "load_tu_standard", "load_tu_gin_split", "num_tag_classes",
    "load_zinc", "load_qm9", "load_qm9_raw", "QM9_CONVERSION", "load_ogb_graphpred",
]
