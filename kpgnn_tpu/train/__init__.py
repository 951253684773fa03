from .config import TrainConfig
from .state import TrainState, create_train_state
from .loop import (
    make_train_step,
    make_eval_step,
    train_epoch,
    evaluate,
    Trainer,
)
from .lr import ReduceLROnPlateau, StepDecay
from .resident import (
    DenseStore,
    BandedStore,
    build_dense_store,
    build_banded_store,
    gather_batch,
    gather_banded_batch,
    plan_banded_store_shapes,
    epoch_index_chunks,
    parallel_epoch_index_chunks,
    make_resident_train_epoch,
    make_resident_eval,
    make_parallel_resident_train_epoch,
    make_parallel_resident_eval,
)
from .loader import GraphLoader
from .kfold import k_fold, k_fold_unstratified
from .checkpoint import CheckpointSaver, save_checkpoint, load_checkpoint
from .ema import EMA

__all__ = [
    "TrainConfig", "TrainState", "create_train_state",
    "make_train_step", "make_eval_step", "train_epoch", "evaluate", "Trainer",
    "ReduceLROnPlateau", "StepDecay", "GraphLoader",
    "DenseStore", "build_dense_store", "gather_batch",
    "BandedStore", "build_banded_store", "gather_banded_batch",
    "plan_banded_store_shapes",
    "epoch_index_chunks", "make_resident_train_epoch", "make_resident_eval",
    "parallel_epoch_index_chunks", "make_parallel_resident_train_epoch",
    "make_parallel_resident_eval",
    "k_fold", "k_fold_unstratified",
    "CheckpointSaver", "save_checkpoint", "load_checkpoint", "EMA",
]
