from .logging import get_logger, get_save_dir
from .seed import get_seed, seed_everything
from .meters import AverageMeter
from .profiling import trace, timed
from .parity import capture_activations, dump_activations


def get_available_devices():
    """Device discovery (reference: train_utils.py:224-239)."""
    import jax
    return jax.devices()


__all__ = ["get_logger", "get_save_dir", "get_seed", "seed_everything",
           "AverageMeter", "get_available_devices", "trace", "timed", "capture_activations", "dump_activations"]
