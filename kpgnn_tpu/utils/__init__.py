from .logging import get_logger, get_save_dir
from .seed import get_seed, seed_everything

__all__ = ["get_logger", "get_save_dir", "get_seed", "seed_everything"]
