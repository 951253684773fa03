"""Profiling helpers (the reference has none — SURVEY.md §5).

`trace(dir)` wraps a block in a jax profiler trace viewable in
TensorBoard/Perfetto; `timed` is a minimal wall-clock context.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {time.perf_counter() - t0:.4f}s")
