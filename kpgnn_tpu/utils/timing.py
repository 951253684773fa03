"""Chained-one-jit throughput timing — the ONE methodology every
published kernel number uses (bench.py, tune_pallas, tune_banded).

Two traps it avoids on a tunnel-attached chip (CLAUDE.md):
  * TRAP 2: a standalone jitted call pays a ~250 us host-dispatch floor
    that swamps a ~200 us kernel — so `chain` dependent applications run
    inside ONE jit and the rate divides by the chain length;
  * TRAP 3: repeated dispatches with identical inputs get result-cached
    by the remote executor (round 3 published a 1.8x-inflated kernel
    number this way) — dependent chaining feeds each application the
    previous output, so nothing can be cached away.
"""
from __future__ import annotations

import time

import jax


def chained_throughput(chained_fn, x0, units: int, iters: int,
                       chain: int) -> float:
    """units/s of ONE application of the op inside `chained_fn` (which
    must apply it `chain` dependent times); best of 3 timing reps."""
    f = jax.jit(chained_fn)
    out = f(x0)
    jax.block_until_ready(out)
    best = 0.0
    reps = max(iters // chain, 1)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(x0)
        jax.block_until_ready(out)
        best = max(best, reps * chain * units / (time.perf_counter() - t0))
    return best
