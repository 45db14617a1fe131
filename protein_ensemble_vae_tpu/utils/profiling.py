"""Profiling & timing harnesses (SURVEY §5.1 — absent in the reference).

- ``trace(logdir)``: context manager around ``jax.profiler`` producing
  Perfetto/TensorBoard traces of jitted steps.
- ``time_fn``: block-until-ready wall-clock timing with warmup, the standard
  JAX microbenchmark recipe.
- ``step_timer``: lightweight per-step host timer for the training loop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a profiler trace; view with TensorBoard or Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 10,
            **kwargs) -> dict:
    """Time ``fn(*args)`` with proper device synchronization."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters": iters, "per_sec": 1.0 / dt}


class step_timer:
    """Rolling per-step timer: ``with step_timer() as t: ...; t.ms``."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self._t0) * 1000.0
        return False


def enable_debug_mode(nans: bool = True) -> None:
    """Numeric-sanitizer mode (SURVEY §5.2): raise on NaN inside jitted code.

    The reference's equivalent is per-batch isfinite guards
    (training.py:136-146); this catches the producing op instead.
    """
    if nans:
        jax.config.update("jax_debug_nans", True)
