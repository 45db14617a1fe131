"""Profiling & timing harnesses (SURVEY §5.1 — absent in the reference).

- ``trace(logdir)``: context manager around ``jax.profiler`` producing
  Perfetto/TensorBoard traces of jitted steps.
- ``time_fn``: block-until-ready wall-clock timing with warmup, the standard
  JAX microbenchmark recipe. **Caveat: on tunneled/remote devices whose
  async completion events are unreliable (this repo's axon TPU tunnel,
  CLAUDE.md), block_until_ready can return before the device finishes and
  over-report throughput by large factors — use ``scan_step_time`` there.**
- ``scan_step_time``: tunnel-proof per-step timing — N chained steps inside
  one jitted computation, walltime of a synchronous scalar fetch differenced
  between two N values (the host<->device round-trip cancels).
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


def scan_step_time(make_run: Callable[[int], Callable[[], object]],
                   n1: int = 4, n2: int = 20, repeats: int = 3,
                   return_detail: bool = False):
    """Seconds per step, measured so a lying async-completion path cannot
    distort it.

    ``make_run(n)`` must return a 0-arg callable that executes n chained
    steps on the device and returns a scalar that DEPENDS on all n steps
    (e.g. the final loss of a ``lax.scan``-ed train step). Each timed call
    fetches the scalar synchronously (``float(...)``), which the device can
    only satisfy after really computing it; per-step time is the walltime
    difference between the two scan lengths, so the fetch round-trip and
    dispatch overhead cancel. Returns the min over ``repeats``.

    With ``return_detail=True`` returns ``(best, detail)`` where detail
    records every repeat's raw walltimes — benchmarks must persist these so
    an outlier headline (a single anomalous min) is diagnosable post-hoc
    instead of becoming an unexplainable record.
    """
    run1, run2 = make_run(n1), make_run(n2)
    t0 = time.perf_counter()
    float(run1())            # compile + warm
    warm1_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run2())
    warm2_s = time.perf_counter() - t0
    best = None
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run1())
        t1 = time.perf_counter()
        float(run2())
        t2 = time.perf_counter()
        d = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
        samples.append({"t_n1_s": round(t1 - t0, 6),
                        "t_n2_s": round(t2 - t1, 6),
                        "per_step_ms": round(d * 1e3, 4)})
        best = d if best is None else min(best, d)
    if not return_detail:
        return best
    detail = {"method": "scan-diff", "n1": n1, "n2": n2,
              "warmup_s": {"n1": round(warm1_s, 3), "n2": round(warm2_s, 3)},
              "repeats": samples}
    return best, detail


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
