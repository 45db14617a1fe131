"""Persistent XLA compilation cache.

On this class of host (few cores), first-time compilation of the fused
train step costs ~15 minutes per process; the persistent cache cuts repeat
runs (re-launched trainings, bench, generate) to seconds. Entry keys
include jaxlib version, backend, and HLO, so stale hits are not possible.

Enabled by the CLIs and bench at startup. Set ``PEV_COMPILE_CACHE`` to a
directory to relocate it, or to ``off`` to disable.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX at a persistent on-disk compilation cache; returns the
    directory (None when disabled). Call before the first jit compile."""
    import jax

    path = path or os.environ.get("PEV_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/pev_xla"))
    if path in ("0", "off", ""):
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # only persist expensive compiles; tiny jits aren't worth the IO
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        return None
    return path
