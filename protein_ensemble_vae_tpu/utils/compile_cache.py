"""Persistent XLA compilation cache.

On this class of host (few cores), first-time compilation of the fused
train step costs ~15 minutes per process; the persistent cache cuts repeat
runs (re-launched trainings, bench, generate) to seconds. Entry keys
include jaxlib version, backend, and HLO — but NOT the host CPU's target
machine features: an XLA:CPU AOT result compiled on a machine with e.g.
AMX/AVX512 subsets the current host lacks loads with a SIGILL-risk warning
(``cpu_aot_loader.cc: Machine type used for XLA:CPU compilation doesn't
match``). We therefore namespace the cache directory by a host fingerprint
(platform tag + CPU flag hash) so a host change gets a fresh cache instead
of replaying foreign-machine code.

Enabled by the CLIs and bench at startup. Set ``PEV_COMPILE_CACHE`` to a
directory to relocate it, or to ``off`` to disable.
"""

from __future__ import annotations

import hashlib
import os
import platform
from typing import Optional


def host_fingerprint() -> str:
    """Short stable tag for this host's ISA: machine arch + hash of the CPU
    feature flags (from /proc/cpuinfo where available)."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        flags = platform.processor()
    digest = hashlib.sha256(flags.encode()).hexdigest()[:12]
    return f"{platform.machine()}-{digest}"


def _adopt_legacy_entries(root: str, host_dir: str) -> None:
    """One-time migration: cache files written by older releases directly
    under ``root`` were compiled on this very host, so they are valid for
    the current fingerprint — move them into ``host_dir`` instead of
    recompiling (~15 min/shape on a 1-core host)."""
    try:
        for name in os.listdir(root):
            src = os.path.join(root, name)
            if not (os.path.isfile(src) and name.endswith("-cache")):
                continue
            dst = os.path.join(host_dir, name)
            if not os.path.exists(dst):
                try:
                    os.replace(src, dst)
                except OSError:
                    pass
    except OSError:
        pass


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX at a persistent on-disk compilation cache; returns the
    directory (None when disabled). Call before the first jit compile."""
    import jax

    path = path or os.environ.get("PEV_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/pev_xla"))
    if path in ("0", "off", ""):
        return None
    root = path
    path = os.path.join(root, host_fingerprint())
    try:
        os.makedirs(path, exist_ok=True)
        _adopt_legacy_entries(root, path)
        jax.config.update("jax_compilation_cache_dir", path)
        # only persist expensive compiles; tiny jits aren't worth the IO
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        return None
    return path
