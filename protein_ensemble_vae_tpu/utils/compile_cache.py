"""Persistent XLA compilation cache.

On this class of host (few cores), first-time compilation of the fused
train step costs ~15 minutes per process; the persistent cache cuts repeat
runs (re-launched trainings, bench, generate) to seconds. Entry keys
include jaxlib version, backend, and HLO — but NOT the host CPU's target
machine features: an XLA:CPU AOT result compiled on a machine with e.g.
AMX/AVX512 subsets the current host lacks loads with a SIGILL-risk warning
(``cpu_aot_loader.cc: Machine type used for XLA:CPU compilation doesn't
match``). We therefore namespace the cache directory by a host fingerprint
(platform tag + codegen-relevant ISA feature hash) so a host change gets a
fresh cache instead of replaying foreign-machine code.

Enabled by the CLIs and bench at startup. Set ``PEV_COMPILE_CACHE`` to a
directory to relocate it, or to ``off`` to disable. Legacy root-level
entries written by older releases are adopted into the current host's
namespace only when the root's marker file proves they were compiled on
this host (or with explicit ``PEV_CACHE_ADOPT=1``) — a migrated or shared
cache root from a different host must NOT leak its AOT code past the
quarantine.
"""

from __future__ import annotations

import hashlib
import os
import platform
from typing import Optional

# CPU feature prefixes that affect XLA:CPU code generation (vector ISA,
# FMA, AMX tiles, crypto/bit-manip units). Kernel/microcode updates toggle
# plenty of OTHER flags (mitigation bits like md_clear/flush_l1d, power
# features) that do not change codegen — hashing those would invalidate the
# whole cache (~15 min/shape recompile on a 1-core host) on every kernel
# upgrade even though the cached code still runs.
_ISA_PREFIXES = (
    "sse", "ssse", "avx", "amx", "fma", "f16c", "bmi", "adx", "aes",
    "vaes", "pclmulqdq", "vpclmulqdq", "sha", "gfni", "popcnt", "movbe",
    "xsave", "lzcnt", "abm", "rdseed", "rdrnd", "cx16", "movdir",
    "prefetch", "clflushopt", "clwb", "serialize", "neon", "asimd", "sve",
)

_MARKER_NAME = ".pev_host_fingerprint"


def _isa_flags() -> str:
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    flags = line.split(":", 1)[1].split()
                    keep = sorted(f for f in flags
                                  if f.startswith(_ISA_PREFIXES))
                    return " ".join(keep)
    except OSError:
        pass
    return platform.processor()


def host_fingerprint() -> str:
    """Short stable tag for this host's ISA: machine arch + hash of the
    codegen-relevant CPU feature flags (vector/FMA/AMX subset of
    /proc/cpuinfo — NOT the full flag set, which churns with every
    kernel/microcode mitigation toggle)."""
    digest = hashlib.sha256(_isa_flags().encode()).hexdigest()[:12]
    return f"{platform.machine()}-{digest}"


def _adopt_legacy_entries(root: str, host_dir: str, fingerprint: str) -> None:
    """Migrate cache files written by older releases directly under ``root``
    into this host's namespace — but ONLY when we can prove they were
    compiled here: either the root's marker file records this host's
    fingerprint, or the user asserts it with ``PEV_CACHE_ADOPT=1``. A cache
    root that persisted across a host/ISA change (shared or migrated
    ~/.cache — the exact SIGILL scenario the quarantine exists for) must
    not have its foreign AOT entries adopted."""
    marker = os.path.join(root, _MARKER_NAME)
    adopt_env = os.environ.get("PEV_CACHE_ADOPT", "") == "1"
    try:
        with open(marker) as fh:
            marker_ok = fh.read().strip() == fingerprint
    except OSError:
        marker_ok = False
    if not (marker_ok or adopt_env):
        return
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
    fingerprint = host_fingerprint()
    path = os.path.join(root, fingerprint)
    try:
        fresh = not os.path.isdir(path)
        os.makedirs(path, exist_ok=True)
        if fresh:
            # surprise recompiles must be diagnosable: say which namespaces
            # already exist (an old fingerprint here means the host's ISA
            # tag changed, e.g. a CPU swap or a flag-set change)
            try:
                old = sorted(n for n in os.listdir(root)
                             if os.path.isdir(os.path.join(root, n))
                             and n != fingerprint)
            except OSError:
                old = []
            if old:
                print(f"[compile_cache] fresh cache namespace {fingerprint} "
                      f"(existing: {', '.join(old)}) — expect first-run "
                      "recompiles")
        _adopt_legacy_entries(root, path, fingerprint)
        # record which host owns the root-level legacy entries so a future
        # enable on the SAME host may adopt them (see _adopt_legacy_entries)
        marker = os.path.join(root, _MARKER_NAME)
        if not os.path.exists(marker):
            with open(marker, "w") as fh:
                fh.write(fingerprint + "\n")
        jax.config.update("jax_compilation_cache_dir", path)
        # only persist expensive compiles; tiny jits aren't worth the IO
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        return None
    return path
