"""Persistent-compilation-cache plumbing (utils/compile_cache.py).

The cache directory is namespaced by a host ISA fingerprint so an XLA:CPU
AOT entry compiled on a different machine is never replayed (SIGILL risk);
entries written by older releases directly under the root are adopted
(same host, still valid).
"""

import os

from protein_ensemble_vae_tpu.utils.compile_cache import (
    _adopt_legacy_entries, host_fingerprint)


def test_host_fingerprint_stable_and_shaped():
    a, b = host_fingerprint(), host_fingerprint()
    assert a == b
    arch, digest = a.rsplit("-", 1)
    assert arch and len(digest) == 12
    assert all(c in "0123456789abcdef" for c in digest)


def test_adopt_legacy_entries_moves_only_cache_files(tmp_path):
    root = tmp_path / "pev_xla"
    host_dir = root / host_fingerprint()
    host_dir.mkdir(parents=True)
    (root / "jit_step-aaaa-cache").write_bytes(b"old entry")
    (root / "notes.txt").write_text("not a cache entry")
    # pre-existing entry in the host dir must not be clobbered
    (host_dir / "jit_step-bbbb-cache").write_bytes(b"new entry")
    (root / "jit_step-bbbb-cache").write_bytes(b"stale duplicate")

    _adopt_legacy_entries(str(root), str(host_dir))

    assert (host_dir / "jit_step-aaaa-cache").read_bytes() == b"old entry"
    assert not (root / "jit_step-aaaa-cache").exists()
    assert (root / "notes.txt").exists()
    assert (host_dir / "jit_step-bbbb-cache").read_bytes() == b"new entry"


def test_adopt_legacy_entries_tolerates_missing_root(tmp_path):
    _adopt_legacy_entries(str(tmp_path / "nope"), str(tmp_path / "host"))
