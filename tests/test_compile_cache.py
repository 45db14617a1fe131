"""Persistent-compilation-cache plumbing (utils/compile_cache.py).

The cache directory is namespaced by a host ISA fingerprint so an XLA:CPU
AOT entry compiled on a different machine is never replayed (SIGILL risk).
Root-level entries written by older releases are adopted only when the
root's marker file proves they were compiled on THIS host (or with
PEV_CACHE_ADOPT=1) — a migrated/shared cache root must stay quarantined.
"""

import os

from protein_ensemble_vae_tpu.utils.compile_cache import (
    _MARKER_NAME, _adopt_legacy_entries, host_fingerprint)


def test_host_fingerprint_stable_and_shaped():
    a, b = host_fingerprint(), host_fingerprint()
    assert a == b
    arch, digest = a.rsplit("-", 1)
    assert arch and len(digest) == 12
    assert all(c in "0123456789abcdef" for c in digest)


def test_fingerprint_ignores_non_isa_flags(monkeypatch):
    """Mitigation/power flag churn (kernel or microcode updates) must not
    invalidate the cache — only codegen-relevant ISA features count."""
    import protein_ensemble_vae_tpu.utils.compile_cache as cc

    base = "fpu avx2 avx512f fma sse4_2 aes md_clear flush_l1d ibrs stibp"
    churned = base.replace("md_clear ", "")  # a mitigation toggle vanished

    def fake_flags(text):
        return " ".join(sorted(
            f for f in text.split() if f.startswith(cc._ISA_PREFIXES)))

    monkeypatch.setattr(cc, "_isa_flags", lambda: fake_flags(base))
    fp_base = cc.host_fingerprint()
    monkeypatch.setattr(cc, "_isa_flags", lambda: fake_flags(churned))
    assert cc.host_fingerprint() == fp_base

    # but a real vector-ISA change DOES renamespace
    monkeypatch.setattr(
        cc, "_isa_flags", lambda: fake_flags(base.replace("avx512f ", "")))
    assert cc.host_fingerprint() != fp_base


def _seed_legacy(tmp_path):
    root = tmp_path / "pev_xla"
    host_dir = root / host_fingerprint()
    host_dir.mkdir(parents=True)
    (root / "jit_step-aaaa-cache").write_bytes(b"old entry")
    (root / "notes.txt").write_text("not a cache entry")
    # pre-existing entry in the host dir must not be clobbered
    (host_dir / "jit_step-bbbb-cache").write_bytes(b"new entry")
    (root / "jit_step-bbbb-cache").write_bytes(b"stale duplicate")
    return root, host_dir


def test_adoption_requires_matching_marker(tmp_path, monkeypatch):
    """Without a marker proving same-host provenance (and without
    PEV_CACHE_ADOPT=1), legacy root entries stay quarantined."""
    monkeypatch.delenv("PEV_CACHE_ADOPT", raising=False)
    root, host_dir = _seed_legacy(tmp_path)

    _adopt_legacy_entries(str(root), str(host_dir), host_fingerprint())
    assert (root / "jit_step-aaaa-cache").exists()          # NOT adopted
    assert not (host_dir / "jit_step-aaaa-cache").exists()

    # a marker from a DIFFERENT host also blocks adoption
    (root / _MARKER_NAME).write_text("x86_64-deadbeef0000\n")
    _adopt_legacy_entries(str(root), str(host_dir), host_fingerprint())
    assert (root / "jit_step-aaaa-cache").exists()


def test_adoption_with_matching_marker_moves_only_cache_files(tmp_path,
                                                              monkeypatch):
    monkeypatch.delenv("PEV_CACHE_ADOPT", raising=False)
    root, host_dir = _seed_legacy(tmp_path)
    (root / _MARKER_NAME).write_text(host_fingerprint() + "\n")

    _adopt_legacy_entries(str(root), str(host_dir), host_fingerprint())

    assert (host_dir / "jit_step-aaaa-cache").read_bytes() == b"old entry"
    assert not (root / "jit_step-aaaa-cache").exists()
    assert (root / "notes.txt").exists()
    assert (host_dir / "jit_step-bbbb-cache").read_bytes() == b"new entry"


def test_adoption_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("PEV_CACHE_ADOPT", "1")
    root, host_dir = _seed_legacy(tmp_path)
    _adopt_legacy_entries(str(root), str(host_dir), host_fingerprint())
    assert (host_dir / "jit_step-aaaa-cache").read_bytes() == b"old entry"


def test_adopt_legacy_entries_tolerates_missing_root(tmp_path):
    _adopt_legacy_entries(str(tmp_path / "nope"), str(tmp_path / "host"),
                          host_fingerprint())


def test_enable_writes_marker(tmp_path, monkeypatch):
    """First enable stamps the root with this host's fingerprint so future
    same-host runs may adopt legacy entries."""
    from protein_ensemble_vae_tpu.utils.compile_cache import (
        enable_compilation_cache)

    monkeypatch.delenv("PEV_CACHE_ADOPT", raising=False)
    root = tmp_path / "cache_root"
    out = enable_compilation_cache(str(root))
    assert out == str(root / host_fingerprint())
    marker = root / _MARKER_NAME
    assert marker.read_text().strip() == host_fingerprint()
