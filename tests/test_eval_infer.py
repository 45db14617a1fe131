"""Eval metrics + PDB IO + geometry gate tests (incl. parity vs the
reference validation_metrics oracle when available)."""

import os
import sys

import numpy as np
import pytest

from protein_ensemble_vae_tpu.data.synthetic import helix_backbone
from protein_ensemble_vae_tpu.eval import (
    classify_ramachandran,
    compute_contact_map,
    compute_gdt,
    compute_lddt,
    compute_radius_of_gyration,
    compute_rmsf,
    compute_tm_score,
    contact_map_overlap,
    phi_psi_from_backbone,
)
from protein_ensemble_vae_tpu.eval.report import (validate_ensemble,
                                                  validate_prediction,
                                                  write_report)
from protein_ensemble_vae_tpu.infer import (
    read_pdb_backbone,
    validate_protein_geometry,
    write_multi_model_pdb,
    write_pdb,
)

from conftest import REFERENCE_DIR, reference_available


@pytest.fixture(scope="module")
def ref_vm():
    if not reference_available():
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.join(REFERENCE_DIR, "scripts"))
    import validation_metrics as vm
    return vm


def _noisy(ca, rng, scale):
    return ca + rng.normal(0, scale, ca.shape).astype(np.float32)


def test_tm_score_parity(ref_vm, rng):
    _, ca, _ = helix_backbone(60)
    pred = _noisy(ca, rng, 1.0)
    ours = compute_tm_score(pred, ca)
    ref = ref_vm.compute_tm_score_python(pred, ca)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_lddt_parity(ref_vm, rng):
    _, ca, _ = helix_backbone(60)
    pred = _noisy(ca, rng, 1.0)
    ours_g, ours_pr = compute_lddt(pred, ca)
    ref_g, ref_pr = ref_vm.compute_lddt(pred, ca)
    np.testing.assert_allclose(ours_g, ref_g, rtol=1e-5)
    np.testing.assert_allclose(ours_pr, ref_pr, rtol=1e-4)


def test_gdt_parity(ref_vm, rng):
    _, ca, _ = helix_backbone(60)
    pred = _noisy(ca, rng, 1.5)
    ours = compute_gdt(pred, ca)
    ref = ref_vm.compute_gdt(pred, ca)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_rmsf_parity(ref_vm, rng):
    _, ca, _ = helix_backbone(40)
    ens = np.stack([_noisy(ca, rng, 0.5) for _ in range(5)])
    ours = compute_rmsf(ens)
    ref = ref_vm.compute_rmsf(ens)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ensemble_diversity_parity(ref_vm, rng):
    """Vmapped [K,K] Kabsch battery vs the reference's O(K²) SVD loop
    (validation_metrics.py:324-349 — the loop the TPU build exists to
    kill; here it serves as the parity oracle)."""
    from protein_ensemble_vae_tpu.eval.metrics import compute_ensemble_diversity

    _, ca, _ = helix_backbone(40)
    ens = np.stack([_noisy(ca, rng, 0.7) for _ in range(6)])
    ours_mean, ours_M = compute_ensemble_diversity(ens)
    ref_mean, ref_M = ref_vm.compute_ensemble_diversity(ens)
    np.testing.assert_allclose(ours_mean, ref_mean, rtol=1e-4)
    np.testing.assert_allclose(ours_M, ref_M, rtol=1e-3, atol=1e-5)


def test_contact_parity(ref_vm, rng):
    _, ca, _ = helix_backbone(40)
    pred = _noisy(ca, rng, 1.0)
    ours = contact_map_overlap(compute_contact_map(pred),
                               compute_contact_map(ca))
    ref = ref_vm.contact_map_overlap(ref_vm.compute_contact_map(pred),
                                     ref_vm.compute_contact_map(ca))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_rg_parity(ref_vm):
    _, ca, _ = helix_backbone(50)
    np.testing.assert_allclose(compute_radius_of_gyration(ca),
                               ref_vm.compute_radius_of_gyration(ca),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# Standalone
# ---------------------------------------------------------------------------

def test_tm_score_perfect_is_one():
    _, ca, _ = helix_backbone(50)
    assert compute_tm_score(ca, ca) > 0.999


def test_lddt_identity_is_one():
    _, ca, _ = helix_backbone(50)
    g, _ = compute_lddt(ca, ca)
    assert g == 1.0


def test_pdb_roundtrip(tmp_path):
    n, ca, c = helix_backbone(20)
    mask = np.ones(20, np.float32)
    mask[5] = 0.0
    seq = "ACDEFGHIKLMNPQRSTVWY"
    path = str(tmp_path / "test.pdb")
    write_pdb(n, ca, c, mask, path, sequence=seq, pdb_id="TEST")
    parsed = read_pdb_backbone(path)
    assert parsed["ca"].shape[0] == 1
    valid = mask > 0.5
    np.testing.assert_allclose(parsed["ca"][0][valid], ca[valid], atol=2e-3)
    np.testing.assert_allclose(parsed["mask"], mask)
    assert parsed["sequence"][0] == "A"
    # CONECT records exist
    text = open(path).read()
    assert "CONECT" in text and "TER" in text


def test_multi_model_pdb_roundtrip(tmp_path):
    n, ca, c = helix_backbone(15)
    mask = np.ones(15, np.float32)
    K = 4
    ens_n = np.stack([n + i * 0.1 for i in range(K)])
    ens_ca = np.stack([ca + i * 0.1 for i in range(K)])
    ens_c = np.stack([c + i * 0.1 for i in range(K)])
    path = str(tmp_path / "ens.pdb")
    write_multi_model_pdb(ens_n, ens_ca, ens_c, mask, path, sequence="A" * 15)
    parsed = read_pdb_backbone(path)
    assert parsed["ca"].shape == (K, 15, 3)
    np.testing.assert_allclose(parsed["ca"][2], ens_ca[2], atol=2e-3)
    assert f"NUMMDL    {K}" in open(path).read()


def test_pdb_read_offset_and_insertion_codes(tmp_path):
    """Real-world numbering: resseq starting at 17, an interior gap, an
    insertion code, and a negative resseq must map to a compact index and
    round-trip through the analysis reader (VERDICT round-1 item #6)."""
    n, ca, c = helix_backbone(6)
    path = str(tmp_path / "offset.pdb")
    rows = []  # (resseq, icode, coords index)
    numbering = [(-2, ""), (17, ""), (18, ""), (18, "A"), (19, ""), (21, "")]
    serial = 1
    with open(path, "w") as f:
        for i, (resseq, icode) in enumerate(numbering):
            for name, xyz, elem in (("N", n[i], "N"), ("CA", ca[i], "C"),
                                    ("C", c[i], "C")):
                pad = f" {name:<3s}"
                f.write(f"ATOM  {serial:5d} {pad} ALA A{resseq:4d}{icode or ' '}"
                        f"   {xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}"
                        f"{1.00:6.2f}{0.00:6.2f}           {elem}\n")
                serial += 1
        f.write("END\n")
    parsed = read_pdb_backbone(path)
    # -2, then a (rebased) run: 17,18,18A,19,gap,21
    # layout: [-2]=0, [17]=1+gap(19)=... offsets rebased but gaps preserved
    mask = parsed["mask"]
    assert parsed["ca"].shape[0] == 1
    assert mask.sum() == 6
    got = parsed["ca"][0][mask > 0.5]
    np.testing.assert_allclose(got, ca, atol=2e-3)
    # 19 -> 21 leaves exactly one masked gap slot between the last two
    valid_idx = np.where(mask > 0.5)[0]
    assert valid_idx[-1] - valid_idx[-2] == 2


def test_geometry_gate():
    _, ca, _ = helix_backbone(30)
    mask = np.ones(30, np.float32)
    ok, reason = validate_protein_geometry(ca, mask)
    assert ok, reason
    bad = ca.copy()
    bad[15] += 50.0
    ok, reason = validate_protein_geometry(bad, mask)
    assert not ok


def test_ramachandran_classification_of_real_helix():
    n, ca, c = helix_backbone(40)
    mask = np.ones(40, np.float32)
    phi, psi, valid = phi_psi_from_backbone(n, ca, c, mask)
    res = classify_ramachandran(phi, psi, valid)
    assert res["n"] > 0
    assert abs(res["favored"] + res["allowed"] + res["outlier"] - 1.0) < 1e-6
    # a helical backbone (phi ~ -41, psi ~ -38 for this fixture) is almost
    # entirely inside the reference's alpha box (analyze_ensemble.py:176-181);
    # only chain-end residues with partial dihedrals can fall outside
    assert res["favored"] >= 0.9


def test_ramachandran_reference_boxes():
    """Point-wise parity with the reference's rectangular regions
    (analyze_ensemble.py:176-190): alpha/beta/L-alpha favored; any other
    |phi| >= 30 allowed; the |phi| < 30 strip outlier."""
    cases = [
        ((-60, -45), "favored"),    # alpha
        ((-120, 120), "favored"),   # beta
        ((60, 45), "favored"),      # left-handed alpha
        ((-150, 0), "allowed"),     # phi <= -30, outside favored boxes
        ((100, -50), "allowed"),    # phi >= 30, outside favored boxes
        ((-60, 60), "allowed"),     # between alpha and beta psi ranges
        ((0, 0), "outlier"),        # |phi| < 30 strip
        ((10, -100), "outlier"),
        ((-20, 170), "outlier"),
    ]
    for (phi_d, psi_d), expect in cases:
        res = classify_ramachandran(np.radians([phi_d]), np.radians([psi_d]),
                                    np.array([True]))
        assert res[expect if expect != "outlier" else "outlier"] == 1.0, (
            (phi_d, psi_d, expect, res))


def test_ramachandran_fractions_partition():
    rng = np.random.default_rng(7)
    phi = rng.uniform(-np.pi, np.pi, 500)
    psi = rng.uniform(-np.pi, np.pi, 500)
    valid = np.ones(500, bool)
    res = classify_ramachandran(phi, psi, valid)
    assert abs(res["favored"] + res["allowed"] + res["outlier"] - 1.0) < 1e-9
    # uniform angles: the outlier strip is 60/360 of phi minus nothing else
    assert 0.1 < res["outlier"] < 0.25


def test_validation_report(tmp_path, rng):
    _, ca, _ = helix_backbone(40)
    pred = _noisy(ca, rng, 0.5)
    pm = validate_prediction(pred, ca)
    assert 0 <= pm["tm_score"] <= 1
    ens = np.stack([_noisy(ca, rng, 0.3) for _ in range(4)])
    em = validate_ensemble(ens)
    assert em["diversity"] > 0.05
    path = write_report(str(tmp_path / "report.txt"), pm, em)
    text = open(path).read()
    assert "TM-score" in text and "diversity" in text


# ---------------------------------------------------------------------------
# MolProbity-style backbone clashscore (BASELINE.md "<20" row; distinct from
# the reference's 3.2 A count metric in analyze_ensemble.py:203-226)

def _spaced_residues(L, spacing=10.0):
    """L residues far apart, each with plausible internal N/CA/C/O geometry."""
    base = np.arange(L)[:, None] * np.array([spacing, 0.0, 0.0])
    n = base + np.array([0.0, 0.0, 0.0])
    ca = base + np.array([1.46, 0.0, 0.0])
    c = base + np.array([2.2, 1.3, 0.0])
    o = base + np.array([2.2, 2.53, 0.0])
    return n, ca, c, o


def test_molprobity_clashscore_clean_helix_is_zero():
    from protein_ensemble_vae_tpu.eval.analyze import molprobity_clashscore
    from protein_ensemble_vae_tpu.infer.pdb_io import compute_backbone_oxygen

    n, ca, c = helix_backbone(40)
    mask = np.ones(40, np.float32)
    o = compute_backbone_oxygen(n, ca, c, mask)
    assert molprobity_clashscore(n, ca, c, o, mask) == 0.0
    assert molprobity_clashscore(n, ca, c, None, mask) == 0.0


def test_molprobity_clashscore_counts_coincident_residues():
    from protein_ensemble_vae_tpu.eval.analyze import molprobity_clashscore

    L = 12
    n, ca, c, o = _spaced_residues(L)
    mask = np.ones(L, np.float32)
    assert molprobity_clashscore(n, ca, c, o, mask) == 0.0
    # drop residue 9 onto residue 2 (far apart in bond graph -> no
    # exclusions apply): of the 4x4 cross pairs, all overlap except the
    # two N<->O pairs (d 3.35 A vs r_N+r_O = 2.95 -> overlap < 0.4)
    for arr in (n, ca, c, o):
        arr[9] = arr[2] + 0.05
    expect = 1000.0 * 14 / (4 * L)
    assert abs(molprobity_clashscore(n, ca, c, o, mask) - expect) < 1e-9


def test_molprobity_clashscore_without_oxygen_remaps_exclusions():
    from protein_ensemble_vae_tpu.eval.analyze import molprobity_clashscore

    L = 12
    n, ca, c, _ = _spaced_residues(L)
    mask = np.ones(L, np.float32)
    for arr in (n, ca, c):
        arr[9] = arr[2] + 0.05
    expect = 1000.0 * 9 / (3 * L)
    assert abs(molprobity_clashscore(n, ca, c, None, mask) - expect) < 1e-9


def test_molprobity_bonded_neighbors_not_counted():
    from protein_ensemble_vae_tpu.eval.analyze import molprobity_clashscore

    # two residues with ideal peptide geometry: C(0)-N(1) at 1.33 A is a
    # massive vdW "overlap" but 1 bond apart -> excluded, score must be 0
    n = np.array([[0.0, 0, 0], [3.8, 0, 0]])
    ca = np.array([[1.46, 0, 0], [5.26, 0, 0]])
    c = np.array([[2.47, 0, 0], [6.27, 0, 0]])
    o = c + np.array([0.0, 1.23, 0.0])
    mask = np.ones(2, np.float32)
    assert molprobity_clashscore(n, ca, c, o, mask) == 0.0
