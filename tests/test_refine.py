"""Generation-time geometric refinement (infer/refine.py).

The failure mode it targets: posterior samples with stretched CA-CA /
peptide bonds that the generator gate (infer/gate.py, reference
generate_ensemble_pdbs.py:290-340) rejects. Refinement must restore gate
validity while staying close to the input conformation, and must leave
padded rows untouched.
"""

import numpy as np
import pytest

from protein_ensemble_vae_tpu.data.synthetic import compact_backbone
from protein_ensemble_vae_tpu.infer.gate import validate_protein_geometry
from protein_ensemble_vae_tpu.infer.refine import refine_backbone

L_REAL, L_PAD = 24, 32


@pytest.fixture(scope="module")
def broken_batch():
    """A 1.35x-stretched compact backbone with one hard-broken bond
    (residue 10 shoved 2.2 A along the chain): avg CA-CA ~5.3 A and max
    ~7.3 A -> gate reject, exactly the dominant failure in
    runs/h2h/gen_report.json."""
    n, ca, c = compact_backbone(L_REAL, seed=3)
    stretch = 1.35
    n, ca, c = n * stretch, ca * stretch, c * stretch
    d = ca[10] - ca[9]
    d /= np.linalg.norm(d)
    for a in (n, ca, c):
        a[10] += 2.2 * d
    n, ca, c = (np.pad(a, ((0, L_PAD - L_REAL), (0, 0)))
                for a in (n, ca, c))
    mask = np.zeros(L_PAD, np.float32)
    mask[:L_REAL] = 1.0
    return (np.stack([n, n]), np.stack([ca, ca]), np.stack([c, c]),
            np.stack([mask, mask]))


def _ca_spacings(ca, mask):
    valid = mask > 0.5
    pts = ca[valid]
    return np.linalg.norm(np.diff(pts, axis=0), axis=-1)


def test_refine_restores_gate_validity(broken_batch):
    n, ca, c, mask = broken_batch
    ok0, reason0 = validate_protein_geometry(ca[0], mask[0])
    assert not ok0 and "CA-CA" in reason0  # fixture really is broken

    rn, rca, rc = refine_backbone(n, ca, c, mask, steps=150, lr=0.05)
    rn, rca, rc = np.asarray(rn), np.asarray(rca), np.asarray(rc)

    for b in range(2):
        ok, reason = validate_protein_geometry(rca[b], mask[b])
        assert ok, reason

    # local geometry actually improved, not just squeaked past the gate
    d0 = _ca_spacings(ca[0], mask[0])
    d1 = _ca_spacings(rca[0], mask[0])
    assert abs(d1.mean() - 3.81) < abs(d0.mean() - 3.81)
    assert d1.max() < 6.0 < d0.max()

    # peptide C(i)-N(i+1) bonds pulled toward 1.33 A
    def cn_err(nn, cc):
        d = np.linalg.norm(nn[1:L_REAL] - cc[:L_REAL - 1], axis=-1)
        return np.abs(d - 1.33).mean()
    assert cn_err(rn[0], rc[0]) < cn_err(n[0], c[0])


def test_refine_preserves_conformation_and_padding(broken_batch):
    n, ca, c, mask = broken_batch
    rn, rca, rc = refine_backbone(n, ca, c, mask, steps=80, lr=0.05)
    rn, rca, rc = np.asarray(rn), np.asarray(rca), np.asarray(rc)

    # padded rows byte-identical to the input
    for a, r in ((n, rn), (ca, rca), (c, rc)):
        np.testing.assert_array_equal(a[:, L_REAL:], r[:, L_REAL:])

    # anchored: mean displacement stays local (fixing ~1 A bond errors
    # must not teleport the fold)
    disp = np.linalg.norm(rca[0, :L_REAL] - ca[0, :L_REAL], axis=-1)
    assert disp.mean() < 3.0


def test_refine_cli_roundtrip(broken_batch, tmp_path, capsys):
    """pev-refine: read a broken multi-model PDB, relax, write gate-valid."""
    from protein_ensemble_vae_tpu.cli.refine import main as refine_main
    from protein_ensemble_vae_tpu.infer.pdb_io import (read_pdb_backbone,
                                                       write_multi_model_pdb)

    n, ca, c, mask = broken_batch
    src = str(tmp_path / "broken.pdb")
    out = str(tmp_path / "refined.pdb")
    write_multi_model_pdb(n[:, :L_REAL], ca[:, :L_REAL], c[:, :L_REAL],
                          mask[0, :L_REAL], src)
    refine_main(["--input", src, "--output", out, "--steps", "150"])
    printed = capsys.readouterr().out
    assert "before: gate 0/2" in printed and "after : gate 2/2" in printed

    ens = read_pdb_backbone(out)
    assert ens["ca"].shape[0] == 2
    for k in range(2):
        ok, reason = validate_protein_geometry(ens["ca"][k], ens["mask"])
        assert ok, reason


def test_refine_cli_heterogeneous_models(tmp_path, capsys):
    """NMR-style ensembles resolve different residue subsets per model: a
    residue absent from model k must not act as a (0,0,0) phantom atom that
    drags model k's real neighbors toward the origin."""
    from protein_ensemble_vae_tpu.cli.refine import main as refine_main
    from protein_ensemble_vae_tpu.infer.pdb_io import (read_pdb_backbone,
                                                       write_multi_model_pdb)

    n, ca, c = compact_backbone(L_REAL, seed=11)
    stretch = 1.4   # broken enough that refinement has real work to do
    n, ca, c = n * stretch, ca * stretch, c * stretch
    mask_k = np.ones((2, L_REAL), np.float32)
    mask_k[1, -3:] = 0.0   # model 2 does not resolve the last 3 residues
    src = str(tmp_path / "hetero.pdb")
    out = str(tmp_path / "hetero_refined.pdb")
    write_multi_model_pdb(np.stack([n, n]), np.stack([ca, ca]),
                          np.stack([c, c]), mask_k, src)

    refine_main(["--input", src, "--output", out, "--steps", "120"])
    assert "after : gate 2/2" in capsys.readouterr().out

    ens = read_pdb_backbone(out)
    # model 2's unresolved tail stays unresolved (not written as atoms)
    np.testing.assert_array_equal(ens["model_mask"][1, -3:], 0.0)
    # and its real residues were refined sanely: spacing near 3.81, and
    # close to model 1's refinement of the same (identical-input) residues
    # — the phantom-atom bug dragged the boundary residues several A off
    valid = ens["model_mask"][1] > 0.5
    pts = ens["ca"][1][valid]
    d = np.linalg.norm(np.diff(pts, axis=0), axis=-1)
    assert abs(d.mean() - 3.81) < 0.3
    cross = np.linalg.norm(ens["ca"][1][valid] - ens["ca"][0][valid], axis=-1)
    assert cross.max() < 2.0


def test_refine_noop_on_valid_geometry():
    """A gate-valid backbone must stay gate-valid and anchored. With the
    torsion terms off (pure covalent energy), a backbone with ideal bonds
    is a near-fixpoint; with them on, torsion idealization may move a
    random fold (its dihedrals aren't in the favored basins) but the
    anchor keeps the displacement local."""
    n, ca, c = compact_backbone(L_REAL, seed=7)
    mask = np.ones(L_REAL, np.float32)
    ok, reason = validate_protein_geometry(ca, mask)
    assert ok, reason

    rn, rca, rc = refine_backbone(n[None], ca[None], c[None], mask[None],
                                  steps=50, lr=0.02, w_rama=0.0, w_omega=0.0,
                                  w_clash=0.0)
    ok2, reason2 = validate_protein_geometry(np.asarray(rca)[0], mask)
    assert ok2, reason2
    disp = np.linalg.norm(np.asarray(rca)[0] - ca, axis=-1)
    assert disp.mean() < 0.5

    # full default energy: still gate-valid, still anchored
    rn, rca, rc = refine_backbone(n[None], ca[None], c[None], mask[None],
                                  steps=150, lr=0.05)
    ok3, reason3 = validate_protein_geometry(np.asarray(rca)[0], mask)
    assert ok3, reason3
    disp = np.linalg.norm(np.asarray(rca)[0] - ca, axis=-1)
    assert disp.mean() < 2.0


def test_refine_vdw_decay_reaches_postfix_bar_from_mild_noise():
    """Round-5 remedies end-to-end: from a mildly corrupted (0.25 Å
    coordinate noise) physically valid chain, refinement with cosine lr
    decay + the MolProbity-event vdW clash term must recover the
    BASELINE.md post-fix bar on its scoreable local rows — bond error
    <= 0.005 Å and MolProbity-style backbone clashscore 0. Constant-lr
    Adam provably cannot (it plateaus at an lr-proportional jitter floor,
    ~0.04 Å across every round-4 sweep row)."""
    from protein_ensemble_vae_tpu.data.synthetic import nerf_ensemble
    from protein_ensemble_vae_tpu.eval.analyze import (bond_length_stats,
                                                       molprobity_clashscore)

    n, ca, c = nerf_ensemble(32, 1, seed=3)
    rng = np.random.default_rng(0)
    n = n + rng.normal(0, 0.25, n.shape).astype(np.float32)
    ca = ca + rng.normal(0, 0.25, ca.shape).astype(np.float32)
    c = c + rng.normal(0, 0.25, c.shape).astype(np.float32)
    mask = np.ones((1, 32), np.float32)

    rn, rca, rc = refine_backbone(n, ca, c, mask, steps=300, lr=0.05,
                                  anchor_weight=0.015, w_bond=4.0,
                                  w_rama=2.0, w_omega=2.0, w_angle=8.0,
                                  w_clash_vdw=100.0, lr_decay=True)
    rn, rca, rc = (np.asarray(x)[0] for x in (rn, rca, rc))
    stats = bond_length_stats(rn, rca, rc, mask[0])
    for bond in ("n_ca", "ca_c", "c_n"):
        assert stats[bond]["mean_error"] <= 0.005, (bond, stats[bond])
    assert molprobity_clashscore(rn, rca, rc, None, mask[0]) == 0.0
