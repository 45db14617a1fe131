"""Torsion-space (NeRF-manifold) refinement (infer/torsion_refine.py).

The property it exists for: every output backbone has EXACT ideal covalent
geometry (config.BOND_* / ANGLE_*) regardless of weights or step count —
the BASELINE post-fix bond (≤0.005 Å) and angle (≤5°) rows hold by
construction, so the optimizer only ever trades clash vs Ramachandran vs
anchor. Contrast the Cartesian refiner (infer/refine.py), whose round-4/5
sweeps floored at bond ~0.015 Å / MolProbity ~43 because clash relief and
covalent accuracy fight over the same coordinates
(runs/refine_sweep_vdw.json, every row targets_pass: false).
"""

import numpy as np
import pytest

from protein_ensemble_vae_tpu.data.synthetic import nerf_ensemble
from protein_ensemble_vae_tpu.eval.analyze import (bond_length_stats,
                                                   molprobity_clashscore)
from protein_ensemble_vae_tpu.infer.torsion_refine import (
    ideal_seed_frame, nerf_rebuild, refine_torsions, torsions_from_coords)

L, K = 32, 3


@pytest.fixture(scope="module")
def nerf_batch():
    n, ca, c = nerf_ensemble(L, K, seed=0)
    mask = np.ones((K, L), np.float32)
    return n, ca, c, mask


@pytest.fixture(scope="module")
def noisy_batch(nerf_batch):
    """Coordinate-noised NeRF chains: the covalent geometry and torsion
    basins are both corrupted, like a posterior sample's."""
    n, ca, c, mask = nerf_batch
    rng = np.random.default_rng(1)
    return (n + rng.normal(0, 0.25, n.shape).astype(np.float32),
            ca + rng.normal(0, 0.25, ca.shape).astype(np.float32),
            c + rng.normal(0, 0.25, c.shape).astype(np.float32), mask)


def test_nerf_roundtrip_reconstructs_fixture(nerf_batch):
    """extract-torsions -> rebuild reproduces a torsion-built chain to
    float precision: the JAX scan and the numpy oracle
    (data.synthetic._nerf_place) implement the same NeRF convention."""
    n, ca, c, mask = nerf_batch
    phi, psi, om = torsions_from_coords(n, ca, c, mask)
    seed = ideal_seed_frame(n[:, 0], ca[:, 0], c[:, 0])
    rn, rca, rc = (np.asarray(x) for x in nerf_rebuild(phi, psi, om, *seed))
    np.testing.assert_allclose(rca, ca, atol=2e-3)
    np.testing.assert_allclose(rn, n, atol=2e-3)
    np.testing.assert_allclose(rc, c, atol=2e-3)


def test_output_geometry_is_exactly_ideal(noisy_batch):
    """Bond/angle errors after refinement are ~float-epsilon even though
    the input's are ~0.25 Å — the post-fix covalent rows cannot fail."""
    n, ca, c, mask = noisy_batch
    rn, rca, rc = (np.asarray(x) for x in
                   refine_torsions(n, ca, c, mask, steps=60))
    for k in range(K):
        stats = bond_length_stats(rn[k], rca[k], rc[k], mask[k])
        for b in ("n_ca", "ca_c", "c_n"):
            assert stats[b]["mean_error"] < 1e-4, (b, stats[b])


def test_refinement_clears_clashes_and_preserves_conformation(noisy_batch):
    n, ca, c, mask = noisy_batch
    rn, rca, rc = (np.asarray(x) for x in refine_torsions(
        n, ca, c, mask, steps=200, lr=0.03, anchor_weight=0.01,
        w_rama=4.0, w_omega=2.0, w_clash_vdw=400.0))
    mp = np.mean([molprobity_clashscore(rn[k], rca[k], rc[k], None, mask[k])
                  for k in range(K)])
    assert mp < 20.0, mp  # the BASELINE post-fix clash row
    # conformational content preserved: rebuilt CAs stay near the sample
    rmsd = np.sqrt(((rca - ca) ** 2).sum(-1).mean())
    assert rmsd < 2.5, rmsd


def test_padding_pinned_and_zero_steps_is_pure_projection(noisy_batch):
    n, ca, c, mask = noisy_batch
    Lp = L + 8
    pad = ((0, 0), (0, 8), (0, 0))
    n2, ca2, c2 = (np.pad(x, pad) for x in (n, ca, c))
    m2 = np.pad(mask, ((0, 0), (0, 8)))
    rn, rca, rc = (np.asarray(x) for x in
                   refine_torsions(n2, ca2, c2, m2, steps=0))
    # padded rows untouched; valid rows moved onto the ideal manifold
    np.testing.assert_array_equal(rca[:, L:], ca2[:, L:])
    np.testing.assert_array_equal(rn[:, L:], n2[:, L:])
    assert rca.shape == (K, Lp, 3)
    stats = bond_length_stats(rn[0], rca[0], rc[0], m2[0])
    assert stats["c_n"]["mean_error"] < 1e-4
