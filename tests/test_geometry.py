"""Geometry-core unit tests: torsions, Kabsch, compaction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protein_ensemble_vae_tpu.ops import geometry as G


def _helix_backbone(L, rng=None, noise=0.0):
    """Synthetic alpha-helix-like backbone N/CA/C coordinates [L, 3]."""
    t = np.arange(L) * 100.0 * np.pi / 180.0
    ca = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(L)], -1)
    # place N and C roughly along the chain tangent at ideal bond lengths
    tang = np.gradient(ca, axis=0)
    tang /= np.linalg.norm(tang, axis=-1, keepdims=True) + 1e-9
    up = np.array([0.0, 0.0, 1.0])
    side = np.cross(tang, up)
    side /= np.linalg.norm(side, axis=-1, keepdims=True) + 1e-9
    n = ca - 1.46 * (0.8 * tang + 0.6 * side)
    c = ca + 1.52 * (0.8 * tang - 0.6 * side)
    if noise and rng is not None:
        n = n + rng.normal(0, noise, n.shape)
        ca = ca + rng.normal(0, noise, ca.shape)
        c = c + rng.normal(0, noise, c.shape)
    return n.astype(np.float32), ca.astype(np.float32), c.astype(np.float32)


def test_dihedral_known_angle():
    # Four points with a known 90-degree torsion.
    p0 = jnp.array([[1.0, 0.0, 0.0]])
    p1 = jnp.array([[0.0, 0.0, 0.0]])
    p2 = jnp.array([[0.0, 1.0, 0.0]])
    p3 = jnp.array([[0.0, 1.0, 1.0]])
    s, c = G.dihedral_from_four(p0, p1, p2, p3)
    angle = np.degrees(np.arctan2(np.asarray(s), np.asarray(c)))[0]
    assert abs(abs(angle) - 90.0) < 0.1


def test_dihedral_planar_is_180_or_0():
    p0 = jnp.array([[1.0, 1.0, 0.0]])
    p1 = jnp.array([[0.0, 0.0, 0.0]])
    p2 = jnp.array([[1.0, 0.0, 0.0]])
    p3 = jnp.array([[2.0, 1.0, 0.0]])  # cis-like arrangement
    s, c = G.dihedral_from_four(p0, p1, p2, p3)
    assert abs(float(s[0])) < 1e-3
    assert abs(abs(float(c[0])) - 1.0) < 1e-2


def test_dihedral_degenerate_collinear():
    p = [jnp.array([[float(i), 0.0, 0.0]]) for i in range(4)]
    s, c = G.dihedral_from_four(*p)
    assert float(s[0]) == 0.0 and float(c[0]) == 1.0


def test_dihedrals_from_coords_shapes_and_masking(rng):
    n, ca, c = _helix_backbone(16)
    N = jnp.array(n)[None]
    CA = jnp.array(ca)[None]
    C = jnp.array(c)[None]
    mask = jnp.ones((1, 16))
    dih = G.dihedrals_from_coords(N, CA, C, mask)
    assert dih.shape == (1, 16, 6)
    # phi/omega undefined at residue 0, psi undefined at last residue
    assert np.allclose(np.asarray(dih[0, 0, 0:2]), 0.0)
    assert np.allclose(np.asarray(dih[0, 0, 4:6]), 0.0)
    assert np.allclose(np.asarray(dih[0, -1, 2:4]), 0.0)
    # interior angles have valid sin^2+cos^2 ~= 1
    sc = np.asarray(dih[0, 1:-1])
    norms = sc[:, 0] ** 2 + sc[:, 1] ** 2
    assert np.all(np.abs(norms - 1.0) < 1e-3)


def test_dihedrals_pair_mask_holes(rng):
    n, ca, c = _helix_backbone(10)
    mask = np.ones((1, 10), np.float32)
    mask[0, 4] = 0.0  # hole at residue 4
    dih = G.dihedrals_from_coords(jnp.array(n)[None], jnp.array(ca)[None],
                                  jnp.array(c)[None], jnp.array(mask))
    d = np.asarray(dih[0])
    # phi(4), phi(5) need pairs (3,4), (4,5) -> both invalid
    assert np.allclose(d[4, 0:2], 0.0) and np.allclose(d[5, 0:2], 0.0)
    # psi(3), psi(4) invalid
    assert np.allclose(d[3, 2:4], 0.0) and np.allclose(d[4, 2:4], 0.0)


def test_kabsch_recovers_rotation(rng):
    _, ca, _ = _helix_backbone(32)
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1.0]], np.float32)
    moved = ca @ R.T + np.array([5.0, -3.0, 2.0], np.float32)
    rmsd = G.kabsch_rmsd(jnp.array(moved), jnp.array(ca))
    assert float(rmsd) < 2e-2  # fp32 SVD precision


def test_kabsch_reflection_not_allowed(rng):
    _, ca, _ = _helix_backbone(32)
    mirrored = ca * np.array([1.0, 1.0, -1.0], np.float32)
    rmsd = G.kabsch_rmsd(jnp.array(mirrored), jnp.array(ca))
    assert float(rmsd) > 0.5  # chirality cannot be undone by rotation


def test_pairwise_kabsch_matrix(rng):
    _, ca, _ = _helix_backbone(20)
    ens = np.stack([ca, ca + rng.normal(0, 0.1, ca.shape).astype(np.float32),
                    ca + rng.normal(0, 0.5, ca.shape).astype(np.float32)])
    M = np.asarray(G.pairwise_kabsch_rmsd(jnp.array(ens)))
    assert M.shape == (3, 3)
    assert np.allclose(np.diag(M), 0.0, atol=2e-2)  # fp32 SVD precision
    assert np.allclose(M, M.T, atol=1e-2)
    assert M[0, 2] > M[0, 1]


def test_compact_valid_roundtrip(rng):
    mask = jnp.array([[1, 1, 0, 1, 0, 1, 0, 0]], dtype=jnp.float32)
    pos, inv_pos, cmask = G.compact_valid(mask)
    assert np.asarray(pos[0, :4]).tolist() == [0, 1, 3, 5]
    assert np.asarray(cmask[0]).tolist() == [1, 1, 1, 1, 0, 0, 0, 0]
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1)
    compacted = jnp.take_along_axis(x, pos[..., None], axis=1)
    back = G.scatter_compact(compacted, inv_pos, mask)
    assert np.allclose(np.asarray(back[0, :, 0]),
                       [0, 1, 0, 3, 0, 5, 0, 0])


def test_safe_ops_no_nan_grads():
    def f(x):
        return jnp.sum(G.safe_norm(x)) + jnp.sum(G.safe_normalize(x))

    g = jax.grad(f)(jnp.zeros((3, 3)))
    assert np.all(np.isfinite(np.asarray(g)))
