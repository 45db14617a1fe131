"""Ramachandran angle extraction and region classification.

``phi_psi_from_backbone`` computes true backbone phi/psi from N/CA/C
(reference ``analyze_ensemble.py:105-147`` uses its own dihedral code; we
reuse the shared geometry core). ``classify_ramachandran`` buckets residues
into favored/allowed/outlier. The reference delegates to MDAnalysis's Lovell
2003 contours (analyze_ensemble.py:150-200); this self-contained
approximation uses elliptical favored/allowed basins around the canonical
regions (alpha, beta, left-alpha, PPII) — consistent with the training-time
Ramachandran loss basins (losses.py:72-131) so train and eval agree on what
"good" means.
"""

from __future__ import annotations

import numpy as np

# (phi0, psi0, favored radius scale, allowed radius scale) in radians.
_BASINS = (
    (-1.05, -0.79, 0.6, 1.2),   # alpha helix
    (-2.09, 2.09, 0.9, 1.6),    # beta sheet
    (1.05, 0.79, 0.45, 0.9),    # left-handed alpha
    (-1.31, 2.53, 0.5, 1.0),    # polyproline II
)


def phi_psi_from_backbone(n: np.ndarray, ca: np.ndarray, c: np.ndarray,
                          mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (phi, psi, valid) each [L]; angles in radians; valid where
    both dihedrals are defined."""
    import jax.numpy as jnp

    from protein_ensemble_vae_tpu.ops.geometry import dihedrals_from_coords

    d = np.asarray(dihedrals_from_coords(
        jnp.array(n[None]), jnp.array(ca[None]), jnp.array(c[None]),
        jnp.array(mask[None])))[0]
    phi = np.arctan2(d[:, 0], d[:, 1])
    psi = np.arctan2(d[:, 2], d[:, 3])
    L = len(mask)
    valid = mask.astype(bool).copy()
    # phi undefined at first valid residue, psi at last: mark via zero sin/cos
    sin_cos_mag = (d[:, 0] ** 2 + d[:, 1] ** 2) * (d[:, 2] ** 2 + d[:, 3] ** 2)
    valid &= sin_cos_mag > 1e-6
    return phi, psi, valid


def _wrap_diff(a: np.ndarray, b: float) -> np.ndarray:
    d = a - b
    return np.arctan2(np.sin(d), np.cos(d))


def classify_ramachandran(phi: np.ndarray, psi: np.ndarray,
                          valid: np.ndarray) -> dict:
    """Fraction of residues favored / allowed / outlier."""
    phi = phi[valid]
    psi = psi[valid]
    n = len(phi)
    if n == 0:
        return dict(favored=0.0, allowed=0.0, outlier=0.0, n=0)

    favored = np.zeros(n, bool)
    allowed = np.zeros(n, bool)
    for phi0, psi0, r_fav, r_alw in _BASINS:
        d2 = (_wrap_diff(phi, phi0) ** 2 + _wrap_diff(psi, psi0) ** 2)
        favored |= d2 < r_fav ** 2
        allowed |= d2 < r_alw ** 2
    allowed_only = allowed & ~favored
    outlier = ~allowed

    return dict(
        favored=float(favored.mean()),
        allowed=float(allowed_only.mean()),
        outlier=float(outlier.mean()),
        n=n,
    )
