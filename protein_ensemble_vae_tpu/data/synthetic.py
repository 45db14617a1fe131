"""Synthetic H5 fixtures with the reference schema.

Replaces the RCSB download pipeline for tests and smoke training
(SURVEY §7.2 minimum slice): K noisy conformers of a helix-like backbone,
torsions computed with the same geometry code, optional fake ESM embeddings,
plus train/val manifest CSVs.
"""

from __future__ import annotations

import csv
import os
from typing import Optional, Sequence

import numpy as np

from protein_ensemble_vae_tpu.config import AA_ORDER
from protein_ensemble_vae_tpu.data.dataset import ESM_GROUP


def helix_backbone(L: int, rise: float = 1.5, radius: float = 2.3,
                   turn_deg: float = 100.0) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Idealized helix-like N/CA/C backbone, each [L, 3] (float32)."""
    t = np.arange(L) * turn_deg * np.pi / 180.0
    ca = np.stack([radius * np.cos(t), radius * np.sin(t), rise * np.arange(L)], -1)
    tang = np.gradient(ca, axis=0)
    tang /= np.linalg.norm(tang, axis=-1, keepdims=True) + 1e-9
    up = np.array([0.0, 0.0, 1.0])
    side = np.cross(tang, up)
    side /= np.linalg.norm(side, axis=-1, keepdims=True) + 1e-9
    n = ca - 1.46 * (0.8 * tang + 0.6 * side)
    c = ca + 1.52 * (0.8 * tang - 0.6 * side)
    return (n.astype(np.float32), ca.astype(np.float32), c.astype(np.float32))


def compact_backbone(L: int, seed: int = 0
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compact globular-like backbone: a helix wound around a slow random
    walk so Rg ~ 2.2 L^0.38 instead of an extended rod. More realistic
    reconstruction difficulty for convergence tests."""
    rng = np.random.default_rng(seed)
    # smooth random-walk axis with bounded extent
    steps = rng.normal(0, 1, (L, 3))
    for _ in range(3):
        steps[1:] = 0.7 * steps[1:] + 0.3 * steps[:-1]  # smooth
    axis = np.cumsum(steps, axis=0)
    axis -= axis.mean(axis=0)
    target_rg = 2.2 * (L ** 0.38)
    rg = np.sqrt((axis ** 2).sum(-1).mean())
    axis *= 0.8 * target_rg / max(rg, 1e-6)
    # local helical decoration at CA-CA ~ 3.8 A spacing along the path
    t = np.arange(L) * 100.0 * np.pi / 180.0
    ca = axis + np.stack([2.3 * np.cos(t), 2.3 * np.sin(t),
                          np.zeros(L)], -1)
    # renormalize consecutive CA spacing toward 3.8 A
    for it in range(9):
        d = np.diff(ca, axis=0)
        norm = np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
        # damped passes smooth the path; the final pass is exact so the
        # ground truth sits well inside the generation gate's 6.0 A max
        # CA-CA threshold (infer/gate.py) instead of marginally at ~5.6 A.
        scale = 3.8 / norm if it == 8 else (0.5 + 0.5 * 3.8 / norm)
        d = d * scale
        ca = np.concatenate([ca[:1], ca[:1] + np.cumsum(d, axis=0)], axis=0)
    tang = np.gradient(ca, axis=0)
    tang /= np.linalg.norm(tang, axis=-1, keepdims=True) + 1e-9
    ref = np.array([0.12, 0.85, 0.51])
    side = np.cross(tang, ref)
    side /= np.linalg.norm(side, axis=-1, keepdims=True) + 1e-9
    n = ca - 1.46 * (0.8 * tang + 0.6 * side)
    c = ca + 1.52 * (0.8 * tang - 0.6 * side)
    return (n.astype(np.float32), ca.astype(np.float32), c.astype(np.float32))


def _torsions_np(n, ca, c, mask):
    """Host-side torsion computation (numpy port of ops.geometry)."""
    import jax.numpy as jnp

    from protein_ensemble_vae_tpu.ops.geometry import dihedrals_from_coords

    d = dihedrals_from_coords(jnp.array(n[None]), jnp.array(ca[None]),
                              jnp.array(c[None]), jnp.array(mask[None]))
    return np.asarray(d[0])


def write_synthetic_h5(path: str, K: int = 5, L: int = 64, seed: int = 0,
                       noise: float = 0.3, seqemb_dim: Optional[int] = None,
                       mask_holes: Sequence[int] = (),
                       fold: str = "helix") -> str:
    """Write one synthetic protein ensemble H5 with the reference schema.
    fold: "helix" (extended rod) or "compact" (globular-like Rg)."""
    import h5py

    rng = np.random.default_rng(seed)
    if fold == "compact":
        n0, ca0, c0 = compact_backbone(L, seed=seed)
    else:
        n0, ca0, c0 = helix_backbone(L)
    mask = np.ones(L, np.float32)
    for h in mask_holes:
        mask[h] = 0.0

    coords_n = np.zeros((K, L, 3), np.float32)
    coords_ca = np.zeros((K, L, 3), np.float32)
    coords_c = np.zeros((K, L, 3), np.float32)
    phi = np.zeros((K, L, 2), np.float32)
    psi = np.zeros((K, L, 2), np.float32)
    omega = np.zeros((K, L, 2), np.float32)
    for k in range(K):
        d = rng.normal(0, noise, (L, 3)).astype(np.float32)
        coords_n[k] = n0 + d
        coords_ca[k] = ca0 + d
        coords_c[k] = c0 + d
        dih = _torsions_np(coords_n[k], coords_ca[k], coords_c[k], mask)
        phi[k] = dih[:, 0:2]
        psi[k] = dih[:, 2:4]
        omega[k] = dih[:, 4:6]

    sequence = "".join(rng.choice(list(AA_ORDER), L))

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as fh:
        fh.create_dataset("coords_N", data=coords_n)
        fh.create_dataset("coords_ca", data=coords_ca)
        fh.create_dataset("coords_C", data=coords_c)
        fh.create_dataset("mask_ca", data=np.tile(mask, (K, 1)))
        fh.create_dataset("torsion_phi_sincos", data=phi)
        fh.create_dataset("torsion_psi_sincos", data=psi)
        fh.create_dataset("torsion_omega_sincos", data=omega)
        fh.create_dataset("sequence", data=sequence)
        if seqemb_dim:
            emb = rng.normal(0, 1, (L, seqemb_dim)).astype(np.float32)
            fh.create_dataset(ESM_GROUP, data=emb, compression="gzip")
    return path


def make_synthetic_dataset(root: str, n_proteins: int = 2, K: int = 4,
                           lengths: Sequence[int] = (48, 64),
                           seqemb_dim: Optional[int] = 32,
                           seed: int = 0, fold: str = "helix",
                           noise: float = 0.3) -> tuple[str, str]:
    """Write n_proteins H5 files + train/val manifests; returns their paths."""
    os.makedirs(root, exist_ok=True)
    h5_paths = []
    for i in range(n_proteins):
        L = lengths[i % len(lengths)]
        p = os.path.join(root, f"syn{i:03d}_nmr.h5")
        write_synthetic_h5(p, K=K, L=L, seed=seed + i, seqemb_dim=seqemb_dim,
                           fold=fold, noise=noise)
        h5_paths.append(p)

    train_csv = os.path.join(root, "manifest_train.csv")
    val_csv = os.path.join(root, "manifest_val.csv")
    for csv_path, paths in ((train_csv, h5_paths), (val_csv, h5_paths[:1])):
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["h5_path"])
            for p in paths:
                w.writerow([p])
    return train_csv, val_csv
