"""Ensemble alignment utilities for dataset preparation.

- ``medoid_index``: medoid conformer by pairwise Kabsch RMSD — one vmapped
  battery instead of the reference's O(K²) Python loop (prepare_data.py:25-59)
- ``core_fit_align``: medoid -> per-residue-variance core detection ->
  realign all conformers on the core (prepare_data.py:62-133,896-922)
- ``compute_rmsf_ensemble``: per-residue RMSF after alignment
- ``needleman_wunsch``: global alignment with BLOSUM62 for cross-PDB
  conformer mapping (prepare_data.py:557-824 uses pairwise2.global*)
"""

from __future__ import annotations

import numpy as np

# BLOSUM62 over the canonical 20 AAs (public substitution matrix).
_AA = "ARNDCQEGHILKMFPSTWYV"
_B62 = """
 4 -1 -2 -2  0 -1 -1  0 -2 -1 -1 -1 -1 -2 -1  1  0 -3 -2  0
-1  5  0 -2 -3  1  0 -2  0 -3 -2  2 -1 -3 -2 -1 -1 -3 -2 -3
-2  0  6  1 -3  0  0  0  1 -3 -3  0 -2 -3 -2  1  0 -4 -2 -3
-2 -2  1  6 -3  0  2 -1 -1 -3 -4 -1 -3 -3 -1  0 -1 -4 -3 -3
 0 -3 -3 -3  9 -3 -4 -3 -3 -1 -1 -3 -1 -2 -3 -1 -1 -2 -2 -1
-1  1  0  0 -3  5  2 -2  0 -3 -2  1  0 -3 -1  0 -1 -2 -1 -2
-1  0  0  2 -4  2  5 -2  0 -3 -3  1 -2 -3 -1  0 -1 -3 -2 -2
 0 -2  0 -1 -3 -2 -2  6 -2 -4 -4 -2 -3 -3 -2  0 -2 -2 -3 -3
-2  0  1 -1 -3  0  0 -2  8 -3 -3 -1 -2 -1 -2 -1 -2 -2  2 -3
-1 -3 -3 -3 -1 -3 -3 -4 -3  4  2 -3  1  0 -3 -2 -1 -3 -1  3
-1 -2 -3 -4 -1 -2 -3 -4 -3  2  4 -2  2  0 -3 -2 -1 -2 -1  1
-1  2  0 -1 -3  1  1 -2 -1 -3 -2  5 -1 -3 -1  0 -1 -3 -2 -2
-1 -1 -2 -3 -1  0 -2 -3 -2  1  2 -1  5  0 -2 -1 -1 -1 -1  1
-2 -3 -3 -3 -2 -3 -3 -3 -1  0  0 -3  0  6 -4 -2 -2  1  3 -1
-1 -2 -2 -1 -3 -1 -1 -2 -2 -3 -3 -1 -2 -4  7 -1 -1 -4 -3 -2
 1 -1  1  0 -1  0  0  0 -1 -2 -2  0 -1 -2 -1  4  1 -3 -2 -2
 0 -1  0 -1 -1 -1 -1 -2 -2 -1 -1 -1 -1 -2 -1  1  5 -2 -2  0
-3 -3 -4 -4 -2 -2 -3 -2 -2 -3 -2 -3 -1  1 -4 -3 -2 11  2 -3
-2 -2 -2 -3 -2 -1 -2 -3  2 -1 -1 -2 -1  3 -3 -2 -2  2  7 -1
 0 -3 -3 -3 -1 -2 -2 -3 -3  3  1 -2  1 -1 -2 -2  0 -3 -1  4
"""
BLOSUM62 = {(_AA[i], _AA[j]): int(v)
            for i, row in enumerate(_B62.strip().split("\n"))
            for j, v in enumerate(row.split())}


def _kabsch_rt(P: np.ndarray, Q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Rotation R and translation t such that P @ R.T + t ~= Q."""
    pc, qc = P.mean(0), Q.mean(0)
    H = (P - pc).T @ (Q - qc)
    U, _, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        Vt = Vt.copy()
        Vt[-1] *= -1
        R = Vt.T @ U.T
    return R, qc - pc @ R.T


def _kabsch_rmsd_np(P: np.ndarray, Q: np.ndarray) -> float:
    R, t = _kabsch_rt(P, Q)
    return float(np.sqrt(((P @ R.T + t - Q) ** 2).sum(-1).mean()))


def medoid_index(coords: np.ndarray, mask: np.ndarray) -> int:
    """Index of the conformer minimizing summed RMSD to all others.

    coords [K, L, 3], mask [K, L]; the fit uses residues valid in *all*
    models (the reference aligns on shared-valid residues).
    """
    K = coords.shape[0]
    if K == 1:
        return 0
    shared = (mask > 0.5).all(axis=0)
    if shared.sum() < 3:
        return 0
    X = coords[:, shared]
    D = np.zeros((K, K), np.float64)
    for i in range(K):
        for j in range(i + 1, K):
            D[i, j] = D[j, i] = _kabsch_rmsd_np(X[i], X[j])
    return int(D.sum(axis=1).argmin())


def detect_core(coords_aligned: np.ndarray, shared: np.ndarray,
                frac: float = 0.5) -> np.ndarray:
    """Core = the ``frac`` fraction of shared residues with the lowest
    per-residue positional variance across aligned conformers."""
    var = coords_aligned.var(axis=0).sum(-1)            # [L]
    var = np.where(shared, var, np.inf)
    n_core = max(int(shared.sum() * frac), min(3, int(shared.sum())))
    order = np.argsort(var)
    core = np.zeros(coords_aligned.shape[1], bool)
    core[order[:n_core]] = True
    return core


def core_fit_align(coords_n: np.ndarray, coords_ca: np.ndarray,
                   coords_c: np.ndarray, mask: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray, int, np.ndarray]:
    """Medoid -> align all on shared residues -> detect low-variance core ->
    realign on core. Returns (n, ca, c, medoid_idx, core_mask)."""
    K = coords_ca.shape[0]
    med = medoid_index(coords_ca, mask)
    shared = (mask > 0.5).all(axis=0)
    n, ca, c = coords_n.copy(), coords_ca.copy(), coords_c.copy()
    if shared.sum() >= 3:
        # pass 1: align every conformer's shared-CA onto the medoid
        for k in range(K):
            if k == med:
                continue
            R, t = _kabsch_rt(ca[k][shared], ca[med][shared])
            for arr in (n, ca, c):
                arr[k] = arr[k] @ R.T + t
        # pass 2: core detection + realign
        core = detect_core(ca, shared)
        if core.sum() >= 3:
            for k in range(K):
                if k == med:
                    continue
                R, t = _kabsch_rt(ca[k][core], ca[med][core])
                for arr in (n, ca, c):
                    arr[k] = arr[k] @ R.T + t
    else:
        core = shared
    return n, ca, c, med, core


def compute_rmsf_ensemble(coords_ca: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per-residue RMSF of the (already aligned) ensemble; invalid -> 0."""
    valid_any = (mask > 0.5).any(axis=0)
    mean = coords_ca.mean(axis=0)
    dev = ((coords_ca - mean) ** 2).sum(-1).mean(axis=0)
    return np.where(valid_any, np.sqrt(dev), 0.0).astype(np.float32)


def needleman_wunsch(a: str, b: str, gap_open: float = -10.0,
                     gap_extend: float = -0.5
                     ) -> tuple[float, list[tuple[int, int]]]:
    """Global alignment with BLOSUM62 + affine-ish gaps (simplified to
    linear with open cost on first gap column). Returns (score, list of
    aligned index pairs (i, j))."""
    n, m = len(a), len(b)
    NEG = -1e9
    score = np.full((n + 1, m + 1), 0.0)
    ptr = np.zeros((n + 1, m + 1), np.int8)  # 0 diag, 1 up(a gap in b), 2 left
    for i in range(1, n + 1):
        score[i, 0] = gap_open + gap_extend * (i - 1)
        ptr[i, 0] = 1
    for j in range(1, m + 1):
        score[0, j] = gap_open + gap_extend * (j - 1)
        ptr[0, j] = 2
    for i in range(1, n + 1):
        ai = a[i - 1]
        for j in range(1, m + 1):
            s = BLOSUM62.get((ai, b[j - 1]), -4)
            diag = score[i - 1, j - 1] + s
            up = score[i - 1, j] + (gap_extend if ptr[i - 1, j] == 1 else gap_open)
            left = score[i, j - 1] + (gap_extend if ptr[i, j - 1] == 2 else gap_open)
            best = max(diag, up, left)
            score[i, j] = best
            ptr[i, j] = 0 if best == diag else (1 if best == up else 2)
    pairs = []
    i, j = n, m
    while i > 0 or j > 0:
        p = ptr[i, j]
        if i > 0 and j > 0 and p == 0:
            pairs.append((i - 1, j - 1))
            i -= 1
            j -= 1
        elif i > 0 and (p == 1 or j == 0):
            i -= 1
        else:
            j -= 1
    pairs.reverse()
    return float(score[n, m]), pairs


def alignment_identity_coverage(a: str, b: str,
                                pairs: list[tuple[int, int]]
                                ) -> tuple[float, float]:
    """(identity over aligned pairs, coverage of sequence a)."""
    if not pairs:
        return 0.0, 0.0
    ident = sum(1 for i, j in pairs if a[i] == b[j]) / len(pairs)
    cov = len(pairs) / max(len(a), 1)
    return ident, cov
