"""Pure-JAX geometry substrate.

Jittable re-implementations of the mathematical formulas the reference
implements in torch (``models/losses.py``, ``scripts/prepare_data.py:222-327``,
``scripts/validation_metrics.py:57-85``). Everything is mask-aware, static
shape, and differentiable-safe (no sqrt/acos/normalize NaN gradients at
degenerate points — torch defines subgradients there, raw XLA does not, so we
guard with epsilons that change values by < 1e-6 Å).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-8
_TINY = 1e-20


def safe_norm(x: Array, axis: int = -1, keepdims: bool = False) -> Array:
    """L2 norm with a NaN-free gradient at 0 (replaces ``torch.norm``)."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)
    return jnp.sqrt(sq + _TINY)


def safe_normalize(x: Array, axis: int = -1, eps: float = 1e-4) -> Array:
    """Unit vectors with torch.nn.functional.normalize semantics
    (``x / max(||x||, eps)``).

    eps default is 1e-4 (torch uses 1e-12): sub-1e-4 direction vectors get
    scaled toward zero instead of normalized, which bounds the backward at
    1/eps = 1e4 and prevents fp32 gradient overflow for degenerate
    predictions. Any real direction head output is O(0.1-1)."""
    n = safe_norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def masked_mean(x: Array, mask: Array, axis=None, eps: float = 0.0) -> Array:
    """Sum(x * mask) / sum(mask) with an optional reference-matching eps."""
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.sum(mask, axis=axis)
    if eps:
        return num / (den + eps)
    return num / jnp.maximum(den, 1.0)


def pairwise_distances(a: Array, b: Array) -> Array:
    """Euclidean cdist: a [..., M, 3], b [..., N, 3] -> [..., M, N].

    Direct-difference formulation (not the matmul trick) for accuracy parity
    with ``torch.cdist`` at protein scales; NaN-safe gradient at d = 0.
    """
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + 1e-12)


# ---------------------------------------------------------------------------
# Dihedrals
# ---------------------------------------------------------------------------

# Degeneracy floor for normalization denominators inside torsion/angle math.
# Values far below any real molecular geometry (plane-normal norms are
# ~1-3 Å² for an actual backbone) but large enough that the backward-pass
# chain of divisions stays far from fp32 overflow. With the reference's
# raw +1e-8 denominators, near-collinear *predicted* coordinates produce
# ~1e8-scale local derivatives whose products overflow to inf -> NaN — the
# exact failure mode the reference's "Training collapsed - NaN detected"
# guard (training.py:136-146) aborts on. We bound instead of aborting.
_DEGEN = 1e-4


def dihedral_from_four(p0: Array, p1: Array, p2: Array, p3: Array,
                       eps: float = _EPS) -> tuple[Array, Array]:
    """Torsion angle defined by four points -> (sin, cos), each [...].

    Mirrors reference ``losses.py:158-232``: plane normals from cross
    products, cos clamped into (−1+eps, 1−eps), sin from the sign of the
    mixed product; degenerate (collinear) cases return (0, 1). Denominators
    are floored at ``_DEGEN`` for bounded gradients (see above); outputs
    only deviate from the reference for plane normals below 1e-4 Å², which
    cannot occur for real geometry.
    """
    b1 = p1 - p0
    b2 = p2 - p1
    b3 = p3 - p2

    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)

    n1_norm = safe_norm(n1, keepdims=True)
    n2_norm = safe_norm(n2, keepdims=True)
    valid = (n1_norm[..., 0] > eps) & (n2_norm[..., 0] > eps)

    n1_u = jnp.where(valid[..., None], n1 / jnp.maximum(n1_norm + eps, _DEGEN), 0.0)
    n2_u = jnp.where(valid[..., None], n2 / jnp.maximum(n2_norm + eps, _DEGEN), 0.0)
    b2_norm = safe_norm(b2, keepdims=True)
    b2_u = jnp.where(valid[..., None], b2 / jnp.maximum(b2_norm + eps, _DEGEN), 0.0)

    # The reference computes sin = sign(mixed)*sqrt(1 - cos^2 + eps) with cos
    # clipped to 1-1e-8 (losses.py:218-226). In fp32 that clip is a no-op
    # (1 - 1e-8 rounds to 1.0) and the sign/sqrt construction NaNs in fused
    # backward passes for near-planar torsions (omega ~ 0 after the peptide
    # projection). Equivalent smooth form: sin and cos are just the two
    # components of the same rotation, so self-normalize the pair —
    # identical values for valid geometry, bounded gradients everywhere.
    c_raw = jnp.sum(n1_u * n2_u, axis=-1)
    s_raw = jnp.sum(jnp.cross(n1_u, n2_u) * b2_u, axis=-1)
    r = jnp.sqrt(jnp.square(s_raw) + jnp.square(c_raw) + eps)
    sin_a = s_raw / jnp.maximum(r, eps)
    cos_a = c_raw / jnp.maximum(r, eps)

    sin_out = jnp.where(valid, sin_a, 0.0)
    cos_out = jnp.where(valid, cos_a, 1.0)
    return sin_out, cos_out


def dihedrals_from_coords(n: Array, ca: Array, c: Array, mask: Array) -> Array:
    """TRUE backbone phi/psi/omega from N/CA/C -> [B, L, 6] sin/cos.

    Layout matches reference ``losses.py:235-308``:
      [:, i, 0:2] = phi(i)   from C(i-1), N(i), CA(i), C(i)     (i >= 1)
      [:, i, 2:4] = psi(i)   from N(i), CA(i), C(i), N(i+1)     (i <= L-2)
      [:, i, 4:6] = omega(i) from CA(i-1), C(i-1), N(i), CA(i)  (i >= 1)
    Undefined or pair-invalid positions are (0, 0).
    """
    B, L, _ = ca.shape
    out = jnp.zeros((B, L, 6), dtype=ca.dtype)
    if L < 2:
        return out

    m = mask.astype(bool)
    pair = m[:, :-1] & m[:, 1:]

    phi_sin, phi_cos = dihedral_from_four(c[:, :-1], n[:, 1:], ca[:, 1:], c[:, 1:])
    out = out.at[:, 1:, 0].set(jnp.where(pair, phi_sin, 0.0))
    out = out.at[:, 1:, 1].set(jnp.where(pair, phi_cos, 0.0))

    psi_sin, psi_cos = dihedral_from_four(n[:, :-1], ca[:, :-1], c[:, :-1], n[:, 1:])
    out = out.at[:, :-1, 2].set(jnp.where(pair, psi_sin, 0.0))
    out = out.at[:, :-1, 3].set(jnp.where(pair, psi_cos, 0.0))

    om_sin, om_cos = dihedral_from_four(ca[:, :-1], c[:, :-1], n[:, 1:], ca[:, 1:])
    out = out.at[:, 1:, 4].set(jnp.where(pair, om_sin, 0.0))
    out = out.at[:, 1:, 5].set(jnp.where(pair, om_cos, 0.0))
    return out


def angle_cos(a: Array, b: Array, c: Array, eps: float = _EPS) -> Array:
    """cos of the angle A-B-C at vertex B, clipped to [-1, 1]
    (reference ``losses.py:358-368``; denominators floored at ``_DEGEN``
    for bounded gradients — real bond vectors are ~1.5 Å)."""
    ba = a - b
    bc = c - b
    ba = ba / jnp.maximum(safe_norm(ba, keepdims=True) + eps, _DEGEN)
    bc = bc / jnp.maximum(safe_norm(bc, keepdims=True) + eps, _DEGEN)
    return jnp.clip(jnp.sum(ba * bc, axis=-1), -1.0, 1.0)


def wrap_angle(x: Array) -> Array:
    """Wrap to (-pi, pi] (reference ``losses.py:133-134``)."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def safe_atan2(y: Array, x: Array) -> Array:
    """atan2 with a finite gradient at (0, 0).

    Undefined torsions are stored as (sin, cos) = (0, 0)
    (``dihedrals_from_coords``); raw atan2 returns 0 there but its gradient
    is 0/0 = NaN, which poisons the whole backward pass even when the value
    is later masked (NaN * 0 = NaN). Substitute x = 1 at exactly-(0,0)
    points: same forward value (atan2(0, 1) = 0), zero gradient.
    """
    both_zero = (jnp.abs(x) + jnp.abs(y)) < 1e-12
    x_safe = jnp.where(both_zero, 1.0, x)
    y_safe = jnp.where(both_zero, 0.0, y)
    return jnp.arctan2(y_safe, x_safe)


# ---------------------------------------------------------------------------
# Kabsch superposition
# ---------------------------------------------------------------------------

def kabsch_align(P: Array, Q: Array, mask: Array | None = None) -> Array:
    """Optimally rotate+translate P onto Q (both [L, 3]); returns aligned P.

    Standard Kabsch via SVD with reflection fix (reference
    ``scripts/validation_metrics.py:57-85``). ``mask`` [L] restricts the fit
    to valid residues while transforming all points.
    """
    if mask is None:
        w = jnp.ones(P.shape[0], dtype=P.dtype)
    else:
        w = mask.astype(P.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    p_cent = jnp.sum(P * w[:, None], axis=0) / wsum
    q_cent = jnp.sum(Q * w[:, None], axis=0) / wsum
    Pc = (P - p_cent) * w[:, None]
    Qc = (Q - q_cent) * w[:, None]

    H = Pc.T @ Qc
    U, _, Vt = jnp.linalg.svd(H, full_matrices=False)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=P.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    return (P - p_cent) @ R.T + q_cent


def kabsch_rmsd(P: Array, Q: Array, mask: Array | None = None) -> Array:
    """RMSD after optimal superposition; masked residues excluded."""
    P_aln = kabsch_align(P, Q, mask)
    sq = jnp.sum(jnp.square(P_aln - Q), axis=-1)
    if mask is None:
        return jnp.sqrt(jnp.mean(sq))
    w = mask.astype(P.dtype)
    return jnp.sqrt(jnp.sum(sq * w) / jnp.maximum(jnp.sum(w), 1.0))


def pairwise_kabsch_rmsd(X: Array, mask: Array | None = None) -> Array:
    """[K, L, 3] ensemble -> [K, K] RMSD matrix, one vmapped Kabsch battery.

    Replaces the O(K^2) Python loops in the reference
    (``validation_metrics.py:324-349``, ``prepare_data.py:25-45``).
    """
    X = jnp.asarray(X)   # numpy input would reject traced vmap indices
    K = X.shape[0]

    def rij(i, j):
        return kabsch_rmsd(X[i], X[j], mask)

    ii, jj = jnp.meshgrid(jnp.arange(K), jnp.arange(K), indexing="ij")
    flat = jax.vmap(rij)(ii.reshape(-1), jj.reshape(-1))
    return flat.reshape(K, K)


# ---------------------------------------------------------------------------
# Mask compaction (replaces the reference's per-sample masked_select,
# en_gnn_decoder.py:216-229, with an XLA-friendly permutation)
# ---------------------------------------------------------------------------

def compact_valid(mask: Array) -> tuple[Array, Array, Array]:
    """Stable valid-first permutation per batch row.

    mask [B, L] (0/1) -> (pos, inv_pos, cmask):
      pos  [B, L] original index of the r-th valid residue (invalid at tail)
      inv_pos [B, L] inverse permutation (for scattering back)
      cmask [B, L] compacted validity = 1 for r < n_valid

    ``take_along_axis(x, pos)`` yields the compacted sequence the reference
    builds with ``torch.nonzero`` + indexing; the |i−j| ≤ W window graph on
    compacted indices is then exactly the reference's graph over valid
    residues.
    """
    L = mask.shape[-1]
    # stable argsort of (1 - mask): valid residues first, original order kept
    key = (1.0 - mask.astype(jnp.float32)) * (L + 1) + jnp.arange(L, dtype=jnp.float32)
    pos = jnp.argsort(key, axis=-1).astype(jnp.int32)
    inv_pos = jnp.argsort(pos, axis=-1).astype(jnp.int32)
    cmask = jnp.take_along_axis(mask.astype(jnp.float32), pos, axis=-1)
    return pos, inv_pos, cmask


def scatter_compact(x: Array, inv_pos: Array, mask: Array) -> Array:
    """Undo ``compact_valid``: gather with the inverse permutation and zero
    padded positions. x [B, L, ...], inv_pos [B, L], mask [B, L]."""
    idx = inv_pos.reshape(inv_pos.shape + (1,) * (x.ndim - 2))
    idx = jnp.broadcast_to(idx, inv_pos.shape + x.shape[2:])
    out = jnp.take_along_axis(x, idx, axis=1)
    m = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
    return out * m.astype(x.dtype)
