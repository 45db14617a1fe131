"""The physics-loss battery, as fused jittable JAX functions.

Numerically parity-matched against reference ``models/losses.py`` (same
formulas, same masked-mean denominator conventions — note these deliberately
differ per loss in the reference: plain ``mask.sum()`` at losses.py:19,37,57,
131, ``+1e-8`` at :435,514). ``compute_total_loss`` returns the same 16-key
dict (losses.py:596-613) so dashboards/plotters port unchanged.

Differentiability: raw XLA gives NaN gradients for sqrt/acos at degenerate
points where torch defines subgradients; every such site here is
epsilon-guarded (values change by < 1e-6).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from protein_ensemble_vae_tpu.config import LossWeights
from protein_ensemble_vae_tpu.ops.geometry import (
    angle_cos,
    safe_atan2,
    dihedrals_from_coords,
    masked_mean,
    pairwise_distances,
    safe_norm,
    wrap_angle,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Reconstruction
# ---------------------------------------------------------------------------

def rmsd_loss(pred: Array, target: Array, mask: Array) -> Array:
    """Masked per-residue coordinate MSE in Å² (reference losses.py:12-21 —
    MSE, not RMSD, despite the name; no Kabsch alignment)."""
    diff = jnp.sum(jnp.square(pred - target), axis=-1)          # [B, L]
    per_sample = jnp.sum(diff * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    return jnp.mean(per_sample)


def pair_distance_loss(pred: Array, target: Array, mask: Array,
                       stride: int = 4) -> Array:
    """Strided pairwise-distance consistency (losses.py:24-37)."""
    P = pred[:, ::stride, :]
    T = target[:, ::stride, :]
    m = mask[:, ::stride]
    M = m[:, :, None] * m[:, None, :]
    dP = pairwise_distances(P, P)
    dT = pairwise_distances(T, T)
    return jnp.sum(jnp.abs(dP - dT) * M) / jnp.maximum(jnp.sum(M), 1.0)


# ---------------------------------------------------------------------------
# KL divergences
# ---------------------------------------------------------------------------

def _kl_unit_gauss(mu: Array, lv: Array) -> Array:
    return 0.5 * (jnp.exp(lv) + jnp.square(mu) - 1.0 - lv)


def kl_global(mu: Array, lv: Array) -> Array:
    """Mean over batch of per-sample summed KL (losses.py:49-51)."""
    return jnp.mean(jnp.sum(_kl_unit_gauss(mu, lv), axis=1))


def kl_local(mu: Array, lv: Array, mask: Array) -> Array:
    """Masked mean over residues of per-residue summed KL (losses.py:54-57)."""
    kl = jnp.sum(_kl_unit_gauss(mu, lv), axis=-1)               # [B, L]
    return jnp.sum(kl * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def free_bits_kl(mu: Array, lv: Array, mask: Optional[Array] = None,
                 free_bits: float = 2.0, min_kl: float = 0.0,
                 reduce: str = "mean") -> Array:
    """KL with a per-dimension floor (free bits), mask-aware.

    The reference ships this as ``FreeBitsKLLoss`` (kl_schedulers.py:267-337)
    but never invokes it; provided here as a working alternative KL path.
    """
    kl = _kl_unit_gauss(mu, lv)
    if free_bits > 0:
        kl = jnp.maximum(kl, free_bits)
    if min_kl > 0:
        kl = jnp.maximum(kl, min_kl)
    kl = jnp.sum(kl, axis=-1)
    if mask is not None:
        kl = kl * mask
        if reduce == "mean":
            return jnp.sum(kl) / jnp.maximum(jnp.sum(mask), 1.0)
        if reduce == "sum":
            return jnp.sum(kl)
        return kl
    if reduce == "mean":
        return jnp.mean(kl)
    if reduce == "sum":
        return jnp.sum(kl)
    return kl


# ---------------------------------------------------------------------------
# Torsion-space terms
# ---------------------------------------------------------------------------

def dihedral_consistency_loss(pred_dih: Array, target_dih: Array,
                              mask: Array) -> Array:
    """Finite-guarded MSE over all sin/cos channels (losses.py:60-69).

    Denominator = count of valid *elements* (B·L·6 scale), matching the
    reference's ``valid.float().sum()``.
    """
    valid = (mask[..., None].astype(bool)
             & jnp.isfinite(pred_dih) & jnp.isfinite(target_dih))
    diff = jnp.where(valid, pred_dih - target_dih, 0.0)
    den = jnp.maximum(jnp.sum(valid.astype(pred_dih.dtype)), 1.0)
    return jnp.sum(jnp.square(diff)) / den


def ramachandran_loss(dihedrals: Array, mask: Array) -> Array:
    """Four Gaussian allowed basins + forbidden-quadrant penalty
    (losses.py:72-131)."""
    phi = safe_atan2(dihedrals[..., 0], dihedrals[..., 1])
    psi = safe_atan2(dihedrals[..., 2], dihedrals[..., 3])

    alpha = jnp.exp(-((phi + 1.05) ** 2 / 0.6 + (psi + 0.79) ** 2 / 0.6))
    beta = jnp.exp(-((phi + 2.09) ** 2 / 0.9 + (psi - 2.09) ** 2 / 0.9))
    left_alpha = jnp.exp(-((phi - 1.05) ** 2 / 0.6 + (psi - 0.79) ** 2 / 0.6))
    ppii = jnp.exp(-((phi + 1.31) ** 2 / 0.5 + (psi - 2.53) ** 2 / 0.5))

    in_allowed = jnp.maximum(jnp.maximum(alpha, beta),
                             jnp.maximum(left_alpha, ppii))
    penalty = 1.0 - in_allowed
    forbidden = ((phi > 0) & (psi < 0)).astype(phi.dtype)
    total = penalty + 5.0 * forbidden
    return jnp.sum(total * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def omega_trans_loss(dihedrals: Array, mask: Array) -> Array:
    """Trans-peptide preference: 2·(1−cos(ω−π)) + 3·1[|wrap(ω)| < 0.5]
    (losses.py:136-155)."""
    omega = safe_atan2(dihedrals[..., 4], dihedrals[..., 5])
    trans_pen = 1.0 - jnp.cos(omega - math.pi)
    cis = (jnp.abs(wrap_angle(omega)) < 0.5).astype(omega.dtype)
    total = 2.0 * trans_pen + 3.0 * cis
    return jnp.sum(total * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ---------------------------------------------------------------------------
# Covalent-geometry terms
# ---------------------------------------------------------------------------

def huber(x: Array, delta: float = 0.2) -> Array:
    """Elementwise Huber (losses.py:311-316)."""
    ax = jnp.abs(x)
    return jnp.where(ax < delta, 0.5 * jnp.square(x), delta * (ax - 0.5 * delta))


def bond_length_loss(pred_n: Array, pred_ca: Array, pred_c: Array,
                     mask: Array, delta_scale: float = 1.0) -> Array:
    """Huber penalties on N-CA (1.46, δ=0.02), CA-C (1.52, δ=0.02) and 2× the
    inter-residue C-N peptide bond (1.33, δ=0.01) (losses.py:318-355).

    ``delta_scale`` (default 1.0 = reference parity) multiplies the huber
    deltas: at the reference values a 2 Å broken peptide bond sits deep in
    the linear tail and costs only ~0.02 loss units — the measured root
    cause of the 0 % geometry-gate pass rate on sampled conformers (both
    implementations, runs/h2h/gen_report.json)."""
    msum = jnp.maximum(jnp.sum(mask), 1.0)
    ds = delta_scale

    n_ca = safe_norm(pred_ca - pred_n) - 1.46
    p_n_ca = jnp.sum(huber(n_ca, 0.02 * ds) * mask) / msum

    ca_c = safe_norm(pred_c - pred_ca) - 1.52
    p_ca_c = jnp.sum(huber(ca_c, 0.02 * ds) * mask) / msum

    if pred_n.shape[1] > 1:
        c_n = safe_norm(pred_n[:, 1:] - pred_c[:, :-1]) - 1.33
        pair_mask = mask[:, :-1] * mask[:, 1:]
        p_c_n = jnp.sum(huber(c_n, 0.01 * ds) * pair_mask) / jnp.maximum(jnp.sum(pair_mask), 1.0)
    else:
        p_c_n = jnp.zeros((), dtype=pred_n.dtype)

    return p_n_ca + p_ca_c + 2.0 * p_c_n


CA_CA_VIRTUAL = 3.81


def ca_spacing_loss(pred_ca: Array, mask: Array,
                    delta: float = 0.5) -> Array:
    """Virtual CA(i)-CA(i+1) bond at 3.81 Å (trans-peptide spacing).

    Beyond-reference term (off by default, ``LossWeights.w_ca_spacing``):
    consecutive-CA spacing is exactly what the generation geometry gate
    checks (gate.py / reference generate_ensemble_pdbs.py:290-340), but no
    reference loss term constrains it directly — sampled conformers drift
    to 4.5-5.4 Å average spacing and fail the gate 100 % of the time."""
    if pred_ca.shape[1] < 2:
        return jnp.zeros((), dtype=pred_ca.dtype)
    d = safe_norm(pred_ca[:, 1:] - pred_ca[:, :-1]) - CA_CA_VIRTUAL
    pair_mask = mask[:, :-1] * mask[:, 1:]
    return (jnp.sum(huber(d, delta) * pair_mask)
            / jnp.maximum(jnp.sum(pair_mask), 1.0))


_TARGET_NCAC = 110.0 * math.pi / 180.0
_TARGET_CNCA = 121.0 * math.pi / 180.0
_TARGET_CACN = 116.0 * math.pi / 180.0
_ACOS_EPS = 1e-7


def _safe_acos(c: Array) -> Array:
    return jnp.arccos(jnp.clip(c, -1.0 + _ACOS_EPS, 1.0 - _ACOS_EPS))


def bond_angle_loss(pred_n: Array, pred_ca: Array, pred_c: Array,
                    mask: Array) -> Array:
    """Huber in angle space on N-CA-C / C-N-CA / CA-C-N, inter-residue terms
    ×2 (losses.py:371-408)."""
    mask = mask.astype(pred_ca.dtype)
    msum = jnp.maximum(jnp.sum(mask), 1.0)

    a_ncac = _safe_acos(angle_cos(pred_n, pred_ca, pred_c))
    l_ncac = jnp.sum(huber(a_ncac - _TARGET_NCAC, 0.1) * mask) / msum

    if pred_n.shape[1] > 1:
        pair = mask[:, :-1] * mask[:, 1:]
        psum = jnp.maximum(jnp.sum(pair), 1.0)

        a_cnca = _safe_acos(angle_cos(pred_c[:, :-1], pred_n[:, 1:], pred_ca[:, 1:]))
        l_cnca = jnp.sum(huber(a_cnca - _TARGET_CNCA, 0.1) * pair) / psum

        a_cacn = _safe_acos(angle_cos(pred_ca[:, :-1], pred_c[:, :-1], pred_n[:, 1:]))
        l_cacn = jnp.sum(huber(a_cacn - _TARGET_CACN, 0.1) * pair) / psum
    else:
        l_cnca = jnp.zeros((), dtype=pred_n.dtype)
        l_cacn = jnp.zeros((), dtype=pred_n.dtype)

    return l_ncac + 2.0 * (l_cnca + l_cacn)


# ---------------------------------------------------------------------------
# Sequence
# ---------------------------------------------------------------------------

def sequence_classification_loss(pred_logits: Array, target_labels: Array,
                                 mask: Array) -> Array:
    """Masked 20-way cross-entropy (losses.py:411-437; eps 1e-8 denominator)."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_labels[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    return jnp.sum(nll * mask) / (jnp.sum(mask) + 1e-8)


def sequence_accuracy(pred_logits: Array, target_labels: Array,
                      mask: Array) -> Array:
    """Masked argmax accuracy (training.py:107-110)."""
    pred = jnp.argmax(pred_logits, axis=-1)
    correct = (pred == target_labels) & mask.astype(bool)
    return jnp.sum(correct.astype(jnp.float32)) / jnp.maximum(jnp.sum(mask), 1.0)


# ---------------------------------------------------------------------------
# Clash
# ---------------------------------------------------------------------------

def clash_loss(pred_n: Array, pred_ca: Array, pred_c: Array, mask: Array,
               clash_dist: float = 3.2, soft_margin: float = 0.5) -> Array:
    """Steric-clash penalty over the full [B, 3L, 3L] distance matrix
    (losses.py:439-517). Pairs must be ≥ 2 residues apart; quadratic penalty
    on relu(clash_dist − d); per-sample normalization by pair count + 1e-8.

    A Pallas-blocked variant lives in ``ops.pallas.clash_kernel`` for long
    chains; this dense form is the parity reference and is fine at L ≤ 640.
    """
    B, L = pred_ca.shape[:2]
    atoms = jnp.stack([pred_n, pred_ca, pred_c], axis=2).reshape(B, L * 3, 3)
    atom_mask = jnp.repeat(mask, 3, axis=1)                      # [B, 3L]

    dists = pairwise_distances(atoms, atoms)                     # [B, 3L, 3L]

    res_idx = jnp.arange(L * 3) // 3
    res_sep = jnp.abs(res_idx[:, None] - res_idx[None, :])
    sep_mask = (res_sep >= 2).astype(pred_ca.dtype)
    triu = jnp.triu(jnp.ones((L * 3, L * 3), dtype=pred_ca.dtype), k=1)

    pair_mask = (atom_mask[:, :, None] * atom_mask[:, None, :]
                 * sep_mask[None] * triu[None])

    violations = jax.nn.relu(clash_dist - dists)
    penalty = jnp.where(violations < soft_margin,
                        0.5 * jnp.square(violations),
                        jnp.square(violations))
    total = jnp.sum(penalty * pair_mask, axis=(1, 2))
    num_pairs = jnp.sum(pair_mask, axis=(1, 2))
    return jnp.mean(total / (num_pairs + 1e-8))


# Probe/MolProbity van der Waals radii for the decoded backbone atoms
# (Word et al. 1999): amide N 1.55, aliphatic CA 1.70, carbonyl C 1.65,
# carbonyl O 1.40 Å. Must match eval.analyze._VDW_RADII so the loss
# optimizes the same event the metric counts.
_VDW_N_CA_C = (1.55, 1.70, 1.65)
_VDW_O = 1.40
# bond-graph distances to/from the residue's junction atoms (N-CA, CA-C,
# C-O in-residue bonds + the C(i)-N(i+1) peptide bond): steps from each
# atom type to its residue's C, and from N to each atom type
_STEPS_TO_C = (2, 1, 0, 1)     # N, CA, C, O
_STEPS_FROM_N = (0, 1, 2, 3)   # N, CA, C, O


def carbonyl_oxygen(pred_n: Array, pred_ca: Array, pred_c: Array,
                    mask: Array) -> Array:
    """Differentiable sp²-plane carbonyl O: O(i) = C(i) − 1.23 Å ·
    unit(unit(CA(i)−C(i)) + unit(N(i+1)−C(i))) — the same placement
    ``infer.pdb_io.compute_backbone_oxygen`` writes to PDB, so a loss
    over these O positions optimizes the atoms the analyzer scores.
    Last/next-invalid residues substitute their own N (terminal
    carboxylate). Denominators floored for bounded gradients."""
    from protein_ensemble_vae_tpu.config import BOND_C_O

    def _unit(v):
        return v / jnp.maximum(safe_norm(v, keepdims=True), 1e-4)

    v1 = _unit(pred_ca - pred_c)
    nxt = jnp.concatenate([pred_n[:, 1:], pred_n[:, -1:]], axis=1)
    next_ok = jnp.concatenate(
        [mask[:, 1:] > 0.5, jnp.zeros_like(mask[:, :1], bool)], axis=1)
    v2 = _unit(jnp.where(next_ok[..., None], nxt, pred_n) - pred_c)
    bis = _unit(v1 + v2)
    return (pred_c - bis * BOND_C_O) * mask[..., None]


def vdw_clash_loss(pred_n: Array, pred_ca: Array, pred_c: Array, mask: Array,
                   count_overlap: float = 0.4, buffer: float = 0.1,
                   include_o: bool = False) -> Array:
    """Differentiable surrogate of the MolProbity backbone clashscore.

    Beyond-reference term (off by default, ``LossWeights.w_clash_vdw``).
    The reference's ``clash_loss`` (losses.py:439-517) penalizes d < 3.2 Å
    uniformly for pairs ≥ 2 residues apart — a DIFFERENT event from the
    MolProbity clashscore the BASELINE "<20" target counts (van der Waals
    overlap ≥ 0.4 Å with Probe radii, 1-2/1-3/1-4 bonded pairs excluded);
    VERDICT r4 weak #7. This term penalizes exactly the scored event:

      penalty_ij = relu((r_i + r_j − count_overlap + buffer) − d_ij)²

    over the same pair set as ``eval.analyze.molprobity_clashscore``. With
    the backbone bond graph N−CA, CA−C, C(i)−N(i+1), the >3-bond pair set
    is: all pairs ≥ 2 residues apart, plus the adjacent-residue pairs whose
    earlier-residue atom type precedes the later-residue atom type in
    (N, CA, C) order — i.e. N(i)·CA(i+1) (4 bonds), CA(i)·C(i+1) (4),
    N(i)·C(i+1) (5); verified against the scorer's BFS exclusions in
    tests/test_losses.py. ``buffer`` pushes pairs a margin PAST the 0.4 Å
    counting threshold so a converged loss leaves no borderline clashes.
    Normalization mirrors ``clash_loss`` (per-sample pair-count mean).

    ``include_o=True`` additionally places the carbonyl O differentiably
    (``carbonyl_oxygen``, the exact atoms the PDB writer emits and the
    analyzer scores) and extends the pair set to the 4-atom bond graph —
    with Probe's H-bond allowance: donor–acceptor N···O pairs only
    penalize overlap past 0.8 Å, matching
    ``eval.analyze.molprobity_clashscore`` (round-5 finding: without the
    allowance, every helix H-bond counts as a clash).
    """
    B, L = pred_ca.shape[:2]
    P = 4 if include_o else 3
    parts = [pred_n, pred_ca, pred_c]
    radii_t = _VDW_N_CA_C + ((_VDW_O,) if include_o else ())
    if include_o:
        parts.append(carbonyl_oxygen(pred_n, pred_ca, pred_c, mask))
    atoms = jnp.stack(parts, axis=2).reshape(B, L * P, 3)
    atom_mask = jnp.repeat(mask, P, axis=1)                      # [B, PL]

    dists = pairwise_distances(atoms, atoms)                     # [B, PL, PL]

    idx = jnp.arange(L * P)
    res_idx, atom_t = idx // P, idx % P
    sep = jnp.abs(res_idx[:, None] - res_idx[None, :])
    # adjacent-residue pairs > 3 covalent bonds apart, via the closed-form
    # bond distance steps_to_C(earlier) + 1 + steps_from_N(later) (for
    # N/CA/C this reduces to the earlier-type < later-type rule)
    earlier_t = jnp.where(res_idx[:, None] <= res_idx[None, :],
                          atom_t[:, None], atom_t[None, :])
    later_t = jnp.where(res_idx[:, None] <= res_idx[None, :],
                        atom_t[None, :], atom_t[:, None])
    s_to_c = jnp.asarray(_STEPS_TO_C[:P])
    s_from_n = jnp.asarray(_STEPS_FROM_N[:P])
    adj_bonds = s_to_c[earlier_t] + 1 + s_from_n[later_t]
    adj_counted = (sep == 1) & (adj_bonds >= 4)
    counted = ((sep >= 2) | adj_counted).astype(pred_ca.dtype)
    triu = jnp.triu(jnp.ones((L * P, L * P), dtype=pred_ca.dtype), k=1)
    pair_mask = (atom_mask[:, :, None] * atom_mask[:, None, :]
                 * counted[None] * triu[None])

    radii = jnp.tile(jnp.asarray(radii_t, dtype=pred_ca.dtype), L)
    co = jnp.full((L * P, L * P), count_overlap, dtype=pred_ca.dtype)
    if include_o:
        is_n, is_o = atom_t == 0, atom_t == 3
        hb = (is_n[:, None] & is_o[None, :]) | (is_o[:, None] & is_n[None, :])
        co = jnp.where(hb, jnp.maximum(0.8, count_overlap), co)
    thresh = radii[:, None] + radii[None, :] - co + buffer
    violation = jax.nn.relu(thresh - dists)
    total = jnp.sum(jnp.square(violation) * pair_mask, axis=(1, 2))
    num_pairs = jnp.sum(pair_mask, axis=(1, 2))
    return jnp.mean(total / (num_pairs + 1e-8))


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------

def compute_total_loss(pred_n: Array, pred_ca: Array, pred_c: Array,
                       pred_seq: Array,
                       target_n: Array, target_ca: Array, target_c: Array,
                       target_seq_labels: Array,
                       mask: Array,
                       mu_g: Array, lv_g: Array, mu_l: Array, lv_l: Array,
                       target_dihedrals: Array,
                       klw_g: Array, klw_l: Array,
                       weights: LossWeights,
                       use_pallas: object = "auto") -> dict[str, Array]:
    """Weighted sum of all terms; same structure and dict keys as reference
    losses.py:520-613. ``klw_g``/``klw_l`` are the *scheduled* KL weights and
    may be traced scalars (so annealing doesn't retrigger compilation).

    ``use_pallas`` (True|False|"auto") follows the model's
    ``use_pallas_egnn`` knob and controls the blocked Pallas clash kernel via
    the shared routing policy (``ops.routing.pallas_policy``)."""
    loss_rec_ca = rmsd_loss(pred_ca, target_ca, mask)
    loss_rec_n = rmsd_loss(pred_n, target_n, mask)
    loss_rec_c = rmsd_loss(pred_c, target_c, mask)
    loss_rec = loss_rec_ca + 0.5 * (loss_rec_n + loss_rec_c)

    loss_pair = pair_distance_loss(pred_ca, target_ca, mask,
                                   stride=weights.pair_stride)

    loss_kg = kl_global(mu_g, lv_g)
    loss_kl = kl_local(mu_l, lv_l, mask)

    pred_dih = dihedrals_from_coords(pred_n, pred_ca, pred_c, mask)

    loss_dih_cons = dihedral_consistency_loss(pred_dih, target_dihedrals, mask)
    loss_rama = ramachandran_loss(pred_dih, mask)
    loss_omega = omega_trans_loss(pred_dih, mask)
    loss_dihedral = loss_dih_cons + loss_omega

    loss_bond = bond_length_loss(pred_n, pred_ca, pred_c, mask,
                                 delta_scale=weights.bond_delta)
    loss_angle = bond_angle_loss(pred_n, pred_ca, pred_c, mask)
    loss_seq = sequence_classification_loss(pred_seq, target_seq_labels, mask)

    # Long chains route through the blocked Pallas clash kernel (O(L) memory
    # instead of a [B, 3L, 3L] matrix); same value to fp32 tolerance. One
    # shared policy with the EGNN band kernel — use_pallas=False disables
    # both.
    from protein_ensemble_vae_tpu.ops.routing import pallas_policy
    if pallas_policy(mask.shape[1], use_pallas, B=mask.shape[0]):
        from protein_ensemble_vae_tpu.ops.pallas.clash import clash_loss_pallas
        loss_clash = clash_loss_pallas(pred_n, pred_ca, pred_c, mask)
    else:
        loss_clash = clash_loss(pred_n, pred_ca, pred_c, mask)

    total = (weights.w_rec * loss_rec
             + weights.w_pair * loss_pair
             + klw_g * loss_kg
             + klw_l * loss_kl
             + weights.w_dihedral * loss_dihedral
             + weights.w_rama * loss_rama
             + weights.w_bond * loss_bond
             + weights.w_angle * loss_angle
             + weights.w_seq * loss_seq
             + weights.w_clash * loss_clash)

    # Beyond-reference virtual CA-CA spacing bond (opt-in; 0.0 = parity).
    extra = {}
    if weights.w_ca_spacing:
        loss_ca_spacing = ca_spacing_loss(pred_ca, mask)
        total = total + weights.w_ca_spacing * loss_ca_spacing
        extra["ca_spacing"] = loss_ca_spacing

    # Beyond-reference MolProbity-event clash surrogate (opt-in; 0.0 =
    # parity) — trains against the same vdW-overlap event the BASELINE
    # "<20" clashscore counts, which the flat 3.2 Å term does not.
    if weights.w_clash_vdw:
        loss_clash_vdw = vdw_clash_loss(pred_n, pred_ca, pred_c, mask)
        total = total + weights.w_clash_vdw * loss_clash_vdw
        extra["clash_vdw"] = loss_clash_vdw

    return {
        **extra,
        "total": total,
        "reconstruction": loss_rec,
        "reconstruction_ca": loss_rec_ca,
        "reconstruction_n": loss_rec_n,
        "reconstruction_c": loss_rec_c,
        "pair_distance": loss_pair,
        "kl_global": loss_kg,
        "kl_local": loss_kl,
        "dihedral_consistency": loss_dih_cons,
        "omega_trans": loss_omega,
        "ramachandran": loss_rama,
        "dihedral_total": loss_dihedral,
        "bond_length": loss_bond,
        "bond_angle": loss_angle,
        "sequence": loss_seq,
        "clash": loss_clash,
    }
