"""Torsion-space (NeRF-manifold) refinement of sampled backbones.

Cartesian refinement (``infer.refine``) trades its loss terms against each
other: the round-4/5 sweeps floored at MolProbity clash ~43 and bond error
~0.015 Å because every Adam step that relieves a clash also bends a bond
(the BASELINE post-fix table wants bond ≤ 0.005 Å, angle ≤ 5°, favored
≥ 85 %, outliers < 5 %, MolProbity < 20 *simultaneously* —
EXPERT_DEEP_LEARNING_ANALYSIS.md:1057-1065, a bar the reference's own
generated ensembles never approach: 12 % favored / 72 % outliers,
generate_ensemble_pdbs.py keep-all fallback).

This module removes the trade-off instead of re-weighting it: the sample
is projected onto the ideal-covalent-geometry manifold (torsions extracted
with the differentiable ``dihedrals_from_coords``, chain rebuilt by a
natural-extension-of-reference-frame scan with the exact config.BOND_* /
ANGLE_* constants the loss battery targets), and Adam then optimizes the
TORSIONS. Bond lengths and bond angles are ideal *by construction* at
every iterate — zero error, not small error — so the only active energy
terms are the MolProbity-event vdW clash surrogate, the Ramachandran /
trans-omega basins, and a soft Cartesian anchor that preserves the
sample's conformational content. Clash relief happens along the manifold
(a lever-arm torsion move), never by stretching a bond.

TPU-native construction: the NeRF rebuild is one ``lax.scan`` over
residues (static length, no dynamic shapes), nested inside the
``lax.scan`` over Adam steps, jitted once per (steps, L) bucket and
batched over the whole ensemble. Weight values (incl. lr) are traced —
sweeping weights never recompiles.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import optax

from protein_ensemble_vae_tpu import losses as L
from protein_ensemble_vae_tpu.config import (ANGLE_C_N_CA_DEG,
                                             ANGLE_CA_C_N_DEG,
                                             ANGLE_N_CA_C_DEG, BOND_C_N,
                                             BOND_CA_C, BOND_N_CA)
from protein_ensemble_vae_tpu.ops.geometry import (_DEGEN,
                                                   dihedrals_from_coords,
                                                   safe_atan2)


def _unit(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                           _DEGEN)


def _place(a, b, c, bond, angle_deg, torsion):
    """Place atom D from internal coordinates (batched over leading dims):
    |CD| = bond, angle(B,C,D) = angle_deg, dihedral(A,B,C,D) = torsion.
    Mirrors the numpy oracle ``data.synthetic._nerf_place`` (sign
    convention validated against ``dihedrals_from_coords`` in
    tests/test_synthetic_nerf.py); denominators floored for bounded
    gradients on degenerate (padded) geometry."""
    ang = math.radians(angle_deg)
    bc = _unit(c - b)
    nrm = _unit(jnp.cross(b - a, bc))
    m = jnp.cross(nrm, bc)
    d0 = -bond * math.cos(ang)
    d1 = bond * math.sin(ang) * jnp.cos(torsion)[..., None]
    d2 = bond * math.sin(ang) * jnp.sin(torsion)[..., None]
    return c + d0 * bc + d1 * m + d2 * nrm


def ideal_seed_frame(n0, ca0, c0):
    """Idealize the first residue in place: keep CA, keep the N direction,
    re-plant N at BOND_N_CA and C in the (N, CA, C) plane at BOND_CA_C /
    ANGLE_N_CA_C. The rebuilt chain then starts in the sample's own rigid
    frame (no global alignment step needed for the anchor term)."""
    u = _unit(n0 - ca0)
    v = c0 - ca0
    w = _unit(v - jnp.sum(v * u, -1, keepdims=True) * u)
    ang = math.radians(ANGLE_N_CA_C_DEG)
    n = ca0 + BOND_N_CA * u
    c = ca0 + BOND_CA_C * (math.cos(ang) * u + math.sin(ang) * w)
    return n, ca0, c


def nerf_rebuild(phi, psi, omega, n0, ca0, c0):
    """Differentiable NeRF chain build: ``[B, L]`` torsions (layout of
    ``dihedrals_from_coords``: phi[i] defined for i>=1, psi[i] for
    i<=L-2, omega[i] for i>=1) + a seed residue -> ideal-geometry
    ``[B, L, 3]`` N/CA/C. One ``lax.scan`` over residues."""
    B, Ln = phi.shape

    def body(carry, tors):
        pn, pca, pc = carry
        psi_i, om_n, phi_n = tors
        nn = _place(pn, pca, pc, BOND_C_N, ANGLE_CA_C_N_DEG, psi_i)
        nca = _place(pca, pc, nn, BOND_N_CA, ANGLE_C_N_CA_DEG, om_n)
        nc = _place(pc, nn, nca, BOND_CA_C, ANGLE_N_CA_C_DEG, phi_n)
        return (nn, nca, nc), (nn, nca, nc)

    # step i (building residue i+1) consumes psi[i], omega[i+1], phi[i+1]
    xs = (jnp.moveaxis(psi[:, :-1], 1, 0), jnp.moveaxis(omega[:, 1:], 1, 0),
          jnp.moveaxis(phi[:, 1:], 1, 0))
    _, (ns, cas, cs) = jax.lax.scan(body, (n0, ca0, c0), xs)
    n = jnp.concatenate([n0[:, None], jnp.moveaxis(ns, 0, 1)], axis=1)
    ca = jnp.concatenate([ca0[:, None], jnp.moveaxis(cas, 0, 1)], axis=1)
    c = jnp.concatenate([c0[:, None], jnp.moveaxis(cs, 0, 1)], axis=1)
    return n, ca, c


def torsions_from_coords(n, ca, c, mask):
    """Extract (phi, psi, omega) angle arrays ``[B, L]`` in the rebuild's
    layout from Cartesian backbones. Undefined positions (chain ends,
    masked pairs — stored as (0, 0) sin/cos) fall to phi/psi = 0 and
    omega = pi (trans) so the rebuilt padding stays extended rather than
    self-colliding."""
    dih = dihedrals_from_coords(n, ca, c, mask)
    phi = safe_atan2(dih[..., 0], dih[..., 1])
    psi = safe_atan2(dih[..., 2], dih[..., 3])
    om_defined = (jnp.abs(dih[..., 4]) + jnp.abs(dih[..., 5])) > 1e-6
    omega = jnp.where(om_defined, safe_atan2(dih[..., 4], dih[..., 5]),
                      jnp.pi)
    return phi, psi, omega


def refine_torsions(n, ca, c, mask, *, steps: int = 300, lr: float = 0.02,
                    anchor_weight: float = 0.03, w_rama: float = 1.0,
                    w_omega: float = 1.0, w_clash_vdw: float = 25.0,
                    lr_decay: bool = True, vdw_include_o: bool = False):
    """Project sampled backbones onto the ideal-geometry manifold and
    relax their torsions.

    Args:
      n, ca, c: ``[B, L, 3]`` backbone coordinates (any float dtype).
      mask: ``[B, L]`` residue validity.
      steps: static Adam iteration count (0 = pure projection).
      anchor_weight: pull of the rebuilt CAs back to the *input* CAs
        (mean squared Å) — preserves reconstruction/diversity.
      w_clash_vdw: weight of ``losses.vdw_clash_loss`` (the MolProbity
        counting event); the only term that fights the anchor, since
        covalent geometry is exact on the manifold.
      lr_decay: cosine-anneal lr to zero (converge, don't jitter).
      vdw_include_o: extend the vdW event to the differentiably-placed
        carbonyl O (the atoms the analyzer scores), with Probe's H-bond
        allowance on N···O pairs.

    Returns:
      ``(n, ca, c)`` ideal-covalent-geometry coordinates, same
      shapes/dtypes as the input; padded rows pinned to the input.
    """
    w = {k: jnp.float32(v) for k, v in dict(
        anchor_weight=anchor_weight, w_rama=w_rama, w_omega=w_omega,
        w_clash_vdw=w_clash_vdw).items()}
    return _refine_torsions(n, ca, c, mask, w, jnp.float32(lr),
                            steps=int(steps), lr_decay=bool(lr_decay),
                            vdw_include_o=bool(vdw_include_o))


@functools.partial(jax.jit, static_argnames=("steps", "lr_decay",
                                             "vdw_include_o"))
def _refine_torsions(n, ca, c, mask, w, lr, *, steps, lr_decay,
                     vdw_include_o):
    dtype = ca.dtype
    ref = {"n": jnp.asarray(n, jnp.float32),
           "ca": jnp.asarray(ca, jnp.float32),
           "c": jnp.asarray(c, jnp.float32)}
    maskf = jnp.asarray(mask, jnp.float32)
    msum = jnp.maximum(jnp.sum(maskf), 1.0)

    phi0, psi0, om0 = torsions_from_coords(ref["n"], ref["ca"], ref["c"],
                                           maskf)
    seed = ideal_seed_frame(ref["n"][:, 0], ref["ca"][:, 0], ref["c"][:, 0])
    params0 = {"phi": phi0, "psi": psi0, "omega": om0}

    def build(params):
        return nerf_rebuild(params["phi"], params["psi"], params["omega"],
                            *seed)

    def energy(params):
        bn, bca, bc = build(params)
        # identical scoring path to the Cartesian refiner: dihedrals and
        # the vdW event are recomputed from the BUILT coordinates, so the
        # optimized objective is exactly what eval.analyze measures
        dih = dihedrals_from_coords(bn, bca, bc, maskf)
        e = (w["w_rama"] * L.ramachandran_loss(dih, maskf)
             + w["w_omega"] * L.omega_trans_loss(dih, maskf)
             + w["w_clash_vdw"] * L.vdw_clash_loss(
                 bn, bca, bc, maskf, include_o=vdw_include_o))
        anchor = jnp.sum(jnp.square(bca - ref["ca"]) * maskf[..., None]) / msum
        return e + w["anchor_weight"] * anchor

    if steps > 0:
        grad_fn = jax.grad(energy)
        sched = optax.cosine_decay_schedule(lr, steps) if lr_decay else lr
        tx = optax.adam(sched)
        opt_state = tx.init(params0)

        def body(carry, _):
            params, opt_state = carry
            updates, opt_state = tx.update(grad_fn(params), opt_state,
                                           params)
            return (optax.apply_updates(params, updates), opt_state), None

        (params, _), _ = jax.lax.scan(body, (params0, opt_state), None,
                                      length=steps)
    else:
        params = params0

    bn, bca, bc = build(params)
    m3 = maskf[..., None]
    out = {k: v * m3 + ref[k] * (1.0 - m3)
           for k, v in (("n", bn), ("ca", bca), ("c", bc))}
    return (out["n"].astype(dtype), out["ca"].astype(dtype),
            out["c"].astype(dtype))
