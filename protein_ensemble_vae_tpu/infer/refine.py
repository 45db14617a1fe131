"""Generation-time geometric refinement of sampled backbones (TPU-native).

Posterior-sampled conformers carry locally broken backbone geometry —
stretched peptide bonds and CA-CA spacings well past the generator gate's
6 Å cutoff. The reference has no remedy: its own generator fails the gate
on 100 % of samples and silently keeps them all
(generate_ensemble_pdbs.py:290-340 + :560-570 keep-all fallback; its
expert analysis documents 12 % Ramachandran favored / 72 % outliers).

This module fixes the samples instead of discarding them: a
fixed-iteration Adam relaxation of the backbone coordinates under the
local geometry energies (bond lengths, virtual CA-CA spacing, bond
angles, steric clash, Ramachandran basins + trans-omega through the
differentiable torsion op) plus a soft anchor to the sampled coordinates, so
the conformational content of the sample is preserved while its local
covalent geometry is restored. Analogous in spirit to AlphaFold's
post-predict relax, built compiler-first: a single ``lax.scan`` over a
static step count, jitted once per length bucket, batched over the whole
ensemble — no per-sample host loop, no dynamic shapes.

Default weights were tuned on 8 posterior samples from the annealed
flagship checkpoint (150 steps, lr 0.05; RESULTS.md "Generation-time
geometric refinement"): covalent-only (w_rama=w_omega=0) fixes bonds but
lets favored torsions fall 50 % -> 26 % and over-packs the chain (clash
5643 -> 7150); w_rama=w_omega=0.5 lifts favored to 85 % and zeroes the
outliers; w_clash=5.0 brings clash back below the ground truth's own
score (5444 vs ~6050) at unchanged gate/bond quality. Reproduce by
re-running that sweep: decode K samples, call ``refine_backbone`` per
weight setting, and score with eval.analyze.clash_score +
eval.ramachandran + infer.gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from protein_ensemble_vae_tpu import losses as L
from protein_ensemble_vae_tpu.ops.geometry import dihedrals_from_coords


def _energy(coords: dict, ref: dict, mask, w: dict, *, rama_on, vdw_on):
    """Local-geometry energy + soft anchor. All terms reuse the (masked,
    bounded-gradient) training losses, with deltas raised into their
    quadratic region so ~Å-scale violations produce proportional forces.
    The torsion terms (Ramachandran basins + trans-omega, through the
    differentiable ``dihedrals_from_coords``) keep the relaxation from
    trading covalent fixes for backbone-dihedral damage.

    ``w`` holds the weights as *traced* scalars (sweeping weight values
    never recompiles); only the zero/nonzero structure of the expensive
    optional terms (``rama_on``, ``vdw_on``) is static."""
    n, ca, c = coords["n"], coords["ca"], coords["c"]
    # clash follows the SAME kernel routing as the training loss: the
    # blocked Pallas kernel keeps long-chain refinement O(L) in memory
    # instead of a dense [B, 3L, 3L] matrix per Adam step
    from protein_ensemble_vae_tpu.ops.routing import pallas_policy
    if pallas_policy(mask.shape[1], "auto", B=mask.shape[0]):
        from protein_ensemble_vae_tpu.ops.pallas.clash import clash_loss_pallas
        clash = clash_loss_pallas(n, ca, c, mask)
    else:
        clash = L.clash_loss(n, ca, c, mask)
    e = (w["w_bond"] * L.bond_length_loss(n, ca, c, mask,
                                          delta_scale=w["bond_delta_scale"])
         + w["w_spacing"] * L.ca_spacing_loss(ca, mask,
                                              delta=w["spacing_delta"])
         + w["w_angle"] * L.bond_angle_loss(n, ca, c, mask)
         + w["w_clash"] * clash)
    if vdw_on:
        # surrogate of the exact MolProbity counting event (vdW overlap
        # >= 0.4 A, 1-2/1-3/1-4 excluded) — the flat 3.2 A term above
        # misses the adjacent-residue 1-5 pairs the scorer counts
        e = e + w["w_clash_vdw"] * L.vdw_clash_loss(n, ca, c, mask)
    if rama_on:
        dih = dihedrals_from_coords(n, ca, c, mask)
        e = (e + w["w_rama"] * L.ramachandran_loss(dih, mask)
             + w["w_omega"] * L.omega_trans_loss(dih, mask))
    msum = 3.0 * jnp.maximum(jnp.sum(mask), 1.0)
    anchor = sum(
        jnp.sum(jnp.square(coords[k] - ref[k]) * mask[..., None])
        for k in ("n", "ca", "c")) / msum
    return e + w["anchor_weight"] * anchor


def refine_backbone(n, ca, c, mask, *, steps: int = 150, lr: float = 0.05,
                    anchor_weight: float = 0.05, w_bond: float = 1.0,
                    bond_delta_scale: float = 50.0, w_spacing: float = 1.0,
                    spacing_delta: float = 3.0, w_angle: float = 0.5,
                    w_clash: float = 5.0, w_rama: float = 0.5,
                    w_omega: float = 0.5, w_clash_vdw: float = 0.0,
                    lr_decay: bool = False):
    """Relax backbone coordinates toward valid local geometry.

    Args:
      n, ca, c: ``[B, L, 3]`` backbone atom coordinates (any float dtype).
      mask: ``[B, L]`` residue validity.
      steps: static number of Adam iterations (one compiled ``lax.scan``).
      lr: Adam step size in Å-ish units.
      anchor_weight: strength of the pull back to the input coordinates
        (per-atom mean squared Å). Higher preserves more of the sample's
        conformation; lower fixes worse geometry.
      lr_decay: cosine-anneal the step size to zero across ``steps``
        (kills the lr-proportional Adam jitter floor — see ``_refine``).

    Only ``steps``, ``lr_decay`` and the on/off structure of the torsion
    and vdW terms are compile-time constants; every weight *value*
    (including ``lr``) is traced, so weight sweeps over a fixed shape
    reuse one compiled executable per (steps, lr_decay, structure).

    Returns:
      ``(n, ca, c)`` refined coordinates, same shapes/dtypes as the input.
    """
    w = {k: jnp.float32(v) for k, v in dict(
        anchor_weight=anchor_weight, w_bond=w_bond,
        bond_delta_scale=bond_delta_scale, w_spacing=w_spacing,
        spacing_delta=spacing_delta, w_angle=w_angle, w_clash=w_clash,
        w_rama=w_rama, w_omega=w_omega, w_clash_vdw=w_clash_vdw).items()}
    return _refine(n, ca, c, mask, w, jnp.float32(lr),
                   steps=int(steps), lr_decay=bool(lr_decay),
                   rama_on=(w_rama != 0.0 or w_omega != 0.0),
                   vdw_on=(w_clash_vdw != 0.0))


@functools.partial(jax.jit, static_argnames=(
    "steps", "lr_decay", "rama_on", "vdw_on"))
def _refine(n, ca, c, mask, w, lr, *, steps, lr_decay, rama_on, vdw_on):
    dtype = ca.dtype
    coords0 = {"n": jnp.asarray(n, jnp.float32),
               "ca": jnp.asarray(ca, jnp.float32),
               "c": jnp.asarray(c, jnp.float32)}
    maskf = jnp.asarray(mask, jnp.float32)

    energy = functools.partial(_energy, ref=coords0, mask=maskf, w=w,
                               rama_on=rama_on, vdw_on=vdw_on)
    grad_fn = jax.grad(energy)

    # Constant-lr Adam leaves an lr-proportional jitter floor on the
    # covalent terms (bond error plateaued at ~0.04 Å vs the 0.005 Å
    # target across every round-4 sweep row regardless of weights);
    # ``lr_decay`` anneals cosine-to-zero so the relaxation actually
    # converges instead of oscillating around the minimum.
    sched = optax.cosine_decay_schedule(lr, steps) if lr_decay else lr
    tx = optax.adam(sched)
    opt_state = tx.init(coords0)

    def body(carry, _):
        coords, opt_state = carry
        g = grad_fn(coords)
        updates, opt_state = tx.update(g, opt_state, coords)
        coords = optax.apply_updates(coords, updates)
        return (coords, opt_state), None

    (coords, _), _ = jax.lax.scan(body, (coords0, opt_state), None,
                                  length=steps)
    # padded rows never accumulate force (every term is masked), but pin
    # them to the input exactly so downstream padding invariants hold
    m3 = maskf[..., None]
    out = {k: coords[k] * m3 + coords0[k] * (1.0 - m3) for k in coords}
    return (out["n"].astype(dtype), out["ca"].astype(dtype),
            out["c"].astype(dtype))
