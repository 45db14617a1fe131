"""Ensemble generation: reconstruction + posterior-sampled conformers.

TPU-first rework of reference ``generate_ensemble_pdbs.py:376-672``:

- samples the posterior z = mu + sigma*eps and decodes **all num_samples in
  one batched jitted decode** (num_samples as the batch axis) — the
  reference loops per sample on the host (:548-570).
- structures are padded to length buckets so encode/decode compile once per
  bucket and are reused across structures.
- consumes ``SingleConformerView`` (the reference's generation path unpacks
  a training *pair* 6-ways — a stale-API bug at :401; this is the intended
  single-conformer behavior).

Per structure it writes: ground-truth PDB, reconstruction PDB, multi-model
ensemble PDB (geometry-gated), and records sequence recovery, Kabsch RMSD,
and ensemble diversity; a summary txt mirrors the reference's report
(:649-669).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from protein_ensemble_vae_tpu.config import IDX_TO_AA
from protein_ensemble_vae_tpu.data.collate import bucket_for
from protein_ensemble_vae_tpu.infer.sequence import logits_to_labels
from protein_ensemble_vae_tpu.infer.gate import validate_protein_geometry
from protein_ensemble_vae_tpu.infer.pdb_io import write_multi_model_pdb, write_pdb
from protein_ensemble_vae_tpu.models.vae import HierCVAE
from protein_ensemble_vae_tpu.ops.geometry import kabsch_rmsd, pairwise_kabsch_rmsd


def _pad(x: np.ndarray, L_pad: int) -> np.ndarray:
    pad = [(0, L_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_jit(model, variables, seq_emb, n, ca, c, dih, mask, rng):
    return model.apply(variables, seq_emb, n, ca, c, dih, mask,
                       method=HierCVAE.encode, rngs={"reparam": rng})


@functools.partial(jax.jit, static_argnums=(0,))
def _decode_jit(model, variables, z_g, z_l, mask):
    return model.apply(variables, z_g, z_l, mask, method=HierCVAE.decode)


def generate_ensembles(model: HierCVAE, variables, view, output_dir: str,
                       num_samples: int = 10, seed: int = 0,
                       max_structures: Optional[int] = None,
                       buckets=(64, 128, 192, 256, 320, 384, 448, 512, 576, 640),
                       temperature: float = 1.0,
                       latent_source: str = "posterior",
                       seq_decode: str = "argmax",
                       refine_steps: int = 0,
                       refine_lr: float = 0.05,
                       refine_anchor: float = 0.05,
                       refine_w_rama: float = 0.5,
                       refine_kwargs: Optional[dict] = None,
                       refine_mode: str = "cartesian",
                       verbose: bool = True) -> dict:
    if latent_source not in ("posterior", "prior"):
        raise ValueError(f"latent_source must be 'posterior' or 'prior', "
                         f"got {latent_source!r}")
    os.makedirs(output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(seed)
    results = []

    n_structures = len(view)
    if max_structures is not None:
        n_structures = min(n_structures, max_structures)

    for idx in range(n_structures):
        item = view[idx]
        conf = view.conformer(idx)
        L = int(item["mask"].shape[0])
        L_pad = bucket_for(L, buckets)
        mask = _pad(item["mask"], L_pad)
        seq_emb = item["seq_emb"]
        if seq_emb is None:
            seq_emb = np.zeros((L, model.config.seqemb_dim), np.float32)
        args = tuple(
            jnp.array(_pad(a, L_pad)[None]) for a in
            (seq_emb, item["n"], item["ca"], item["c"], item["dihedrals"]))
        mask_j = jnp.array(mask[None])

        rng, enc_rng, samp_rng = jax.random.split(rng, 3)
        z_g, z_l, mu_g, lv_g, mu_l, lv_l = _encode_jit(
            model, variables, args[0], args[1], args[2], args[3], args[4],
            mask_j, enc_rng)

        # Reconstruction (posterior sample, as the reference forward does).
        rec_n, rec_ca, rec_c, rec_seq = _decode_jit(model, variables, z_g,
                                                    z_l, mask_j)

        rng, seq_rng = jax.random.split(rng)
        pred_labels = np.asarray(logits_to_labels(rec_seq[0], seq_decode,
                                                  rng=seq_rng))
        true_labels = _pad(item["seq_labels"], L_pad)
        valid = mask > 0.5
        seq_recovery = float((pred_labels[valid] == true_labels[valid]).mean())
        pred_sequence = "".join(IDX_TO_AA[int(a)] for a in pred_labels[:L])

        rec_rmsd = float(kabsch_rmsd(rec_ca[0], jnp.array(_pad(item["ca"], L_pad)),
                                     jnp.array(mask)))

        sid = f"{conf.protein_id}_{idx:04d}"
        write_pdb(item["n"], item["ca"], item["c"], item["mask"],
                  os.path.join(output_dir, f"{sid}_true.pdb"),
                  sequence=conf.sequence, pdb_id=conf.protein_id,
                  title="GROUND TRUTH")
        write_pdb(np.asarray(rec_n[0, :L]), np.asarray(rec_ca[0, :L]),
                  np.asarray(rec_c[0, :L]), item["mask"],
                  os.path.join(output_dir, f"{sid}_reconstruction.pdb"),
                  sequence=pred_sequence, pdb_id=conf.protein_id,
                  title="RECONSTRUCTION")

        # Ensemble latents: one batched decode for all samples.
        kg, kl = jax.random.split(samp_rng)
        eps_g = jax.random.normal(kg, (num_samples,) + mu_g.shape[1:])
        eps_l = jax.random.normal(kl, (num_samples,) + mu_l.shape[1:])
        if latent_source == "prior":
            # z ~ N(0, T^2 I) — HierCVAE.sample semantics (ref model.py:77-103)
            zs_g = temperature * eps_g
            zs_l = temperature * eps_l
        else:
            zs_g = mu_g + temperature * eps_g * jnp.exp(0.5 * lv_g)
            zs_l = mu_l + temperature * eps_l * jnp.exp(0.5 * lv_l)
        mask_rep = jnp.broadcast_to(mask_j, (num_samples, L_pad))
        ens_n, ens_ca, ens_c, ens_seq = _decode_jit(model, variables, zs_g,
                                                    zs_l, mask_rep)
        if refine_steps > 0 and refine_mode in ("torsion", "polish"):
            # NeRF-manifold refinement: exact covalent geometry by
            # construction (infer/torsion_refine.py); the Cartesian
            # kwargs (w_angle/w_bond/...) don't apply on the manifold.
            # "polish" = the measured two-stage pipeline
            # (runs/refine_sweep_polish.json): the Cartesian vdW
            # relaxation first — torsion extraction from favored-~25 %
            # raws starts too far from the Ramachandran basins for their
            # Gaussian gradients to recover (runs/refine_sweep_torsion
            # .json caps at favored 63.7 %) — then the manifold stage.
            from protein_ensemble_vae_tpu.infer.refine import refine_backbone
            from protein_ensemble_vae_tpu.infer.torsion_refine import \
                refine_torsions
            if refine_mode == "polish":
                # fixed 600-step stage exactly as measured in the sweep;
                # refine_steps/lr/anchor/... only shape the torsion stage
                ens_n, ens_ca, ens_c = refine_backbone(
                    ens_n, ens_ca, ens_c, mask_rep, steps=600,
                    lr=0.05, anchor_weight=0.003, w_bond=4.0, w_rama=2.0,
                    w_omega=2.0, w_clash=5.0, w_angle=8.0,
                    w_clash_vdw=400.0, lr_decay=True)
            kw = {k: v for k, v in (refine_kwargs or {}).items()
                  if k in ("w_clash_vdw", "lr_decay")}
            ens_n, ens_ca, ens_c = refine_torsions(
                ens_n, ens_ca, ens_c, mask_rep, steps=refine_steps,
                lr=refine_lr, anchor_weight=refine_anchor,
                w_rama=refine_w_rama, w_omega=refine_w_rama / 2.0,
                vdw_include_o=(refine_mode == "polish"), **kw)
        elif refine_steps > 0:
            from protein_ensemble_vae_tpu.infer.refine import refine_backbone
            ens_n, ens_ca, ens_c = refine_backbone(
                ens_n, ens_ca, ens_c, mask_rep, steps=refine_steps,
                lr=refine_lr, anchor_weight=refine_anchor,
                w_rama=refine_w_rama, w_omega=refine_w_rama,
                **(refine_kwargs or {}))
        ens_n, ens_ca, ens_c = (np.asarray(a) for a in (ens_n, ens_ca, ens_c))

        keep, reasons = [], []
        for s in range(num_samples):
            ok, reason = validate_protein_geometry(ens_ca[s], mask)
            (keep if ok else reasons).append(s if ok else reason)
        kept = keep if keep else list(range(num_samples))  # fall back: keep all

        # Ensemble SEQRES: posterior samples reconstruct the conditioning
        # structure, so the reconstruction's sequence applies; unconditional
        # (prior) samples carry their OWN decoded sequences (reference
        # HierCVAE.sample returns per-sample seq_logits, model.py:77-103) —
        # a multi-model PDB holds one SEQRES, so write the consensus
        # (argmax of the kept samples' mean logits).
        if latent_source == "prior":
            cons = np.asarray(
                jnp.argmax(jnp.mean(ens_seq[jnp.array(kept)], axis=0), -1))
            ens_sequence = "".join(IDX_TO_AA[int(a)] for a in cons[:L])
        else:
            ens_sequence = pred_sequence
        write_multi_model_pdb(
            ens_n[kept][:, :L], ens_ca[kept][:, :L], ens_c[kept][:, :L],
            item["mask"], os.path.join(output_dir, f"{sid}_ensemble.pdb"),
            sequence=ens_sequence, pdb_id=conf.protein_id,
            title=f"GENERATED ENSEMBLE ({len(kept)} MODELS)")

        if len(kept) > 1:
            M = np.asarray(pairwise_kabsch_rmsd(jnp.array(ens_ca[kept]),
                                                jnp.array(mask)))
            diversity = float(M[np.triu_indices(len(kept), k=1)].mean())
        else:
            diversity = 0.0

        results.append(dict(
            structure=sid, protein=conf.protein_id, length=L,
            reconstruction_rmsd=rec_rmsd, seq_recovery=seq_recovery,
            n_valid_samples=len(keep), n_samples=num_samples,
            diversity=diversity, gate_failures=reasons[:3]))
        if verbose:
            print(f"[generate] {sid}: L={L} rec_rmsd={rec_rmsd:.3f}A "
                  f"seq_rec={seq_recovery:.3f} "
                  f"valid={len(keep)}/{num_samples} div={diversity:.3f}A")

    summary_path = os.path.join(output_dir, "generation_summary.txt")
    with open(summary_path, "w") as f:
        f.write("ENSEMBLE GENERATION SUMMARY\n")
        f.write("=" * 70 + "\n")
        for r in results:
            f.write(f"{r['structure']:24s} L={r['length']:4d} "
                    f"rec_rmsd={r['reconstruction_rmsd']:7.3f}A "
                    f"seq_recovery={r['seq_recovery']:.3f} "
                    f"valid={r['n_valid_samples']}/{r['n_samples']} "
                    f"diversity={r['diversity']:.3f}A\n")
        if results:
            f.write("-" * 70 + "\n")
            f.write(f"mean rec RMSD: "
                    f"{np.mean([r['reconstruction_rmsd'] for r in results]):.3f}A\n")
            f.write(f"mean seq recovery: "
                    f"{np.mean([r['seq_recovery'] for r in results]):.3f}\n")
            f.write(f"mean diversity: "
                    f"{np.mean([r['diversity'] for r in results]):.3f}A\n")
    return dict(results=results, summary_path=summary_path)
