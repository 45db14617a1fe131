"""Generation CLI — reference ``generate_ensemble_pdbs.py`` equivalent.

    pev-generate --checkpoint checkpoints/hier_cvae/best --manifest data.csv \
                 --output_dir generated/ --num_samples 10

Model architecture is rebuilt from the checkpoint's config sidecar
("architecture travels with the checkpoint").
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Generate conformational "
                                 "ensembles from a trained checkpoint")
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint directory (with state/ + meta.json)")
    ap.add_argument("--manifest", required=True, help="manifest CSV")
    ap.add_argument("--output_dir", default="generated_ensembles")
    ap.add_argument("--num_samples", type=int, default=10)
    ap.add_argument("--max_structures", type=int, default=None)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--latent_source", default="posterior",
                    choices=["posterior", "prior"],
                    help="posterior = z ~ q(z|x) per structure (reference "
                         "generator behavior); prior = z ~ N(0, T^2 I) "
                         "(HierCVAE.sample / reference model.py:77-103)")
    ap.add_argument("--seq_decode", default="argmax",
                    choices=["argmax", "sample", "threshold"],
                    help="sequence decode mode "
                         "(reference sequence_utils.py:44-70)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--refine_steps", type=int, default=0,
                    help="generation-time geometric refinement: N jitted "
                         "Adam iterations relaxing each sampled backbone "
                         "under bond/CA-spacing/angle/clash energies with a "
                         "soft anchor to the sample (0 = off, reference-"
                         "parity behavior; see infer/refine.py)")
    ap.add_argument("--refine_lr", type=float, default=0.05)
    ap.add_argument("--refine_anchor", type=float, default=0.05,
                    help="anchor strength to the unrefined sample (higher "
                         "= preserve more conformational signal)")
    ap.add_argument("--refine_w_rama", type=float, default=0.5,
                    help="Ramachandran + trans-omega energy weight in the "
                         "refiner (scripts/refine_sweep.py measured 2.0 with "
                         "--refine_anchor 0.03 --refine_steps 300 best: "
                         "favored 91.7%%, outliers 0.2%%, gate 100%%, "
                         "diversity +37%% over the default)")
    ap.add_argument("--refine_w_angle", type=float, default=0.5)
    ap.add_argument("--refine_w_bond", type=float, default=1.0,
                    help="covalent bond weight (4.0 with --refine_lr_decay "
                         "reaches the 0.005 A post-fix bond bar)")
    ap.add_argument("--refine_w_clash_vdw", type=float, default=0.0,
                    help="MolProbity-event vdW clash weight in the refiner")
    ap.add_argument("--refine_lr_decay", action="store_true",
                    help="cosine-anneal the refiner step size to zero "
                         "(kills the Adam jitter floor on bonds/angles)")
    ap.add_argument("--refine_mode", default="cartesian",
                    choices=["cartesian", "torsion", "polish"],
                    help="'torsion' refines on the ideal-covalent-geometry "
                         "NeRF manifold (infer/torsion_refine.py): bond/"
                         "angle errors exactly zero by construction; only "
                         "rama/omega/vdW-clash/anchor weights apply. "
                         "'polish' prepends the measured Cartesian vdW "
                         "relaxation (fixed weights from runs/"
                         "refine_sweep_vdw.json's best row) before the "
                         "manifold stage — the two-stage pipeline that "
                         "passes the BASELINE post-fix table")
    return ap


def main(argv=None):
    import jax

    from protein_ensemble_vae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from protein_ensemble_vae_tpu.data import EnsembleDataset, SingleConformerView
    from protein_ensemble_vae_tpu.infer import generate_ensembles
    from protein_ensemble_vae_tpu.models import HierCVAE
    from protein_ensemble_vae_tpu.train.checkpoint import (load_checkpoint,
                                                           load_run_config)
    from protein_ensemble_vae_tpu.train.training import create_train_state

    args = build_parser().parse_args(argv)

    cfg = load_run_config(args.checkpoint)
    model = HierCVAE(cfg.model)

    ds = EnsembleDataset(args.manifest, use_seqemb=cfg.model.use_seqemb,
                         verbose=True)
    view = SingleConformerView(ds)

    # template state for restore
    item = view[0]
    import numpy as np
    L = item["mask"].shape[0]
    seq_emb = item["seq_emb"]
    if seq_emb is None:
        seq_emb = np.zeros((L, cfg.model.seqemb_dim), np.float32)
    sample = dict(seq_emb=seq_emb[None], n=item["n"][None], ca=item["ca"][None],
                  c=item["c"][None], dihedrals=item["dihedrals"][None],
                  mask=item["mask"][None])
    template = create_train_state(model, jax.random.PRNGKey(0), sample)
    state = load_checkpoint(args.checkpoint, template)

    out = generate_ensembles(model, {"params": state.params}, view,
                             args.output_dir, num_samples=args.num_samples,
                             seed=args.seed,
                             max_structures=args.max_structures,
                             buckets=cfg.train.bucket_sizes,
                             temperature=args.temperature,
                             latent_source=args.latent_source,
                             seq_decode=args.seq_decode,
                             refine_steps=args.refine_steps,
                             refine_lr=args.refine_lr,
                             refine_anchor=args.refine_anchor,
                             refine_w_rama=args.refine_w_rama,
                             refine_kwargs=dict(
                                 w_angle=args.refine_w_angle,
                                 w_bond=args.refine_w_bond,
                                 w_clash_vdw=args.refine_w_clash_vdw,
                                 lr_decay=args.refine_lr_decay),
                             refine_mode=args.refine_mode)
    print(f"[generate] wrote {len(out['results'])} structures to "
          f"{args.output_dir}; summary: {out['summary_path']}")


if __name__ == "__main__":
    main()
