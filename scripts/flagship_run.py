#!/usr/bin/env python3
"""Flagship annealed-KL convergence run (VERDICT r2 item #1, second half).

Builds the flagship synthetic dataset (6 train + 1 val proteins, compact
folds, L=128/192, exact 3.8 A CA-CA ground truth), trains the full
reference-dims model with a MONOTONIC KL schedule held at max weight for
the second half of the run (the "annealed convergence" the cyclical
schedule never reaches — reference kl_schedulers.py:123-165 behavior),
then generates an ensemble from the best checkpoint and runs the full
analysis battery so gate pass-rate / Ramachandran favored % / clashscore
become reportable against BASELINE.md targets.

Usage: python scripts/flagship_run.py [data|train|gen|strict_ft|all]
(`strict_ft` = fine-tune the completed annealed run under
configs/strict_finetune.json and run the raw/refined generation battery
into FLAGSHIP_STRICT_ROOT; it is not part of `all` since it needs the
annealed checkpoint as its warm start.)
Env: FLAGSHIP_ROOT (default runs/flagship), FLAGSHIP_EPOCHS (default 400),
     FLAGSHIP_WARMUP (default 120), FLAGSHIP_FOLD (compact|nerf|helix;
     "nerf" = torsion-built physically valid folds on which BASELINE.md's
     post-fix generation targets are honestly scoreable),
     FLAGSHIP_NOISE (conformer noise; for nerf, torsion-jitter scale*0.3),
     FLAGSHIP_STRICT=1 (--strict_geometry:
     the beyond-reference bond/spacing losses targeting the generation
     gate both parity configurations fail — use a separate FLAGSHIP_ROOT
     to keep the parity run's artifacts).
"""

from __future__ import annotations

import os
import subprocess
import sys

# The tunneled TPU is single-client: if THIS orchestrator process ever
# initializes the axon backend (data.synthetic touches jax.numpy), the
# train/generate SUBPROCESSES block forever waiting for the chip. Pin the
# parent to CPU before any jax-importing module loads; the children get a
# cleaned env with the chip path restored.
#
# The env var alone no longer suffices: the axon sitecustomize's register()
# force-selects the axon platform at interpreter startup, overriding
# JAX_PLATFORMS from the environment. Pinning must therefore go through
# jax.config (which wins over the plugin's selection as long as the backend
# is uninitialized) — same pattern as tests/conftest.py.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402  (must precede any jax-importing module)

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROOT = os.environ.get("FLAGSHIP_ROOT", os.path.join(REPO, "runs", "flagship"))
EPOCHS = int(os.environ.get("FLAGSHIP_EPOCHS", "400"))
WARMUP = int(os.environ.get("FLAGSHIP_WARMUP", "120"))
ENV = dict(os.environ,
           PYTHONPATH=f"{REPO}:/root/.axon_site")
ENV.pop("JAX_PLATFORMS", None)  # children pick the axon chip normally


def build_data():
    from protein_ensemble_vae_tpu.data.synthetic import make_synthetic_dataset
    fold = os.environ.get("FLAGSHIP_FOLD", "compact")
    # nerf folds take torsion jitter, not A of coordinate noise; 0.105
    # (scale 0.35) gives NMR-like ~1.6-2.2 A ensemble diversity
    noise = float(os.environ.get("FLAGSHIP_NOISE",
                                 "0.105" if fold == "nerf" else "0.3"))
    train_csv, val_csv = make_synthetic_dataset(
        os.path.join(ROOT, "data"), n_proteins=7, K=5, lengths=(128, 192),
        seqemb_dim=1280, seed=0, fold=fold, noise=noise)
    print(f"[flagship] data at {ROOT}/data (fold={fold}, noise={noise})")
    return train_csv, val_csv


def train():
    train_csv = os.path.join(ROOT, "data", "manifest_train.csv")
    val_csv = os.path.join(ROOT, "data", "manifest_val.csv")
    cmd = [sys.executable, "-m", "protein_ensemble_vae_tpu.cli.train",
           "--manifest_train", train_csv, "--manifest_val", val_csv,
           "--use_seqemb", "--batch_size", "8", "--lr", "5e-5",
           "--epochs", str(EPOCHS), "--compute_dtype", "bfloat16",
           "--kl_schedule", "monotonic", "--kl_warmup_epochs", str(WARMUP),
           "--early_stopping_patience", str(EPOCHS),  # run the full anneal
           "--checkpoint_every", "50",
           "--save", os.path.join(ROOT, "ckpt"),
           "--log_jsonl", os.path.join(ROOT, "train_log.jsonl")]
    if os.environ.get("FLAGSHIP_PLATEAU"):
        cmd += ["--plateau_patience", os.environ["FLAGSHIP_PLATEAU"]]
    if os.environ.get("FLAGSHIP_STRICT") == "1":
        cmd.append("--strict_geometry")
    print("[flagship]", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=ENV, cwd=REPO)


def generate_and_analyze():
    val_csv = os.path.join(ROOT, "data", "manifest_val.csv")
    ckpt = os.path.join(ROOT, "ckpt", "best")
    outdir = os.path.join(ROOT, "generated")
    for args in (
        [sys.executable, "-m", "protein_ensemble_vae_tpu.cli.generate",
         "--checkpoint", ckpt, "--manifest", val_csv,
         "--num_samples", "20", "--temperature", "0.7",
         "--refine_steps", os.environ.get("FLAGSHIP_REFINE", "150"),
         "--output_dir", outdir],
        [sys.executable, "-m", "protein_ensemble_vae_tpu.cli.analyze",
         "--pdb_dir", outdir,
         "--output", os.path.join(ROOT, "analysis.txt")],
    ):
        print("[flagship]", " ".join(args), flush=True)
        subprocess.run(args, check=True, env=ENV, cwd=REPO)


def strict_ft():
    """Strict-geometry fine-tune from the annealed best checkpoint, then the
    raw/refined generation battery (the RESULTS.md "Strict-geometry
    fine-tune" table rows for the strict checkpoint). Requires a completed
    ``train`` stage under FLAGSHIP_ROOT; writes to FLAGSHIP_STRICT_ROOT
    (default runs/flagship_strict_ft)."""
    strict_root = os.environ.get(
        "FLAGSHIP_STRICT_ROOT",
        os.path.join(REPO, "runs", "flagship_strict_ft"))
    train_csv = os.path.join(ROOT, "data", "manifest_train.csv")
    val_csv = os.path.join(ROOT, "data", "manifest_val.csv")
    cmd = [sys.executable, "-m", "protein_ensemble_vae_tpu.cli.train",
           "--manifest_train", train_csv, "--manifest_val", val_csv,
           "--config", os.path.join(REPO, "configs", "strict_finetune.json"),
           "--use_seqemb", "--compute_dtype", "bfloat16",
           "--init_from", os.path.join(ROOT, "ckpt", "best"),
           "--checkpoint_every", "0",
           "--save", os.path.join(strict_root, "ckpt"),
           "--log_jsonl", os.path.join(strict_root, "train_log.jsonl")]
    print("[flagship]", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=ENV, cwd=REPO)
    for tag, steps in (("raw", "0"),
                       ("refined", os.environ.get("FLAGSHIP_REFINE", "150"))):
        outdir = os.path.join(strict_root, f"generated_{tag}")
        for args in (
            [sys.executable, "-m", "protein_ensemble_vae_tpu.cli.generate",
             "--checkpoint", os.path.join(strict_root, "ckpt", "best"),
             "--manifest", val_csv,
             "--num_samples", "20", "--temperature", "0.7",
             "--refine_steps", steps, "--output_dir", outdir],
            [sys.executable, "-m", "protein_ensemble_vae_tpu.cli.analyze",
             "--pdb_dir", outdir,
             "--output", os.path.join(strict_root, f"analysis_{tag}.txt")],
        ):
            print("[flagship]", " ".join(args), flush=True)
            subprocess.run(args, check=True, env=ENV, cwd=REPO)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode not in ("data", "train", "gen", "all", "strict_ft"):
        raise SystemExit(f"unknown stage {mode!r} "
                         "(data|train|gen|strict_ft|all)")
    if mode in ("data", "all"):
        build_data()
    if mode in ("train", "all"):
        train()
    if mode in ("gen", "all"):
        generate_and_analyze()
    if mode == "strict_ft":
        strict_ft()
