#!/usr/bin/env bash
# Pipeline orchestration: generate -> analyze -> validate -> inspect params.
# Equivalent of the reference's generate_and_analyze.sh (L8).
#
# Usage: ./scripts/generate_and_analyze.sh <checkpoint_dir> <manifest_csv> [num_samples] [outdir]
# Env: REFINE_STEPS (default 150; 0 disables the geometric refinement)
set -euo pipefail

CKPT=${1:?usage: generate_and_analyze.sh <checkpoint> <manifest> [n] [outdir]}
MANIFEST=${2:?need manifest csv}
NUM=${3:-10}
OUTDIR=${4:-generated_ensembles}
REFINE=${REFINE_STEPS:-150}

echo "== 1/4 generate (refine_steps=$REFINE) =="
python -m protein_ensemble_vae_tpu.cli.generate \
  --checkpoint "$CKPT" --manifest "$MANIFEST" \
  --output_dir "$OUTDIR" --num_samples "$NUM" --refine_steps "$REFINE"

echo "== 2/4 analyze =="
python -m protein_ensemble_vae_tpu.cli.analyze --pdb_dir "$OUTDIR"

echo "== 3/4 validate (first structure) =="
FIRST=$(ls "$OUTDIR"/*_ensemble.pdb | head -1)
BASE=${FIRST%_ensemble.pdb}
python -m protein_ensemble_vae_tpu.cli.validate \
  --pred "${BASE}_reconstruction.pdb" --true "${BASE}_true.pdb" \
  --ensemble "$FIRST" --output "$OUTDIR/validation_report.txt" || true

echo "== 4/4 parameters =="
python -m protein_ensemble_vae_tpu.viz.parameters \
  --checkpoint "$CKPT" --output_dir "$OUTDIR/parameter_analysis" || \
  echo "(parameter inspection skipped)"

echo "done: $OUTDIR"
