"""Checkpoint parameter inspection.

Reference ``visualize_parameters.py`` equivalent: per-module weight/bias
statistics, histograms (matplotlib-guarded), and a text summary. The model
is rebuilt from the checkpoint's config sidecar — no weight-shape sniffing
needed (the reference infers seqemb_dim from weight shapes,
visualize_parameters.py:427-453).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def parameter_stats(params) -> list[dict]:
    """Flat list of per-leaf statistics."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rows = []
    for path, leaf in flat:
        a = np.asarray(leaf)
        rows.append(dict(
            name="/".join(str(k.key) for k in path),
            shape=tuple(a.shape),
            count=int(a.size),
            mean=float(a.mean()),
            std=float(a.std()),
            min=float(a.min()),
            max=float(a.max()),
            abs_mean=float(np.abs(a).mean()),
            frac_zero=float((a == 0).mean()),
        ))
    return rows


def write_parameter_summary(params, output_path: str) -> str:
    rows = parameter_stats(params)
    total = sum(r["count"] for r in rows)
    with open(output_path, "w") as f:
        f.write("MODEL PARAMETER SUMMARY\n" + "=" * 90 + "\n")
        f.write(f"total parameters: {total:,}\n\n")
        f.write(f"{'name':60s} {'shape':>16s} {'mean':>9s} {'std':>9s} "
                f"{'min':>9s} {'max':>9s}\n")
        for r in rows:
            f.write(f"{r['name'][:60]:60s} {str(r['shape']):>16s} "
                    f"{r['mean']:9.4f} {r['std']:9.4f} {r['min']:9.3f} "
                    f"{r['max']:9.3f}\n")
    return output_path


def plot_parameter_histograms(params, output_path: str) -> Optional[str]:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    rows = parameter_stats(params)
    import jax
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    n = len(flat)
    cols = 4
    nrows = (n + cols - 1) // cols
    fig, axes = plt.subplots(nrows, cols, figsize=(4 * cols, 2.5 * nrows))
    for ax, (path, leaf) in zip(np.atleast_1d(axes).flat, flat):
        a = np.asarray(leaf).ravel()
        ax.hist(a, bins=50, alpha=0.8)
        ax.set_title("/".join(str(k.key) for k in path)[-40:], fontsize=6)
        ax.tick_params(labelsize=5)
    for ax in np.atleast_1d(axes).flat[n:]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(output_path, dpi=120)
    plt.close(fig)
    return output_path


def main(argv=None):
    import argparse

    import jax

    from protein_ensemble_vae_tpu.models import HierCVAE
    from protein_ensemble_vae_tpu.train.checkpoint import (load_checkpoint,
                                                           load_run_config)
    from protein_ensemble_vae_tpu.train.training import create_train_state

    ap = argparse.ArgumentParser(description="Inspect checkpoint parameters")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output_dir", default="parameter_analysis")
    args = ap.parse_args(argv)

    cfg = load_run_config(args.checkpoint)
    model = HierCVAE(cfg.model)
    import numpy as np  # noqa: F811
    L = 16
    sample = dict(
        seq_emb=np.zeros((1, L, cfg.model.seqemb_dim), np.float32),
        n=np.zeros((1, L, 3), np.float32), ca=np.zeros((1, L, 3), np.float32),
        c=np.zeros((1, L, 3), np.float32),
        dihedrals=np.zeros((1, L, 6), np.float32),
        mask=np.ones((1, L), np.float32))
    template = create_train_state(model, jax.random.PRNGKey(0), sample)
    state = load_checkpoint(args.checkpoint, template)

    os.makedirs(args.output_dir, exist_ok=True)
    summary = write_parameter_summary(
        state.params, os.path.join(args.output_dir, "parameter_summary.txt"))
    print(f"[params] summary: {summary}")
    hist = plot_parameter_histograms(
        state.params, os.path.join(args.output_dir, "parameter_histograms.png"))
    if hist:
        print(f"[params] histograms: {hist}")


if __name__ == "__main__":
    main()
