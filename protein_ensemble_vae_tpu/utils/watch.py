"""Offline ``wandb.watch`` equivalent: periodic param/grad histogram dumps.

The reference logs gradient/parameter histograms to wandb every 100 batches
(``models/training.py:209-210``). wandb is optional here (and absent in the
TPU image), so the same observability is provided offline: every N epochs a
compressed ``.npz`` with per-layer histograms + summary stats of both the
parameters and one batch's gradients is written next to the checkpoints,
consumable by ``viz.parameters`` or plain numpy.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import numpy as np


def _flatten_named(tree) -> dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        out[name] = np.asarray(leaf)
    return out


def histogram_summaries(tree, bins: int = 64) -> dict[str, dict]:
    """Per-leaf histogram (counts, edges) + scalar stats of a pytree."""
    out = {}
    for name, a in _flatten_named(tree).items():
        a = a.astype(np.float64).ravel()
        finite = a[np.isfinite(a)]
        if finite.size == 0:
            finite = np.zeros(1)
        counts, edges = np.histogram(finite, bins=bins)
        out[name] = {
            "counts": counts.astype(np.int64),
            "edges": edges.astype(np.float32),
            "mean": float(finite.mean()),
            "std": float(finite.std()),
            "min": float(finite.min()),
            "max": float(finite.max()),
            "l2": float(np.sqrt((finite ** 2).sum())),
            "nonfinite": int(a.size - finite.size) if finite.size != a.size
                         else int(np.sum(~np.isfinite(a))),
        }
    return out


def dump_watch_npz(path: str, params, grads=None, bins: int = 64) -> str:
    """Write param (and optionally grad) histograms to ``path`` (.npz)."""
    payload = {}
    for prefix, tree in (("param", params), ("grad", grads)):
        if tree is None:
            continue
        for name, h in histogram_summaries(tree, bins).items():
            for k, v in h.items():
                payload[f"{prefix}/{name}/{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **payload)
    return path


def make_watch_fn(model, train_ds, run_config, outdir: str,
                  every: int, logger=None) -> Optional[Callable]:
    """Build the ``watch_fn(state, epoch)`` hook for ``train_model``.

    Every ``every`` epochs it draws the first training batch, computes one
    gradient with the SAME loss as the train step (``make_param_grad_fn``),
    and dumps ``<outdir>/epoch_NNNNN.npz``."""
    if not every:
        return None
    import jax.numpy as jnp

    from protein_ensemble_vae_tpu.data.collate import make_epoch_batches
    from protein_ensemble_vae_tpu.train.training import (_batch_to_arrays,
                                                         make_param_grad_fn)

    tcfg, weights = run_config.train, run_config.loss
    grad_fn = make_param_grad_fn(model, weights)

    def watch_fn(state, epoch: int) -> None:
        if epoch % every != 0:
            return
        first = next(iter(make_epoch_batches(
            train_ds, tcfg.batch_size, tcfg.bucket_sizes, False, tcfg.seed)))
        batch = _batch_to_arrays(first, run_config.model.seqemb_dim)
        grads = grad_fn(state.params, batch,
                        jax.random.fold_in(jax.random.PRNGKey(tcfg.seed),
                                           epoch),
                        jnp.float32(weights.klw_global),
                        jnp.float32(weights.klw_local))
        path = os.path.join(outdir, f"epoch_{epoch:05d}.npz")
        dump_watch_npz(path, state.params, grads)
        if logger is not None:
            logger.info(f"[watch] param/grad histograms -> {path}")

    return watch_fn
