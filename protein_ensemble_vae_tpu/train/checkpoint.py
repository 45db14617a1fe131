"""Checkpointing: orbax state tree + JSON hyperparameter sidecar.

Keeps the reference's "architecture travels with the checkpoint" contract
(checkpoint dict {model_state_dict, epoch, loss_history, hyperparameters},
training.py:441-477; downstream tools rebuild the model from it,
generate_ensemble_pdbs.py:719-754) and **finishes the unfinished resume
feature**: optimizer state, KL-scheduler state, plateau-LR state, and epoch
all round-trip (the reference serializes scheduler state but never restores
it, and never saves optimizer state — SURVEY §5.3/§5.4).

Layout on disk:
    <path>/state/...        orbax PyTree (params, opt_state, step)
    <path>/meta.json        RunConfig + epoch + scheduler/LR/early-stop state
    <path>/history.json     loss_history dict (reference metric names)
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _to_jsonable(obj):
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    return obj


def save_checkpoint(path: str, state, run_config, epoch: int,
                    loss_history: Optional[dict] = None,
                    extra_meta: Optional[dict] = None) -> str:
    """Write a full training checkpoint. ``state`` is a TrainState pytree."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)

    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(path, "state")
    ckptr.save(state_path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()

    meta = {
        "epoch": int(epoch),
        "config": json.loads(run_config.to_json()),
        "format_version": 1,
    }
    if extra_meta:
        meta.update(_to_jsonable(extra_meta))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)

    if loss_history is not None:
        with open(os.path.join(path, "history.json"), "w") as f:
            json.dump(_to_jsonable(loss_history), f)
    return path


def record_artifact(root: str, name: str, path: str, epoch: int,
                    metrics: Optional[dict] = None) -> str:
    """Append a checkpoint-artifact record to ``<root>/artifacts.jsonl``.

    Offline equivalent of the reference's wandb Artifact upload
    (``models/training.py:464-477``): a durable, append-only manifest of
    every saved checkpoint (name, epoch, headline metrics, path, mtime)
    that survives without any tracking service."""
    import time

    os.makedirs(root, exist_ok=True)
    rec = {"name": name, "path": os.path.abspath(path), "epoch": int(epoch),
           "time": time.time(), "metrics": _to_jsonable(metrics or {})}
    manifest = os.path.join(root, "artifacts.jsonl")
    with open(manifest, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return manifest


def load_meta(path: str) -> dict:
    with open(os.path.join(os.path.abspath(path), "meta.json")) as f:
        return json.load(f)


def load_history(path: str) -> Optional[dict]:
    p = os.path.join(os.path.abspath(path), "history.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def load_checkpoint(path: str, state_template) -> Any:
    """Restore the TrainState pytree given a template with matching structure
    (build it with ``create_train_state`` from the sidecar config)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, "state"),
                         target=jax.device_get(state_template))


def load_run_config(path: str):
    from protein_ensemble_vae_tpu.config import RunConfig

    meta = load_meta(path)
    return RunConfig.from_json(json.dumps(meta["config"]))
