"""CLI-level tests for the train entry point (cli/train.py main()).

Runs main() in-process on a tiny synthetic dataset. Covers the
``--init_from`` warm-start path: params load from a previous run's
checkpoint while optimizer/scheduler state starts fresh — the fine-tune
mechanism used to apply ``--strict_geometry`` to an annealed checkpoint.
"""

import json
import os

import pytest

from protein_ensemble_vae_tpu.cli.train import main as train_main
from protein_ensemble_vae_tpu.data.synthetic import make_synthetic_dataset

TINY = ["--d_model", "32", "--nhead", "4", "--ff", "64", "--nlayers", "1",
        "--z_global", "16", "--z_local", "8", "--decoder_hidden", "16",
        "--decoder_layers", "2", "--max_neighbors", "4",
        "--batch_size", "3", "--lr", "1e-4", "--use_seqemb"]


@pytest.fixture(scope="module")
def tiny_manifests(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    return make_synthetic_dataset(
        str(root), n_proteins=1, K=3, lengths=(16,), seqemb_dim=16, seed=5)


def _run(train_csv, val_csv, save, extra):
    train_main(["--manifest_train", train_csv, "--manifest_val", val_csv,
                "--save", save, *TINY, *extra])


@pytest.mark.slow
def test_init_from_warm_starts_params(tiny_manifests, tmp_path):
    train_csv, val_csv = tiny_manifests
    ckpt_a = str(tmp_path / "a")
    _run(train_csv, val_csv, ckpt_a, ["--epochs", "2"])

    # Warm start at lr=0 (changed loss config, as in a real strict-geometry
    # fine-tune): params must be EXACTLY the source checkpoint's — proof the
    # load happened — while the run restarts at epoch 1 with fresh state.
    ckpt_b = str(tmp_path / "b")
    _run(train_csv, val_csv, ckpt_b,
         ["--epochs", "1", "--lr", "0.0",
          "--init_from", os.path.join(ckpt_a, "final"),
          "--strict_geometry"])
    with open(os.path.join(ckpt_b, "final", "history.json")) as f:
        warm_hist = json.load(f)
    assert len(warm_hist["train"]["loss"]) == 1
    with open(os.path.join(ckpt_b, "final", "meta.json")) as f:
        assert json.load(f)["epoch"] == 1

    import jax
    import numpy as np
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    a = ckptr.restore(os.path.join(ckpt_a, "final", "state"))
    b = ckptr.restore(os.path.join(ckpt_b, "final", "state"))
    la = jax.tree.leaves(a["params"])
    lb = jax.tree.leaves(b["params"])
    assert len(la) == len(lb) and len(la) > 0
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_init_from_with_resume_rejected(tiny_manifests, tmp_path):
    train_csv, val_csv = tiny_manifests
    with pytest.raises(SystemExit):
        _run(train_csv, val_csv, str(tmp_path / "c"),
             ["--epochs", "1", "--resume", "--init_from", "whatever"])
