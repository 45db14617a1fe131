"""Two-process multi-host execution test (VERDICT r2 item #3).

Spawns 2 real OS processes, each with 4 virtual CPU devices, joined by
``jax.distributed.initialize`` on a localhost coordinator. Both run two
dp=8 training steps end-to-end through ``make_sharded_epoch_batches`` and
the ``make_array_from_process_local_data`` assembly in
``make_parallel_jit``; the test asserts both processes observe the same
loss, equal to a single-process plain-jit step over the concatenated
global batches — proving the multi-host path executes (not just compiles)
and is numerically equivalent.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(mh_dataset, outs, extra_argv=()):
    """Spawn the 2-process worker pair; retry ONCE on the gloo-init
    infra-timeout signature (XLA's hard-coded 30 s KV rendezvous window,
    which unrelated background load on this 1-core host can blow). Returns
    after asserting both workers exited 0."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)  # worker sets platform via jax.config

    def spawn():
        port = _free_port()
        procs = [subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), mh_dataset, outs[i],
             *extra_argv],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(2)]
        logs = []
        for p in procs:
            out, _ = p.communicate(timeout=2400)
            logs.append(out.decode(errors="replace"))
        return procs, logs

    procs, logs = spawn()
    if any(p.returncode != 0 for p in procs) and any(
            "Gloo context initialization failed" in lg for lg in logs):
        procs, logs = spawn()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"


@pytest.fixture(scope="module")
def mh_dataset(tmp_path_factory):
    from protein_ensemble_vae_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path_factory.mktemp("mh_data"))
    # one protein, K=7 -> 21 pairs -> 5 chunks of 4 -> 2 chunks per process
    make_synthetic_dataset(root, n_proteins=1, K=7, lengths=(16,),
                           seqemb_dim=8, seed=3)
    return root


@pytest.mark.slow
def test_two_process_dp8_matches_single_process(mh_dataset, tmp_path):
    from multihost_worker import (BATCH_PER_PROCESS, MODEL_KW, N_STEPS,
                                  per_process_batches)

    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    _run_workers(mh_dataset, outs)

    results = [json.load(open(o)) for o in outs]
    # both processes observe the same (replicated) global loss
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)

    # single-process reference: the SAME global batches (concat of the two
    # per-process shards in process order) through a plain jitted step
    import jax
    import jax.numpy as jnp

    from protein_ensemble_vae_tpu.config import LossWeights, ModelConfig
    from protein_ensemble_vae_tpu.data import EnsembleDataset
    from protein_ensemble_vae_tpu.models import HierCVAE
    from protein_ensemble_vae_tpu.train.training import (_batch_to_arrays,
                                                         create_train_state,
                                                         make_train_step)

    cfg = ModelConfig(**MODEL_KW)
    model = HierCVAE(cfg)
    ds = EnsembleDataset(os.path.join(mh_dataset, "manifest_train.csv"),
                         use_seqemb=True)
    shards = [per_process_batches(ds, i, 2)[:N_STEPS] for i in range(2)]
    glob = []
    for step_idx in range(N_STEPS):
        locs = [_batch_to_arrays(shards[p][step_idx], cfg.seqemb_dim)
                for p in range(2)]
        glob.append(jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), locs[0], locs[1]))
    assert glob[0]["inp"]["ca"].shape[0] == 2 * BATCH_PER_PROCESS

    state = create_train_state(model, jax.random.PRNGKey(0), glob[0]["inp"])
    step = make_train_step(model, LossWeights(), train=True)
    expect = []
    for i, b in enumerate(glob):
        state, m = step(state, b,
                        jax.random.fold_in(jax.random.PRNGKey(3), i),
                        jnp.float32(1.0), jnp.float32(0.5), jnp.float32(1e-4))
        expect.append(float(m["loss"]))

    np.testing.assert_allclose(results[0]["losses"], expect, rtol=2e-5)


@pytest.mark.slow
def test_two_process_train_model_loop(mh_dataset, tmp_path):
    """The full --multihost training path (train_model + sharded batch
    factory + aligned-compile barrier) executes 2 epochs across 2 real
    processes with identical, finite epoch losses."""
    outs = [str(tmp_path / f"tm{i}.json") for i in range(2)]
    _run_workers(mh_dataset, outs, extra_argv=("train_model",))

    results = [json.load(open(o)) for o in outs]
    assert len(results[0]["losses"]) == 2
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["val_losses"],
                               results[1]["val_losses"], rtol=1e-6)
    assert all(np.isfinite(v) for v in results[0]["losses"])
