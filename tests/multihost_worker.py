"""Worker process for the two-process multi-host dryrun test.

Launched by tests/test_multihost.py as
``python tests/multihost_worker.py PORT PROCESS_ID DATA_ROOT OUT_JSON``.
Each of the two processes gets 4 virtual CPU devices, joins a distributed
coordinator, feeds its own shard from ``make_sharded_epoch_batches``, and
runs two dp=8 training steps through the real multi-host path
(``make_parallel_jit`` → ``jax.make_array_from_process_local_data``
assembly, ``parallel/mesh.py:140-147``). Per-step losses go to OUT_JSON.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# tiny config shared with the host-side expectation in test_multihost.py
MODEL_KW = dict(seqemb_dim=8, d_model=16, nhead=2, ff=32, nlayers=1,
                z_global=8, z_local=4, decoder_hidden=8, decoder_layers=1,
                max_neighbors=2)
BATCH_PER_PROCESS = 4
BUCKETS = (16,)
N_STEPS = 2
SHUFFLE_SEED = 7


def per_process_batches(dataset, process_index, process_count):
    from protein_ensemble_vae_tpu.data.collate import make_sharded_epoch_batches
    return list(make_sharded_epoch_batches(
        dataset, BATCH_PER_PROCESS, BUCKETS, True, SHUFFLE_SEED,
        process_index=process_index, process_count=process_count))


def run_train_model(data_root, out_json):
    """Drive the FULL train_model loop (the --multihost CLI path: sharded
    batch factory + parallel jit + the aligned-compile barrier in
    train_model) for 2 epochs and record the epoch losses."""
    import functools
    import json as _json

    import jax

    from protein_ensemble_vae_tpu.config import (LossWeights, ModelConfig,
                                                 RunConfig, TrainConfig)
    from protein_ensemble_vae_tpu.data import EnsembleDataset
    from protein_ensemble_vae_tpu.data.collate import make_sharded_epoch_batches
    from protein_ensemble_vae_tpu.models import HierCVAE
    from protein_ensemble_vae_tpu.parallel import make_mesh, make_parallel_jit
    from protein_ensemble_vae_tpu.train import train_model
    from protein_ensemble_vae_tpu.utils import MetricLogger

    cfg = RunConfig(
        model=ModelConfig(**MODEL_KW), loss=LossWeights(),
        train=TrainConfig(batch_size=BATCH_PER_PROCESS, epochs=2, lr=1e-4,
                          seed=SHUFFLE_SEED, bucket_sizes=BUCKETS,
                          kl_schedule="cyclical", dp=8, tp=1))
    model = HierCVAE(cfg.model)
    ds = EnsembleDataset(os.path.join(data_root, "manifest_train.csv"),
                         use_seqemb=True)
    mesh = make_mesh(dp=8, tp=1)
    make_batches = functools.partial(
        make_sharded_epoch_batches, process_index=jax.process_index(),
        process_count=jax.process_count())
    _, history = train_model(model, ds, ds, cfg, logger=MetricLogger(),
                             jit_wrapper=make_parallel_jit(mesh, use_tp=False),
                             make_batches=make_batches)
    with open(out_json, "w") as f:
        _json.dump({"process": jax.process_index(),
                    "losses": history["train"]["loss"],
                    "val_losses": history["val"]["loss"]}, f)
    jax.distributed.shutdown()


def main():
    port, process_id, data_root, out_json = sys.argv[1:5]
    mode = sys.argv[5] if len(sys.argv) > 5 else "step"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=int(process_id))
    import jax.numpy as jnp

    from protein_ensemble_vae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()   # 1-core host: compiles dominate the test

    from protein_ensemble_vae_tpu.config import LossWeights, ModelConfig
    from protein_ensemble_vae_tpu.data import EnsembleDataset
    from protein_ensemble_vae_tpu.models import HierCVAE
    from protein_ensemble_vae_tpu.parallel import make_mesh, make_parallel_jit
    from protein_ensemble_vae_tpu.train.training import (_batch_to_arrays,
                                                         create_train_state,
                                                         make_train_step)

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    if mode == "train_model":
        return run_train_model(data_root, out_json)

    cfg = ModelConfig(**MODEL_KW)
    model = HierCVAE(cfg)
    ds = EnsembleDataset(os.path.join(data_root, "manifest_train.csv"),
                         use_seqemb=True)
    batches = per_process_batches(ds, jax.process_index(), 2)[:N_STEPS]
    arrs = [_batch_to_arrays(b, cfg.seqemb_dim) for b in batches]

    # Establish the gloo context NOW, while both processes are at the same
    # point (just past import): XLA's gloo init has a hard-coded 30 s
    # GetKeyValue timeout, and if it first fires inside the train step the
    # two processes can be minutes apart on this 1-core host (compile skew)
    # — the suite flaked exactly that way under load.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("gloo-warmup")

    # identical seed on both processes -> identical replicated params
    state = create_train_state(model, jax.random.PRNGKey(0), arrs[0]["inp"])
    mesh = make_mesh(dp=8, tp=1)
    step = make_train_step(model, LossWeights(), train=True,
                           jit_wrapper=make_parallel_jit(mesh, use_tp=False))

    # AOT-compile the sharded step on BOTH processes, then meet at a
    # coordination-service barrier (plain RPC, no 30 s gloo limit) before
    # the first real execution: the executable's gloo KV rendezvous fires
    # at first run, and compile-time skew between two processes on a
    # loaded 1-core host otherwise blows its hard-coded 30 s timeout.
    from protein_ensemble_vae_tpu.parallel import coordination_barrier
    step(state, arrs[0],
         jax.random.fold_in(jax.random.PRNGKey(3), 0),
         jnp.float32(1.0), jnp.float32(0.5), jnp.float32(1e-4),
         compile_only=True)
    coordination_barrier("pev-step-compiled")

    losses = []
    for i, b in enumerate(arrs):
        state, m = step(state, b,
                        jax.random.fold_in(jax.random.PRNGKey(3), i),
                        jnp.float32(1.0), jnp.float32(0.5), jnp.float32(1e-4))
        losses.append(float(m["loss"]))

    with open(out_json, "w") as f:
        json.dump({"process": int(process_id), "losses": losses}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
