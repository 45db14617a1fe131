"""Train CLI — flag-compatible with reference ``models/vae.py:17-80``.

    pev-train --manifest_train train.csv --manifest_val val.csv [--use_seqemb]
              [--d_model 512 ...] [--kl_schedule cyclical] [--dp N --tp M] ...

Differences from the reference (deliberate, documented):
- ``--kl_schedule`` is honored (the reference always used cyclical,
  training.py:231-236).
- ``--decoder_hidden`` defaults to 256 and is honored (the reference's flag
  default 512 was silently overridden to 256, en_gnn_decoder.py:343-349).
- ``--resume`` restores optimizer/scheduler/epoch state (unfinished in the
  reference).
- ``--dp/--tp`` run the step over a device mesh.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="Train the hierarchical conditional VAE on NMR / "
                    "cross-PDB conformational ensembles (TPU-native)")
    ap.add_argument("--manifest_train", required=True)
    ap.add_argument("--manifest_val", required=True)
    ap.add_argument("--config", default=None,
                    help="JSON preset (see configs/): model/loss/train "
                         "sections applied as defaults before CLI flags")
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=3e-5)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--use_seqemb", action="store_true")

    ap.add_argument("--d_model", type=int, default=512)
    ap.add_argument("--nhead", type=int, default=8)
    ap.add_argument("--ff", type=int, default=1024)
    ap.add_argument("--nlayers", type=int, default=6)
    ap.add_argument("--z_global", type=int, default=512)
    ap.add_argument("--z_local", type=int, default=256)
    ap.add_argument("--decoder_hidden", type=int, default=256)
    ap.add_argument("--decoder_layers", type=int, default=8)
    ap.add_argument("--max_neighbors", type=int, default=40)
    ap.add_argument("--dropout", type=float, default=0.1)

    ap.add_argument("--pair_stride", type=int, default=8)
    ap.add_argument("--w_rec", type=float, default=10.0)
    ap.add_argument("--w_pair", type=float, default=10.0)
    ap.add_argument("--kl_warmup_epochs", type=int, default=20)
    ap.add_argument("--klw_global", type=float, default=1.0)
    ap.add_argument("--klw_local", type=float, default=0.5)
    ap.add_argument("--w_dihedral", type=float, default=20.0)
    ap.add_argument("--w_rama", type=float, default=400.0)
    ap.add_argument("--w_bond", type=float, default=500.0)
    ap.add_argument("--w_angle", type=float, default=500.0)
    ap.add_argument("--w_seq", type=float, default=50.0)
    ap.add_argument("--w_clash", type=float, default=300.0)
    ap.add_argument("--bond_delta", type=float, default=1.0,
                    help="multiplier on the reference huber bond deltas "
                         "(1.0 = exact reference parity)")
    ap.add_argument("--w_ca_spacing", type=float, default=0.0,
                    help="beyond-reference virtual CA-CA 3.81A spacing bond "
                         "(0 = off/parity)")
    ap.add_argument("--w_clash_vdw", type=float, default=0.0,
                    help="beyond-reference vdW-overlap clash surrogate "
                         "matched to the MolProbity clashscore event "
                         "(losses.vdw_clash_loss; 0 = off/parity)")
    ap.add_argument("--strict_geometry", action="store_true",
                    help="preset: bond_delta=25 (quadratic region covers "
                         "real sampled-bond errors) + w_ca_spacing=100 -- "
                         "targets the generation geometry gate that both "
                         "the reference and the parity configuration fail "
                         "100%% of the time (runs/h2h/gen_report.json)")

    ap.add_argument("--kl_schedule", type=str, default="cyclical",
                    choices=["cyclical", "monotonic", "adaptive", "exponential"])
    ap.add_argument("--kl_cycles", type=int, default=4)
    ap.add_argument("--kl_ratio", type=float, default=0.4)

    ap.add_argument("--save", default="checkpoints/hier_cvae")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--init_from", default=None,
                    help="warm-start: load PARAMS ONLY from this checkpoint "
                         "dir (fresh optimizer/LR/KL-scheduler state, epoch "
                         "1) -- for fine-tuning with changed loss weights, "
                         "e.g. --strict_geometry on an annealed checkpoint. "
                         "Mutually exclusive with --resume.")
    ap.add_argument("--checkpoint_every", type=int, default=0)
    ap.add_argument("--compute_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() before backend "
                         "init; dp then spans all hosts' devices and each "
                         "process feeds its own batch shard")
    ap.add_argument("--coordinator_address", default=None,
                    help="host:port of process 0 (auto-discovered on TPU "
                         "pod slices)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)

    ap.add_argument("--prepad_host_batches", type=int, default=1,
                    help="1: pad every conformer once and assemble epoch "
                         "batches by numpy gathers (same batches, no "
                         "per-epoch Python pad loops); 0: pad per batch")
    ap.add_argument("--early_stopping_patience", type=int, default=20)
    ap.add_argument("--plateau_patience", type=int, default=10,
                    help="ReduceLROnPlateau patience in epochs (reference "
                         "default 10, training.py:213-215; raise for long "
                         "KL warmups where val rec shifts with the "
                         "annealing objective and the default decays the "
                         "LR to min before the anneal completes)")
    ap.add_argument("--early_stopping_metric", type=str, default="rec",
                    choices=["rec", "loss", "rmsd"])
    ap.add_argument("--early_stopping_delta", type=float, default=1e-4)

    ap.add_argument("--use_crosspdb", action="store_true",
                    help="include /crosspdb conformers (same-UniProt "
                         "augmentation) as extra training pair partners")
    ap.add_argument("--watch_every", type=int, default=0,
                    help="N>0: dump param/grad histograms every N epochs to "
                         "<save>/watch/ (offline wandb.watch equivalent)")
    ap.add_argument("--wandb_project", type=str, default="Protein-VAE")
    ap.add_argument("--wandb_run_name", type=str, default=None)
    ap.add_argument("--wandb_mode", type=str, default="disabled",
                    choices=["online", "offline", "disabled"])
    ap.add_argument("--log_jsonl", type=str, default=None)
    return ap


def main(argv=None):
    import jax.numpy as jnp

    from protein_ensemble_vae_tpu.config import (LossWeights, ModelConfig,
                                                 RunConfig, TrainConfig)
    from protein_ensemble_vae_tpu.data import EnsembleDataset
    from protein_ensemble_vae_tpu.models import HierCVAE
    from protein_ensemble_vae_tpu.train import train_model
    from protein_ensemble_vae_tpu.train.checkpoint import save_checkpoint
    from protein_ensemble_vae_tpu.utils import MetricLogger

    parser = build_parser()
    args = parser.parse_args(argv)
    if args.resume and args.init_from:
        raise SystemExit("--init_from and --resume are mutually exclusive")

    if args.multihost:
        # must precede first backend use; after it jax.devices() spans hosts
        from protein_ensemble_vae_tpu.parallel import initialize_multihost
        initialize_multihost(coordinator_address=args.coordinator_address,
                             num_processes=args.num_processes,
                             process_id=args.process_id)

    from protein_ensemble_vae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    if args.config:
        # preset JSON provides defaults; explicit CLI flags win
        import json
        with open(args.config) as f:
            preset = json.load(f)
        flat = {}
        for section in ("model", "loss", "train"):
            flat.update(preset.get(section, {}))
        defaults = {k: v for k, v in flat.items() if hasattr(args, k)}
        parser.set_defaults(**defaults)
        args = parser.parse_args(argv)

    train_ds = EnsembleDataset(args.manifest_train, use_seqemb=args.use_seqemb,
                               use_crosspdb=args.use_crosspdb, verbose=True)
    val_ds = EnsembleDataset(args.manifest_val, use_seqemb=args.use_seqemb,
                             use_crosspdb=args.use_crosspdb, verbose=True)
    seqemb_dim = train_ds.seqemb_dim if args.use_seqemb else None
    if seqemb_dim is None:
        seqemb_dim = 1280  # zero-filled placeholder channel

    cfg = RunConfig(
        model=ModelConfig(
            seqemb_dim=seqemb_dim, d_model=args.d_model, nhead=args.nhead,
            ff=args.ff, nlayers=args.nlayers, z_global=args.z_global,
            z_local=args.z_local, dropout=args.dropout,
            decoder_hidden=args.decoder_hidden,
            decoder_layers=args.decoder_layers,
            max_neighbors=args.max_neighbors,
            use_seqemb=args.use_seqemb),
        loss=LossWeights(
            w_rec=args.w_rec, w_pair=args.w_pair, pair_stride=args.pair_stride,
            klw_global=args.klw_global, klw_local=args.klw_local,
            w_dihedral=args.w_dihedral, w_rama=args.w_rama,
            w_bond=args.w_bond, w_angle=args.w_angle, w_seq=args.w_seq,
            w_clash=args.w_clash,
            bond_delta=25.0 if args.strict_geometry else args.bond_delta,
            w_ca_spacing=(100.0 if args.strict_geometry
                          else args.w_ca_spacing),
            w_clash_vdw=args.w_clash_vdw),
        train=TrainConfig(
            batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
            seed=args.seed, kl_schedule=args.kl_schedule,
            kl_cycles=args.kl_cycles, kl_ratio=args.kl_ratio,
            kl_warmup_epochs=args.kl_warmup_epochs,
            early_stopping_patience=args.early_stopping_patience,
            plateau_patience=args.plateau_patience,
            early_stopping_metric=args.early_stopping_metric,
            early_stopping_delta=args.early_stopping_delta,
            save_path=args.save, checkpoint_every=args.checkpoint_every,
            resume=args.resume, compute_dtype=args.compute_dtype,
            dp=args.dp, tp=args.tp))

    if args.tp > 1 and cfg.model.use_pallas_egnn is not False:
        # The fused Pallas band kernel is a single-device custom call that
        # GSPMD cannot partition over the tp axis; the XLA band path carries
        # the decoder TP layout (parallel/mesh.py:_tp_spec_for). tp=1 runs
        # (incl. pure-dp meshes) keep the Pallas fast path.
        import dataclasses as _dc
        cfg = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                                 use_pallas_egnn=False))
        print("[mesh] tp>1: decoder routed to the XLA band path "
              "(Pallas kernel is single-device)")

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    model = HierCVAE(cfg.model, dtype=dtype)

    logger = MetricLogger(jsonl_path=args.log_jsonl,
                          wandb_mode=args.wandb_mode,
                          wandb_project=args.wandb_project,
                          wandb_run_name=args.wandb_run_name,
                          config={"model": cfg.model.__dict__,
                                  "loss": cfg.loss.__dict__,
                                  "train": cfg.train.__dict__})

    jit_wrapper = None
    make_batches = None
    if args.dp > 1 or args.tp > 1:
        import jax

        from protein_ensemble_vae_tpu.parallel import make_mesh, make_parallel_jit
        from protein_ensemble_vae_tpu.parallel.mesh import (ensure_cpu_devices,
                                                            validate_mesh_config)
        ensure_cpu_devices(args.dp * args.tp)
        validate_mesh_config(args.dp, args.tp, args.batch_size, cfg.model,
                             n_devices=len(jax.devices()))
        mesh = make_mesh(dp=args.dp, tp=args.tp)
        jit_wrapper = make_parallel_jit(mesh, use_tp=args.tp > 1)
        logger.info(f"[mesh] dp={args.dp} tp={args.tp} "
                    f"processes={jax.process_count()}")
        if jax.process_count() > 1:
            # each host feeds its own shard; the mesh wrapper assembles the
            # global dp batch from the per-process locals
            import functools

            from protein_ensemble_vae_tpu.data.collate import (
                make_sharded_epoch_batches)
            make_batches = functools.partial(
                make_sharded_epoch_batches,
                process_index=jax.process_index(),
                process_count=jax.process_count())

    if make_batches is None and args.prepad_host_batches:
        from protein_ensemble_vae_tpu.data.collate import make_prepadded_factory
        make_batches = make_prepadded_factory()

    from protein_ensemble_vae_tpu.train.checkpoint import record_artifact

    def checkpoint_fn(state, epoch, loss_history, meta):
        tag = "best" if meta.get("best") else f"epoch{epoch:05d}"
        path = os.path.join(args.save, tag)
        save_checkpoint(path, state, cfg, epoch, loss_history, meta)
        headline = {k: loss_history["val"][k][-1]
                    for k in ("loss", "rec") if loss_history["val"].get(k)}
        record_artifact(args.save, tag, path, epoch, headline)
        logger.info(f"[checkpoint] saved {path}")

    from protein_ensemble_vae_tpu.utils.watch import make_watch_fn
    watch_fn = make_watch_fn(model, train_ds, cfg,
                             os.path.join(args.save, "watch"),
                             args.watch_every, logger=logger)

    def template_state():
        """TrainState with the current run's structure, for orbax restore."""
        from protein_ensemble_vae_tpu.data import make_epoch_batches
        from protein_ensemble_vae_tpu.train.training import (
            _batch_to_arrays, create_train_state)
        import jax
        first = next(iter(make_epoch_batches(
            train_ds, cfg.train.batch_size, cfg.train.bucket_sizes, False,
            cfg.train.seed)))
        sample = _batch_to_arrays(first, cfg.model.seqemb_dim)["inp"]
        return create_train_state(model, jax.random.PRNGKey(0), sample)

    start_epoch = 1
    init_state = None
    if args.resume and os.path.isdir(os.path.join(args.save, "best")):
        from protein_ensemble_vae_tpu.train.checkpoint import (load_checkpoint,
                                                               load_meta)
        path = os.path.join(args.save, "best")
        init_state = load_checkpoint(path, template_state())
        start_epoch = load_meta(path)["epoch"] + 1
        logger.info(f"[resume] from {path} at epoch {start_epoch}")
    elif args.init_from:
        import dataclasses

        from protein_ensemble_vae_tpu.train.checkpoint import (load_checkpoint,
                                                               load_meta)
        src_model = load_meta(args.init_from).get("config", {}).get("model")
        if src_model is not None and src_model != dataclasses.asdict(cfg.model):
            logger.info("[init_from] WARNING: checkpoint model config differs "
                        "from the current one; params must still be "
                        "tree-compatible")
        template = template_state()
        loaded = load_checkpoint(args.init_from, template)
        # params only: fresh optimizer moments, step 0, schedulers from cfg
        init_state = template.replace(params=loaded.params)
        logger.info(f"[init_from] params warm-started from {args.init_from} "
                    f"(epoch {load_meta(args.init_from)['epoch']}); optimizer/"
                    "scheduler state fresh")

    state, history = train_model(model, train_ds, val_ds, cfg, logger=logger,
                                 jit_wrapper=jit_wrapper,
                                 start_epoch=start_epoch,
                                 init_state=init_state,
                                 checkpoint_fn=checkpoint_fn,
                                 make_batches=make_batches,
                                 watch_fn=watch_fn)

    final_path = os.path.join(args.save, "final")
    final_epoch = len(history["train"]["loss"])
    save_checkpoint(final_path, state, cfg, epoch=final_epoch,
                    loss_history=history)
    record_artifact(args.save, "final", final_path, final_epoch)
    logger.info(f"[done] final checkpoint: {final_path}")
    logger.close()


if __name__ == "__main__":
    main()
