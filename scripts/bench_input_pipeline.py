#!/usr/bin/env python3
"""Host input-pipeline timing: batch production vs TPU step time.

Measures how long the host takes to produce one training batch (collate +
PairBatch->array conversion) on a realistic multi-protein dataset, for both
the per-batch padding path (``make_epoch_batches``) and the prepadded cache
(``PrepaddedStore``). Compare against the device step time from ``bench.py``
to verify the input pipeline stays <= ~20 % of step time (VERDICT weak #6).

  python scripts/bench_input_pipeline.py [--step_ms_256 N] [--step_ms_640 N]

Prints one JSON line per shape.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_factory(factory, ds, batch_size, buckets, epochs, seqemb_dim):
    """ms per produced batch (collate + array conversion), best of 2 passes
    (the first pass doubles as allocator/page-cache warmup)."""
    from protein_ensemble_vae_tpu.train.training import _batch_to_arrays

    best, n_batches = None, 0
    for _ in range(2):
        n_batches = 0
        t0 = time.perf_counter()
        for e in range(epochs):
            for pb in factory(ds, batch_size, buckets, True, e):
                _batch_to_arrays(pb, seqemb_dim)
                n_batches += 1
        dt = 1e3 * (time.perf_counter() - t0) / max(n_batches, 1)
        best = dt if best is None else min(best, dt)
    return best, n_batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step_ms_256", type=float, default=None,
                    help="measured TPU step ms at B4/L256 (from bench.py)")
    ap.add_argument("--step_ms_640", type=float, default=None)
    ap.add_argument("--step_ms_b16", type=float, default=None,
                    help="measured TPU step ms at B16/L256")
    ap.add_argument("--step_ms_b32", type=float, default=None)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from protein_ensemble_vae_tpu.data import EnsembleDataset, make_synthetic_dataset
    from protein_ensemble_vae_tpu.data.collate import (PrepaddedStore,
                                                       make_epoch_batches)

    shapes = [
        # (tag, n_proteins, K, lengths, seqemb_dim, batch, buckets, step_ms)
        ("B4_L256", 12, 4, (200, 224, 256), 1280, 4,
         (64, 128, 192, 256), args.step_ms_256),
        ("B2_L640", 6, 4, (576, 608, 640), 1280, 2,
         (512, 576, 640), args.step_ms_640),
        # production regime (VERDICT r3 #8): B16+ needs 16/32 pairs per
        # batch flowing through collate/prepad on the 1-core host
        ("B16_L256", 24, 4, (200, 224, 256), 1280, 16,
         (64, 128, 192, 256), args.step_ms_b16),
        ("B32_L256", 32, 5, (200, 224, 256), 1280, 32,
         (64, 128, 192, 256), args.step_ms_b32),
    ]

    for tag, n_prot, K, lengths, D, bs, buckets, step_ms in shapes:
        with tempfile.TemporaryDirectory() as root:
            train_csv, _ = make_synthetic_dataset(
                root, n_proteins=n_prot, K=K, lengths=lengths,
                seqemb_dim=D, seed=0)
            ds = EnsembleDataset(train_csv, use_seqemb=True)

            base_ms, nb = time_factory(make_epoch_batches, ds, bs, buckets,
                                       args.epochs, D)

            t0 = time.perf_counter()
            store = PrepaddedStore(ds, buckets)
            build_ms = 1e3 * (time.perf_counter() - t0)
            pre_ms, _ = time_factory(
                lambda d, b, bk, sh, sd: store.epoch_batches(b, sh, sd),
                ds, bs, buckets, args.epochs, D)

            row = dict(shape=tag, pairs=len(ds), batches_per_epoch=nb // args.epochs,
                       host_ms_per_batch_collate=round(base_ms, 3),
                       host_ms_per_batch_prepadded=round(pre_ms, 3),
                       prepad_build_ms=round(build_ms, 1),
                       speedup=round(base_ms / max(pre_ms, 1e-9), 1))
            if step_ms:
                row["step_ms"] = step_ms
                row["collate_frac_of_step"] = round(base_ms / step_ms, 3)
                row["prepadded_frac_of_step"] = round(pre_ms / step_ms, 3)
            print(json.dumps(row))


if __name__ == "__main__":
    main()
