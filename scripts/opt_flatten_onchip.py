#!/usr/bin/env python3
"""A/B the optax.flatten optimizer against the default at small batch.

The round-4 roofline left B4/L256 at 1.30x of its VPU bound and attributed
the ~3 ms gap to un-amortized fixed overheads, naming the optimizer scalar
chain (Adam over ~300 small tensors dispatches ~300 small fused kernels)
as a prime suspect. ``make_optimizer(flatten=True)`` ravels the parameter
pytree into one vector so clip+Adam run as one fused pass. This measures
both configurations with the tunnel-proof scan-differenced clock at the
roofline shapes.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/opt_flatten_onchip.py
Env: OFB_SHAPES (default "4x256,16x256"), OFB_STEPS (default 20).
Writes runs/opt_flatten.json; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from protein_ensemble_vae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import bench as benchmod
    from protein_ensemble_vae_tpu.config import LossWeights, ModelConfig
    from protein_ensemble_vae_tpu.models import HierCVAE
    from protein_ensemble_vae_tpu.train.training import (create_train_state,
                                                         make_train_step)
    from protein_ensemble_vae_tpu.utils.profiling import scan_step_time

    shapes = os.environ.get("OFB_SHAPES", "4x256,16x256")
    steps = int(os.environ.get("OFB_STEPS", "20"))
    rows = []
    for shape in shapes.split(","):
        B, L = (int(v) for v in shape.split("x"))
        cfg = ModelConfig(seqemb_dim=benchmod.SEQD, use_pallas_egnn="auto")
        model = HierCVAE(cfg, dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        batch = benchmod._make_batch(B, L, rng)
        row = {"B": B, "L": L}
        for flatten in (False, True):
            state = create_train_state(model, jax.random.PRNGKey(0),
                                       batch["inp"], opt_flatten=flatten)
            raw_step = make_train_step(model, LossWeights(), train=True,
                                       jit_wrapper=lambda f: f,
                                       opt_flatten=flatten)
            sargs = (jax.random.PRNGKey(1), jnp.float32(1.0),
                     jnp.float32(0.5), jnp.float32(3e-5))
            # same compiled module as bench.py at flatten=False -> the
            # default arm is a persistent-cache hit after any bench run
            make_run = benchmod.make_fori_runner(raw_step, state, batch,
                                                 sargs)

            n1 = max(steps // 5, 2)
            float(make_run(n1)())    # compile + sanity (finite loss)
            dt = scan_step_time(make_run, n1=n1, n2=steps)
            row["flatten_ms" if flatten else "default_ms"] = round(
                dt * 1e3, 2)
            print(f"# B{B}/L{L} flatten={flatten}: {dt*1e3:.2f} ms",
                  file=sys.stderr)
        row["speedup"] = round(row["default_ms"] / row["flatten_ms"], 3)
        rows.append(row)

    out = {"device": jax.devices()[0].device_kind, "rows": rows}
    path = os.path.join(REPO, "runs", "opt_flatten.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
