"""Timing/profiling harness tests (utils.profiling)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from protein_ensemble_vae_tpu.utils.profiling import scan_step_time, time_fn


def test_scan_step_time_measures_real_work():
    """Per-step time from scan-differencing must scale with the work done
    inside one scan step."""
    x = jnp.ones((256, 256), jnp.float32)

    def factory(chain):
        def make_run(n):
            @jax.jit
            def run(x):
                def body(c, _):
                    y = c
                    for _ in range(chain):
                        y = y @ x * 1e-3
                    return c + y * 1e-6, ()
                c, _ = jax.lax.scan(body, x, None, length=n)
                return c.sum()
            return lambda: run(x)
        return make_run

    # One retry: on this 1-core host a competing background process can
    # corrupt a single walltime difference; a clean re-measure is the
    # correct response to that, a real harness regression fails twice.
    for attempt in range(2):
        t_small = scan_step_time(factory(1), n1=2, n2=10, repeats=3)
        t_big = scan_step_time(factory(16), n1=2, n2=10, repeats=3)
        if t_big > 4 * t_small > 0:
            break
    assert t_big > t_small > 0
    assert t_big > 4 * t_small  # 16x the matmuls; allow generous slack


def test_time_fn_runs():
    f = jax.jit(lambda x: (x * 2).sum())
    out = time_fn(f, jnp.ones((64, 64)), warmup=1, iters=3)
    assert out["mean_s"] > 0 and out["per_sec"] > 0


def test_model_flops_scales():
    import sys
    sys.path.insert(0, "/root/repo")
    import bench
    from protein_ensemble_vae_tpu.config import ModelConfig

    cfg = ModelConfig(seqemb_dim=1280)
    f1 = bench.model_flops_per_step(cfg, 4, 256)
    f2 = bench.model_flops_per_step(cfg, 8, 256)
    assert abs(f2 / f1 - 2.0) < 0.01          # linear in batch
    # XLA's compiled cost analysis measured 0.673 TFLOP at B4/L256; the
    # analytic count must agree within 10%
    assert abs(f1 / 0.673e12 - 1.0) < 0.10
    assert bench.model_flops_per_step(cfg, 4, 256, train=False) * 3 == f1
