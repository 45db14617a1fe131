#!/usr/bin/env python3
"""Is the v5e VPU faster on bf16 than fp32 elementwise chains?

Decides the round-4 roofline gap-closer: the fused EGNN band kernel
computes its silu edge chain in fp32 (ops/pallas/egnn_band.py casts inputs
to fp32), while the roofline's VPU ceiling was microbenchmarked on bf16.
If bf16 silu runs ~2x fp32 (packed ALU), converting the in-kernel chain to
bf16 halves the binding VPU term of the train step; if the rates are equal,
the fp32 kernel is already at the roof and the ceiling claim stands.

Also re-measures the bf16 ceiling N times to bound the run-to-run variance
the r4 roofline exposed (1687 vs 2308 Gel-op/s, 3 h apart, same chip).

  PYTHONPATH=/root/.axon_site python scripts/vpu_dtype_bench.py [--repeats 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def rate(dtype, mb=64, chain=8, n2=32):
    import jax
    import jax.numpy as jnp

    from protein_ensemble_vae_tpu.utils.profiling import scan_step_time

    itemsize = jnp.dtype(dtype).itemsize
    n = mb * (1 << 20) // itemsize
    y0 = jnp.full((n,), 0.5, dtype)

    def make_run(nlen):
        @jax.jit
        def run(y):
            def body(y, _):
                for _ in range(chain):
                    y = jax.nn.silu(y)
                return y, ()
            y, _ = jax.lax.scan(body, y, None, length=nlen)
            return jnp.float32(y[0])
        return lambda: run(y0)

    dt = scan_step_time(make_run, n1=max(n2 // 5, 2), n2=n2)
    return 2.0 * chain * n / dt / 1e9      # Gel-op/s (silu = 2 el-ops)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    out = {}
    for dtype in ("bfloat16", "float32"):
        rs = [round(rate(dtype), 1) for _ in range(args.repeats)]
        out[dtype] = dict(gelops=rs, max=max(rs), min=min(rs))
        print(f"# {dtype}: {rs} Gel-op/s", file=sys.stderr)
    out["bf16_over_fp32"] = round(out["bfloat16"]["max"]
                                  / out["float32"]["max"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
