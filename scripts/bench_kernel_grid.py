#!/usr/bin/env python3
"""Honest XLA-vs-Pallas grid over the bench shapes.

Uses bench.bench_shape (scan-differenced synchronous timing — the only
methodology that survives the axon tunnel, see CLAUDE.md) to time the full
train step with the Pallas kernels forced off / forced on at each shape.
Output drives the auto-routing thresholds in ops/routing.py and the
RESULTS.md kernel table.

  python scripts/bench_kernel_grid.py                  # one JSON line per config
  python scripts/bench_kernel_grid.py --assert_routing # + fail if the auto
      policy picks the measured-slower path at any bucket (the hardware
      guard behind routing.MEASURED_FASTER_IS_PALLAS; exits 1 on mismatch)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

CONFIGS = [
    # (B, L, use_pallas, remat)
    (16, 64, False, False),
    (16, 64, True, False),
    (4, 256, False, False),
    (4, 256, True, False),
    (16, 256, False, False),
    (16, 256, True, False),
    (2, 640, False, True),
    (2, 640, True, True),
]


def main():
    import jax

    from protein_ensemble_vae_tpu.ops.routing import pallas_policy

    do_assert = "--assert_routing" in sys.argv
    backend = jax.default_backend()
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    only_l = os.environ.get("BENCH_GRID_L")  # e.g. "64" or "64,256"
    configs = CONFIGS
    if only_l:
        keep = {int(s) for s in only_l.split(",")}
        configs = [c for c in CONFIGS if c[1] in keep]
    times: dict[tuple, dict] = {}
    for B, L, up, rm in configs:
        # forcing the kernel on needs the interpret escape off-TPU
        use = up if (not up or backend == "tpu") else "interpret"
        row = bench.bench_shape(B, L, steps, use_pallas=use, remat=rm)
        row["forced"] = "pallas" if up else "xla"
        times[(B, L, bool(up))] = row
        print(json.dumps(row), flush=True)

    mismatches = []
    for (B, L, up) in list(times):
        if up:
            continue
        xla = times[(B, L, False)]["ms_per_step"]
        pls = times[(B, L, True)]["ms_per_step"]
        measured_faster_is_pallas = pls < xla
        auto = pallas_policy(L, "auto", backend, B=B)
        rec = dict(B=B, L=L, xla_ms=xla, pallas_ms=pls,
                   measured_faster="pallas" if measured_faster_is_pallas
                   else "xla", auto_picks="pallas" if auto else "xla",
                   ok=auto == measured_faster_is_pallas)
        print(json.dumps({"routing_check": rec}), flush=True)
        if not rec["ok"]:
            mismatches.append(rec)
    if do_assert and backend == "tpu" and mismatches:
        print(f"ROUTING MISMATCH: {mismatches}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
