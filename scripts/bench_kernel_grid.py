#!/usr/bin/env python3
"""Honest XLA-vs-Pallas grid over the bench shapes.

Uses bench.bench_shape (scan-differenced synchronous timing — the only
methodology that survives the axon tunnel, see CLAUDE.md) to time the full
train step with the Pallas kernels forced off / forced on at each shape.
Output drives the auto-routing thresholds in ops/routing.py and the
RESULTS.md kernel table.

  python scripts/bench_kernel_grid.py          # one JSON line per config
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

CONFIGS = [
    # (B, L, use_pallas, remat)
    (4, 256, False, False),
    (4, 256, True, False),
    (16, 256, False, False),
    (16, 256, True, False),
    (2, 640, False, True),
    (2, 640, True, True),
]


def main():
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    for B, L, up, rm in CONFIGS:
        row = bench.bench_shape(B, L, steps, use_pallas=up, remat=rm)
        row["forced"] = "pallas" if up else "xla"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
