"""Single kernel-routing policy for the Pallas compute paths.

Both the fused EGNN band kernel (``ops.pallas.egnn_band``) and the blocked
clash kernel (``ops.pallas.clash``) are alternatives to pure-XLA paths over
the same parameters/values. Whether they run is decided *here*, in one place,
from one config knob (``ModelConfig.use_pallas_egnn``) — previously the
threshold heuristic was duplicated in ``models/decoder.py`` and ``losses.py``
and the clash side ignored the flag entirely.

Measured regimes (RESULTS.md "honest XLA-vs-Pallas grid", single v5e chip,
scan-differenced synchronous timing — see CLAUDE.md on why async timing
lies on this tunnel):
- full-train-step speedups with both kernels on: 1.26x at B8/L128,
  2.22x at B4/L256, 1.72x at B16/L256, 3.42x at B2/L640+remat;
- at L = 64 the un-folded kernel loses (16.4 vs 23.5 ms at B16 — a 64-row
  band under-fills the 128-row MXU tile), but the cross-batch fold
  (ops/pallas/egnn_band.py:_fold) stacks two batch rows per tile and wins
  13.2 vs 19.1 ms (1.45x), so "auto" enables it when the fold applies
  (even B, B*L >= 1024).
"""

from __future__ import annotations

from typing import Optional

import jax

# "auto" enables Pallas where it measured faster than XLA: L >= 128 on a
# real TPU, and — since the cross-batch fold lifted the L=64 tile to full
# 128-row MXU occupancy (ops/pallas/egnn_band.py:_fold) — also at L=64 when
# the batch is even (fold active) and the total row count B*L reaches the
# measured win point. Mosaic tiling requires L % 64 == 0 (sublane alignment
# of the band blocks), which the length-bucket ladder guarantees.
PALLAS_AUTO_MIN_L = 128
PALLAS_L_MULTIPLE = 64
PALLAS_AUTO_MIN_ROWS = 1024   # B*L at the measured B16/L64 folded win

# Measured crossover per (B, L) shape (single v5e, full-train-step, honest
# scan-differenced timing — RESULTS.md "honest XLA-vs-Pallas grid" + the
# folded-kernel L=64 grid). This is DATA, asserted by tests/test_routing.py
# against the policy, and re-checked on hardware by
# ``scripts/bench_kernel_grid.py --assert_routing``. The numbers are
# v5e-measured; on a new TPU generation run the grid script once — if the
# crossover moves, update this table and the thresholds together (the guard
# test keeps them consistent).
MEASURED_FASTER_IS_PALLAS = {
    (16, 64): True,    # folded kernel: 13.2 vs 19.1 ms
    (8, 128): True,
    (4, 256): True,
    (16, 256): True,
    (2, 640): True,
}


def pallas_supported(L: int, backend: Optional[str] = None) -> bool:
    """Hardware/shape feasibility: the kernels are Mosaic(TPU)-only and need
    64-aligned L."""
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu" and L % PALLAS_L_MULTIPLE == 0


def pallas_policy(L: int, use_pallas: object = "auto",
                  backend: Optional[str] = None,
                  B: Optional[int] = None) -> bool:
    """Decide whether the Pallas path runs for sequence length ``L``.

    ``use_pallas`` is ``ModelConfig.use_pallas_egnn``:
    True | False | "auto" | "interpret".
    - True: forced on; RAISES off-TPU — Mosaic kernels on a CPU/GPU backend
      would otherwise silently run in interpret mode, orders of magnitude
      slower than the XLA path they replace.
    - "interpret": forced on anywhere, interpret mode knowingly accepted
      (CPU parity tests).
    - False/None: forced off everywhere — including the clash kernel.
    - "auto": on in the measured-faster regime — TPU + aligned + (L >= 128,
      or L = 64 with the cross-batch fold active (even ``B``) and
      B*L >= PALLAS_AUTO_MIN_ROWS). Callers that know the batch size pass
      ``B``; without it the L=64 bucket conservatively stays on XLA.
    """
    if use_pallas == "auto":
        if not pallas_supported(L, backend):
            return False
        if L >= PALLAS_AUTO_MIN_L:
            return True
        return (B is not None and B % 2 == 0
                and B * L >= PALLAS_AUTO_MIN_ROWS)
    if use_pallas == "interpret":
        return True
    if use_pallas:
        if backend is None:
            backend = jax.default_backend()
        if backend != "tpu":
            raise RuntimeError(
                "use_pallas_egnn=True forces the Mosaic kernels, but the "
                f"active backend is {backend!r}: they would run in interpret "
                "mode, orders of magnitude slower than the XLA path. Use "
                '"auto" (routes to XLA off-TPU) or "interpret" to knowingly '
                "run interpret-mode kernels (CPU parity tests).")
        return True
    return bool(use_pallas)
