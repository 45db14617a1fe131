#!/usr/bin/env python3
"""Validate the roofline's VPU constants against the compiler (r4 weak #6).

``scripts/roofline.py`` models the train step's elementwise demand as
``TRAIN_MULT * FWD_ELOPS * DL*B*L*K*H`` with hand-derived constants
FWD_ELOPS=32 el-op/element and TRAIN_MULT=3.2. The round-4 verdict
correctly flagged that the whole "measured = 1.06-1.09x of the VPU bound"
claim rests on those two numbers being right.

This script derives both from XLA instead of by hand:

1. It jits the decoder's *actual* edge chain (the XLA band path,
   models/decoder.py:143-155, minus the band gathers whose traffic the
   HBM term owns) standalone at the roofline shapes and reads the
   compiled module's cost analysis (flops + transcendentals).
2. It subtracts the chain's exact matmul FLOPs (2*B*L*K*H*H for each of
   phi_e2/phi_x1, 2*B*L*K*H for phi_x2) — the roofline's MXU term
   already accounts those — and divides by B*L*K*H elements. That is a
   compiler-counted FWD_ELOPS.
3. It repeats for the training direction, both ways the framework runs
   it: grad-with-saved-activations (XLA band path) and
   grad-under-jax.checkpoint (the recompute schedule the Pallas merged
   VJP implements). The ratio is a compiler-counted TRAIN_MULT.
4. Units: XLA counts a silu as ~1 transcendental + ~3 flops while the
   hand model counts it as 2 el-ops (and the microbenched ceiling is
   calibrated in hand-units on a silu chain). The script therefore also
   costs one fused silu through the same pipeline and uses
   (el-ops-per-silu)/2 as the conversion factor, so the output constants
   are directly comparable to (and substitutable for) the hand ones.

Writes runs/vpu_constants.json. Pure cost-analysis — runs on the CPU
backend, no TPU time needed; the *rates* stay microbenchmarked on-chip.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _cost(fn, *args):
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return (float(ca.get("flops", 0.0)),
            float(ca.get("transcendentals", 0.0)))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    B, L, H = 16, 256, 256
    K = 2 * 40 + 1          # max_neighbors=40 band
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.normal(0, 1, s), jnp.float32)
    a_i = f32(B, L, H)
    b_j_g = f32(B, L, K, H)      # pre-gathered: gather traffic is HBM-term
    x = f32(B, L, 3)
    x_j = f32(B, L, K, 3)
    mask_k = jnp.ones((B, L, K, 1), jnp.float32)
    k_d2, k_e2, b_e2 = f32(1, H), f32(H, H), f32(H)
    k_x1, b_x1, k_x2, b_x2 = f32(H, H), f32(H), f32(H, 1), f32(1)

    def chain(a_i, b_j_g, x, x_j, mask_k, k_d2, k_e2, b_e2, k_x1, b_x1,
              k_x2, b_x2):
        """models/decoder.py:143-155 verbatim (minus band_gather)."""
        rel = x[:, :, None, :] - x_j
        d2 = jnp.sum(jnp.square(rel), axis=-1, keepdims=True)
        pre = a_i[:, :, None, :] + b_j_g + d2 * k_d2
        m = nn.silu(pre)
        m = nn.silu(m @ k_e2 + b_e2)
        agg = jnp.sum(m * mask_k, axis=2)
        w = nn.silu(m @ k_x1 + b_x1)
        w = w @ k_x2 + b_x2
        delta = jnp.sum((w * mask_k) * rel, axis=2)
        return agg, delta

    params = (a_i, b_j_g, x, x_j, mask_k, k_d2, k_e2, b_e2, k_x1, b_x1,
              k_x2, b_x2)

    def fwd(*p):
        agg, delta = chain(*p)
        return jnp.sum(agg) + jnp.sum(delta)

    allargs = tuple(range(len(params)))   # train grads flow to weights too
    grad_saved = jax.value_and_grad(fwd, argnums=allargs)

    ckpt_chain = jax.checkpoint(chain)

    def fwd_remat(*p):
        agg, delta = ckpt_chain(*p)
        return jnp.sum(agg) + jnp.sum(delta)

    grad_remat = jax.value_and_grad(fwd_remat, argnums=allargs)

    elements = float(B * L * K * H)
    mm_fwd = 2.0 * B * L * K * (H * H + H * H + H)   # phi_e2, phi_x1, phi_x2
    mm_saved = 3.0 * mm_fwd                          # + dgrad + wgrad each
    mm_remat = 4.0 * mm_fwd                          # checkpoint reruns fwd

    f_fl, f_tr = _cost(fwd, *params)
    s_fl, s_tr = _cost(grad_saved, *params)
    r_fl, r_tr = _cost(grad_remat, *params)

    # calibration: XLA's el-op count for one silu (hand model says 2.0)
    y = f32(1 << 20)
    c_fl, c_tr = _cost(lambda y: jnp.sum(nn.silu(y)), y)
    silu_elops_xla = (c_fl + c_tr - (1 << 20)) / float(1 << 20)  # -sum
    to_hand = 2.0 / max(silu_elops_xla, 1e-9)

    fwd_el = f_fl + f_tr - mm_fwd
    saved_el = s_fl + s_tr - mm_saved
    remat_el = r_fl + r_tr - mm_remat

    fwd_elops_xla = fwd_el / elements
    out = {
        "shape": {"B": B, "L": L, "K": K, "H": H},
        "xla_units": {
            "silu_elops_per_element": round(silu_elops_xla, 3),
            "fwd_elops_per_element": round(fwd_elops_xla, 3),
            "train_mult_saved": round(saved_el / fwd_el, 3),
            "train_mult_remat": round(remat_el / fwd_el, 3),
        },
        "hand_units": {
            # same silu-weighted units as roofline.py's microbenched
            # ceiling: FWD_ELOPS comparable to the hand 32.0
            "FWD_ELOPS": round(fwd_elops_xla * to_hand, 2),
            "TRAIN_MULT_saved": round(saved_el / fwd_el, 3),
            "TRAIN_MULT_remat": round(remat_el / fwd_el, 3),
            "hand_FWD_ELOPS": 32.0,
            "hand_TRAIN_MULT": 3.2,
        },
        "raw": {
            "fwd": {"flops": f_fl, "transcendentals": f_tr},
            "grad_saved": {"flops": s_fl, "transcendentals": s_tr},
            "grad_remat": {"flops": r_fl, "transcendentals": r_tr},
            "matmul_flops_fwd": mm_fwd,
            "matmul_flops_saved": mm_saved,
            "matmul_flops_remat": mm_remat,
        },
    }
    path = os.path.join(REPO, "runs", "vpu_constants.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["hand_units"]))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
