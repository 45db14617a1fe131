#!/usr/bin/env python3
"""Roofline of the fused train step (VERDICT r3 → r4 ask #1).

Round 3 claimed "~30 % MFU is the practical ceiling of this architecture
on v5e" qualitatively. This script makes the claim quantitative, with
three measured hardware ceilings instead of two assumed ones:

1. **Microbenchmarked ceilings** (same chip, same tunnel-proof
   scan-differenced clock as bench.py):
     - MXU:  chained 4096^3 bf16 matmuls          -> achievable TFLOP/s
     - HBM:  chained y = a + y over 256 MB arrays -> achievable GB/s
     - VPU:  chained 8x silu over a 64 MB tensor  -> achievable Gel-op/s
       (one "el-op" = one elementwise primitive on one element; silu is
       counted as 2 el-ops: sigmoid + mul, matching how the analytic
       model counts the step's elementwise work)
2. **Per-step demand**, from two independent sources:
     - XLA's compiled-module cost analysis of the *donated, fused* train
       step: flops, bytes accessed, transcendentals;
     - the analytic model: matmul FLOPs (bench.model_flops_per_step,
       cross-checked vs XLA to ~5 %), optimizer/param HBM bytes
       (6 fp32 tensors per param per step), and the EGNN edge-chain
       elementwise op count (the VPU term round 3 blamed, now a number).
3. **The verdict**: measured ms/step vs
       T_bound = max(MXU_flops / MXU_rate,
                     HBM_bytes / HBM_rate,
                     VPU_elops / VPU_rate)
   per shape. "Ceiling proven" = measured within 15 % of T_bound
   (VERDICT r3 'Next #1' acceptance bar); a larger gap names the slack
   as schedulable headroom (serialization / dispatch latency) that the
   listed gap-closers should target.

Writes runs/roofline.json and prints a markdown table for RESULTS.md.

Reference for the ceiling targets: v5e public spec 197 TFLOP/s bf16,
819 GB/s HBM (Google Cloud TPU spec sheet); the microbench shows what
fraction of those this tunneled single chip actually delivers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


# ---------------------------------------------------------------- ceilings

def _scan_rate(make_run, n1, n2, repeats=3):
    """Units-per-second via the tunnel-proof two-length scan difference."""
    from protein_ensemble_vae_tpu.utils.profiling import scan_step_time
    return scan_step_time(make_run, n1=n1, n2=n2, repeats=repeats)


def microbench_mxu(dim=4096, n2=64):
    """Achievable bf16 matmul TFLOP/s: y <- normalize(y @ w) chained."""
    import jax
    import jax.numpy as jnp

    w = jnp.asarray(np.random.default_rng(0).normal(0, 0.02, (dim, dim)),
                    jnp.bfloat16)
    y0 = jnp.asarray(np.random.default_rng(1).normal(0, 1, (dim, dim)),
                     jnp.bfloat16)

    def make_run(n):
        @jax.jit
        def run(y, w):
            def body(y, _):
                y = y @ w
                # rescale so the chain can't over/underflow; negligible cost
                y = (y * jax.lax.rsqrt(jnp.float32(dim))).astype(jnp.bfloat16)
                return y, ()
            y, _ = jax.lax.scan(body, y, None, length=n)
            return jnp.float32(y[0, 0])
        return lambda: run(y0, w)

    dt = _scan_rate(make_run, n1=max(n2 // 5, 2), n2=n2)
    return 2.0 * dim ** 3 / dt / 1e12                       # TFLOP/s


def microbench_hbm(mb=256, n2=64):
    """Achievable HBM GB/s: y <- y + a on fp32 arrays far beyond VMEM.

    Each scan iteration reads y and a and writes y: 3 x size bytes.
    """
    import jax
    import jax.numpy as jnp

    n = mb * (1 << 20) // 4
    a = jnp.ones((n,), jnp.float32) * 1e-6
    y0 = jnp.zeros((n,), jnp.float32)

    def make_run(nlen):
        @jax.jit
        def run(y, a):
            def body(y, _):
                return y + a, ()
            y, _ = jax.lax.scan(body, y, None, length=nlen)
            return y[0]
        return lambda: run(y0, a)

    dt = _scan_rate(make_run, n1=max(n2 // 5, 2), n2=n2)
    return 3.0 * n * 4 / dt / 1e9                           # GB/s


def microbench_vpu(mb=64, chain=8, n2=192):
    """Achievable elementwise Gel-op/s on a silu chain (bf16, VMEM-resident
    per tile; `chain` silus fuse per HBM pass so compute dominates traffic).

    One silu = sigmoid + mul = 2 el-ops, the same accounting used for the
    step's analytic elementwise count, so the ceiling and the demand line
    up by construction. Transcendentals cost more than adds on the VPU, so
    this is a silu-weighted ceiling, not a pure-add one — which is the
    right weighting for the EGNN edge chain it models.
    """
    import jax
    import jax.numpy as jnp

    n = mb * (1 << 20) // 2
    y0 = jnp.full((n,), 0.5, jnp.bfloat16)

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

    dt = _scan_rate(make_run, n1=max(n2 // 5, 2), n2=n2)
    return 2.0 * chain * n / dt / 1e9                       # Gel-op/s


def microbench_vpu_mix(mb=64, reps=3, n2=192):
    """Achievable XLA-unit Gel-op/s on a chain with the *edge chain's own
    op mix* (r4 verdict weak #6: the silu-proxy ceiling and the hand
    FWD_ELOPS=32 were the weak links of the VPU bound).

    The compiler-counted fwd edge chain (scripts/validate_vpu_constants.py,
    runs/vpu_constants.json) costs ~22 flops + 3 transcendentals per
    element in XLA cost-analysis units. This proxy executes `reps` rounds
    of silu + 2 FMA-ish updates per element per scan iteration — the same
    transcendental:flop ratio — then *cost-analyzes its own body* so the
    achieved rate is reported in exactly the units the demand is counted
    in. No hand-derived constant touches either side of the division.
    """
    import jax
    import jax.numpy as jnp

    n = mb * (1 << 20) // 2
    y0 = jnp.full((n,), 0.5, jnp.bfloat16)
    c1 = jnp.bfloat16(0.123)

    def one_iter(y):
        for _ in range(reps):
            y = jax.nn.silu(y)
            y = y * c1 + c1
            y = y * y + c1
        return y * c1   # keep the chain bounded

    # self-calibration: XLA-unit cost of one iteration per element
    compiled = jax.jit(lambda y: jnp.float32(one_iter(y)[0])).lower(
        y0).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    elops_per_iter = (float(ca.get("flops", 0.0))
                      + float(ca.get("transcendentals", 0.0))) / n

    def make_run(nlen):
        @jax.jit
        def run(y):
            def body(y, _):
                return one_iter(y), ()
            y, _ = jax.lax.scan(body, y, None, length=nlen)
            # the fetch must depend on EVERY lane: with y[0] alone XLA
            # narrows the elementwise scan to element 0 and the "rate"
            # reads ~100x the VPU's physical peak (measured round 5)
            return jnp.float32(y.sum())
        return lambda: run(y0)

    dt = _scan_rate(make_run, n1=max(n2 // 5, 2), n2=n2)
    return elops_per_iter * n / dt / 1e9, elops_per_iter    # Gel-op(xla)/s


# ---------------------------------------------------------------- demand

def build_step(B, L):
    """The exact bench.py fused train step (donated), plus its pieces."""
    import jax
    import jax.numpy as jnp

    import bench as benchmod
    from protein_ensemble_vae_tpu.config import LossWeights, ModelConfig
    from protein_ensemble_vae_tpu.models import HierCVAE
    from protein_ensemble_vae_tpu.train.training import (create_train_state,
                                                         make_train_step)

    cfg = ModelConfig(seqemb_dim=benchmod.SEQD, use_pallas_egnn="auto")
    model = HierCVAE(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = benchmod._make_batch(B, L, rng)
    state = create_train_state(model, jax.random.PRNGKey(0), batch["inp"])
    step = make_train_step(model, LossWeights(), train=True)
    args = (jax.random.PRNGKey(1), jnp.float32(1.0), jnp.float32(0.5),
            jnp.float32(3e-5))
    return cfg, model, state, batch, step, args


def xla_cost(step, state, batch, args):
    """flops / bytes accessed / transcendentals from the compiled module."""
    lowered = step.lower(state, batch, *args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    keep = {}
    for k in ("flops", "bytes accessed", "transcendentals",
              "bytes accessed output"):
        if k in ca:
            keep[k] = float(ca[k])
    # cost_analysis' "optimal_seconds" is garbage for this module (negative
    # values on the axon plugin, r4 verdict weak #6) — deliberately dropped.
    return keep, compiled


def analytic_demand(cfg, B, L, n_params):
    """Per-step analytic demand by component.

    MXU FLOPs: bench.model_flops_per_step (train = 3x forward).
    HBM bytes (the tensors that *must* cross HBM):
      - optimizer: read + write params/mu/nu, fp32           -> 24 N
      - grads: written by bwd, read by the fused update      ->  8 N
      - batch: seq_emb dominates (B,L,1280 fp32) + coords    (read once)
      - encoder saved-for-bwd: per layer qkv/attn-out/ffn/ln activations
        [B,L,d|ff] bf16 + softmax probs [B,nh,L,L] bf16, written fwd,
        read bwd -> 2x each
      - decoder band path: per layer a_i, b_j [B,L,H] (written by the
        projection GEMMs, saved by the custom VJP, re-read in bwd), agg,
        cotangents, phi_h activations; the K-sized edge tensors NEVER
        touch HBM (recomputed in-kernel) -> that is the kernel's design
    VPU el-ops: the EGNN edge chain on [B,L,K,H]:
      fwd ~32 el-ops per element (pre-add 3, silu 2x2=4 counting
      sigmoid+mul as 2... see inline constants), bwd-with-recompute ~2.2x
      fwd. Constants are estimates good to ~1.5x, stated in the output.
    """
    d, f_, nl, nh = cfg.d_model, cfg.ff, cfg.nlayers, cfg.nhead
    H, DL = cfg.decoder_hidden, cfg.decoder_layers
    K = 2 * cfg.max_neighbors + 1
    E = cfg.seqemb_dim
    T = B * L

    bf2, f4 = 2, 4
    hbm = {}
    hbm["optimizer (p,m,v r+w fp32)"] = 24.0 * n_params
    hbm["grads (bwd write + update read, fp32)"] = 8.0 * n_params
    hbm["batch inputs (seq_emb fp32 + coords)"] = T * E * f4 + 4 * T * 3 * f4
    enc_acts = nl * (T * (4 * d + 2 * f_ + 2 * d) * bf2
                     + B * nh * L * L * bf2)
    hbm["encoder acts saved fwd->read bwd"] = 2.0 * enc_acts
    dec_acts = DL * T * (2 * H          # a_i, b_j (saved by custom VJP)
                         + 2 * H        # agg + its cotangent
                         + 2 * H        # phi_h1/h2 hidden acts
                         + 2 * H        # h in/out + LN stats approx
                         ) * bf2
    hbm["decoder node/band-projection acts (x2)"] = 2.0 * dec_acts
    hbm["loss/head tensors (logits, offsets)"] = 2.0 * T * (20 + 9 + H) * bf2

    # VPU elementwise demand: edge chain, per [B,L,K,H] element. The
    # constants are compiler-derived (scripts/validate_vpu_constants.py
    # cost-analyzes the actual chain and subtracts its exact matmul FLOPs;
    # r4 verdict weak #6) with the original hand estimates as fallback.
    FWD_ELOPS, TRAIN_MULT, source = 32.0, 3.2, "hand-derived"
    vc_path = os.path.join(REPO, "runs", "vpu_constants.json")
    if os.path.exists(vc_path):
        xu = json.load(open(vc_path))["xla_units"]
        FWD_ELOPS = xu["fwd_elops_per_element"]     # XLA cost-analysis units
        TRAIN_MULT = xu["train_mult_remat"]         # Pallas VJP recomputes
        source = "xla-cost-analysis (runs/vpu_constants.json)"
    vpu_elops = TRAIN_MULT * FWD_ELOPS * DL * B * L * K * H
    # dropout threefry: ~2M node elements x ~20 sites x ~16 ops - minor,
    # folded into the estimate's stated ~1.5x accuracy band.

    return hbm, vpu_elops, dict(FWD_ELOPS=FWD_ELOPS, TRAIN_MULT=TRAIN_MULT,
                                source=source)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="4x256,16x256,32x256")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--skip_micro", action="store_true",
                    help="reuse ceilings from an existing runs/roofline.json")
    args_ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from protein_ensemble_vae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from protein_ensemble_vae_tpu.train.training import make_train_step
    from protein_ensemble_vae_tpu.utils.profiling import scan_step_time
    from protein_ensemble_vae_tpu.config import LossWeights

    backend = jax.default_backend()
    kind = jax.devices()[0].device_kind
    print(f"# backend={backend} device={kind}", file=sys.stderr)

    out_path = os.path.join(REPO, "runs", "roofline.json")
    ceilings = None
    if args_ns.skip_micro and os.path.exists(out_path):
        ceilings = json.load(open(out_path)).get("ceilings")
    if not ceilings:
        t0 = time.time()
        mxu = microbench_mxu()
        print(f"# MXU ceiling: {mxu:.1f} TFLOP/s "
              f"({time.time()-t0:.0f}s)", file=sys.stderr)
        t0 = time.time()
        hbm = microbench_hbm()
        print(f"# HBM ceiling: {hbm:.1f} GB/s "
              f"({time.time()-t0:.0f}s)", file=sys.stderr)
        t0 = time.time()
        vpu = microbench_vpu()
        print(f"# VPU ceiling: {vpu:.1f} Gel-op/s (silu-weighted) "
              f"({time.time()-t0:.0f}s)", file=sys.stderr)
        t0 = time.time()
        vpu_mix, mix_elops = microbench_vpu_mix()
        print(f"# VPU ceiling: {vpu_mix:.1f} Gel-op(xla)/s (edge-chain "
              f"mix, {mix_elops:.1f} elops/iter) "
              f"({time.time()-t0:.0f}s)", file=sys.stderr)
        ceilings = {"mxu_tflops": round(mxu, 1), "hbm_gbps": round(hbm, 1),
                    "vpu_gelops": round(vpu, 1),
                    "vpu_gelops_xla": round(vpu_mix, 1),
                    "vpu_mix_elops_per_iter": round(mix_elops, 2),
                    "spec_mxu_tflops": 197.0, "spec_hbm_gbps": 819.0}

    import bench as benchmod
    rows = []
    for shape in args_ns.shapes.split(","):
        B, L = (int(v) for v in shape.split("x"))
        cfg, model, state, batch, step, sargs = build_step(B, L)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(state.params))
        cost, compiled = xla_cost(step, state, batch, sargs)

        # measured per-step time, same methodology AND same compiled
        # module as bench.py (bench.make_fori_runner: runtime fori bound
        # -> one compile per shape, persistent-cache-shared with bench)
        raw_step = make_train_step(model, LossWeights(), train=True,
                                   jit_wrapper=lambda f: f)
        make_run = benchmod.make_fori_runner(raw_step, state, batch, sargs)

        n1 = max(args_ns.steps // 5, 2)
        float(make_run(n1)())
        dt = scan_step_time(make_run, n1=n1, n2=args_ns.steps)

        mxu_flops = benchmod.model_flops_per_step(cfg, B, L)
        hbm_tbl, vpu_elops, vpu_consts = analytic_demand(cfg, B, L, n_params)
        hbm_analytic = sum(hbm_tbl.values())
        hbm_xla = cost.get("bytes accessed", 0.0)

        t_mxu = mxu_flops / (ceilings["mxu_tflops"] * 1e12)
        # XLA's bytes-accessed over-counts VMEM-resident fusion traffic;
        # the analytic table counts only true HBM crossings. Use analytic
        # for the bound, report both.
        t_hbm = hbm_analytic / (ceilings["hbm_gbps"] * 1e9)
        # demand and ceiling must share units: compiler-counted el-ops
        # divide by the mix-matched XLA-unit rate; the hand fallback
        # divides by the silu-weighted rate (pre-r5 behavior).
        xla_units = vpu_consts["source"].startswith("xla")
        if xla_units and "vpu_gelops_xla" not in ceilings:
            raise SystemExit(
                "runs/vpu_constants.json provides XLA-unit demand but the "
                "cached ceilings predate microbench_vpu_mix — rerun "
                "without --skip_micro")
        vpu_rate = ceilings["vpu_gelops_xla" if xla_units else "vpu_gelops"]
        t_vpu = vpu_elops / (vpu_rate * 1e9)
        t_bound = max(t_mxu, t_hbm, t_vpu)
        binding = {t_mxu: "MXU", t_hbm: "HBM", t_vpu: "VPU"}[t_bound]

        row = dict(
            B=B, L=L, n_params=n_params,
            measured_ms=round(dt * 1e3, 2),
            mxu_flops=mxu_flops, hbm_bytes_analytic=hbm_analytic,
            hbm_bytes_xla=hbm_xla, vpu_elops=vpu_elops,
            xla_cost=cost,
            t_mxu_ms=round(t_mxu * 1e3, 2),
            t_hbm_ms=round(t_hbm * 1e3, 2),
            t_vpu_ms=round(t_vpu * 1e3, 2),
            t_bound_ms=round(t_bound * 1e3, 2),
            binding=binding,
            measured_over_bound=round(dt / t_bound, 2),
            hbm_table={k: round(v / 1e6, 1) for k, v in hbm_tbl.items()},
            vpu_constants=vpu_consts,
        )
        rows.append(row)
        print(f"# B{B}/L{L}: measured {dt*1e3:.2f} ms | bound "
              f"{t_bound*1e3:.2f} ms ({binding}) | MXU {t_mxu*1e3:.2f} "
              f"HBM {t_hbm*1e3:.2f} VPU {t_vpu*1e3:.2f} | x"
              f"{dt/t_bound:.2f}", file=sys.stderr)

    os.makedirs(os.path.join(REPO, "runs"), exist_ok=True)
    result = {"device": kind, "backend": backend, "ceilings": ceilings,
              "rows": rows}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))

    # markdown for RESULTS.md
    print("\n| shape | measured | MXU bound | HBM bound | VPU bound | "
          "roofline | measured/bound | binding |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| B{r['B']}/L{r['L']} | {r['measured_ms']} ms | "
              f"{r['t_mxu_ms']} | {r['t_hbm_ms']} | {r['t_vpu_ms']} | "
              f"{r['t_bound_ms']} ms | {r['measured_over_bound']}x | "
              f"{r['binding']} |", file=sys.stderr)


if __name__ == "__main__":
    main()
