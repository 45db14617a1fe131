#!/usr/bin/env python3
"""Benchmark: full train-step throughput of the flagship HierCVAE.

Prints ONE JSON line:
  {"metric": "train_step_samples_per_sec", "value": N, "unit": "samples/s",
   "vs_baseline": R}

``vs_baseline`` is measured against the CPU PyTorch reference
(/root/reference) running the same train step at the same shapes — the
BASELINE.md north-star comparison ("throughput vs CPU PyTorch reference").
The torch number is cached in BENCH_BASELINE_CACHE.json (it is hardware-
stable on this image) so repeated bench runs don't pay the reference's
minutes-long CPU steps.

Config: reference default dims (d_model 512, 6 layers, EGNN 8x256, W=40,
ESM width 1280), batch 4, L=256, bf16 matmuls on TPU (fp32 losses).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "BENCH_BASELINE_CACHE.json")

B = int(os.environ.get("BENCH_BATCH", "4"))
L = int(os.environ.get("BENCH_LEN", "256"))
STEPS = int(os.environ.get("BENCH_STEPS", "20"))
SEQD = 1280


def bench_tpu() -> float:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from protein_ensemble_vae_tpu.config import LossWeights, ModelConfig
    from protein_ensemble_vae_tpu.models import HierCVAE
    from protein_ensemble_vae_tpu.train.training import (create_train_state,
                                                         make_train_step)

    dtype_name = os.environ.get("BENCH_DTYPE", "bf16")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    # Fused Pallas band kernel (BENCH_PALLAS=1): 1.8x over the XLA band path
    # in isolation (16.4ms vs 30.3ms decoder fwd+bwd at B4/L256 bf16), but at
    # the full-step level XLA's whole-graph fusion reaches parity (944 vs 921
    # samples/s), so the default stays on the XLA path.
    use_pallas = (jax.default_backend() == "tpu"
                  and os.environ.get("BENCH_PALLAS", "0") == "1"
                  and dtype_name == "bf16")
    cfg = ModelConfig(seqemb_dim=SEQD, use_pallas_egnn=use_pallas)
    model = HierCVAE(cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    conf = dict(
        n=jnp.array(rng.normal(0, 3, (B, L, 3)), jnp.float32),
        ca=jnp.array(rng.normal(0, 3, (B, L, 3)), jnp.float32),
        c=jnp.array(rng.normal(0, 3, (B, L, 3)), jnp.float32),
        mask=jnp.ones((B, L), jnp.float32),
        seq_emb=jnp.array(rng.normal(0, 1, (B, L, SEQD)), jnp.float32),
        dihedrals=jnp.array(rng.normal(0, 1, (B, L, 6)), jnp.float32),
        seq_labels=jnp.zeros((B, L), jnp.int32),
    )
    batch = {"inp": conf, "tgt": dict(conf)}
    state = create_train_state(model, jax.random.PRNGKey(0), conf)
    step = make_train_step(model, LossWeights(), train=True)

    args = (jax.random.PRNGKey(1), jnp.float32(1.0), jnp.float32(0.5),
            jnp.float32(3e-5))
    state, m = step(state, batch, *args)           # compile
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, batch, *args)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return B * STEPS / dt


def bench_torch_reference() -> float:
    """Reference PyTorch train step on CPU at the same shapes."""
    sys.path.insert(0, "/root/reference/models")
    import torch
    from losses import compute_total_loss
    from model import HierCVAE as RefHierCVAE

    torch.manual_seed(0)
    model = RefHierCVAE(seqemb_dim=SEQD)
    opt = torch.optim.Adam(model.parameters(), lr=3e-5)
    seq = torch.randn(B, L, SEQD)
    n = torch.randn(B, L, 3) * 3
    ca = torch.randn(B, L, 3) * 3
    c = torch.randn(B, L, 3) * 3
    dih = torch.randn(B, L, 6)
    mask = torch.ones(B, L)
    labels = torch.zeros(B, L, dtype=torch.long)

    def one_step():
        out = model(seq, n, ca, c, dih, mask)
        pred_n, pred_ca, pred_c, pred_seq, mu_g, lv_g, mu_l, lv_l = out
        d = compute_total_loss(
            pred_N=pred_n, pred_CA=pred_ca, pred_C=pred_c, pred_seq=pred_seq,
            target_N=n, target_CA=ca, target_C=c, target_seq_labels=labels,
            mask=mask, mu_g=mu_g, lv_g=lv_g, mu_l=mu_l, lv_l=lv_l,
            target_dihedrals=dih, klw_g=1.0, klw_l=0.5, w_pair=10.0,
            pair_stride=8, w_dihedral=20.0, w_rama=400.0, w_bond=500.0,
            w_angle=500.0, w_rec=10.0, w_seq=50.0, w_clash=300.0)
        opt.zero_grad()
        d["total"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
        opt.step()

    one_step()  # warmup
    steps = 3
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return B * steps / dt


def get_baseline() -> float:
    key = f"B{B}_L{L}"
    cache = {}
    if os.path.exists(CACHE):
        try:
            cache = json.load(open(CACHE))
        except Exception:
            cache = {}
    if key in cache:
        return cache[key]
    if not os.path.isdir("/root/reference/models"):
        return 0.0
    try:
        val = bench_torch_reference()
    except Exception as e:
        print(f"# torch baseline failed: {e}", file=sys.stderr)
        return 0.0
    cache[key] = val
    try:
        json.dump(cache, open(CACHE, "w"), indent=2)
    except Exception:
        pass
    return val


def main():
    ours = bench_tpu()
    base = get_baseline()
    vs = (ours / base) if base > 0 else None
    print(json.dumps({
        "metric": "train_step_samples_per_sec",
        "value": round(ours, 3),
        "unit": "samples/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
