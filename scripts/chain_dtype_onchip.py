"""On-chip check of the Pallas EGNN band kernel's chain_dtype knob.

Runs fwd+bwd at the flagship decoder shape (B16/L256/Hd256/W40) in both
chain dtypes on the real TPU, reports:
  - value agreement (bf16 chain vs fp32 chain, and vs the XLA band path
    computed in bf16 — the numerics the decoder must match),
  - scan-differenced kernel time per call (the only honest clock on this
    tunnel, see CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/chain_dtype_onchip.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from protein_ensemble_vae_tpu.ops.pallas.egnn_band import egnn_band_fused

B, L, Hd, W = 16, 256, 256, 40


def make_inputs(key):
    ks = jax.random.split(key, 12)
    a = jax.random.normal(ks[0], (B, L, Hd), jnp.float32) * 0.3
    bs = jax.random.normal(ks[1], (B, L, Hd), jnp.float32) * 0.3
    x = jax.random.normal(ks[2], (B, L, 3), jnp.float32) * 3.0
    cm = (jax.random.uniform(ks[3], (B, L)) > 0.1).astype(jnp.float32)
    w_d = jax.random.normal(ks[4], (1, Hd), jnp.float32) * 0.05
    w_e2 = jax.random.normal(ks[5], (Hd, Hd), jnp.float32) * 0.06
    b_e2 = jax.random.normal(ks[6], (Hd,), jnp.float32) * 0.05
    w_x1 = jax.random.normal(ks[7], (Hd, Hd), jnp.float32) * 0.06
    b_x1 = jax.random.normal(ks[8], (Hd,), jnp.float32) * 0.05
    w_x2 = jax.random.normal(ks[9], (Hd, 1), jnp.float32) * 0.06
    b_x2 = jax.random.normal(ks[10], (1,), jnp.float32) * 0.05
    return (a, bs, x, cm, w_d, w_e2, b_e2, w_x1, b_x1, w_x2, b_x2)


def loss_fn(args, cdt):
    agg, delta = egnn_band_fused(*args, W, None, cdt)
    return jnp.sum(agg * agg) * 1e-3 + jnp.sum(delta * delta) * 1e-3


def timed_scan(args, cdt, n):
    """n fwd+bwd passes chained so the device really does the work."""
    def body(carry, _):
        g = jax.grad(lambda a: loss_fn((a,) + args[1:], cdt))(carry)
        return carry + 1e-6 * g, ()
    out, _ = jax.lax.scan(body, args[0], None, length=n)
    return jnp.sum(out)


def measure(args, cdt):
    f = jax.jit(timed_scan, static_argnums=(1, 2))
    # warm both scan lengths
    float(f(args, cdt, 2)); float(f(args, cdt, 6))
    t0 = time.perf_counter(); float(f(args, cdt, 2)); t1 = time.perf_counter()
    float(f(args, cdt, 6)); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / 4.0 * 1e3  # ms per fwd+bwd


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    args = make_inputs(jax.random.PRNGKey(0))

    fwd = jax.jit(lambda a, cdt: egnn_band_fused(*((a,) + args[1:]), W, None,
                                                 cdt),
                  static_argnums=1)
    agg32, d32 = fwd(args[0], jnp.float32)
    agg16, d16 = fwd(args[0], jnp.bfloat16)

    def rel(x, y):
        return float(jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(y)) + 1e-9))

    print(f"fwd agg  bf16-vs-fp32 chain rel-max: {rel(agg16, agg32):.3e}")
    print(f"fwd delta bf16-vs-fp32 chain rel-max: {rel(d16, d32):.3e}")

    g32 = jax.jit(jax.grad(loss_fn), static_argnums=1)(args, jnp.float32)
    g16 = jax.jit(jax.grad(loss_fn), static_argnums=1)(args, jnp.bfloat16)
    names = ["a", "bs", "x", "cm", "w_d", "w_e2", "b_e2", "w_x1", "b_x1",
             "w_x2", "b_x2"]
    worst = max((rel(g16[i], g32[i]), names[i]) for i in range(len(g32))
                if names[i] != "cm")
    print(f"bwd worst grad rel-max: {worst[0]:.3e} ({worst[1]})")

    t32 = measure(args, jnp.float32)
    t16 = measure(args, jnp.bfloat16)
    print(f"fwd+bwd per call: fp32-chain {t32:.2f} ms | bf16-chain "
          f"{t16:.2f} ms | speedup {t32 / t16:.2f}x")


if __name__ == "__main__":
    main()
