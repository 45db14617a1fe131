"""Pallas kernel tests (interpret mode on CPU): value + gradient parity of
the blocked clash kernel against the dense reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protein_ensemble_vae_tpu.losses import clash_loss
from protein_ensemble_vae_tpu.ops.pallas.clash import clash_loss_pallas


def _batch(rng, B=2, L=40, holes=True):
    n = rng.normal(0, 4, (B, L, 3)).astype(np.float32)
    ca = rng.normal(0, 4, (B, L, 3)).astype(np.float32)
    c = rng.normal(0, 4, (B, L, 3)).astype(np.float32)
    mask = np.ones((B, L), np.float32)
    if holes:
        mask[0, -6:] = 0.0
        mask[1, 7] = 0.0
    return jnp.array(n), jnp.array(ca), jnp.array(c), jnp.array(mask)


def test_clash_value_parity(rng):
    n, ca, c, mask = _batch(rng)
    dense = clash_loss(n, ca, c, mask)
    pallas = clash_loss_pallas(n, ca, c, mask)
    np.testing.assert_allclose(float(pallas), float(dense), rtol=1e-3)


def test_clash_value_parity_dense_contacts(rng):
    # crowded coords -> many clashes
    n, ca, c, mask = _batch(rng)
    n, ca, c = n * 0.3, ca * 0.3, c * 0.3
    dense = clash_loss(n, ca, c, mask)
    pallas = clash_loss_pallas(n, ca, c, mask)
    assert float(dense) > 0
    # |a|^2+|b|^2-2ab distance form vs direct-diff: fp32 accumulation order
    np.testing.assert_allclose(float(pallas), float(dense), rtol=2e-3)


def test_clash_grad_parity(rng):
    n, ca, c, mask = _batch(rng)
    n, ca, c = n * 0.3, ca * 0.3, c * 0.3

    def f_dense(n, ca, c):
        return clash_loss(n, ca, c, mask)

    def f_pallas(n, ca, c):
        return clash_loss_pallas(n, ca, c, mask)

    gd = jax.grad(f_dense, argnums=(0, 1, 2))(n, ca, c)
    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(n, ca, c)
    for a, b in zip(gd, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-6)


def test_clash_jit_and_nonsquare(rng):
    # L not a multiple of the tile to exercise padding
    n, ca, c, mask = _batch(rng, B=1, L=37, holes=False)
    dense = clash_loss(n, ca, c, mask)
    pallas = jax.jit(lambda *a: clash_loss_pallas(*a))(n, ca, c, mask)
    np.testing.assert_allclose(float(pallas), float(dense), rtol=1e-3)


# ---------------------------------------------------------------------------
# Fused EGNN band kernel
# ---------------------------------------------------------------------------

from protein_ensemble_vae_tpu.ops.pallas.egnn_band import egnn_band_fused


def _band_reference(a, bs, x, cmask, w_d, w_e2, b_e2, w_x1, b_x1, w_x2,
                    b_x2, W):
    """Plain-jnp reference of the fused kernel's math.

    Runs under HIGHEST matmul precision: on real TPU the default is bf16
    MXU passes, and the kernel under test is invoked with HIGHEST."""
    from protein_ensemble_vae_tpu.models.decoder import band_indices, band_gather

    B, L, Hd = a.shape
    with jax.default_matmul_precision("highest"):
        nbr_idx, in_range = band_indices(L, W)
        cm = cmask.astype(bool)
        nbr_valid = (in_range[None] & cm[:, :, None] & cm[:, nbr_idx])
        mask_k = nbr_valid.astype(jnp.float32)[..., None]
        x_j = band_gather(x, nbr_idx)
        rel = x[:, :, None, :] - x_j
        d2 = jnp.sum(rel ** 2, -1, keepdims=True)
        pre = a[:, :, None, :] + band_gather(bs, nbr_idx) + d2 * w_d
        m = jax.nn.silu(pre)
        m = jax.nn.silu(m @ w_e2 + b_e2)
        agg = jnp.sum(m * mask_k, axis=2)
        w = jax.nn.silu(m @ w_x1 + b_x1) @ w_x2 + b_x2
        delta = jnp.sum((w * mask_k) * rel, axis=2)
        return agg, delta


def _egnn_inputs(rng, B=2, L=64, Hd=8, W=4):
    a = jnp.array(rng.normal(0, 1, (B, L, Hd)), jnp.float32)
    bs = jnp.array(rng.normal(0, 1, (B, L, Hd)), jnp.float32)
    x = jnp.array(rng.normal(0, 1, (B, L, 3)), jnp.float32)
    cmask = np.ones((B, L), np.float32)
    cmask[0, -10:] = 0.0
    params = dict(
        w_d=jnp.array(rng.normal(0, 0.5, (1, Hd)), jnp.float32),
        w_e2=jnp.array(rng.normal(0, 0.3, (Hd, Hd)), jnp.float32),
        b_e2=jnp.array(rng.normal(0, 0.1, (Hd,)), jnp.float32),
        w_x1=jnp.array(rng.normal(0, 0.3, (Hd, Hd)), jnp.float32),
        b_x1=jnp.array(rng.normal(0, 0.1, (Hd,)), jnp.float32),
        w_x2=jnp.array(rng.normal(0, 0.3, (Hd, 1)), jnp.float32),
        b_x2=jnp.array(rng.normal(0, 0.1, (1,)), jnp.float32),
    )
    return a, bs, x, jnp.array(cmask), params


def test_egnn_fused_forward_parity(rng):
    a, bs, x, cmask, p = _egnn_inputs(rng)
    W = 4
    agg_k, delta_k = egnn_band_fused(a, bs, x, cmask, p["w_d"], p["w_e2"],
                                     p["b_e2"], p["w_x1"], p["b_x1"],
                                     p["w_x2"], p["b_x2"], W,
                                     jax.lax.Precision.HIGHEST)
    agg_r, delta_r = _band_reference(a, bs, x, cmask, **p, W=W)
    np.testing.assert_allclose(np.asarray(agg_k), np.asarray(agg_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(delta_k), np.asarray(delta_r),
                               rtol=1e-4, atol=1e-5)


def test_egnn_fused_grad_parity(rng):
    a, bs, x, cmask, p = _egnn_inputs(rng)
    W = 4
    ct_agg = jnp.array(rng.normal(0, 1, a.shape), jnp.float32)
    ct_delta = jnp.array(rng.normal(0, 1, x.shape), jnp.float32)

    def loss_k(a, bs, x, w_d, w_e2, b_e2, w_x1, b_x1, w_x2, b_x2):
        agg, delta = egnn_band_fused(a, bs, x, cmask, w_d, w_e2, b_e2,
                                     w_x1, b_x1, w_x2, b_x2, W,
                                     jax.lax.Precision.HIGHEST)
        return jnp.sum(agg * ct_agg) + jnp.sum(delta * ct_delta)

    def loss_r(a, bs, x, w_d, w_e2, b_e2, w_x1, b_x1, w_x2, b_x2):
        with jax.default_matmul_precision("highest"):
            agg, delta = _band_reference(a, bs, x, cmask, w_d, w_e2, b_e2,
                                         w_x1, b_x1, w_x2, b_x2, W)
            return jnp.sum(agg * ct_agg) + jnp.sum(delta * ct_delta)

    args = (a, bs, x, p["w_d"], p["w_e2"], p["b_e2"], p["w_x1"], p["b_x1"],
            p["w_x2"], p["b_x2"])
    gk = jax.grad(loss_k, argnums=tuple(range(10)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(10)))(*args)
    names = ["a", "bs", "x", "w_d", "w_e2", "b_e2", "w_x1", "b_x1",
             "w_x2", "b_x2"]
    for nm, k, r in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   rtol=2e-3, atol=1e-4,
                                   err_msg=f"grad {nm}")


def test_egnn_layer_pallas_path_matches_xla(rng):
    """Full EGNNBandLayer with use_pallas vs without, same params."""
    from protein_ensemble_vae_tpu.models import EGNNBandLayer
    from protein_ensemble_vae_tpu.models.decoder import band_indices

    B, L, H, W = 2, 64, 8, 4
    h = jnp.array(rng.normal(0, 1, (B, L, H)), jnp.float32)
    x = jnp.array(rng.normal(0, 1, (B, L, 3)), jnp.float32)
    cmask = jnp.ones((B, L), jnp.float32)
    nbr_idx, in_range = band_indices(L, W)
    nbr_valid = jnp.broadcast_to(in_range[None], (B, L, 2 * W + 1))
    deg_inv = 1.0 / jnp.maximum(jnp.sum(nbr_valid, -1).astype(jnp.float32), 1.0)

    xla_layer = EGNNBandLayer(hidden=H, use_pallas=False)
    params = xla_layer.init(jax.random.PRNGKey(0), h, x, nbr_idx, nbr_valid,
                            deg_inv, cmask)
    with jax.default_matmul_precision("highest"):
        h1, x1 = xla_layer.apply(params, h, x, nbr_idx, nbr_valid, deg_inv,
                                 cmask)
        pallas_layer = EGNNBandLayer(hidden=H, use_pallas="interpret")
        h2, x2 = pallas_layer.apply(params, h, x, nbr_idx, nbr_valid,
                                    deg_inv, cmask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-4,
                               atol=1e-5)


def test_egnn_fused_bf16_chain(rng):
    """chain_dtype=bf16 (the production setting for bf16 models — the VPU
    gap-closer from the r4 roofline) must track the fp32 chain within bf16
    rounding, return fp32 outputs, and keep grads finite and close."""
    a, bs, x, cmask, p = _egnn_inputs(rng)
    W = 4
    args = (a, bs, x, cmask, p["w_d"], p["w_e2"], p["b_e2"], p["w_x1"],
            p["b_x1"], p["w_x2"], p["b_x2"], W, None)
    agg32, d32 = egnn_band_fused(*args, jnp.float32)
    agg16, d16 = egnn_band_fused(*args, jnp.bfloat16)
    assert agg16.dtype == jnp.float32 and d16.dtype == jnp.float32
    scale_a = float(jnp.max(jnp.abs(agg32)))
    scale_d = float(jnp.max(jnp.abs(d32)))
    assert float(jnp.max(jnp.abs(agg16 - agg32))) < 0.03 * scale_a
    assert float(jnp.max(jnp.abs(d16 - d32))) < 0.03 * scale_d

    def loss(cdt, *diff):
        agg, delta = egnn_band_fused(*diff[:3], cmask, *diff[3:], W, None,
                                     cdt)
        return jnp.sum(agg ** 2) + jnp.sum(delta ** 2)

    diff = (a, bs, x, p["w_d"], p["w_e2"], p["b_e2"], p["w_x1"], p["b_x1"],
            p["w_x2"], p["b_x2"])
    g32 = jax.grad(lambda *d: loss(jnp.float32, *d), range(10))(*diff)
    g16 = jax.grad(lambda *d: loss(jnp.bfloat16, *d), range(10))(*diff)
    for k, r in zip(g16, g32):
        assert bool(jnp.all(jnp.isfinite(k)))
        denom = float(jnp.max(jnp.abs(r))) + 1e-6
        assert float(jnp.max(jnp.abs(k - r))) < 0.05 * denom


def test_egnn_fold_sample_isolation(rng):
    """Cross-batch folding (F=2 at L=64) must not mix samples: the folded
    even-batch result equals per-sample (B=1, unfolded) runs stacked."""
    a, bs, x, cmask, p = _egnn_inputs(rng, B=4)
    W = 4
    args = (p["w_d"], p["w_e2"], p["b_e2"], p["w_x1"], p["b_x1"],
            p["w_x2"], p["b_x2"], W, jax.lax.Precision.HIGHEST)
    agg, delta = egnn_band_fused(a, bs, x, cmask, *args)
    for b in range(4):
        agg_b, delta_b = egnn_band_fused(a[b:b + 1], bs[b:b + 1],
                                         x[b:b + 1], cmask[b:b + 1], *args)
        np.testing.assert_allclose(np.asarray(agg[b]), np.asarray(agg_b[0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(delta[b]),
                                   np.asarray(delta_b[0]),
                                   rtol=1e-5, atol=1e-6)
