"""Pallas TPU kernel: fused EGNN band-layer message passing.

The XLA banded formulation (models/decoder.py) materializes several
[B, L, K, H] tensors in HBM per layer (K = 2W+1 = 81 neighbors): edge
pre-activations, messages, and edge weights — ~85 MB each at L=256/H=256.
Profiling shows the decoder at ~8-16% MXU utilization: HBM-bandwidth bound.

This kernel streams the band through VMEM: for each 64-residue receiver
tile it loops over the K band offsets, slicing the (zero-padded) sender
projections, running the edge MLP chain on-chip, and accumulating message
sums and coordinate deltas — nothing K-sized ever touches HBM.

Algebra (identical to the jnp path, same parameters):
    pre[i,k] = a[i] + bs[j] + d2(i,j) * w_d        j = i + k - W
    m  = silu(silu(pre) @ W_e2 + b_e2)
    agg[i]       = sum_k m * valid(i,k)
    raw_delta[i] = sum_k (silu(m @ W_x1 + b_x1) @ w_x2 + b_x2) * valid * rel
(valid(i,k) = in-range & k != W & cmask_i & cmask_j; callers apply
deg_inv * 0.2 to raw_delta.)

Custom VJP with full recomputation (nothing K-sized is saved), ONE
receiver-centric sweep: per edge the chain is recomputed once and emits
d_a / the receiver part of d_x directly, while the sender cotangents
(cot_pre -> d_bs, -d_rel -> d_x) accumulate into [T+8]-row window buffers
at the offset's static row and are added to the W-padded sender outputs
with one 8-aligned read-modify-write per offset group. (An earlier design
ran a second sender-centric kernel that recomputed the whole chain again —
4 extra matmuls per edge, ~1.5x backward cost.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

def _tile(L: int) -> int:
    """Receiver/sender tile: 128 rows when possible (full MXU sublanes),
    64 otherwise (all length buckets are multiples of 64)."""
    return 128 if L % 128 == 0 else 64


def _fold(B: int, L: int) -> int:
    """Cross-batch fold factor: when the tile is only 64 rows (L not
    128-aligned), stack F samples into the matmul row dimension so the
    edge-MLP matmuls run at full 128-row MXU occupancy. Sample isolation
    is free — each sample slices only its own W-padded sender rows, so no
    cross-sample edge can form. F=1 when the batch doesn't divide.
    PEV_EGNN_FOLD=0 disables folding (debug / fallback)."""
    import os
    if os.environ.get("PEV_EGNN_FOLD", "1") == "0":
        return 1
    if _tile(L) >= 128:
        return 1
    return 2 if B % 2 == 0 else 1


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sigmoid(x):
    # NOT jax.nn.sigmoid: Mosaic's `logistic` lowering broadcasts an f32
    # constant into the result vector, which fails verification for bf16
    # operands ("vector.broadcast ... f32 -> vector<...xbf16>"). The
    # explicit form with dtype-matched constants lowers cleanly for both
    # dtypes and matches XLA's bf16 silu bit-for-bit (probe in r4 notes).
    one = jnp.asarray(1.0, x.dtype)
    return one / (one + jnp.exp(-x))


def _silu(x):
    return x * _sigmoid(x)


def _dsilu(x):
    one = jnp.asarray(1.0, x.dtype)
    s = _sigmoid(x)
    return s * (one + x * (one - s))



def _mm(a, b, precision=None, out_dtype=jnp.float32):
    # Mosaic requires a 32-bit matmul accumulator ("tpu.matmul acc must be
    # 32-bit"), so the dot always emits fp32 and the result is cast to the
    # chain dtype afterwards — one cheap VPU pass vs the chain's ~30.
    out = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=precision)
    return out if out_dtype == jnp.float32 else out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _win(ref, t0, n):
    """Aligned window load: rows [t0, t0+n) of a W-padded ref."""
    return ref[0, pl.ds(t0, n), :]


def _fwd_kernel(a_ref, bs_pad_ref, x_ref, x_pad_ref, cm_ref, cm_pad_ref,
                w_d_ref, w_e2_ref, b_e2_ref, w_x1_ref, b_x1_ref, w_x2_ref,
                b_x2_ref, agg_ref, delta_ref, *, K, W, T, F, precision, cdt):
    t = pl.program_id(1)
    t0 = t * T

    def cat(parts):
        # fold F per-sample row blocks into one [F*T, ...] matmul operand
        return parts[0] if F == 1 else jnp.concatenate(parts, axis=0)

    # Refs stay fp32 (the sliding window loads need the fp32 8-row sublane
    # granularity); the edge-MLP chain computes in `cdt` — bf16 runs the
    # binding VPU term ~2.3x faster on v5e (scripts/vpu_dtype_bench.py).
    # Coordinates (x/rel/d2/delta) and accumulators stay fp32 always.
    a = cat([a_ref[f, pl.ds(t0, T), :] for f in range(F)]).astype(cdt)
    x_i = cat([x_ref[f, pl.ds(t0, T), :] for f in range(F)])    # [F*T, 3]
    cm_i = cat([cm_ref[f, pl.ds(t0, T), :] for f in range(F)])  # [F*T, 1]
    w_d = w_d_ref[...][0]                              # [Hd], cdt
    w_e2 = w_e2_ref[...]
    b_e2 = b_e2_ref[...][0]
    w_x1 = w_x1_ref[...]
    b_x1 = b_x1_ref[...][0]
    w_x2 = w_x2_ref[...]                               # [Hd, 1]
    b_x2 = b_x2_ref[...]        # [1,1]; Mosaic can't scalarize bf16

    # Band offsets processed in groups of 8: per group one aligned dynamic
    # window load (start provably 8-aligned), then a static 8-wide inner
    # unroll over value slices. Bounds VMEM stack at 8 live edge chains.
    Hd = a.shape[-1]
    n_groups = (K + 7) // 8

    def group(k8, carry):
        acc_agg, acc_delta = carry
        g0 = pl.multiple_of(k8 * 8, 8)
        wbs = [bs_pad_ref[f, pl.ds(t0 + g0, T + 8), :] for f in range(F)]
        wx = [x_pad_ref[f, pl.ds(t0 + g0, T + 8), :] for f in range(F)]
        wcm = [cm_pad_ref[f, pl.ds(t0 + g0, T + 8), :] for f in range(F)]
        for r in range(8):
            k = g0 + r                                  # traced offset
            keep = jnp.where((k != W) & (k < K), 1.0, 0.0)
            bs_j = cat([jax.lax.slice_in_dim(w, r, r + T, axis=0)
                        for w in wbs]).astype(cdt)
            x_j = cat([jax.lax.slice_in_dim(w, r, r + T, axis=0)
                       for w in wx])
            cm_j = cat([jax.lax.slice_in_dim(w, r, r + T, axis=0)
                        for w in wcm])
            valid_f = cm_i * cm_j * keep                # [F*T, 1] fp32
            valid = valid_f.astype(cdt)

            rel = x_i - x_j
            d2 = jnp.sum(rel * rel, axis=-1, keepdims=True)
            pre = a + bs_j + d2.astype(cdt) * w_d[None, :]
            m1 = _silu(pre)
            u = _mm(m1, w_e2, precision, cdt) + b_e2[None, :]
            m = _silu(u)
            acc_agg = acc_agg + (m * valid).astype(jnp.float32)

            v = _mm(m, w_x1, precision, cdt) + b_x1[None, :]
            w1 = _silu(v)
            wsc = _mm(w1, w_x2, precision, cdt) + b_x2  # [T, 1]
            acc_delta = acc_delta + (wsc * valid).astype(jnp.float32) * rel
        return acc_agg, acc_delta

    acc_agg, acc_delta = jax.lax.fori_loop(
        0, n_groups, group, (jnp.zeros((F * T, Hd), jnp.float32),
                             jnp.zeros((F * T, 3), jnp.float32)))
    for f in range(F):
        agg_ref[f, pl.ds(t0, T), :] = jax.lax.slice_in_dim(
            acc_agg, f * T, (f + 1) * T, axis=0)
        delta_ref[f, pl.ds(t0, T), :] = jax.lax.slice_in_dim(
            acc_delta, f * T, (f + 1) * T, axis=0)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _edge_chain_cotangents(a, bs_j, x_i, x_j, valid_f, w_d, w_e2, b_e2,
                           w_x1, b_x1, w_x2, b_x2, g_agg, g_delta,
                           precision=None, cdt=jnp.float32):
    """Recompute the edge chain for one band offset and return all local
    cotangents: (cot_pre [T,Hd] in cdt, d_rel [T,3] fp32, weight grads fp32).

    a/bs_j/g_agg and all weights arrive in `cdt`; x/rel/g_delta and the
    returned coordinate/weight grads are fp32. Bias grads and w_d's grad
    reduce over the tile rows in fp32 (a bf16 256-row reduction would lose
    ~2 mantissa bits; the cast pass is ~2 el-ops vs the chain's ~30)."""
    valid = valid_f.astype(cdt)
    rel = x_i - x_j
    d2 = jnp.sum(rel * rel, axis=-1, keepdims=True)
    pre = a + bs_j + d2.astype(cdt) * w_d[None, :]
    m1 = _silu(pre)
    u = _mm(m1, w_e2, precision, cdt) + b_e2[None, :]
    m = _silu(u)
    v = _mm(m, w_x1, precision, cdt) + b_x1[None, :]
    w1 = _silu(v)
    wsc = _mm(w1, w_x2, precision, cdt) + b_x2
    wsc_f = wsc.astype(jnp.float32)

    # cot wsc from delta path: g_delta . rel, masked
    cot_wsc_f = (jnp.sum(g_delta * rel, axis=-1, keepdims=True)
                 * valid_f)                             # [T,1] fp32
    cot_wsc = cot_wsc_f.astype(cdt)
    cot_w1 = _mm(cot_wsc, w_x2.T, precision, cdt)       # [T, Hd]
    cot_v = cot_w1 * _dsilu(v)
    cot_m = g_agg * valid + _mm(cot_v, w_x1.T, precision, cdt)
    cot_u = cot_m * _dsilu(u)
    cot_m1 = _mm(cot_u, w_e2.T, precision, cdt)
    cot_pre = cot_m1 * _dsilu(pre)

    # rel cotangent: from wsc*rel product and from d2
    cot_d2 = jnp.sum((cot_pre * w_d[None, :]).astype(jnp.float32),
                     axis=-1, keepdims=True)
    d_rel = g_delta * (wsc_f * valid_f) + 2.0 * rel * cot_d2

    wg = dict(
        w_e2=_mm(m1.T, cot_u, precision),
        b_e2=jnp.sum(cot_u.astype(jnp.float32), axis=0, keepdims=True),
        w_x1=_mm(m.T, cot_v, precision),
        b_x1=jnp.sum(cot_v.astype(jnp.float32), axis=0, keepdims=True),
        w_x2=_mm(w1.T, cot_wsc, precision),
        b_x2=jnp.sum(cot_wsc_f, axis=0, keepdims=True),
        w_d=jnp.sum(cot_pre.astype(jnp.float32) * d2, axis=0,
                    keepdims=True),
    )
    return cot_pre, d_rel, wg


def _bwd_merged_kernel(a_ref, bs_pad_ref, x_ref, x_pad_ref, cm_ref,
                       cm_pad_ref, w_d_ref, w_e2_ref, b_e2_ref, w_x1_ref,
                       b_x1_ref, w_x2_ref, b_x2_ref, g_agg_ref, g_delta_ref,
                       da_ref, dxr_ref, dbs_pad_ref, dxs_pad_ref, dwd_ref,
                       dwe2_ref, dbe2_ref, dwx1_ref, dbx1_ref, dwx2_ref,
                       dbx2_ref, *, K, W, T, L, F, precision, cdt):
    """Single-pass backward: one receiver-centric sweep emits BOTH sides.

    The old design ran a second, sender-centric kernel that recomputed the
    whole edge chain (4 more big matmuls per edge) just to route cot_pre /
    -d_rel to the senders. Here the sender cotangents of edge (i, j=i+k-W)
    land in a [T+8, Hd] window accumulator at static row offset r (the
    position within the 8-wide offset group, via a static pad), and the
    window is added into the W-padded sender outputs with ONE 8-aligned
    read-modify-write per group — grid steps are sequential on TPU, so the
    overlapping windows never race.
    """
    b = pl.program_id(0)
    Hd = a_ref.shape[-1]
    n_tiles = L // T
    n_groups = (K + 7) // 8

    def cat(parts):
        # fold F per-sample row blocks into one [F*T, ...] matmul operand
        return parts[0] if F == 1 else jnp.concatenate(parts, axis=0)

    def unfold(x, f):
        return jax.lax.slice_in_dim(x, f * T, (f + 1) * T, axis=0)

    # fresh sender accumulators for this batch row
    dbs_pad_ref[...] = jnp.zeros(dbs_pad_ref.shape, jnp.float32)
    dxs_pad_ref[...] = jnp.zeros(dxs_pad_ref.shape, jnp.float32)

    w_d = w_d_ref[...][0]
    w_e2 = w_e2_ref[...]
    b_e2 = b_e2_ref[...][0]
    w_x1 = w_x1_ref[...]
    b_x1 = b_x1_ref[...][0]
    w_x2 = w_x2_ref[...]
    b_x2 = b_x2_ref[...]        # [1,1]; Mosaic can't scalarize bf16

    def tile_body(t, wg_carry):
        t0 = pl.multiple_of(t * T, 8)
        a = cat([a_ref[f, pl.ds(t0, T), :] for f in range(F)]).astype(cdt)
        x_i = cat([x_ref[f, pl.ds(t0, T), :] for f in range(F)])
        cm_i = cat([cm_ref[f, pl.ds(t0, T), :] for f in range(F)])
        g_agg = cat([g_agg_ref[f, pl.ds(t0, T), :]
                     for f in range(F)]).astype(cdt)
        g_delta = cat([g_delta_ref[f, pl.ds(t0, T), :] for f in range(F)])

        def group(k8, carry):
            da, dx, g_wd, g_we2, g_be2, g_wx1, g_bx1, g_wx2, g_bx2 = carry
            g0 = pl.multiple_of(k8 * 8, 8)
            wbs = [bs_pad_ref[f, pl.ds(t0 + g0, T + 8), :]
                   for f in range(F)]
            wx = [x_pad_ref[f, pl.ds(t0 + g0, T + 8), :] for f in range(F)]
            wcm = [cm_pad_ref[f, pl.ds(t0 + g0, T + 8), :]
                   for f in range(F)]
            dbs_win = [jnp.zeros((T + 8, Hd), jnp.float32)
                       for _ in range(F)]
            dxs_win = [jnp.zeros((T + 8, 3), jnp.float32)
                       for _ in range(F)]
            for r in range(8):
                k = g0 + r
                keep = jnp.where((k != W) & (k < K), 1.0, 0.0)
                bs_j = cat([jax.lax.slice_in_dim(w, r, r + T, axis=0)
                            for w in wbs]).astype(cdt)
                x_j = cat([jax.lax.slice_in_dim(w, r, r + T, axis=0)
                           for w in wx])
                cm_j = cat([jax.lax.slice_in_dim(w, r, r + T, axis=0)
                            for w in wcm])
                valid_f = cm_i * cm_j * keep
                cot_pre, d_rel, wg = _edge_chain_cotangents(
                    a, bs_j, x_i, x_j, valid_f, w_d, w_e2, b_e2, w_x1, b_x1,
                    w_x2, b_x2, g_agg, g_delta, precision, cdt)
                cot_pre = cot_pre.astype(jnp.float32)
                da = da + cot_pre
                dx = dx + d_rel
                pad = ((r, 8 - r), (0, 0))
                for f in range(F):
                    dbs_win[f] = dbs_win[f] + jnp.pad(unfold(cot_pre, f),
                                                      pad)
                    dxs_win[f] = dxs_win[f] + jnp.pad(-unfold(d_rel, f),
                                                      pad)
                g_wd = g_wd + wg["w_d"]
                g_we2 = g_we2 + wg["w_e2"]
                g_be2 = g_be2 + wg["b_e2"]
                g_wx1 = g_wx1 + wg["w_x1"]
                g_bx1 = g_bx1 + wg["b_x1"]
                g_wx2 = g_wx2 + wg["w_x2"]
                g_bx2 = g_bx2 + wg["b_x2"]
            for f in range(F):
                dbs_pad_ref[f, pl.ds(t0 + g0, T + 8), :] += dbs_win[f]
                dxs_pad_ref[f, pl.ds(t0 + g0, T + 8), :] += dxs_win[f]
            return (da, dx, g_wd, g_we2, g_be2, g_wx1, g_bx1, g_wx2, g_bx2)

        init = (jnp.zeros((F * T, Hd), jnp.float32),
                jnp.zeros((F * T, 3), jnp.float32)) + wg_carry
        out = jax.lax.fori_loop(0, n_groups, group, init)
        for f in range(F):
            da_ref[f, pl.ds(t0, T), :] = unfold(out[0], f)
            dxr_ref[f, pl.ds(t0, T), :] = unfold(out[1], f)
        return out[2:]

    wg_init = (jnp.zeros((1, Hd), jnp.float32),
               jnp.zeros((Hd, Hd), jnp.float32),
               jnp.zeros((1, Hd), jnp.float32),
               jnp.zeros((Hd, Hd), jnp.float32),
               jnp.zeros((1, Hd), jnp.float32),
               jnp.zeros((Hd, 1), jnp.float32),
               jnp.zeros((1, 1), jnp.float32))
    g_wd, g_we2, g_be2, g_wx1, g_bx1, g_wx2, g_bx2 = jax.lax.fori_loop(
        0, n_tiles, tile_body, wg_init)

    @pl.when(b == 0)
    def _():
        dwd_ref[...] = jnp.zeros_like(dwd_ref)
        dwe2_ref[...] = jnp.zeros_like(dwe2_ref)
        dbe2_ref[...] = jnp.zeros_like(dbe2_ref)
        dwx1_ref[...] = jnp.zeros_like(dwx1_ref)
        dbx1_ref[...] = jnp.zeros_like(dbx1_ref)
        dwx2_ref[...] = jnp.zeros_like(dwx2_ref)
        dbx2_ref[...] = jnp.zeros_like(dbx2_ref)

    dwd_ref[...] += g_wd
    dwe2_ref[...] += g_we2
    dbe2_ref[...] += g_be2
    dwx1_ref[...] += g_wx1
    dbx1_ref[...] += g_bx1
    dwx2_ref[...] += g_wx2
    dbx2_ref[...] += g_bx2


# ---------------------------------------------------------------------------
# Host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

def _pad_w(x, W):
    # front W; back W+8 so the last 8-group's T+8 window stays in bounds
    return jnp.pad(x, ((0, 0), (W, W + 8)) + ((0, 0),) * (x.ndim - 2))


def _full_specs(shapes):
    return [pl.BlockSpec(s, (lambda *_: (0,) * len(s)),
                         memory_space=pltpu.VMEM) for s in shapes]


def _batch_spec(shape, F=1):
    nd = len(shape)
    return pl.BlockSpec((F,) + shape[1:],
                        lambda b, t: (b,) + (0,) * (nd - 1),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def egnn_band_fused(a, bs, x, cmask, w_d, w_e2, b_e2, w_x1, b_x1, w_x2,
                    b_x2, W: int, precision=None, chain_dtype=jnp.float32):
    """Fused band message passing.

    a, bs: [B, L, Hd] receiver/sender first-layer projections
    x: [B, L, 3]; cmask: [B, L] compacted validity
    w_d [1, Hd], w_e2 [Hd, Hd], b_e2 [Hd], w_x1 [Hd, Hd], b_x1 [Hd],
    w_x2 [Hd, 1], b_x2 [1]
    chain_dtype: compute dtype of the edge-MLP chain (activations, silu,
    cotangent chain). bf16 matches the XLA band path's numerics at model
    dtype bf16 and runs the binding VPU term ~2.3x faster on v5e;
    coordinates, aggregation accumulators, and weight-grad reductions stay
    fp32 regardless.
    Returns (agg [B, L, Hd], raw_delta [B, L, 3]), both fp32.
    """
    out, _ = _fused_fwd(a, bs, x, cmask, w_d, w_e2, b_e2, w_x1, b_x1,
                        w_x2, b_x2, W, precision, chain_dtype)
    return out


def _prep(a, bs, x, cmask, W):
    B, L, Hd = a.shape
    assert L % 64 == 0, f"L={L} must be a multiple of 64"
    cm = cmask.astype(jnp.float32)[..., None]
    return dict(
        bs_pad=_pad_w(bs.astype(jnp.float32), W),
        x=x.astype(jnp.float32),
        x_pad=_pad_w(x.astype(jnp.float32), W),
        cm=cm, cm_pad=_pad_w(cm, W),
        a=a.astype(jnp.float32), B=B, L=L, Hd=Hd)


def _param_tuple(w_d, w_e2, b_e2, w_x1, b_x1, w_x2, b_x2,
                 cdt=jnp.float32):
    # Chain weights travel in the chain dtype (tiny tensors, full-block
    # VMEM specs, no sliding windows — bf16 layout is unconstrained here).
    return (w_d.reshape(1, -1).astype(cdt),
            w_e2.astype(cdt),
            b_e2.reshape(1, -1).astype(cdt),
            w_x1.astype(cdt),
            b_x1.reshape(1, -1).astype(cdt),
            w_x2.reshape(-1, 1).astype(cdt),
            b_x2.reshape(1, 1).astype(cdt))


def _fused_fwd(a, bs, x, cmask, w_d, w_e2, b_e2, w_x1, b_x1, w_x2, b_x2, W,
               precision=None, chain_dtype=jnp.float32):
    cdt = jnp.dtype(chain_dtype)
    p = _prep(a, bs, x, cmask, W)
    B, L, Hd = p["B"], p["L"], p["Hd"]
    K = 2 * W + 1
    Lp = L + 2 * W + 8
    T = _tile(L)
    F = _fold(B, L)
    params = _param_tuple(w_d, w_e2, b_e2, w_x1, b_x1, w_x2, b_x2, cdt)

    kern = functools.partial(_fwd_kernel, K=K, W=W, T=T, F=F,
                             precision=precision, cdt=cdt)
    agg, delta = pl.pallas_call(
        kern,
        grid=(B // F, L // T),
        in_specs=[
            _batch_spec((B, L, Hd), F),     # a
            _batch_spec((B, Lp, Hd), F),    # bs_pad
            _batch_spec((B, L, 3), F),      # x
            _batch_spec((B, Lp, 3), F),     # x_pad
            _batch_spec((B, L, 1), F),      # cm
            _batch_spec((B, Lp, 1), F),     # cm_pad
        ] + _full_specs([(1, Hd), (Hd, Hd), (1, Hd), (Hd, Hd), (1, Hd),
                         (Hd, 1), (1, 1)]),
        out_specs=[_batch_spec((B, L, Hd), F), _batch_spec((B, L, 3), F)],
        out_shape=[jax.ShapeDtypeStruct((B, L, Hd), jnp.float32),
                   jax.ShapeDtypeStruct((B, L, 3), jnp.float32)],
        interpret=_interpret(),
    )(p["a"], p["bs_pad"], p["x"], p["x_pad"], p["cm"], p["cm_pad"], *params)

    res = (a, bs, x, cmask, w_d, w_e2, b_e2, w_x1, b_x1, w_x2, b_x2)
    return (agg, delta), res


def _batch_spec1(shape, F=1):
    """BlockSpec for a 1-D (batch-only) grid: whole per-batch-group block."""
    nd = len(shape)
    return pl.BlockSpec((F,) + shape[1:],
                        lambda b: (b,) + (0,) * (nd - 1),
                        memory_space=pltpu.VMEM)


def _fused_bwd(W, precision, chain_dtype, res, cots):
    cdt = jnp.dtype(chain_dtype)
    a, bs, x, cmask, w_d, w_e2, b_e2, w_x1, b_x1, w_x2, b_x2 = res
    g_agg, g_delta = cots
    p = _prep(a, bs, x, cmask, W)
    B, L, Hd = p["B"], p["L"], p["Hd"]
    K = 2 * W + 1
    Lp = L + 2 * W + 8
    T = _tile(L)
    F = _fold(B, L)
    params = _param_tuple(w_d, w_e2, b_e2, w_x1, b_x1, w_x2, b_x2, cdt)
    g_agg = g_agg.astype(jnp.float32)
    g_delta = g_delta.astype(jnp.float32)

    kern = functools.partial(_bwd_merged_kernel, K=K, W=W, T=T, L=L, F=F,
                             precision=precision, cdt=cdt)
    fs = _full_specs([(1, Hd), (Hd, Hd), (1, Hd), (Hd, Hd), (1, Hd),
                      (Hd, 1), (1, 1)])
    (da, dx_r, dbs_pad, dxs_pad, dwd, dwe2, dbe2, dwx1, dbx1, dwx2,
     dbx2) = pl.pallas_call(
        kern,
        grid=(B // F,),
        in_specs=[
            _batch_spec1((B, L, Hd), F),     # a
            _batch_spec1((B, Lp, Hd), F),    # bs_pad
            _batch_spec1((B, L, 3), F),      # x
            _batch_spec1((B, Lp, 3), F),     # x_pad
            _batch_spec1((B, L, 1), F),      # cm
            _batch_spec1((B, Lp, 1), F),     # cm_pad
        ] + fs + [_batch_spec1((B, L, Hd), F), _batch_spec1((B, L, 3), F)],
        out_specs=[_batch_spec1((B, L, Hd), F), _batch_spec1((B, L, 3), F),
                   _batch_spec1((B, Lp, Hd), F),
                   _batch_spec1((B, Lp, 3), F)] + fs,
        out_shape=[jax.ShapeDtypeStruct((B, L, Hd), jnp.float32),
                   jax.ShapeDtypeStruct((B, L, 3), jnp.float32),
                   jax.ShapeDtypeStruct((B, Lp, Hd), jnp.float32),
                   jax.ShapeDtypeStruct((B, Lp, 3), jnp.float32),
                   jax.ShapeDtypeStruct((1, Hd), jnp.float32),
                   jax.ShapeDtypeStruct((Hd, Hd), jnp.float32),
                   jax.ShapeDtypeStruct((1, Hd), jnp.float32),
                   jax.ShapeDtypeStruct((Hd, Hd), jnp.float32),
                   jax.ShapeDtypeStruct((1, Hd), jnp.float32),
                   jax.ShapeDtypeStruct((Hd, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=_interpret(),
    )(p["a"], p["bs_pad"], p["x"], p["x_pad"], p["cm"], p["cm_pad"],
      *params, g_agg, g_delta)

    # strip the W/W+8 padding off the sender-side accumulators
    dbs = dbs_pad[:, W:W + L, :]
    dx = dx_r + dxs_pad[:, W:W + L, :]
    return (da.astype(a.dtype), dbs.astype(bs.dtype), dx.astype(x.dtype),
            jnp.zeros_like(cmask),
            dwd.reshape(w_d.shape).astype(w_d.dtype),
            dwe2.astype(w_e2.dtype),
            dbe2.reshape(b_e2.shape).astype(b_e2.dtype),
            dwx1.astype(w_x1.dtype),
            dbx1.reshape(b_x1.shape).astype(b_x1.dtype),
            dwx2.reshape(w_x2.shape).astype(w_x2.dtype),
            dbx2.reshape(b_x2.shape).astype(b_x2.dtype))


egnn_band_fused.defvjp(_fused_fwd, _fused_bwd)
