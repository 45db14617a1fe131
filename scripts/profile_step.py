#!/usr/bin/env python3
"""On-chip component breakdown of the fused train step (VERDICT r2 item #2).

jax.profiler traces need a TensorFlow/XProf reader that isn't in this image,
and the axon tunnel makes async timestamps untrustworthy anyway (CLAUDE.md).
So the breakdown uses the same scan-differenced synchronous methodology as
bench.py, applied to *component* functions:

  full      — the complete train step (fwd + loss + bwd + Adam)
  fwd_loss  — forward + total loss only (no grad)
  enc_fb    — encoder (+latent heads) value+grad
  dec_fb    — decoder value+grad at fixed latents
  clash_fb  — clash loss value+grad at fixed coords
  losses_fb — all non-clash loss terms value+grad at fixed predictions

Each component runs N times inside one jitted lax.scan with a chained
carry; walltime of a synchronous final fetch is differenced between two
scan lengths. Components overlap (enc+dec+losses ≈ fwd graph), so rows are
a *attribution*, not a partition; the backward share is full − fwd_loss.

CAVEAT (measured, round 3): component rows with no loop-carried parameter
dependency (everything except ``full``) pipeline across scan iterations on
TPU and can under-read their in-chain serialized cost by up to ~3× — the
identical fwd+bwd math measured 4.0 ms without the optimizer update vs
13.4 ms with it. Treat component rows as steady-state throughput, the
``full`` row as the honest per-step latency, and prefer term-removal
subtraction on the full step for attribution (RESULTS.md "Step-time
attribution").

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py
Env: PROF_BATCH/PROF_LEN/PROF_STEPS, PROF_REMAT=1, PROF_PALLAS (auto).
Prints one JSON line per row + a summary.
"""

import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B = int(os.environ.get("PROF_BATCH", "4"))
L = int(os.environ.get("PROF_LEN", "256"))
STEPS = int(os.environ.get("PROF_STEPS", "40"))
SEQD = 1280


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import bench
    from protein_ensemble_vae_tpu.config import LossWeights, ModelConfig
    from protein_ensemble_vae_tpu.losses import compute_total_loss, clash_loss
    from protein_ensemble_vae_tpu.models import HierCVAE
    from protein_ensemble_vae_tpu.train.training import (create_train_state,
                                                         make_train_step)
    from protein_ensemble_vae_tpu.utils import enable_compilation_cache
    from protein_ensemble_vae_tpu.utils.profiling import scan_step_time

    enable_compilation_cache()
    remat = os.environ.get("PROF_REMAT", "0") == "1"
    use_pallas = os.environ.get("PROF_PALLAS", "auto")
    if use_pallas in ("0", "1"):
        use_pallas = use_pallas == "1"
    dtype = jnp.bfloat16
    cfg = ModelConfig(seqemb_dim=SEQD, use_pallas_egnn=use_pallas,
                      decoder_remat=remat)
    model = HierCVAE(cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    batch = bench._make_batch(B, L, rng)
    state = create_train_state(model, jax.random.PRNGKey(0), batch["inp"])
    lw = LossWeights()

    inp, tgt = batch["inp"], batch["tgt"]
    mask = tgt["mask"]
    key = jax.random.PRNGKey(1)

    # Same clash routing as compute_total_loss (losses.py:322-332).
    from protein_ensemble_vae_tpu.ops.routing import pallas_policy
    if pallas_policy(L, use_pallas):
        from protein_ensemble_vae_tpu.ops.pallas.clash import clash_loss_pallas
        routed_clash = clash_loss_pallas
    else:
        routed_clash = clash_loss

    # ---- component closures; every fn maps a scalar carry -> scalar ------
    def model_out(params, r):
        return model.apply({"params": params}, inp["seq_emb"], inp["n"],
                           inp["ca"], inp["c"], inp["dihedrals"], mask,
                           deterministic=False,
                           rngs={"reparam": r, "dropout": r})

    out0 = jax.jit(functools.partial(model_out))(state.params, key)
    (pred_n0, pred_ca0, pred_c0, pred_seq0, mu_g0, lv_g0, mu_l0, lv_l0) = \
        [jax.device_get(o) for o in out0]
    preds = tuple(jnp.asarray(o) for o in
                  (pred_n0, pred_ca0, pred_c0, pred_seq0,
                   mu_g0, lv_g0, mu_l0, lv_l0))

    def total_loss(pn, pca, pc, ps, mg, lg, ml, ll, w_clash=lw.w_clash):
        d = compute_total_loss(
            pn, pca, pc, ps, tgt["n"], tgt["ca"], tgt["c"],
            tgt["seq_labels"], mask, mg, lg, ml, ll, tgt["dihedrals"],
            klw_g=jnp.float32(1.0), klw_l=jnp.float32(0.5),
            weights=lw, use_pallas=use_pallas)
        return d["total"]

    raw_step = make_train_step(model, lw, train=True,
                               jit_wrapper=lambda f: f)

    def full_body(carry, i):
        st, _ = carry
        st, m = raw_step(st, batch, jax.random.fold_in(key, i),
                         jnp.float32(1.0), jnp.float32(0.5), jnp.float32(3e-5))
        return (st, m["loss"]), ()

    def fwd_loss_body(carry, i):
        out = model_out(state.params, jax.random.fold_in(key, i))
        t = total_loss(*out)
        return (carry[0], t), ()

    def fwd_loss_nodrop_body(carry, i):
        # deterministic forward: isolates dropout-mask PRNG generation cost
        out = model.apply({"params": state.params}, inp["seq_emb"],
                          inp["n"], inp["ca"], inp["c"], inp["dihedrals"],
                          mask, deterministic=True,
                          rngs={"reparam": jax.random.fold_in(key, i)})
        t = total_loss(*out)
        return (carry[0], t), ()

    from protein_ensemble_vae_tpu.train.training import make_optimizer
    import optax
    tx_prof = make_optimizer(10.0)
    grads0 = jax.tree.map(lambda p: jnp.full_like(p, 1e-3), state.params)

    def opt_body(carry, i):
        # optimizer-only: global-norm clip + apply_if_finite + Adam + update
        st, v = carry
        leaves, treedef = jax.tree.flatten(grads0)
        leaves[0] = leaves[0] + v * 0.0
        g = jax.tree.unflatten(treedef, leaves)
        updates, opt_state = tx_prof.update(g, st.opt_state, st.params)
        updates = jax.tree.map(lambda u: (-jnp.float32(3e-5)) * u, updates)
        params = optax.apply_updates(st.params, updates)
        st = st.replace(params=params, opt_state=opt_state,
                        step=st.step + 1)
        return (st, (v * 0.0
                     + jax.tree.leaves(params)[0].ravel()[0])), ()

    def enc_fb_body(carry, i):
        # 0.5*sum(out^2) scalars: the output cotangent is the activation
        # itself, so XLA cannot constant-fold the backward (a plain sum's
        # all-ones cotangent lets W^T @ 1 collapse to row sums, which made
        # this row report ~8x less than the component's true fwd+bwd cost).
        def f(params):
            _, _, mg, lg, ml, ll = model.apply(
                {"params": params}, inp["seq_emb"], inp["n"], inp["ca"],
                inp["c"], inp["dihedrals"], mask, deterministic=False,
                rngs={"reparam": jax.random.fold_in(key, i),
                      "dropout": jax.random.fold_in(key, i)},
                method=model.encode)
            sq = lambda a: 0.5 * jnp.sum(jnp.square(a.astype(jnp.float32)))
            return sq(mg) + sq(lg) + sq(ml) + sq(ll) + carry[1] * 0.0
        v, g = jax.value_and_grad(f)(state.params)
        return (carry[0], v + jax.tree.leaves(g)[0].ravel()[0]), ()

    z_g0 = jnp.asarray(rng.normal(0, 1, (B, cfg.z_global)), dtype)
    z_l0 = jnp.asarray(rng.normal(0, 1, (B, L, cfg.z_local)), dtype)

    def dec_fb_body(carry, i):
        def f(params):
            pn, pca, pc, ps = model.apply(
                {"params": params}, z_g0 + carry[1].astype(dtype) * 0, z_l0,
                mask, deterministic=False,
                rngs={"dropout": jax.random.fold_in(key, i)},
                method=model.decode)
            sq = lambda a: 0.5 * jnp.sum(jnp.square(a.astype(jnp.float32)))
            return sq(pca) + sq(pn) + sq(pc) + sq(ps)
        v, g = jax.value_and_grad(f)(state.params)
        return (carry[0], v + jax.tree.leaves(g)[0].ravel()[0]), ()

    def clash_fb_body(carry, i):
        def f(pn, pca, pc):
            return routed_clash(pn + carry[1] * 0.0, pca, pc, mask)
        v, gs = jax.value_and_grad(f, argnums=(0, 1, 2))(
            preds[0].astype(jnp.float32), preds[1].astype(jnp.float32),
            preds[2].astype(jnp.float32))
        return (carry[0], v + gs[0].ravel()[0]), ()

    def losses_fb_body(carry, i):
        def f(pn, pca, pc, ps):
            return total_loss(pn + carry[1] * 0.0, pca, pc, ps, *preds[4:],
                              ) - lw.w_clash * routed_clash(
                                  pn + carry[1] * 0.0, pca, pc, mask)
        args4 = tuple(p.astype(jnp.float32) for p in preds[:4])
        v, gs = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(*args4)
        return (carry[0], v + gs[0].ravel()[0]), ()

    rows = []

    def time_body(name, body):
        _runs = {}

        def make_run(n):
            if n not in _runs:
                @jax.jit
                def run():
                    (st, v), _ = jax.lax.scan(
                        body, (state, jnp.float32(0.0)), jnp.arange(n))
                    return v
                _runs[n] = run
            return _runs[n]

        n1 = max(STEPS // 5, 2)
        v = float(make_run(n1)())
        assert np.isfinite(v), (name, v)
        dt = scan_step_time(make_run, n1=n1, n2=STEPS)
        row = dict(component=name, B=B, L=L, remat=remat,
                   ms=round(1e3 * dt, 3))
        rows.append(row)
        print(json.dumps(row), flush=True)

    time_body("full", full_body)
    time_body("fwd_loss", fwd_loss_body)
    time_body("fwd_loss_nodrop", fwd_loss_nodrop_body)
    time_body("opt_only", opt_body)
    time_body("enc_fb", enc_fb_body)
    time_body("dec_fb", dec_fb_body)
    time_body("clash_fb", clash_fb_body)
    time_body("losses_fb", losses_fb_body)

    ms = {r["component"]: r["ms"] for r in rows}
    summary = dict(
        shape=f"B{B}/L{L}", remat=remat,
        full_ms=ms["full"],
        backward_share=round(1 - ms["fwd_loss"] / ms["full"], 3),
        dropout_rng_ms=round(ms["fwd_loss"] - ms["fwd_loss_nodrop"], 3),
        attribution={k: round(ms[k] / ms["full"], 3)
                     for k in ("opt_only", "enc_fb", "dec_fb", "clash_fb",
                               "losses_fb")},
    )
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
