"""Loss battery tests: numerical parity vs the reference torch oracle
(/root/reference, when present) plus standalone sanity/property checks.

Parity is the BASELINE acceptance gate: "reproduce per-term losses ... to
numerical tolerance" on fixed inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protein_ensemble_vae_tpu import losses as L
from protein_ensemble_vae_tpu.config import LossWeights
from protein_ensemble_vae_tpu.ops.geometry import dihedrals_from_coords

B, SEQ = 2, 24


def _batch(rng, B=B, L_=SEQ, holes=True):
    n = rng.normal(0, 3, (B, L_, 3)).astype(np.float32)
    ca = rng.normal(0, 3, (B, L_, 3)).astype(np.float32)
    c = rng.normal(0, 3, (B, L_, 3)).astype(np.float32)
    mask = np.ones((B, L_), np.float32)
    if holes:
        mask[0, -4:] = 0.0
        mask[1, 10] = 0.0
    labels = rng.integers(0, 20, (B, L_)).astype(np.int64)
    logits = rng.normal(0, 1, (B, L_, 20)).astype(np.float32)
    mu = rng.normal(0, 0.5, (B, 8)).astype(np.float32)
    lv = rng.normal(-2, 0.3, (B, 8)).astype(np.float32)
    mu_l = rng.normal(0, 0.5, (B, L_, 4)).astype(np.float32)
    lv_l = rng.normal(-2, 0.3, (B, L_, 4)).astype(np.float32)
    return dict(n=n, ca=ca, c=c, mask=mask, labels=labels, logits=logits,
                mu=mu, lv=lv, mu_l=mu_l, lv_l=lv_l)


# ---------------------------------------------------------------------------
# Parity vs the reference oracle
# ---------------------------------------------------------------------------

def _t(torch, x):
    return torch.from_numpy(np.asarray(x))


def test_parity_rmsd_loss(ref_modules, rng):
    b = _batch(rng)
    torch, rl = ref_modules["torch"], ref_modules["losses"]
    ref = rl.rmsd_loss(_t(torch, b["ca"] + 1), _t(torch, b["ca"]), _t(torch, b["mask"]))
    ours = L.rmsd_loss(jnp.array(b["ca"] + 1), jnp.array(b["ca"]), jnp.array(b["mask"]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_parity_pair_distance(ref_modules, rng):
    b = _batch(rng)
    torch, rl = ref_modules["torch"], ref_modules["losses"]
    pred = b["ca"] + rng.normal(0, 0.2, b["ca"].shape).astype(np.float32)
    ref = rl.pair_distance_loss(_t(torch, pred), _t(torch, b["ca"]),
                                _t(torch, b["mask"]), stride=4)
    ours = L.pair_distance_loss(jnp.array(pred), jnp.array(b["ca"]),
                                jnp.array(b["mask"]), stride=4)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_parity_kl(ref_modules, rng):
    b = _batch(rng)
    torch, rl = ref_modules["torch"], ref_modules["losses"]
    ref_g = rl.kl_global(_t(torch, b["mu"]), _t(torch, b["lv"]))
    ours_g = L.kl_global(jnp.array(b["mu"]), jnp.array(b["lv"]))
    np.testing.assert_allclose(float(ours_g), float(ref_g), rtol=1e-5)
    ref_l = rl.kl_local(_t(torch, b["mu_l"]), _t(torch, b["lv_l"]), _t(torch, b["mask"]))
    ours_l = L.kl_local(jnp.array(b["mu_l"]), jnp.array(b["lv_l"]), jnp.array(b["mask"]))
    np.testing.assert_allclose(float(ours_l), float(ref_l), rtol=1e-5)


def test_parity_dihedrals_from_coords(ref_modules, rng):
    b = _batch(rng)
    torch, rl = ref_modules["torch"], ref_modules["losses"]
    ref = rl.compute_dihedrals_from_coords(
        _t(torch, b["n"]), _t(torch, b["ca"]), _t(torch, b["c"]), _t(torch, b["mask"]))
    ours = dihedrals_from_coords(jnp.array(b["n"]), jnp.array(b["ca"]),
                                 jnp.array(b["c"]), jnp.array(b["mask"]))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


def test_parity_rama_omega_consistency(ref_modules, rng):
    b = _batch(rng)
    torch, rl = ref_modules["torch"], ref_modules["losses"]
    dih = np.asarray(dihedrals_from_coords(jnp.array(b["n"]), jnp.array(b["ca"]),
                                           jnp.array(b["c"]), jnp.array(b["mask"])))
    tgt = dih + rng.normal(0, 0.1, dih.shape).astype(np.float32)

    ref = rl.ramachandran_loss(_t(torch, dih), _t(torch, b["mask"]))
    ours = L.ramachandran_loss(jnp.array(dih), jnp.array(b["mask"]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    ref = rl.omega_trans_loss(_t(torch, dih), _t(torch, b["mask"]))
    ours = L.omega_trans_loss(jnp.array(dih), jnp.array(b["mask"]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    ref = rl.dihedral_consistency_loss(_t(torch, dih), _t(torch, tgt), _t(torch, b["mask"]))
    ours = L.dihedral_consistency_loss(jnp.array(dih), jnp.array(tgt), jnp.array(b["mask"]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_parity_bond_and_angle(ref_modules, rng):
    b = _batch(rng)
    torch, rl = ref_modules["torch"], ref_modules["losses"]
    args_t = (_t(torch, b["n"]), _t(torch, b["ca"]), _t(torch, b["c"]), _t(torch, b["mask"]))
    args_j = (jnp.array(b["n"]), jnp.array(b["ca"]), jnp.array(b["c"]), jnp.array(b["mask"]))
    np.testing.assert_allclose(float(L.bond_length_loss(*args_j)),
                               float(rl.bond_length_loss(*args_t)), rtol=1e-4)
    np.testing.assert_allclose(float(L.bond_angle_loss(*args_j)),
                               float(rl.bond_angle_loss(*args_t)), rtol=1e-4)


def test_parity_seq_and_clash(ref_modules, rng):
    b = _batch(rng)
    torch, rl = ref_modules["torch"], ref_modules["losses"]
    ref = rl.sequence_classification_loss(
        _t(torch, b["logits"]), _t(torch, b["labels"]), _t(torch, b["mask"]))
    ours = L.sequence_classification_loss(
        jnp.array(b["logits"]), jnp.array(b["labels"]), jnp.array(b["mask"]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    ref = rl.clash_loss(_t(torch, b["n"]), _t(torch, b["ca"]), _t(torch, b["c"]),
                        _t(torch, b["mask"]))
    ours = L.clash_loss(jnp.array(b["n"]), jnp.array(b["ca"]), jnp.array(b["c"]),
                        jnp.array(b["mask"]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_parity_total_loss(ref_modules, rng):
    b = _batch(rng)
    torch, rl = ref_modules["torch"], ref_modules["losses"]
    pred_n = b["n"] + rng.normal(0, 0.3, b["n"].shape).astype(np.float32)
    pred_ca = b["ca"] + rng.normal(0, 0.3, b["ca"].shape).astype(np.float32)
    pred_c = b["c"] + rng.normal(0, 0.3, b["c"].shape).astype(np.float32)
    tgt_dih = np.asarray(dihedrals_from_coords(jnp.array(b["n"]), jnp.array(b["ca"]),
                                               jnp.array(b["c"]), jnp.array(b["mask"])))
    w = LossWeights()
    ref = rl.compute_total_loss(
        pred_N=_t(torch, pred_n), pred_CA=_t(torch, pred_ca), pred_C=_t(torch, pred_c),
        pred_seq=_t(torch, b["logits"]),
        target_N=_t(torch, b["n"]), target_CA=_t(torch, b["ca"]), target_C=_t(torch, b["c"]),
        target_seq_labels=_t(torch, b["labels"]), mask=_t(torch, b["mask"]),
        mu_g=_t(torch, b["mu"]), lv_g=_t(torch, b["lv"]),
        mu_l=_t(torch, b["mu_l"]), lv_l=_t(torch, b["lv_l"]),
        target_dihedrals=_t(torch, tgt_dih),
        klw_g=0.7, klw_l=0.3, w_pair=w.w_pair, pair_stride=w.pair_stride,
        w_dihedral=w.w_dihedral, w_rama=w.w_rama, w_bond=w.w_bond,
        w_angle=w.w_angle, w_rec=w.w_rec, w_seq=w.w_seq, w_clash=w.w_clash)
    ours = L.compute_total_loss(
        jnp.array(pred_n), jnp.array(pred_ca), jnp.array(pred_c), jnp.array(b["logits"]),
        jnp.array(b["n"]), jnp.array(b["ca"]), jnp.array(b["c"]), jnp.array(b["labels"]),
        jnp.array(b["mask"]), jnp.array(b["mu"]), jnp.array(b["lv"]),
        jnp.array(b["mu_l"]), jnp.array(b["lv_l"]), jnp.array(tgt_dih),
        klw_g=0.7, klw_l=0.3, weights=w)
    assert set(ours.keys()) == set(k for k in ref.keys())
    for k in ref:
        np.testing.assert_allclose(float(ours[k]), float(ref[k]), rtol=2e-3,
                                   atol=1e-5, err_msg=f"loss term {k}")


# ---------------------------------------------------------------------------
# Standalone sanity / property tests (run without the reference)
# ---------------------------------------------------------------------------

def test_rmsd_loss_zero_on_identical(rng):
    b = _batch(rng)
    v = L.rmsd_loss(jnp.array(b["ca"]), jnp.array(b["ca"]), jnp.array(b["mask"]))
    assert float(v) == 0.0


def test_kl_zero_at_standard_normal():
    mu = jnp.zeros((2, 8))
    lv = jnp.zeros((2, 8))
    assert float(L.kl_global(mu, lv)) == 0.0


def test_bond_length_zero_on_ideal_geometry():
    ca = jnp.array([[[0.0, 0, 0], [3.8, 0, 0]]])
    n = ca + jnp.array([1.46, 0, 0])
    c = ca + jnp.array([0, 1.52, 0.0])
    mask = jnp.ones((1, 2))
    # intra-residue bonds ideal; peptide C(0)-N(1) is off so only that term fires
    v_full = L.bond_length_loss(n, ca, c, mask)
    intra_only = L.bond_length_loss(n[:, :1], ca[:, :1], c[:, :1], mask[:, :1])
    assert float(intra_only) < 1e-9
    assert float(v_full) > 0


def test_clash_loss_detects_overlap():
    # Two far-apart residues -> no clash; then place residue 2 on top of 0.
    ca = np.zeros((1, 4, 3), np.float32)
    ca[0, :, 0] = [0.0, 3.8, 7.6, 11.4]
    n = ca + np.array([1.46, 0, 0], np.float32)
    c = ca + np.array([0, 1.52, 0], np.float32)
    mask = np.ones((1, 4), np.float32)
    ok = float(L.clash_loss(jnp.array(n), jnp.array(ca), jnp.array(c), jnp.array(mask)))
    ca2 = ca.copy()
    ca2[0, 2] = ca[0, 0] + 0.5
    bad = float(L.clash_loss(jnp.array(n), jnp.array(ca2), jnp.array(c), jnp.array(mask)))
    assert bad > ok


def test_total_loss_grads_finite(rng):
    b = _batch(rng)
    w = LossWeights()
    tgt_dih = dihedrals_from_coords(jnp.array(b["n"]), jnp.array(b["ca"]),
                                    jnp.array(b["c"]), jnp.array(b["mask"]))

    def f(pred_ca):
        d = L.compute_total_loss(
            jnp.array(b["n"]), pred_ca, jnp.array(b["c"]), jnp.array(b["logits"]),
            jnp.array(b["n"]), jnp.array(b["ca"]), jnp.array(b["c"]),
            jnp.array(b["labels"]), jnp.array(b["mask"]),
            jnp.array(b["mu"]), jnp.array(b["lv"]),
            jnp.array(b["mu_l"]), jnp.array(b["lv_l"]), tgt_dih,
            klw_g=1.0, klw_l=0.5, weights=w)
        return d["total"]

    g = jax.grad(f)(jnp.array(b["ca"]))
    assert np.all(np.isfinite(np.asarray(g)))

    # degenerate input: identical points everywhere must still be finite
    g0 = jax.grad(f)(jnp.zeros_like(jnp.array(b["ca"])))
    assert np.all(np.isfinite(np.asarray(g0)))


def test_free_bits_floor():
    mu = jnp.zeros((2, 8))
    lv = jnp.zeros((2, 8))
    v = L.free_bits_kl(mu, lv, free_bits=2.0)
    np.testing.assert_allclose(float(v), 16.0, rtol=1e-6)  # 8 dims * 2 nats


def test_strict_geometry_options_parity_and_effect(rng):
    """bond_delta=1 / w_ca_spacing=0 reproduce the parity configuration
    exactly; the strict options add gradient signal in the broken-bond
    regime the reference huber deltas leave nearly flat."""
    b = _batch(rng)
    n, ca, c, mask = (jnp.asarray(b[k]) for k in ("n", "ca", "c", "mask"))

    # delta_scale=1.0 is the default-path value.
    assert float(L.bond_length_loss(n, ca, c, mask)) == float(
        L.bond_length_loss(n, ca, c, mask, delta_scale=1.0))

    # In a ~2A-broken-bond regime the strict delta multiplies the gradient.
    g_ref = jax.grad(lambda x: L.bond_length_loss(x, ca, c, mask))(n)
    g_strict = jax.grad(
        lambda x: L.bond_length_loss(x, ca, c, mask, delta_scale=25.0))(n)
    assert float(jnp.linalg.norm(g_strict)) > 5 * float(jnp.linalg.norm(g_ref))


def test_ca_spacing_loss():
    # Ideal 3.81A spacing -> zero; stretched chain -> positive, masked pairs
    # excluded.
    ca = jnp.array([[[0.0, 0, 0], [3.81, 0, 0], [7.62, 0, 0]]])
    mask = jnp.ones((1, 3))
    assert float(L.ca_spacing_loss(ca, mask)) < 1e-9

    ca_bad = jnp.array([[[0.0, 0, 0], [5.5, 0, 0], [11.0, 0, 0]]])
    v = float(L.ca_spacing_loss(ca_bad, mask))
    assert v > 0.1
    # masking the last residue removes one of the two bad pairs
    mask2 = jnp.array([[1.0, 1.0, 0.0]])
    v2 = float(L.ca_spacing_loss(ca_bad, mask2))
    assert abs(v2 - v) < 1e-6  # both remaining pairs equally bad -> same mean
    # gradient finite and pulls the stretched pair together
    g = jax.grad(lambda x: L.ca_spacing_loss(x, mask))(ca_bad)
    assert np.all(np.isfinite(np.asarray(g)))


def test_total_loss_ca_spacing_opt_in(rng):
    b = _batch(rng)
    n, ca, c, mask = (jnp.asarray(b[k]) for k in ("n", "ca", "c", "mask"))
    logits = jnp.asarray(b["logits"])
    labels = jnp.asarray(b["labels"])
    mu = jnp.asarray(b["mu"]); lv = jnp.asarray(b["lv"])
    mu_l = jnp.asarray(b["mu_l"]); lv_l = jnp.asarray(b["lv_l"])
    dih = dihedrals_from_coords(n, ca, c, mask)

    def total(weights):
        return L.compute_total_loss(
            n, ca, c, logits, n, ca, c, labels, mask, mu, lv, mu_l, lv_l,
            dih, klw_g=jnp.float32(1.0), klw_l=jnp.float32(0.5),
            weights=weights, use_pallas=False)

    base = total(LossWeights())
    assert "ca_spacing" not in base  # parity: key absent when off
    strict = total(LossWeights(w_ca_spacing=100.0))
    assert "ca_spacing" in strict
    assert float(strict["total"]) >= float(base["total"])


def test_vdw_clash_pair_set_matches_scorer():
    """The loss's counted pair set must equal the MolProbity scorer's
    complement of its BFS 1-2/1-3/1-4 exclusions (3-atom backbone remap) —
    otherwise the loss optimizes a different event than the metric counts."""
    from protein_ensemble_vae_tpu.eval.analyze import _backbone_bond_exclusions

    Lr = 6
    # scorer side: 4-per-residue BFS exclusions remapped to N/CA/C rows
    excluded = {(u - u // 4, v - v // 4)
                for u, v in _backbone_bond_exclusions(Lr)
                if u % 4 != 3 and v % 4 != 3}
    scorer_counted = {(i, j) for i in range(3 * Lr) for j in range(3 * Lr)
                      if i < j and (i, j) not in excluded}

    # loss side: replicate the mask construction
    idx = np.arange(Lr * 3)
    res_idx, atom_t = idx // 3, idx % 3
    sep = np.abs(res_idx[:, None] - res_idx[None, :])
    earlier_t = np.where(res_idx[:, None] <= res_idx[None, :],
                         atom_t[:, None], atom_t[None, :])
    later_t = np.where(res_idx[:, None] <= res_idx[None, :],
                       atom_t[None, :], atom_t[:, None])
    counted = (sep >= 2) | ((sep == 1) & (earlier_t < later_t))
    loss_counted = {(i, j) for i in range(3 * Lr) for j in range(3 * Lr)
                    if i < j and counted[i, j]}
    assert loss_counted == scorer_counted


def test_vdw_clash_loss_zero_iff_clashscore_zero(rng):
    from protein_ensemble_vae_tpu.data.synthetic import nerf_ensemble
    from protein_ensemble_vae_tpu.eval.analyze import molprobity_clashscore

    # physically valid torsion-built chain: scorer reads 0, loss ~0
    n, ca, c = nerf_ensemble(32, 1, seed=0)
    mask = np.ones((1, 32), np.float32)
    mp = molprobity_clashscore(n[0], ca[0], c[0], None, mask[0])
    assert mp == 0.0
    lv = float(L.vdw_clash_loss(jnp.asarray(n), jnp.asarray(ca),
                                jnp.asarray(c), jnp.asarray(mask)))
    assert lv < 1e-6

    # tangled random coil: scorer fires, loss positive, grads finite
    b = _batch(rng, B=1, L_=24, holes=False)
    mp_bad = molprobity_clashscore(b["n"][0], b["ca"][0], b["c"][0], None,
                                   b["mask"][0])
    lv_bad = float(L.vdw_clash_loss(*(jnp.asarray(b[k]) for k in
                                      ("n", "ca", "c", "mask"))))
    assert mp_bad > 0 and lv_bad > 0
    g = jax.grad(lambda x: L.vdw_clash_loss(
        x, jnp.asarray(b["ca"]), jnp.asarray(b["c"]),
        jnp.asarray(b["mask"])))(jnp.asarray(b["n"]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_vdw_clash_minimization_clears_clashscore(rng):
    """Gradient descent on the surrogate must drive the REAL MolProbity
    count to zero — the end-to-end property the refiner relies on."""
    import optax
    from protein_ensemble_vae_tpu.eval.analyze import molprobity_clashscore

    b = _batch(rng, B=1, L_=16, holes=False)
    coords = {k: jnp.asarray(b[k]) for k in ("n", "ca", "c")}
    mask = jnp.asarray(b["mask"])
    assert molprobity_clashscore(b["n"][0], b["ca"][0], b["c"][0], None,
                                 b["mask"][0]) > 0

    tx = optax.adam(0.05)
    opt = tx.init(coords)
    loss_fn = lambda cs: L.vdw_clash_loss(cs["n"], cs["ca"], cs["c"], mask)
    step = jax.jit(lambda cs, op: (lambda g: (lambda u, o:
                   (optax.apply_updates(cs, u), o))(*tx.update(g, op, cs)))(
                   jax.grad(loss_fn)(cs)))
    for _ in range(300):
        coords, opt = step(coords, opt)
    out = {k: np.asarray(v[0]) for k, v in coords.items()}
    assert molprobity_clashscore(out["n"], out["ca"], out["c"], None,
                                 b["mask"][0]) == 0.0


def test_total_loss_vdw_clash_opt_in(rng):
    b = _batch(rng)
    n, ca, c, mask = (jnp.asarray(b[k]) for k in ("n", "ca", "c", "mask"))
    dih = dihedrals_from_coords(n, ca, c, mask)

    def total(weights):
        return L.compute_total_loss(
            n, ca, c, jnp.asarray(b["logits"]), n, ca, c,
            jnp.asarray(b["labels"]), mask, jnp.asarray(b["mu"]),
            jnp.asarray(b["lv"]), jnp.asarray(b["mu_l"]),
            jnp.asarray(b["lv_l"]), dih, klw_g=jnp.float32(1.0),
            klw_l=jnp.float32(0.5), weights=weights, use_pallas=False)

    base = total(LossWeights())
    assert "clash_vdw" not in base  # parity: key absent when off
    on = total(LossWeights(w_clash_vdw=50.0))
    assert "clash_vdw" in on
    assert float(on["total"]) > float(base["total"])


def test_carbonyl_oxygen_matches_pdb_writer(rng):
    """losses.carbonyl_oxygen must place the SAME O atoms the PDB writer
    emits (infer.pdb_io.compute_backbone_oxygen) — the O-aware loss has to
    optimize exactly the atoms the analyzer scores."""
    from protein_ensemble_vae_tpu.data.synthetic import nerf_ensemble
    from protein_ensemble_vae_tpu.infer.pdb_io import compute_backbone_oxygen

    n, ca, c = nerf_ensemble(24, 2, seed=3)
    mask = np.ones((2, 24), np.float32)
    o_loss = np.asarray(L.carbonyl_oxygen(jnp.asarray(n), jnp.asarray(ca),
                                          jnp.asarray(c), jnp.asarray(mask)))
    for k in range(2):
        o_ref = compute_backbone_oxygen(n[k], ca[k], c[k], mask[k])
        np.testing.assert_allclose(o_loss[k], o_ref, atol=1e-4)


def test_vdw_clash_pair_set_with_o_matches_scorer():
    """4-atom variant of the pair-set parity: the closed-form
    steps_to_C + 1 + steps_from_N bond distance must reproduce the
    scorer's BFS 1-2/1-3/1-4 exclusions exactly."""
    from protein_ensemble_vae_tpu.eval.analyze import _backbone_bond_exclusions

    Lr = 6
    excluded = _backbone_bond_exclusions(Lr)
    scorer_counted = {(i, j) for i in range(4 * Lr) for j in range(4 * Lr)
                      if i < j and (i, j) not in excluded}

    idx = np.arange(Lr * 4)
    res_idx, atom_t = idx // 4, idx % 4
    sep = np.abs(res_idx[:, None] - res_idx[None, :])
    earlier_t = np.where(res_idx[:, None] <= res_idx[None, :],
                         atom_t[:, None], atom_t[None, :])
    later_t = np.where(res_idx[:, None] <= res_idx[None, :],
                       atom_t[None, :], atom_t[:, None])
    s_to_c = np.asarray(L._STEPS_TO_C)
    s_from_n = np.asarray(L._STEPS_FROM_N)
    adj_counted = (sep == 1) & (s_to_c[earlier_t] + 1 + s_from_n[later_t] >= 4)
    counted = (sep >= 2) | adj_counted
    loss_counted = {(i, j) for i in range(4 * Lr) for j in range(4 * Lr)
                    if i < j and counted[i, j]}
    assert loss_counted == scorer_counted


def test_vdw_include_o_zero_on_extended_strand_positive_on_tangle(rng):
    """include_o=True: an extended strand has no O contacts (H-bond
    allowance covers donor-acceptor pairs) -> ~0 loss; a compressed chain
    produces O-involved overlaps the 3-atom loss misses."""
    from protein_ensemble_vae_tpu.data.synthetic import torsion_backbone

    Lr = 24
    phi = np.full(Lr, np.radians(-120.0))
    psi = np.full(Lr, np.radians(140.0))
    n, ca, c = (x[None] for x in torsion_backbone(phi, psi))
    mask = np.ones((1, Lr), np.float32)
    lv = float(L.vdw_clash_loss(jnp.asarray(n), jnp.asarray(ca),
                                jnp.asarray(c), jnp.asarray(mask),
                                include_o=True))
    assert lv < 1e-6, lv

    squashed = {k: jnp.asarray(v * np.array([0.55, 1.0, 1.0]))
                for k, v in (("n", n), ("ca", ca), ("c", c))}
    lv_bad = float(L.vdw_clash_loss(squashed["n"], squashed["ca"],
                                    squashed["c"], jnp.asarray(mask),
                                    include_o=True))
    assert lv_bad > lv + 1e-4
