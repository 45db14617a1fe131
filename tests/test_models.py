"""Model tests: shapes, padding invariance, prior sampling, and E(n)
equivariance of the banded EGNN decoder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protein_ensemble_vae_tpu.config import ModelConfig
from protein_ensemble_vae_tpu.models import EGNNBandLayer, EGNNDecoder, HierCVAE
from protein_ensemble_vae_tpu.models.decoder import band_indices

SMALL = ModelConfig(seqemb_dim=32, d_model=64, nhead=4, ff=128, nlayers=2,
                    z_global=32, z_local=16, decoder_hidden=32,
                    decoder_layers=2, max_neighbors=6)


def _inputs(rng, B=2, L=12, cfg=SMALL):
    return dict(
        seqemb=jnp.array(rng.normal(0, 1, (B, L, cfg.seqemb_dim)), jnp.float32),
        n_coords=jnp.array(rng.normal(0, 3, (B, L, 3)), jnp.float32),
        ca_coords=jnp.array(rng.normal(0, 3, (B, L, 3)), jnp.float32),
        c_coords=jnp.array(rng.normal(0, 3, (B, L, 3)), jnp.float32),
        dihedrals=jnp.array(rng.normal(0, 1, (B, L, 6)), jnp.float32),
        mask=jnp.ones((B, L), jnp.float32),
    )


@pytest.fixture(scope="module")
def model_and_params():
    rng = np.random.default_rng(0)
    model = HierCVAE(SMALL)
    inp = _inputs(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        **inp)
    return model, variables


def test_forward_shapes(model_and_params, rng):
    model, variables = model_and_params
    inp = _inputs(rng)
    out = model.apply(variables, **inp, rngs={"reparam": jax.random.PRNGKey(2)})
    pred_n, pred_ca, pred_c, pred_seq, mu_g, lv_g, mu_l, lv_l = out
    B, L = 2, 12
    assert pred_n.shape == (B, L, 3)
    assert pred_ca.shape == (B, L, 3)
    assert pred_c.shape == (B, L, 3)
    assert pred_seq.shape == (B, L, 20)
    assert mu_g.shape == (B, SMALL.z_global)
    assert mu_l.shape == (B, L, SMALL.z_local)
    for o in out:
        assert np.all(np.isfinite(np.asarray(o)))


def test_padded_positions_zero(model_and_params, rng):
    model, variables = model_and_params
    inp = _inputs(rng)
    mask = np.ones((2, 12), np.float32)
    mask[0, 8:] = 0.0
    inp["mask"] = jnp.array(mask)
    pred_n, pred_ca, pred_c, pred_seq, *_ = model.apply(
        variables, **inp, rngs={"reparam": jax.random.PRNGKey(2)})
    assert np.allclose(np.asarray(pred_ca[0, 8:]), 0.0)
    assert np.allclose(np.asarray(pred_seq[0, 8:]), 0.0)


def test_padding_invariance(model_and_params, rng):
    """Decoder output on valid residues must not depend on padded content."""
    model, variables = model_and_params
    inp = _inputs(rng)
    mask = np.ones((2, 12), np.float32)
    mask[:, 9:] = 0.0
    inp["mask"] = jnp.array(mask)
    z_g = jnp.array(rng.normal(0, 1, (2, SMALL.z_global)), jnp.float32)
    z_l = jnp.array(rng.normal(0, 1, (2, 12, SMALL.z_local)), jnp.float32)

    dec = lambda zl: model.apply(variables, z_g, zl, jnp.array(mask),
                                 method=HierCVAE.decode)
    out1 = dec(z_l)
    z_l2 = z_l.at[:, 9:].set(999.0)  # garbage in padded latents
    out2 = dec(z_l2)
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_decoder_band_graph_matches_reference_window():
    """Band indices reproduce |i-j| <= W, i != j edges."""
    L, W = 10, 3
    idx, in_range = band_indices(L, W)
    edges = set()
    for i in range(L):
        for k in range(2 * W + 1):
            if bool(in_range[i, k]):
                edges.add((i, int(idx[i, k])))
    expected = {(i, j) for i in range(L) for j in range(max(0, i - W), min(L, i + W + 1))
                if i != j}
    assert edges == expected


def test_egnn_layer_equivariance(rng):
    """Rotations/translations of x commute with the layer (Satorras 2021
    property claimed at reference en_gnn_decoder.py:22-27)."""
    B, L, H, W = 2, 16, 24, 4
    layer = EGNNBandLayer(hidden=H)
    h = jnp.array(rng.normal(0, 1, (B, L, H)), jnp.float32)
    x = jnp.array(rng.normal(0, 1, (B, L, 3)), jnp.float32)
    nbr_idx, in_range = band_indices(L, W)
    nbr_valid = jnp.broadcast_to(in_range[None], (B, L, 2 * W + 1))
    deg_inv = 1.0 / jnp.maximum(jnp.sum(nbr_valid, -1).astype(jnp.float32), 1.0)

    params = layer.init(jax.random.PRNGKey(0), h, x, nbr_idx, nbr_valid, deg_inv)

    theta = 0.9
    R = jnp.array([[np.cos(theta), -np.sin(theta), 0],
                   [np.sin(theta), np.cos(theta), 0],
                   [0, 0, 1.0]], jnp.float32)
    t = jnp.array([3.0, -1.0, 2.0], jnp.float32)

    h1, x1 = layer.apply(params, h, x, nbr_idx, nbr_valid, deg_inv)
    h2, x2 = layer.apply(params, h, x @ R.T + t, nbr_idx, nbr_valid, deg_inv)

    # Exact in real arithmetic; fp32 rounding amplified through LayerNorm
    # bounds the tolerance. A genuine equivariance break would be O(1).
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-2)
    np.testing.assert_allclose(np.asarray(x1 @ R.T + t), np.asarray(x2),
                               atol=2e-2)


def test_decoder_equivariance_of_refinement(rng):
    """Full decoder: rotating the *initial* coords (by rotating through the
    EGNN stack) keeps N/C placement consistent — here we check the weaker,
    exact property that decode is deterministic and finite, and bond lengths
    hit their targets."""
    model = HierCVAE(SMALL)
    inp = _inputs(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        **inp)
    z_g = jnp.array(rng.normal(0, 1, (2, SMALL.z_global)), jnp.float32)
    z_l = jnp.array(rng.normal(0, 1, (2, 12, SMALL.z_local)), jnp.float32)
    n, ca, c, seq = model.apply(variables, z_g, z_l, inp["mask"],
                                method=HierCVAE.decode)
    # CA-C is exactly the idealized length (unit direction x fixed length);
    # N is placed at 1.46 then moved by the 3-iteration peptide projection
    # (scale clamped to [0.9, 1.1] per iter), so check a physical band.
    d_nca = np.linalg.norm(np.asarray(n - ca), axis=-1)
    d_cac = np.linalg.norm(np.asarray(c - ca), axis=-1)
    np.testing.assert_allclose(d_cac, 1.52, atol=1e-3)
    assert np.all(d_nca > 0.5) and np.all(d_nca < 2.6)


def test_peptide_projection_improves_cn_bond(rng):
    model = HierCVAE(SMALL)
    inp = _inputs(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        **inp)
    z_g = jnp.array(rng.normal(0, 1, (1, SMALL.z_global)), jnp.float32)
    z_l = jnp.array(rng.normal(0, 1, (1, 12, SMALL.z_local)), jnp.float32)
    mask = jnp.ones((1, 12), jnp.float32)
    n, ca, c, _ = model.apply(variables, z_g, z_l, mask,
                              method=HierCVAE.decode)
    cn = np.linalg.norm(np.asarray(n[0, 1:] - c[0, :-1]), axis=-1)
    # after 3 x 15% pulls the C-N distances should be closer to 1.33 than
    # random initialization would give (sanity band, not exact)
    assert np.mean(np.abs(cn - 1.33)) < np.mean(np.abs(cn * 1.5 - 1.33)) + 1.0


def test_prior_sampling(model_and_params, rng):
    model, variables = model_and_params
    mask = jnp.ones((2, 12), jnp.float32)
    n, ca, c, seq = model.apply(
        variables, mask, 3, method=HierCVAE.sample,
        rngs={"sample": jax.random.PRNGKey(7)})
    assert ca.shape == (6, 12, 3)
    assert seq.shape == (6, 12, 20)
    # different samples differ
    assert not np.allclose(np.asarray(ca[0]), np.asarray(ca[1]))


def test_dropout_rng_paths(model_and_params, rng):
    model, variables = model_and_params
    inp = _inputs(rng)
    out = model.apply(variables, **inp, deterministic=False,
                      rngs={"reparam": jax.random.PRNGKey(2),
                            "dropout": jax.random.PRNGKey(3)})
    assert np.all(np.isfinite(np.asarray(out[1])))


def test_torch_matched_init_statistics(model_and_params):
    """Every Dense kernel follows torch nn.Linear's default family:
    U(+-1/sqrt(fan_in)) => |w| <= 1/sqrt(fan), std ~ 1/sqrt(3*fan).
    Biases are bounded the same way; latent logvar bias halves sit at -2.0;
    the split EGNN edge layer uses the JOINT reference fan-in 2H+1.
    (Root-caused in the round-3 head-to-head: the lecun default's 3x
    variance froze sequence recovery at 0.11 vs the reference's 0.44.)"""
    _, variables = model_and_params
    params = variables["params"]

    def get(path):
        node = params
        for k in path.split("/"):
            node = node[k]
        return np.asarray(node)

    # Encoder fusion kernel: fan_in = d_model.
    w = get("encoder/enc/fusion_dense/kernel")
    fan = w.shape[0]
    bound = 1.0 / np.sqrt(fan)
    assert np.abs(w).max() <= bound + 1e-7
    assert np.isclose(w.std(), bound / np.sqrt(3), rtol=0.25)
    b = get("encoder/enc/fusion_dense/bias")
    assert np.abs(b).max() <= bound + 1e-7 and np.abs(b).max() > 0.0

    # Latent head logvar bias halves at exactly -2.0, mu halves random.
    for head, z in (("global_out", SMALL.z_global), ("local_out", SMALL.z_local)):
        b = get(f"encoder/latent/{head}/bias")
        assert np.all(b[z:] == -2.0)
        assert np.abs(b[:z]).max() > 0.0 and np.abs(b[:z]).max() <= 1.0 / np.sqrt(256) + 1e-7

    # Split EGNN edge-MLP first layer: joint fan 2H+1 for all three pieces.
    H = SMALL.decoder_hidden
    joint_bound = 1.0 / np.sqrt(2 * H + 1)
    for piece in ("phi_e1_hi_kernel", "phi_e1_hj_kernel", "phi_e1_d2_kernel"):
        w = get(f"decoder/egnn_0/{piece}")
        assert np.abs(w).max() <= joint_bound + 1e-7, piece
    assert np.abs(get("decoder/egnn_0/phi_e1_hi_bias")).max() <= joint_bound + 1e-7

    # l2c_out keeps the reference's 0.1 kernel scale + zero bias.
    w = get("decoder/l2c_out/kernel")
    assert np.abs(w).max() <= 0.1 / np.sqrt(H // 2) + 1e-7
    assert np.all(get("decoder/l2c_out/bias") == 0.0)
