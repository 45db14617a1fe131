"""End-to-end training slice: 2-epoch smoke train on the synthetic fixture
(mirrors the reference's de-facto smoke test, POST_PAIRWISE_ANALYSIS.md:219-228)
+ scheduler math + checkpoint/resume round-trip."""

import numpy as np
import jax
import pytest

from protein_ensemble_vae_tpu.config import (LossWeights, ModelConfig,
                                             RunConfig, TrainConfig)
from protein_ensemble_vae_tpu.data import EnsembleDataset, make_synthetic_dataset
from protein_ensemble_vae_tpu.models import HierCVAE
from protein_ensemble_vae_tpu.train import (CyclicalKLScheduler,
                                            MonotonicKLScheduler,
                                            ReduceLROnPlateau,
                                            create_kl_scheduler, train_model)
from protein_ensemble_vae_tpu.train.checkpoint import (load_checkpoint,
                                                       load_history,
                                                       load_meta,
                                                       load_run_config,
                                                       save_checkpoint)
from protein_ensemble_vae_tpu.utils import MetricLogger

TINY_MODEL = ModelConfig(seqemb_dim=16, d_model=32, nhead=4, ff=64, nlayers=1,
                         z_global=16, z_local=8, decoder_hidden=16,
                         decoder_layers=2, max_neighbors=4)


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("smoke")
    train_csv, val_csv = make_synthetic_dataset(
        str(root), n_proteins=1, K=3, lengths=(16,), seqemb_dim=16, seed=5)
    train_ds = EnsembleDataset(train_csv, use_seqemb=True)
    val_ds = EnsembleDataset(val_csv, use_seqemb=True)
    cfg = RunConfig(
        model=TINY_MODEL,
        loss=LossWeights(),
        train=TrainConfig(batch_size=3, epochs=2, lr=1e-4, seed=13,
                          bucket_sizes=(16,), kl_schedule="cyclical"))
    model = HierCVAE(cfg.model)
    state, history = train_model(model, train_ds, val_ds, cfg,
                                 logger=MetricLogger())
    return model, cfg, state, history, str(root)


def test_smoke_train_runs_and_is_finite(tiny_run):
    _, _, state, history, _ = tiny_run
    assert len(history["train"]["loss"]) == 2
    assert all(np.isfinite(v) for v in history["train"]["loss"])
    assert all(np.isfinite(v) for v in history["val"]["loss"])
    # all 12 reference metric names present
    for k in ("loss", "rec", "pair", "klg", "kll", "dihedral", "rama",
              "bond", "angle", "seq", "seq_acc", "clash"):
        assert k in history["train"] and len(history["train"][k]) == 2


def test_loss_decreases_with_training(tiny_run):
    """Two epochs on one tiny protein: training loss should not explode."""
    _, _, _, history, _ = tiny_run
    assert history["train"]["loss"][-1] < history["train"]["loss"][0] * 2.0


def test_checkpoint_roundtrip(tiny_run, tmp_path):
    model, cfg, state, history, _ = tiny_run
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, cfg, epoch=2, loss_history=history,
                    extra_meta={"plateau": {"lr": 1e-4}})
    meta = load_meta(path)
    assert meta["epoch"] == 2
    cfg2 = load_run_config(path)
    assert cfg2.model.d_model == cfg.model.d_model
    hist = load_history(path)
    assert len(hist["train"]["loss"]) == 2

    restored = load_checkpoint(path, state)
    leaves_a = jax.tree.leaves(state.params)
    leaves_b = jax.tree.leaves(restored.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Scheduler math (golden values from the reference formulas)
# ---------------------------------------------------------------------------

def test_cyclical_scheduler_sawtooth():
    s = CyclicalKLScheduler(n_cycles=4, ratio=0.5, max_weight=2.0)
    w = [s.step(e, 200) for e in range(1, 201)]
    # peak at the middle of each 50-epoch cycle
    assert abs(max(w) - 2.0) < 0.1
    assert w[0] == 0.0
    # cycle restarts: epoch 51 is back near zero
    assert w[50] < 0.1
    # ratio=1.0 holds at max after ramp
    s2 = CyclicalKLScheduler(n_cycles=2, ratio=1.0, max_weight=1.0)
    w2 = [s2.step(e, 100) for e in range(1, 101)]
    assert w2[49] > 0.9


def test_monotonic_scheduler():
    s = MonotonicKLScheduler(warmup_epochs=10, max_weight=1.0)
    assert abs(s.step(5, 100) - 0.5) < 1e-9
    assert s.step(10, 100) == 1.0
    assert s.step(50, 100) == 1.0


def test_adaptive_scheduler_moves_with_rmsd():
    s = create_kl_scheduler("adaptive", max_weight=10.0, warmup_epochs=2,
                            target_rmsd=1.5, min_weight=0.1)
    s.step(1, 100)
    s.step(2, 100)
    w_before = s.step(3, 100, val_rmsd=1.0)   # good -> increase
    w_after = s.step(4, 100, val_rmsd=3.0)    # bad -> decrease
    assert w_after < w_before * 1.01


def test_exponential_scheduler_monotone():
    s = create_kl_scheduler("exponential", max_weight=1.0, warmup_epochs=20)
    w = [s.step(e, 100) for e in range(1, 30)]
    assert all(b >= a - 1e-12 for a, b in zip(w, w[1:]))
    assert abs(w[19 - 1] - 1.0) < 1e-6 or w[-1] == 1.0


def test_scheduler_state_roundtrip():
    s = CyclicalKLScheduler(n_cycles=4, ratio=0.4, max_weight=1.0)
    for e in range(1, 10):
        s.step(e, 100)
    st = s.get_state()
    s2 = CyclicalKLScheduler(n_cycles=4, ratio=0.4, max_weight=1.0)
    s2.load_state(st)
    assert s2.current_weight == s.current_weight
    assert s2.history == s.history


def test_reduce_lr_on_plateau_torch_semantics():
    sch = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2, min_lr=0.1)
    sch.step(10.0)           # new best
    for _ in range(2):
        sch.step(10.0)       # bad x2 (== patience, not yet > patience)
    assert sch.lr == 1.0
    sch.step(10.0)           # 3rd bad epoch -> reduce
    assert sch.lr == 0.5
    # min_lr floor
    for _ in range(20):
        sch.step(10.0)
    assert sch.lr >= 0.1


def test_run_epoch_skips_nonfinite_steps(tiny_run):
    """A non-finite step must be excluded from epoch stats, not poison them
    (apply_if_finite skips the update; run_epoch skips the accumulation)."""
    import jax.numpy as jnp
    from protein_ensemble_vae_tpu.train.training import run_epoch

    model, cfg, state, history, root = tiny_run

    calls = {"n": 0}

    def fake_step(state, batch, rng, klw_g, klw_l, lr):
        calls["n"] += 1
        bad = calls["n"] == 2
        val = jnp.where(bad, jnp.nan, 1.0)
        metrics = {k: val for k in
                   ("loss", "rec", "pair", "klg", "kll", "dihedral", "rama",
                    "bond", "angle", "seq", "seq_acc", "clash", "grad_norm",
                    "rec_ca")}
        return state, metrics

    from protein_ensemble_vae_tpu.data import EnsembleDataset, make_epoch_batches
    train_csv = root + "/manifest_train.csv"
    ds = EnsembleDataset(train_csv, use_seqemb=True)
    batches = list(make_epoch_batches(ds, 1, (16,), False, 0))[:3]
    _, stats = run_epoch(state, fake_step, batches, jax.random.PRNGKey(0),
                         0.0, 0.0, 1e-4, 16)
    assert stats["loss"] == 1.0           # NaN step excluded
    assert 0 < stats["nonfinite_frac"] < 1


def test_compact_backbone_geometry():
    from protein_ensemble_vae_tpu.data.synthetic import compact_backbone

    n, ca, c = compact_backbone(64, seed=3)
    d = np.linalg.norm(np.diff(ca, axis=0), axis=-1)
    assert 3.6 < d.mean() < 4.0
    rg = np.sqrt(((ca - ca.mean(0)) ** 2).sum(-1).mean())
    assert rg < 20  # compact, not an extended rod


def test_config_presets_load():
    import glob
    import json

    from protein_ensemble_vae_tpu.config import (LossWeights, ModelConfig,
                                                 TrainConfig)

    presets = glob.glob("configs/*.json")
    assert len(presets) >= 5
    for p in presets:
        d = json.load(open(p))
        ModelConfig.from_dict(d["model"])
        LossWeights.from_dict(d["loss"])
        TrainConfig.from_dict(d["train"])


def test_watch_dumps_param_grad_histograms(tiny_run, tmp_path):
    """Offline wandb.watch equivalent (reference training.py:209-210):
    every-N-epoch npz with per-layer param AND grad histograms."""
    model, cfg, state, _, root = tiny_run
    from protein_ensemble_vae_tpu.utils.watch import make_watch_fn

    train_ds = EnsembleDataset(root + "/manifest_train.csv", use_seqemb=True)
    outdir = str(tmp_path / "watch")
    fn = make_watch_fn(model, train_ds, cfg, outdir, every=2)
    fn(state, 1)      # cadence: skipped
    fn(state, 2)      # dumped
    import os
    assert not os.path.exists(os.path.join(outdir, "epoch_00001.npz"))
    path = os.path.join(outdir, "epoch_00002.npz")
    assert os.path.exists(path)
    z = np.load(path)
    param_keys = [k for k in z.files if k.startswith("param/")]
    grad_keys = [k for k in z.files if k.startswith("grad/")]
    assert param_keys and grad_keys
    # histograms + stats present for a known leaf and finite
    counts = [k for k in grad_keys if k.endswith("/counts")]
    assert counts
    some = counts[0][:-len("/counts")]
    assert int(z[some + "/counts"].sum()) > 0
    assert np.isfinite(z[some + "/l2"])
    # every param leaf is covered
    n_param_leaves = len(jax.tree.leaves(state.params))
    assert len([k for k in param_keys if k.endswith("/counts")]) == n_param_leaves


def test_make_watch_fn_disabled_is_none(tiny_run):
    from protein_ensemble_vae_tpu.utils.watch import make_watch_fn
    model, cfg, *_ , root = tiny_run
    train_ds = EnsembleDataset(root + "/manifest_train.csv", use_seqemb=True)
    assert make_watch_fn(model, train_ds, cfg, "/tmp/x", every=0) is None


def test_record_artifact_manifest(tmp_path):
    """Checkpoint-artifact manifest: offline equivalent of the reference's
    wandb Artifact upload (training.py:464-477)."""
    import json
    from protein_ensemble_vae_tpu.train.checkpoint import record_artifact

    root = str(tmp_path / "ckpts")
    m1 = record_artifact(root, "best", root + "/best", 3,
                         {"rec": 1.5, "loss": np.float32(9.0)})
    m2 = record_artifact(root, "final", root + "/final", 5)
    assert m1 == m2
    recs = [json.loads(l) for l in open(m1)]
    assert [r["name"] for r in recs] == ["best", "final"]
    assert recs[0]["epoch"] == 3 and recs[0]["metrics"]["rec"] == 1.5
    assert isinstance(recs[0]["metrics"]["loss"], float)


def test_opt_flatten_matches_default_updates():
    """make_optimizer(flatten=True) collapses the per-tensor Adam chain
    into one raveled pass (scripts/opt_flatten_onchip.py measures the
    latency win); the parameter trajectory must be numerically identical
    to the default optimizer."""
    import jax.numpy as jnp
    from protein_ensemble_vae_tpu.train.training import make_optimizer

    rng = np.random.default_rng(0)
    params = {"a": jnp.asarray(rng.normal(0, 1, (7, 5)), jnp.float32),
              "b": {"w": jnp.asarray(rng.normal(0, 1, (3,)), jnp.float32)}}
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(0, 1, p.shape), jnp.float32),
        params)

    outs = []
    for flatten in (False, True):
        tx = make_optimizer(10.0, flatten=flatten)
        st = tx.init(params)
        p = params
        for _ in range(3):
            up, st = tx.update(grads, st, p)
            p = jax.tree.map(lambda x, u: x - 1e-3 * u, p, up)
        outs.append(p)
    for x, y in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
