"""Ensemble generation (infer/generate.py) — latent-source contract.

The reference generator samples the encoder posterior
(generate_ensemble_pdbs.py:548-556); ``HierCVAE.sample`` additionally
exposes unconditional prior sampling (reference model.py:77-103).
``generate_ensembles(latent_source=...)`` selects between them.
"""

import os

import jax
import numpy as np
import pytest

from protein_ensemble_vae_tpu.config import ModelConfig
from protein_ensemble_vae_tpu.data import (EnsembleDataset,
                                           SingleConformerView,
                                           make_synthetic_dataset)
from protein_ensemble_vae_tpu.infer import generate_ensembles
from protein_ensemble_vae_tpu.models import HierCVAE


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("gen_data")
    make_synthetic_dataset(str(root), n_proteins=1, K=2, lengths=(16,),
                           seqemb_dim=8, seed=5)
    ds = EnsembleDataset(str(root / "manifest_train.csv"), use_seqemb=True,
                         verbose=False)
    view = SingleConformerView(ds)
    cfg = ModelConfig(seqemb_dim=8, d_model=16, nhead=2, ff=32, nlayers=1,
                      z_global=8, z_local=4, decoder_hidden=8,
                      decoder_layers=2, max_neighbors=4,
                      use_pallas_egnn=False)
    model = HierCVAE(cfg)
    item = view[0]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        item["seq_emb"][None], item["n"][None], item["ca"][None],
        item["c"][None], item["dihedrals"][None], item["mask"][None])
    return model, {"params": variables["params"]}, view


def _run(model, variables, view, outdir, **kw):
    return generate_ensembles(model, variables, view, str(outdir),
                              num_samples=3, seed=0, max_structures=1,
                              buckets=(16,), verbose=False, **kw)


def test_prior_and_posterior_modes_differ(tiny_setup, tmp_path):
    model, variables, view = tiny_setup
    out_post = _run(model, variables, view, tmp_path / "post",
                    latent_source="posterior")
    out_prior = _run(model, variables, view, tmp_path / "prior",
                     latent_source="prior")
    for out, sub in ((out_post, "post"), (out_prior, "prior")):
        assert len(out["results"]) == 1
        sid = out["results"][0]["structure"]
        for suffix in ("true", "reconstruction", "ensemble"):
            assert os.path.exists(tmp_path / sub / f"{sid}_{suffix}.pdb")

    from protein_ensemble_vae_tpu.infer.pdb_io import read_pdb_backbone
    sid = out_post["results"][0]["structure"]
    ca_post = read_pdb_backbone(str(tmp_path / "post" / f"{sid}_ensemble.pdb"))["ca"]
    ca_prior = read_pdb_backbone(str(tmp_path / "prior" / f"{sid}_ensemble.pdb"))["ca"]
    # same seed, same model: only the latent source changed, and it matters
    k = min(ca_post.shape[0], ca_prior.shape[0])
    assert not np.allclose(ca_post[:k], ca_prior[:k], atol=1e-4)


def test_zero_temperature_prior_collapses_to_mode(tiny_setup, tmp_path):
    """T=0 prior sampling decodes z=0 for every draw -> zero diversity."""
    model, variables, view = tiny_setup
    out = _run(model, variables, view, tmp_path / "t0",
               latent_source="prior", temperature=0.0)
    assert out["results"][0]["diversity"] == pytest.approx(0.0, abs=1e-5)


def test_invalid_latent_source_raises(tiny_setup, tmp_path):
    model, variables, view = tiny_setup
    with pytest.raises(ValueError, match="latent_source"):
        _run(model, variables, view, tmp_path / "bad", latent_source="magic")
