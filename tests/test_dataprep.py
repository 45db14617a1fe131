"""Dataset-build pipeline tests: mmCIF parsing, alignment, pair features,
H5 schema round-trip — all offline via a synthetic mmCIF fixture."""

import numpy as np
import pytest

from protein_ensemble_vae_tpu.data import EnsembleDataset
from protein_ensemble_vae_tpu.data.synthetic import helix_backbone
from protein_ensemble_vae_tpu.dataprep.align import (
    alignment_identity_coverage,
    compute_rmsf_ensemble,
    core_fit_align,
    medoid_index,
    needleman_wunsch,
)
from protein_ensemble_vae_tpu.dataprep.mmcif import (
    chain_to_arrays,
    parse_mmcif_backbone,
)
from protein_ensemble_vae_tpu.dataprep.pair_features import (
    compute_pair_features,
    virtual_cb,
)
from protein_ensemble_vae_tpu.dataprep.pipeline import (
    append_crosspdb_conformers,
    process_chain,
    write_chain_h5,
    write_manifests,
)

AA3 = {"A": "ALA", "G": "GLY", "L": "LEU", "K": "LYS", "S": "SER"}


def _fake_mmcif(K=3, L=60, seed=0, chain="A", jitter=0.4):
    """Generate a synthetic multi-model mmCIF text with K conformers."""
    rng = np.random.default_rng(seed)
    n0, ca0, c0 = helix_backbone(L)
    seq = rng.choice(list(AA3.keys()), L)
    lines = ["data_test", "#", "loop_"]
    cols = ["group_PDB", "id", "label_atom_id", "label_alt_id",
            "label_comp_id", "label_asym_id", "auth_asym_id", "auth_seq_id",
            "Cartn_x", "Cartn_y", "Cartn_z", "pdbx_PDB_model_num"]
    lines += [f"_atom_site.{c}" for c in cols]
    aid = 1
    for k in range(1, K + 1):
        d = rng.normal(0, jitter, (L, 3))
        for i in range(L):
            for name, base in (("N", n0), ("CA", ca0), ("C", c0)):
                xyz = base[i] + d[i]
                lines.append(
                    f"ATOM {aid} {name} . {AA3[seq[i]]} {chain} {chain} "
                    f"{i + 1} {xyz[0]:.3f} {xyz[1]:.3f} {xyz[2]:.3f} {k}")
                aid += 1
    lines.append("#")
    return "\n".join(lines), "".join(seq)


def test_mmcif_parse_and_arrays():
    text, seq = _fake_mmcif(K=3, L=60)
    chains = parse_mmcif_backbone(text, is_text=True)
    assert "A" in chains
    arrays = chain_to_arrays(chains["A"])
    assert arrays["coords_ca"].shape == (3, 60, 3)
    assert arrays["mask"].sum() == 3 * 60
    assert arrays["sequence"] == seq


def test_medoid_and_core_fit(rng):
    _, ca, _ = helix_backbone(40)
    K = 4
    coords = np.stack([ca + rng.normal(0, s, ca.shape).astype(np.float32)
                       for s in (0.1, 0.1, 0.1, 2.0)])
    n = coords + np.array([1.0, 0, 0], np.float32)
    c = coords + np.array([0, 1.0, 0], np.float32)
    mask = np.ones((K, 40), np.float32)
    med = medoid_index(coords, mask)
    assert med != 3  # the outlier can't be the medoid
    an, aca, ac, med2, core = core_fit_align(n, coords, c, mask)
    assert core.sum() >= 3
    rmsf = compute_rmsf_ensemble(aca, mask)
    assert rmsf.shape == (40,)
    assert np.all(rmsf >= 0)


def test_needleman_wunsch_identical():
    s = "ACDEFGHIKLMNPQRSTVWY"
    score, pairs = needleman_wunsch(s, s)
    ident, cov = alignment_identity_coverage(s, s, pairs)
    assert ident == 1.0 and cov == 1.0
    assert pairs == [(i, i) for i in range(len(s))]


def test_needleman_wunsch_with_gap():
    a = "ACDEFGHIKL"
    b = "ACDFGHIKL"  # E deleted
    _, pairs = needleman_wunsch(a, b)
    ident, cov = alignment_identity_coverage(a, b, pairs)
    assert ident > 0.9
    assert len(pairs) == 9


def test_virtual_cb_geometry():
    n, ca, c = helix_backbone(10)
    cb = virtual_cb(n, ca, c)
    d = np.linalg.norm(cb - ca, axis=-1)
    assert np.all(d > 1.0) and np.all(d < 2.2)  # ~1.53 A typical


def test_pair_features_shapes():
    n, ca, c = helix_backbone(20)
    mask = np.ones(20, np.float32)
    mask[3] = 0.0
    pf = compute_pair_features(n, ca, c, mask)
    assert pf["d"].shape == (20, 20)
    assert pf["pair_mask"][3].sum() == 0  # invalid residue has no pairs
    assert pf["pair_mask"][0, 0] == 0     # no self pairs
    # symmetric distances
    np.testing.assert_allclose(pf["d"], pf["d"].T, atol=1e-4)


def test_process_chain_and_h5_roundtrip(tmp_path):
    text, seq = _fake_mmcif(K=3, L=60)
    chains = parse_mmcif_backbone(text, is_text=True)
    arrays = chain_to_arrays(chains["A"])
    processed = process_chain(arrays, min_len=50, max_len=600)
    assert processed is not None
    assert processed["torsion_phi_sincos"].shape == (3, 60, 2)
    h5 = str(tmp_path / "h5" / "test_A_nmr.h5")
    write_chain_h5(h5, processed)

    manifests = write_manifests([h5], str(tmp_path), seed=1,
                                splits=(1.0, 0.0, 0.0))
    ds = EnsembleDataset(manifests["train"], use_seqemb=False)
    assert len(ds.conformers) == 3
    assert len(ds) == 3  # C(3,2)


def test_process_chain_gates():
    text, _ = _fake_mmcif(K=3, L=20)  # too short
    chains = parse_mmcif_backbone(text, is_text=True)
    arrays = chain_to_arrays(chains["A"])
    assert process_chain(arrays, min_len=50) is None


def test_crosspdb_augmentation():
    text, seq = _fake_mmcif(K=2, L=60, seed=0)
    chains = parse_mmcif_backbone(text, is_text=True)
    base = chain_to_arrays(chains["A"])
    base = process_chain(base, min_len=50, with_pair_features=False)

    # candidate: same sequence, rigidly transformed coords
    theta = 0.5
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]], np.float32)
    cand = dict(
        coords_n=base["coords_n"][:1] @ R.T + 5.0,
        coords_ca=base["coords_ca"][:1] @ R.T + 5.0,
        coords_c=base["coords_c"][:1] @ R.T + 5.0,
        mask=base["mask"][:1], sequence=base["sequence"], source="candpdb")
    cross = append_crosspdb_conformers(base, [cand])
    assert cross["coords_ca"].shape[0] == 1
    # after Kabsch into the base frame the conformer matches the original
    med = base["medoid"]
    err = np.abs(cross["coords_ca"][0] - base["coords_ca"][0]).max()
    assert err < 0.5
