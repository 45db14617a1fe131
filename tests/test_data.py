"""Data pipeline tests over the synthetic H5 fixture."""

import numpy as np
import pytest

from protein_ensemble_vae_tpu.data import (
    EnsembleDataset,
    SingleConformerView,
    make_epoch_batches,
    make_synthetic_dataset,
)
from protein_ensemble_vae_tpu.data.collate import bucket_for
from protein_ensemble_vae_tpu.data.dataset import sequence_to_labels


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    train_csv, val_csv = make_synthetic_dataset(
        str(root), n_proteins=2, K=4, lengths=(24, 32), seqemb_dim=16, seed=3)
    return train_csv, val_csv


def test_dataset_pairs(synthetic):
    train_csv, _ = synthetic
    ds = EnsembleDataset(train_csv, use_seqemb=True)
    # 2 proteins x C(4,2)=6 pairs each
    assert len(ds) == 12
    assert len(ds.conformers) == 8
    assert ds.seqemb_dim == 16
    inp, tgt = ds[0]
    assert inp["ca"].shape[-1] == 3
    # centered on valid-CA centroid
    m = inp["mask"].astype(bool)
    np.testing.assert_allclose(inp["ca"][m].mean(0), 0.0, atol=1e-4)
    # pair members belong to the same protein (same length here)
    assert inp["ca"].shape == tgt["ca"].shape


def test_sequence_labels():
    labels = sequence_to_labels("ARNDX", 6)
    assert labels.tolist() == [0, 1, 2, 3, 0, 0]  # X -> 0, pad -> 0


def test_bucketing():
    assert bucket_for(24, (32, 64)) == 32
    assert bucket_for(33, (32, 64)) == 64
    with pytest.raises(ValueError):
        bucket_for(100, (32, 64))


def test_epoch_batches_shapes(synthetic):
    train_csv, _ = synthetic
    ds = EnsembleDataset(train_csv, use_seqemb=True)
    batches = list(make_epoch_batches(ds, batch_size=4, buckets=(24, 32, 64),
                                      shuffle=True, seed=0))
    assert sum(b.inp.ca.shape[0] for b in batches) == len(ds)
    for b in batches:
        L = b.inp.ca.shape[1]
        assert L in (24, 32, 64)
        assert b.inp.seq_emb.shape == (b.inp.ca.shape[0], L, 16)
        assert b.tgt.mask.shape == b.inp.mask.shape
        # padded rows are zero-masked
        lengths = b.inp.mask.sum(1)
        assert np.all(lengths > 0)


def test_epoch_batches_deterministic_given_seed(synthetic):
    train_csv, _ = synthetic
    ds = EnsembleDataset(train_csv, use_seqemb=True)
    a = [b.inp.ca.sum() for b in make_epoch_batches(ds, 4, (32, 64), True, 7)]
    b = [b.inp.ca.sum() for b in make_epoch_batches(ds, 4, (32, 64), True, 7)]
    assert a == b


def test_single_conformer_view(synthetic):
    train_csv, _ = synthetic
    ds = EnsembleDataset(train_csv, use_seqemb=True)
    view = SingleConformerView(ds)
    assert len(view) == 8
    item = view[0]
    assert item["ca"].ndim == 2
    assert "seq_labels" in item


def test_no_seqemb_mode(synthetic):
    train_csv, _ = synthetic
    ds = EnsembleDataset(train_csv, use_seqemb=False)
    batches = list(make_epoch_batches(ds, 2, (32, 64), False, 0))
    assert batches[0].inp.seq_emb is None


def _sample_keys(batch):
    """Hashable identity of each sample row in a PairBatch (a pair is its
    (input, target) conformer combination — inputs alone repeat across
    pairs of the same protein)."""
    return [batch.inp.ca[i].tobytes() + batch.tgt.ca[i].tobytes()
            for i in range(batch.inp.ca.shape[0])]


def test_sharded_epoch_batches_align_and_partition(synthetic):
    from protein_ensemble_vae_tpu.data.collate import make_sharded_epoch_batches

    train_csv, _ = synthetic
    ds = EnsembleDataset(train_csv, use_seqemb=True)
    per_proc = []
    for p in range(2):
        per_proc.append(list(make_sharded_epoch_batches(
            ds, 2, (24, 32, 64), shuffle=True, seed=11,
            process_index=p, process_count=2)))
    # same number of steps and identical padded shape at every step index
    assert len(per_proc[0]) == len(per_proc[1]) > 0
    for b0, b1 in zip(*per_proc):
        assert b0.inp.ca.shape == b1.inp.ca.shape
        assert b0.inp.ca.shape[0] == 2  # always full batches
    # processes see disjoint samples
    s0 = {k for b in per_proc[0] for k in _sample_keys(b)}
    s1 = {k for b in per_proc[1] for k in _sample_keys(b)}
    assert s0 and s1 and not (s0 & s1)


def test_sharded_epoch_batches_deterministic(synthetic):
    from protein_ensemble_vae_tpu.data.collate import make_sharded_epoch_batches

    train_csv, _ = synthetic
    ds = EnsembleDataset(train_csv, use_seqemb=True)
    a = [b.inp.ca.sum() for b in make_sharded_epoch_batches(
        ds, 2, (32, 64), True, 5, process_index=0, process_count=2)]
    b = [b.inp.ca.sum() for b in make_sharded_epoch_batches(
        ds, 2, (32, 64), True, 5, process_index=0, process_count=2)]
    assert a == b


def test_prepadded_factory_matches_collate(synthetic):
    from protein_ensemble_vae_tpu.data.collate import make_prepadded_factory

    train_csv, _ = synthetic
    ds = EnsembleDataset(train_csv, use_seqemb=True)
    factory = make_prepadded_factory()
    for shuffle, drop in ((False, False), (True, True)):
        ref = list(make_epoch_batches(ds, 3, (24, 32, 64), shuffle, 9,
                                      drop_remainder=drop))
        got = list(factory(ds, 3, (24, 32, 64), shuffle, 9,
                           drop_remainder=drop))
        assert len(ref) == len(got) > 0
        for rb, gb in zip(ref, got):
            for side in ("inp", "tgt"):
                r, g = getattr(rb, side), getattr(gb, side)
                np.testing.assert_array_equal(r.n, g.n)
                np.testing.assert_array_equal(r.ca, g.ca)
                np.testing.assert_array_equal(r.c, g.c)
                np.testing.assert_array_equal(r.mask, g.mask)
                np.testing.assert_array_equal(r.dihedrals, g.dihedrals)
                np.testing.assert_array_equal(r.seq_labels, g.seq_labels)
                np.testing.assert_array_equal(r.seq_emb, g.seq_emb)


def test_prepadded_factory_no_seqemb(synthetic):
    from protein_ensemble_vae_tpu.data.collate import make_prepadded_factory

    train_csv, _ = synthetic
    ds = EnsembleDataset(train_csv, use_seqemb=False)
    factory = make_prepadded_factory()
    ref = list(make_epoch_batches(ds, 2, (32, 64), False, 0))
    got = list(factory(ds, 2, (32, 64), False, 0))
    assert len(ref) == len(got) > 0
    for rb, gb in zip(ref, got):
        assert gb.inp.seq_emb is None and rb.inp.seq_emb is None
        np.testing.assert_array_equal(rb.inp.ca, gb.inp.ca)
        np.testing.assert_array_equal(rb.tgt.seq_labels, gb.tgt.seq_labels)


def test_sharded_epoch_batches_remainder_rotates(synthetic):
    """Dropped trailing samples must depend on the seed (membership is
    shuffled BEFORE chunking), so per-epoch seeds rotate the exclusion."""
    from protein_ensemble_vae_tpu.data.collate import make_sharded_epoch_batches

    train_csv, _ = synthetic
    ds = EnsembleDataset(train_csv, use_seqemb=True)

    def included(seed):
        out = set()
        for p in range(2):
            for b in make_sharded_epoch_batches(
                    ds, 2, (24, 32, 64), shuffle=True, seed=seed,
                    process_index=p, process_count=2):
                out.update(_sample_keys(b))
        return out

    sets = [included(s) for s in range(4)]
    assert any(sets[0] != s for s in sets[1:]), (
        "identical exclusion across seeds: remainder does not rotate")
    # across a few epochs, coverage approaches the full dataset
    union = set().union(*sets)
    assert len(union) > len(sets[0])


def test_prepadded_matches_collate_multichain_embeddings(tmp_path):
    """Two chains sharing a protein_id carry DIFFERENT embeddings; the
    prepadded store must not alias them (dedup is by array identity)."""
    import csv as _csv

    from protein_ensemble_vae_tpu.data import write_synthetic_h5
    from protein_ensemble_vae_tpu.data.collate import make_prepadded_factory

    pa = str(tmp_path / "dual_A_nmr.h5")
    pb = str(tmp_path / "dual_B_nmr.h5")
    write_synthetic_h5(pa, K=3, L=24, seed=1, seqemb_dim=16)
    write_synthetic_h5(pb, K=3, L=24, seed=2, seqemb_dim=16)
    manifest = str(tmp_path / "manifest.csv")
    with open(manifest, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["h5_path"])
        w.writerow([pa])
        w.writerow([pb])

    ds = EnsembleDataset(manifest, use_seqemb=True)
    assert len(ds.proteins) == 1  # both chains grouped under "dual"
    factory = make_prepadded_factory()
    ref = list(make_epoch_batches(ds, 3, (24,), False, 0))
    got = list(factory(ds, 3, (24,), False, 0))
    assert len(ref) == len(got) > 0
    for rb, gb in zip(ref, got):
        np.testing.assert_array_equal(rb.inp.seq_emb, gb.inp.seq_emb)
        np.testing.assert_array_equal(rb.tgt.seq_emb, gb.tgt.seq_emb)
