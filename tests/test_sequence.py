"""Sequence utils parity (reference models/sequence_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protein_ensemble_vae_tpu.config import AA_ORDER
from protein_ensemble_vae_tpu.infer.sequence import (
    logits_to_labels,
    sequence_accuracy_vs_string,
    sequence_to_onehot,
    tensor_to_sequence,
    to_3letter,
)


def test_onehot_roundtrip():
    seq = "ARNDCQEGHILKMFPSTWYV"
    oh = sequence_to_onehot(seq)
    assert oh.shape == (20, 20)
    assert np.allclose(oh, np.eye(20))


def test_onehot_unknown_uniform():
    oh = sequence_to_onehot("AXB")  # X and B are not in the 20-AA table
    assert np.allclose(oh[1], 1.0 / 20.0)
    assert np.allclose(oh[2], 1.0 / 20.0)
    assert oh[0, 0] == 1.0


def test_argmax_decode():
    logits = jnp.array(sequence_to_onehot("GLYW") * 10.0)
    assert tensor_to_sequence(logits) == "GLYW"


def test_sample_decode_follows_distribution():
    # near-deterministic logits: sampling must recover argmax almost always
    logits = jnp.array(sequence_to_onehot("MKV" * 10) * 50.0)
    out = tensor_to_sequence(logits, method="sample",
                             rng=jax.random.PRNGKey(0))
    assert out == "MKV" * 10

    # uniform logits: sampling must actually vary across positions
    flat = jnp.zeros((200, 20))
    labels = np.asarray(logits_to_labels(flat, "sample",
                                         rng=jax.random.PRNGKey(1)))
    assert len(set(labels.tolist())) > 5


def test_threshold_decode():
    # top prob ~1.0 clears 0.5 -> argmax; uniform never clears -> argmax too
    logits = jnp.array(sequence_to_onehot("AC") * 10.0)
    assert tensor_to_sequence(logits, method="threshold") == "AC"
    flat = jnp.zeros((3, 20))
    assert tensor_to_sequence(flat, method="threshold") == "AAA"


def test_unknown_method_raises():
    with pytest.raises(ValueError):
        logits_to_labels(jnp.zeros((2, 20)), "beam")
    with pytest.raises(ValueError):
        logits_to_labels(jnp.zeros((2, 20)), "sample")  # no rng


def test_accuracy_vs_string():
    seq = "ARND"
    logits = jnp.array(sequence_to_onehot(seq) * 10.0)[None]
    assert sequence_accuracy_vs_string(logits, seq) == 1.0
    mask = np.array([[1.0, 1.0, 0.0, 0.0]])
    wrong_tail = jnp.array(sequence_to_onehot("ARAA") * 10.0)[None]
    assert sequence_accuracy_vs_string(wrong_tail, seq, mask) == 1.0
    assert sequence_accuracy_vs_string(wrong_tail, seq) == 0.5


def test_to_3letter():
    assert to_3letter("AR") == ["ALA", "ARG"]
    assert to_3letter("X") == ["ALA"]
    assert len(AA_ORDER) == 20
