"""Sequence encode/decode utilities.

Reference ``models/sequence_utils.py`` equivalent, JAX-native:

- ``sequence_to_onehot``      (sequence_utils.py:18-43; unknown AA -> uniform)
- ``logits_to_labels`` / ``tensor_to_sequence``
                              (sequence_utils.py:44-70; 'argmax' and 'sample'
                               — the reference's docstring also advertises
                               'threshold' but its body raises ValueError for
                               it, so we match the implemented behavior and
                               additionally accept 'threshold' as documented:
                               greedy over classes whose probability clears
                               ``threshold``, falling back to argmax)
- ``sequence_accuracy_vs_string``  (sequence_utils.py:72-101)
- ``to_3letter``              (sequence_utils.py:103-119)

Sampling uses ``jax.random.categorical`` over the logits — the exact
counterpart of the reference's softmax+multinomial, but batched and
traceable under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from protein_ensemble_vae_tpu.config import AA_1TO3, AA_TO_IDX, IDX_TO_AA

Array = jax.Array

DECODE_METHODS = ("argmax", "sample", "threshold")


def sequence_to_onehot(sequence: str) -> np.ndarray:
    """AA string -> [L, 20] one-hot; unknown residues get uniform 1/20."""
    L = len(sequence)
    out = np.full((L, 20), 0.0, np.float32)
    for i, aa in enumerate(sequence):
        j = AA_TO_IDX.get(aa)
        if j is None:
            out[i, :] = 1.0 / 20.0
        else:
            out[i, j] = 1.0
    return out


def logits_to_labels(logits: Array, method: str = "argmax",
                     rng: Optional[Array] = None,
                     threshold: float = 0.5) -> Array:
    """[..., 20] logits -> [...] int labels under the chosen decode method."""
    if method == "argmax":
        return jnp.argmax(logits, axis=-1)
    if method == "sample":
        if rng is None:
            raise ValueError("method='sample' needs an rng key")
        return jax.random.categorical(rng, logits, axis=-1)
    if method == "threshold":
        # greedy over classes clearing the probability threshold; when none
        # does, plain argmax (which is also the argmax over cleared classes,
        # so this reduces to argmax whenever the top prob > threshold).
        probs = jax.nn.softmax(logits, axis=-1)
        cleared = jnp.where(probs >= threshold, probs, -jnp.inf)
        any_cleared = jnp.any(jnp.isfinite(cleared), axis=-1)
        return jnp.where(any_cleared,
                         jnp.argmax(cleared, axis=-1),
                         jnp.argmax(logits, axis=-1))
    raise ValueError(f"Unknown method: {method!r} "
                     f"(expected one of {DECODE_METHODS})")


def tensor_to_sequence(logits, method: str = "argmax",
                       rng: Optional[Array] = None,
                       threshold: float = 0.5) -> str:
    """[L, 20] logits -> AA string (reference sequence_utils.py:44-70)."""
    labels = np.asarray(logits_to_labels(jnp.asarray(logits), method,
                                         rng=rng, threshold=threshold))
    return "".join(IDX_TO_AA[int(i)] for i in labels.reshape(-1))


def sequence_accuracy_vs_string(pred_logits, target_sequence: str,
                                mask=None) -> float:
    """Argmax accuracy of [B, L, 20] logits against an AA string
    (reference sequence_utils.py:72-101; unknown residues, encoded uniform,
    resolve to class 0 by argmax, matching torch)."""
    pred = np.asarray(jnp.argmax(jnp.asarray(pred_logits), axis=-1))
    tgt = sequence_to_onehot(target_sequence).argmax(-1)[None]  # [1, L]
    if mask is not None:
        valid = np.asarray(mask) > 0.5
        if valid.sum() == 0:
            return 0.0
        return float(((pred == tgt) & valid).sum() / valid.sum())
    return float((pred == tgt).mean())


def to_3letter(sequence: str) -> list[str]:
    """1-letter AA string -> 3-letter codes, unknown -> ALA
    (reference sequence_utils.py:103-119)."""
    return [AA_1TO3.get(aa, "ALA") for aa in sequence]
