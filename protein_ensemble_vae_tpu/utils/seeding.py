"""Seeding utility.

The reference exports ``set_seed`` from its package ``__init__`` but never
defines it (models/__init__.py:16,40 — a latent ImportError); this is the
working version. JAX randomness itself is explicit-PRNG-key based, so this
only covers the host-side numpy/python generators used in data shuffling.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
