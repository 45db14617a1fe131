"""protein_ensemble_vae_tpu — TPU-native framework for protein conformational
ensemble learning with a hierarchical conditional VAE.

A from-scratch JAX / Flax / pjit / Pallas re-design of the capabilities of the
reference PyTorch codebase (mohit03031999/Protein-Ensemble-VAE):

- ``ops``      : pure-JAX geometry / math substrate (dihedrals, Kabsch, clash,
                 banded message passing) + Pallas TPU kernels for the hot ops.
- ``losses``   : the full physics-loss battery (reference ``models/losses.py``)
                 as fused, jittable functions.
- ``models``   : Flax modules — transformer encoder, hierarchical latent,
                 E(n)-equivariant banded GNN decoder, and the HierCVAE model.
- ``data``     : H5 ensemble datasets, pair enumeration, length-bucketed
                 padded batching, synthetic fixtures.
- ``train``    : jitted train step, KL schedulers, LR plateau scheduling,
                 early stopping, checkpointing (orbax + json sidecar).
- ``parallel`` : device-mesh construction and data/tensor-parallel shardings.
- ``infer``    : vmapped ensemble generation, PDB IO, geometry gating.
- ``eval``     : TM-score / lDDT / GDT / RMSF / Ramachandran / clash metrics.
"""

__version__ = "0.1.0"

from protein_ensemble_vae_tpu.config import (  # noqa: F401
    ModelConfig,
    LossWeights,
    TrainConfig,
)
