"""HierCVAE — the flagship hierarchical conditional VAE (Flax).

Wires ``ProteinEncoder`` + ``EGNNDecoder`` (reference ``models/model.py``).
Forward returns the same 8-tuple layout
``(pred_N, pred_CA, pred_C, pred_seq, mu_g, lv_g, mu_l, lv_l)``
(model.py:42-67). ``sample`` draws from the unit-Gaussian prior with latent
sizes taken from config — replacing the reference's hack of reading
``global_head[-1].out_features // 2`` (model.py:94-95).

RNG collections: ``params`` (init), ``reparam`` (posterior sampling),
``sample`` (prior sampling), ``dropout`` (training).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from protein_ensemble_vae_tpu.config import ModelConfig
from protein_ensemble_vae_tpu.models.decoder import EGNNDecoder
from protein_ensemble_vae_tpu.models.encoder import ProteinEncoder

Array = jax.Array


class HierCVAE(nn.Module):
    config: ModelConfig
    dtype: Any = jnp.float32   # compute dtype; params stay fp32

    def setup(self):
        cfg = self.config
        dtype = self.dtype
        self.encoder = ProteinEncoder(
            seqemb_dim=cfg.seqemb_dim, d_model=cfg.d_model, nhead=cfg.nhead,
            ff=cfg.ff, nlayers=cfg.nlayers, z_g=cfg.z_global, z_l=cfg.z_local,
            dropout=cfg.dropout, dtype=dtype)
        self.decoder = EGNNDecoder(
            z_g=cfg.z_global, z_l=cfg.z_local, hidden=cfg.decoder_hidden,
            num_layers=cfg.decoder_layers, max_neighbors=cfg.max_neighbors,
            dropout=cfg.dropout, degree_normalize=cfg.degree_normalize,
            remat=cfg.decoder_remat, use_pallas=cfg.use_pallas_egnn,
            dtype=dtype)

    def __call__(self, seqemb: Array, n_coords: Array, ca_coords: Array,
                 c_coords: Array, dihedrals: Array, mask: Array,
                 deterministic: bool = True):
        z_g, z_l, mu_g, lv_g, mu_l, lv_l = self.encoder(
            seqemb, n_coords, ca_coords, c_coords, dihedrals, mask,
            deterministic=deterministic)
        pred_n, pred_ca, pred_c, pred_seq = self.decoder(
            z_g, z_l, mask=mask, deterministic=deterministic)
        return pred_n, pred_ca, pred_c, pred_seq, mu_g, lv_g, mu_l, lv_l

    def encode(self, seqemb: Array, n_coords: Array, ca_coords: Array,
               c_coords: Array, dihedrals: Array, mask: Array,
               deterministic: bool = True):
        return self.encoder(seqemb, n_coords, ca_coords, c_coords, dihedrals,
                            mask, deterministic=deterministic)

    def decode(self, z_g: Array, z_l: Array, mask: Optional[Array] = None,
               deterministic: bool = True):
        return self.decoder(z_g, z_l, mask=mask, deterministic=deterministic)

    def sample(self, mask: Array, num_samples: int = 1,
               deterministic: bool = True):
        """Prior sampling: z ~ N(0, I), decode for each of ``num_samples``
        draws per batch row (reference model.py:77-103)."""
        cfg = self.config
        B, L = mask.shape
        key = self.make_rng("sample")
        kg, kl = jax.random.split(key)
        z_g = jax.random.normal(kg, (B * num_samples, cfg.z_global))
        z_l = jax.random.normal(kl, (B * num_samples, L, cfg.z_local))
        mask_rep = jnp.repeat(mask, num_samples, axis=0)
        return self.decoder(z_g, z_l, mask=mask_rep,
                            deterministic=deterministic)
