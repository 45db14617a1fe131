"""E(n)-equivariant GNN decoder, banded-dense TPU formulation (Flax).

**Key redesign vs the reference** (``models/en_gnn_decoder.py``): the
reference loops over the batch in Python, compacts valid residues with
``torch.nonzero``, builds an edge list with a Python double loop, and
aggregates with ``index_add_`` — none of which maps to XLA. Here the
|i−j| ≤ W window graph over valid residues becomes a dense
[B, L, 2W+1] neighbor *band* over mask-compacted sequences:

1. ``compact_valid`` permutes each row valid-first (stable), so the window
   graph on compacted indices is exactly the reference's graph
   (en_gnn_decoder.py:174-189 built over ``valid_idx``).
2. Message passing is a regular band gather + batched matmuls (MXU-friendly);
   masked band slots replace degree bookkeeping (degree counts only valid
   neighbors, as ``bincount`` does at en_gnn_decoder.py:191-198).
3. The edge MLP's first layer is algebraically split:
   ``W·[h_i, h_j, d²] = W_i·h_i + W_j·h_j + w_d·d²`` so the [L, K, 2H+1]
   edge-feature tensor is never materialized — two [L, H]×[H, H] matmuls
   plus a band gather instead of a K×-redundant [L·K, 2H+1] matmul.
4. Results scatter back through the inverse permutation; padded positions
   emit zeros (matching en_gnn_decoder.py:312-328).

Equivariance is preserved: coordinate updates are linear combinations of
relative vectors only (Satorras et al. 2021), verified by property tests.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from protein_ensemble_vae_tpu.models.init import (
    TorchLinear,
    torch_bias_init,
    torch_kernel_init,
)
from protein_ensemble_vae_tpu.ops.geometry import (
    compact_valid,
    safe_norm,
    safe_normalize,
    scatter_compact,
)

Array = jax.Array
Dtype = Any

BOND_N_CA = 1.46
BOND_CA_C = 1.52
BOND_C_N = 1.33


def band_indices(L: int, W: int) -> tuple[Array, Array]:
    """Static band geometry: neighbor indices [L, K] (clipped) and the
    in-range/non-self mask [L, K], K = 2W+1."""
    offs = jnp.arange(2 * W + 1) - W
    base = jnp.arange(L)[:, None] + offs[None, :]
    idx = jnp.clip(base, 0, L - 1)
    in_range = (base >= 0) & (base < L) & (offs != 0)[None, :]
    return idx.astype(jnp.int32), in_range


def band_gather(v: Array, idx: Array) -> Array:
    """Gather neighbors along the band: v [B, L, D], idx [L, K] -> [B, L, K, D]."""
    return v[:, idx]


class EGNNBandLayer(nn.Module):
    """One EGNN layer over a dense neighbor band (reference EGNLayer,
    en_gnn_decoder.py:15-87, reformulated).

    φ_e: [h_i, h_j, ‖x_i−x_j‖²] → message (2-layer SiLU MLP, split first layer)
    φ_h: [h_i, Σ_j m_ij] → residual node update + LayerNorm
    φ_x: m_ij → scalar w_ij; x_i += 0.2 · deg⁻¹ · Σ_j w_ij (x_i − x_j)

    Two compute paths over the same parameters: a pure-XLA banded gather
    (reference implementation) and the fused Pallas kernel
    (``ops.pallas.egnn_band``) that streams the band through VMEM.
    """

    hidden: int
    use_pallas: object = False   # True | False | "auto"
    dtype: Dtype = jnp.float32

    def _pallas_enabled(self, L: int, B: Optional[int] = None) -> bool:
        """Routing is centralized in ``ops.routing.pallas_policy`` (shared
        with the clash-loss kernel). ``B`` lets the L=64 bucket route to the
        cross-batch folded kernel when the fold is active."""
        from protein_ensemble_vae_tpu.ops.routing import pallas_policy
        return pallas_policy(L, self.use_pallas, B=B)

    @nn.compact
    def __call__(self, h: Array, x: Array, nbr_idx: Array, nbr_valid: Array,
                 deg_inv: Array, cmask: Optional[Array] = None
                 ) -> tuple[Array, Array]:
        Hd = self.hidden
        Hin = h.shape[-1]
        # The split first layer is one reference matrix W[2H+1, Hd]
        # (en_gnn_decoder.py:34-37) — all three pieces and the bias use the
        # JOINT fan-in so the init variance matches the unsplit layer.
        fan_e1 = 2 * Hin + 1
        init_e1 = torch_kernel_init(fan_e1)

        k_hi = self.param("phi_e1_hi_kernel", init_e1, (Hin, Hd))
        b_hi = self.param("phi_e1_hi_bias", torch_bias_init(fan_e1), (Hd,))
        k_hj = self.param("phi_e1_hj_kernel", init_e1, (Hin, Hd))
        k_d2 = self.param("phi_e1_d2_kernel", init_e1, (1, Hd))
        k_e2 = self.param("phi_e2_kernel", torch_kernel_init(Hd), (Hd, Hd))
        b_e2 = self.param("phi_e2_bias", torch_bias_init(Hd), (Hd,))
        k_x1 = self.param("phi_x1_kernel", torch_kernel_init(Hd), (Hd, Hd))
        b_x1 = self.param("phi_x1_bias", torch_bias_init(Hd), (Hd,))
        k_x2 = self.param("phi_x2_kernel", torch_kernel_init(Hd), (Hd, 1))
        b_x2 = self.param("phi_x2_bias", torch_bias_init(Hd), (1,))

        hc = h.astype(self.dtype)
        a_i = hc @ k_hi.astype(self.dtype) + b_hi.astype(self.dtype)
        b_j = hc @ k_hj.astype(self.dtype)

        if cmask is not None and self._pallas_enabled(h.shape[1],
                                                      B=h.shape[0]):
            from protein_ensemble_vae_tpu.ops.pallas.egnn_band import (
                egnn_band_fused)

            W = (nbr_idx.shape[1] - 1) // 2
            # fp32 models get fp32-accurate matmul passes; bf16 models keep
            # the MXU's fast default (matches the XLA path's precision).
            precision = (jax.lax.Precision.HIGHEST
                         if self.dtype == jnp.float32 else None)
            # chain_dtype stays fp32 even for bf16 models: the r4 on-chip
            # measurement (scripts/chain_dtype_onchip.py, B16/L256/Hd256)
            # timed the bf16 edge chain at 0.74x the fp32 chain — Mosaic's
            # 16-row bf16 sublane tiles force relayouts on the 8-aligned
            # window loads and the accumulator casts add VPU passes,
            # outweighing the raw bf16 elementwise rate advantage that
            # scripts/vpu_dtype_bench.py measures on XLA-fused chains.
            agg, raw_delta = egnn_band_fused(
                a_i, b_j, x, cmask, k_d2, k_e2, b_e2, k_x1, b_x1, k_x2,
                b_x2, W, precision, jnp.float32)
            agg = agg.astype(self.dtype)
        else:
            mask_k = nbr_valid.astype(self.dtype)[..., None]     # [B, L, K, 1]
            x_j = band_gather(x, nbr_idx)                        # [B, L, K, 3]
            rel = x[:, :, None, :] - x_j
            d2 = jnp.sum(jnp.square(rel), axis=-1,
                         keepdims=True).astype(self.dtype)
            pre = (a_i[:, :, None, :] + band_gather(b_j, nbr_idx)
                   + d2 * k_d2.astype(self.dtype))
            m = nn.silu(pre)
            m = nn.silu(m @ k_e2.astype(self.dtype) + b_e2.astype(self.dtype))
            agg = jnp.sum(m * mask_k, axis=2)                    # [B, L, Hd]
            w = nn.silu(m @ k_x1.astype(self.dtype) + b_x1.astype(self.dtype))
            w = w @ k_x2.astype(self.dtype) + b_x2.astype(self.dtype)
            raw_delta = jnp.sum((w * mask_k).astype(x.dtype) * rel, axis=2)

        # Node update: residual + LayerNorm.
        hu = TorchLinear(Hd, dtype=self.dtype, name="phi_h1")(
            jnp.concatenate([hc, agg], axis=-1))
        hu = nn.silu(hu)
        hu = TorchLinear(Hin, dtype=self.dtype, name="phi_h2")(hu)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_h")(h + hu)

        x = x + raw_delta.astype(x.dtype) * deg_inv[..., None] * 0.2
        return h, x


class EGNNDecoder(nn.Module):
    """Full decoder: latent → initial CA coords → EGNN refinement → backbone +
    sequence logits (reference EGNNDecoder, en_gnn_decoder.py:90-333).

    Defaults are the reference's *effective* values (hidden 256, 8 layers,
    max_neighbors 40 — hardcoded in its SE3 wrapper at :343-349)."""

    z_g: int
    z_l: int
    hidden: int = 256
    num_layers: int = 8
    max_neighbors: int = 40
    dropout: float = 0.1
    degree_normalize: bool = True
    remat: bool = False   # jax.checkpoint each EGNN layer: trades ~1 extra
                          # forward for not storing [B, L, K, H] residuals —
                          # needed for long chains (HBM bound, SURVEY §7.3)
    use_pallas: object = False  # fused Pallas band kernel: True|False|"auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z_g: Array, z_l: Array, mask: Optional[Array] = None,
                 deterministic: bool = True
                 ) -> tuple[Array, Array, Array, Array]:
        B, L, _ = z_l.shape
        if mask is None:
            mask = jnp.ones((B, L), dtype=z_l.dtype)
        mask = mask.astype(jnp.float32)

        # Mask compaction: valid-first permutation per row (replaces the
        # reference's per-sample nonzero/masked_select, :216-229).
        pos, inv_pos, cmask = compact_valid(mask)
        zl_c = jnp.take_along_axis(z_l, pos[..., None], axis=1)
        zg_rep = jnp.broadcast_to(z_g[:, None, :], (B, L, z_g.shape[-1]))
        zc = jnp.concatenate([zg_rep, zl_c], axis=-1).astype(self.dtype)

        # Latent-dependent coordinate initialization with 0.1-scaled final
        # layer (reference :124-137). Coordinates stay fp32 for geometry.
        t = TorchLinear(self.hidden, dtype=self.dtype, name="l2c_dense1")(zc)
        t = nn.LayerNorm(dtype=self.dtype, name="l2c_norm")(t)
        t = nn.relu(t)
        t = nn.Dropout(self.dropout * 0.5)(t, deterministic=deterministic)
        t = TorchLinear(self.hidden // 2, dtype=self.dtype,
                        name="l2c_dense2")(t)
        t = nn.relu(t)
        x = TorchLinear(3, dtype=jnp.float32, name="l2c_out",
                        kernel_scale=0.1, zero_bias=True)(t)
        x = x.astype(jnp.float32)                                # [B, L, 3]

        h = TorchLinear(self.hidden, dtype=self.dtype,
                        name="input_embedding")(zc)

        # Band graph over compacted indices == reference window graph over
        # valid residues.
        nbr_idx, in_range = band_indices(L, self.max_neighbors)
        cmask_j = cmask[:, nbr_idx]                              # [B, L, K]
        nbr_valid = (in_range[None] & cmask.astype(bool)[:, :, None]
                     & cmask_j.astype(bool))
        deg = jnp.sum(nbr_valid, axis=-1).astype(jnp.float32)
        if self.degree_normalize:
            deg_inv = 1.0 / jnp.maximum(deg, 1.0)
        else:
            deg_inv = jnp.ones_like(deg)

        layer_cls = EGNNBandLayer
        if self.remat:
            layer_cls = nn.remat(EGNNBandLayer, static_argnums=())
        for i in range(self.num_layers):
            h, x = layer_cls(hidden=self.hidden, dtype=self.dtype,
                             use_pallas=self.use_pallas,
                             name=f"egnn_{i}")(h, x, nbr_idx, nbr_valid,
                                               deg_inv, cmask)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        # Sequence head on refined features (reference :160-172,253).
        s = TorchLinear(self.hidden * 2, dtype=self.dtype,
                        name="seq_dense1")(h)
        s = nn.LayerNorm(dtype=self.dtype, name="seq_norm1")(s)
        s = nn.relu(s)
        s = nn.Dropout(self.dropout * 0.5)(s, deterministic=deterministic)
        s = TorchLinear(self.hidden, dtype=self.dtype, name="seq_dense2")(s)
        s = nn.LayerNorm(dtype=self.dtype, name="seq_norm2")(s)
        s = nn.relu(s)
        s = nn.Dropout(self.dropout * 0.5)(s, deterministic=deterministic)
        seq_logits = TorchLinear(20, dtype=jnp.float32, name="seq_out")(s)

        # N/C placement: unit direction × fixed bond length (reference
        # :145-158,258-293; the 4th "length adjustment" channel is predicted
        # but unused, as in the reference).
        n_head = TorchLinear(self.hidden // 2, dtype=self.dtype,
                             name="n_off1")(h)
        n_head = TorchLinear(4, dtype=jnp.float32,
                             name="n_off2")(nn.relu(n_head))
        c_head = TorchLinear(self.hidden // 2, dtype=self.dtype,
                             name="c_off1")(h)
        c_head = TorchLinear(4, dtype=jnp.float32,
                             name="c_off2")(nn.relu(c_head))

        x_n = x + safe_normalize(n_head[..., :3]) * BOND_N_CA
        x_c = x + safe_normalize(c_head[..., :3]) * BOND_CA_C

        # Soft peptide-bond projection: 3 iterations pulling N(i+1) toward
        # 1.33 Å from C(i), 15 %/iter, clamp [0.90, 1.10] (reference :295-310)
        # — on compacted arrays, i.e. over consecutive *valid* residues.
        if L > 1:
            def project(x_n, _):
                vec = x_n[:, 1:] - x_c[:, :-1]
                dist = safe_norm(vec, keepdims=True)
                scale = 1.0 + 0.15 * (BOND_C_N / (dist + 1e-8) - 1.0)
                scale = jnp.clip(scale, 0.90, 1.10)
                new_tail = x_c[:, :-1] + vec * scale
                return jnp.concatenate([x_n[:, :1], new_tail], axis=1), None

            x_n, _ = jax.lax.scan(project, x_n, None, length=3)

        # Scatter back to original residue order; padded positions -> 0.
        out_n = scatter_compact(x_n, inv_pos, mask)
        out_ca = scatter_compact(x, inv_pos, mask)
        out_c = scatter_compact(x_c, inv_pos, mask)
        out_seq = scatter_compact(seq_logits, inv_pos, mask)
        return out_n, out_ca, out_c, out_seq
