"""ESM-2 as a frozen JAX forward pass.

The reference conditions the VAE on per-residue ESM-2 (t33, 650M) layer-33
embeddings computed by fair-esm/PyTorch (``models/esm_embeddings.py:17-49``).
Here the same transformer is implemented as a pure jittable JAX function so
embedding extraction runs on the TPU: token embedding with ESM's
token-dropout rescale, pre-LN transformer stack with rotary position
embeddings on q/k (query pre-scaled by head_dim^-0.5 *before* rotary — the
ESM convention), exact-erf GELU, and the final layer norm whose output is the
"layer 33" representation.

Weights convert from any HuggingFace ``EsmModel``/``EsmForMaskedLM``
state dict (``convert_hf_state_dict``); numerical parity with HF torch is
tested to <= 1e-4 (tests/test_esm2.py). The torch path in ``dataprep/esm.py``
remains as a fallback.

Parameters are a plain nested dict pytree (the model is frozen — no
init/training), so ``esm2_forward`` is just ``jax.jit``-able with the params
as a captured constant or donated argument.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# The ESM alphabet (fair-esm `proteinseq_toks` prepended/appended with the
# special tokens) — token ids match both fair-esm and the HF EsmTokenizer.
ESM2_TOKENS = (
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K", "Q", "N",
    "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O", ".", "-",
    "<null_1>", "<mask>",
)
ESM2_TOKEN_TO_ID = {t: i for i, t in enumerate(ESM2_TOKENS)}
CLS_ID, PAD_ID, EOS_ID, UNK_ID = 0, 1, 2, 3
MASK_ID = ESM2_TOKEN_TO_ID["<mask>"]


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    """Defaults are esm2_t33_650M_UR50D."""

    vocab_size: int = 33
    hidden: int = 1280
    num_layers: int = 33
    num_heads: int = 20
    intermediate: int = 5120
    layer_norm_eps: float = 1e-5
    token_dropout: bool = True
    max_tokens: int = 1022          # RESIDUE cap (esm_embeddings.py:37);
                                    # +2 cls/eos tokens fit ESM-2's 1026
                                    # positions


def tokenize(sequence: str) -> np.ndarray:
    """AA string -> token ids with <cls>/<eos> framing (no padding)."""
    ids = [CLS_ID]
    ids += [ESM2_TOKEN_TO_ID.get(aa, UNK_ID) for aa in sequence.upper()]
    ids.append(EOS_ID)
    return np.asarray(ids, np.int32)


def _gelu_erf(x: Array) -> Array:
    """ESM's original gelu (erf form — F.gelu's tanh variant differs)."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def _rotary_cos_sin(L: int, head_dim: int, dtype) -> tuple[Array, Array]:
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    t = jnp.arange(L, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                       # [L, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)       # [L, hd]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rotary(x: Array, cos: Array, sin: Array) -> Array:
    # x [B, H, L, hd]; cos/sin [L, hd]
    return x * cos[None, None] + _rotate_half(x) * sin[None, None]


def _layer_norm(x: Array, p: dict, eps: float) -> Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _linear(x: Array, p: dict) -> Array:
    return x @ p["kernel"] + p["bias"]


def esm2_forward(params: dict, tokens: Array,
                 attention_mask: Optional[Array] = None,
                 config: Optional[ESM2Config] = None) -> Array:
    """Frozen forward: tokens [B, T] -> last hidden states [B, T, D]
    (== fair-esm representations[num_layers], HF last_hidden_state)."""
    cfg = config or ESM2Config()
    if attention_mask is None:
        attention_mask = (tokens != PAD_ID).astype(jnp.float32)
    amask = attention_mask.astype(jnp.float32)

    x = params["word_embeddings"][tokens]                 # [B, T, D]

    if cfg.token_dropout:
        # mask-dropout rescale (HF EsmEmbeddings.forward): zero <mask>
        # embeddings, scale by (1 - 0.15*0.8) / (1 - observed mask ratio).
        is_mask = (tokens == MASK_ID)
        x = jnp.where(is_mask[..., None], 0.0, x)
        src_len = jnp.sum(amask, axis=-1)
        observed = jnp.sum(is_mask.astype(jnp.float32), axis=-1) / src_len
        x = x * ((1.0 - 0.12) / (1.0 - observed))[:, None, None]

    x = x * amask[..., None]

    B, T, D = x.shape
    H = cfg.num_heads
    hd = D // H
    cos, sin = _rotary_cos_sin(T, hd, x.dtype)
    # additive attention bias: -inf at padded keys
    bias = (1.0 - amask[:, None, None, :]) * jnp.finfo(jnp.float32).min

    def split_heads(t):
        return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

    for layer in params["layers"]:
        # --- self-attention block (pre-LN) ---
        h = _layer_norm(x, layer["attn_ln"], cfg.layer_norm_eps)
        q = split_heads(_linear(h, layer["q"])) * (hd ** -0.5)
        k = split_heads(_linear(h, layer["k"]))
        v = split_heads(_linear(h, layer["v"]))
        q = _apply_rotary(q, cos, sin)
        k = _apply_rotary(k, cos, sin)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                               ).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + _linear(ctx, layer["attn_out"])
        # --- feed-forward block (pre-LN) ---
        h = _layer_norm(x, layer["ffn_ln"], cfg.layer_norm_eps)
        h = _gelu_erf(_linear(h, layer["fc1"]))
        x = x + _linear(h, layer["fc2"])

    return _layer_norm(x, params["final_ln"], cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# Weight conversion
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _lin(sd: dict, prefix: str) -> dict:
    # torch Linear stores [out, in]; JAX matmul wants [in, out]
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _ln(sd: dict, prefix: str) -> dict:
    return {"weight": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def convert_hf_state_dict(sd: dict) -> tuple[dict, ESM2Config]:
    """HF EsmModel / EsmForMaskedLM state dict -> (params pytree, config).

    Accepts keys with or without the ``esm.`` prefix (EsmForMaskedLM nests
    the encoder under ``esm.``).
    """
    if any(k.startswith("esm.") for k in sd):
        sd = {k[len("esm."):]: v for k, v in sd.items() if k.startswith("esm.")}

    emb = _np(sd["embeddings.word_embeddings.weight"])
    layers = []
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        p = f"encoder.layer.{i}"
        layers.append({
            "attn_ln": _ln(sd, f"{p}.attention.LayerNorm"),
            "q": _lin(sd, f"{p}.attention.self.query"),
            "k": _lin(sd, f"{p}.attention.self.key"),
            "v": _lin(sd, f"{p}.attention.self.value"),
            "attn_out": _lin(sd, f"{p}.attention.output.dense"),
            "ffn_ln": _ln(sd, f"{p}.LayerNorm"),
            "fc1": _lin(sd, f"{p}.intermediate.dense"),
            "fc2": _lin(sd, f"{p}.output.dense"),
        })
        i += 1
    params = {
        "word_embeddings": emb,
        "layers": layers,
        "final_ln": _ln(sd, "encoder.emb_layer_norm_after"),
    }
    hidden = emb.shape[1]
    cfg = ESM2Config(
        vocab_size=emb.shape[0], hidden=hidden, num_layers=len(layers),
        num_heads=_infer_num_heads(sd, hidden),
        intermediate=layers[0]["fc1"]["kernel"].shape[1] if layers else 4 * hidden)
    return params, cfg


def _infer_num_heads(sd: dict, hidden: int) -> int:
    """Head count from the state dict itself: the rotary ``inv_freq`` buffer
    has length head_dim/2, so num_heads = hidden / (2·len). Falls back to
    the ESM-2 family table (every size t6-t33 uses 20 heads; t36 uses 40)
    for dicts saved without buffers."""
    for k, v in sd.items():
        if k.endswith("rotary_embeddings.inv_freq"):
            head_dim = 2 * int(_np(v).shape[0])
            if head_dim > 0 and hidden % head_dim == 0:
                return hidden // head_dim
            break
    return 40 if hidden >= 2560 else 20


def load_hf_esm2(name_or_path: str = "facebook/esm2_t33_650M_UR50D"
                 ) -> tuple[dict, ESM2Config]:
    """Convert a HF checkpoint (hub cache or local path) to JAX params."""
    import torch  # noqa: F401 — ensure torch is importable for the load
    from transformers import EsmModel

    model = EsmModel.from_pretrained(name_or_path, add_pooling_layer=False)
    params, cfg = convert_hf_state_dict(model.state_dict())
    cfg = dataclasses.replace(cfg, num_heads=model.config.num_attention_heads)
    return params, cfg


# ---------------------------------------------------------------------------
# Embedding extraction (the dataprep entry point)
# ---------------------------------------------------------------------------

class ESM2Embedder:
    """Jitted per-sequence embedding extraction with length bucketing.

    Sequences are padded to the next power-of-two-ish bucket so XLA compiles
    a handful of shapes instead of one per length.
    """

    def __init__(self, params: dict, config: ESM2Config):
        self.config = config
        # leave params as device arrays; jit once per bucket length
        self.params = jax.tree.map(jnp.asarray, params)
        self._fn = jax.jit(
            lambda toks, m: esm2_forward(self.params, toks, m, self.config))

    @staticmethod
    def _bucket(n: int) -> int:
        b = 32
        while b < n:
            b *= 2
        return b

    def embed(self, sequence: str) -> np.ndarray:
        """[L, D] per-residue layer-N representation, CLS/EOS stripped
        (reference esm_embeddings.py:26-49)."""
        # max_tokens is the RESIDUE cap (reference esm_embeddings.py:37-38
        # caps residues at 1022; tokens = residues + cls/eos, within ESM-2's
        # 1026 positions) — same inputs accepted as the torch backend.
        if len(sequence) > self.config.max_tokens:
            raise ValueError(
                f"sequence length {len(sequence)} exceeds the "
                f"{self.config.max_tokens} cap (esm_embeddings.py:37-38)")
        ids = tokenize(sequence)
        T = self._bucket(len(ids))
        toks = np.full((1, T), PAD_ID, np.int32)
        toks[0, :len(ids)] = ids
        mask = (toks != PAD_ID).astype(np.float32)
        reps = np.asarray(self._fn(jnp.asarray(toks), jnp.asarray(mask)))
        return reps[0, 1:len(ids) - 1].astype(np.float32)   # strip cls/eos
