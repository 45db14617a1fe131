"""ESM-2 per-residue embeddings -> H5 ``seq_embed`` groups.

Re-implements reference ``models/esm_embeddings.py``: per-residue layer-33
representations of ``esm2_t33_650M_UR50D`` with CLS/EOS stripped, written
gzip'd with metadata (incl. sequence md5) into
``seq_embed/esm2_t33_650M_UR50D/layer_33`` of each H5.

The reference runs fair-esm/PyTorch; here the default backend is the
**frozen JAX forward** (``models/esm2.esm2_forward`` — jitted, runs on the
TPU, parity-tested vs HF torch to <= 1e-4 in tests/test_esm2.py) with the
HF-torch path as fallback (``backend="torch"``). Either way the checkpoint
weights come from the HF hub cache (``facebook/esm2_t33_650M_UR50D``);
absent that, a clear error notes the training path only *reads* precomputed
embeddings, so any machine with the model can produce them once.
"""

from __future__ import annotations

import csv
import hashlib
import os
from typing import Optional

import numpy as np

MODEL_NAME = "facebook/esm2_t33_650M_UR50D"
GROUP = "seq_embed/esm2_t33_650M_UR50D/layer_33"
MAX_TOKENS = 1022  # reference guard, esm_embeddings.py:37-38

_LOAD_HINT = ("could not load {name} (network/HF cache needed). "
              "Note: training only READS precomputed embeddings from H5 — "
              "run this step on a machine with the model available.")


class ESMEmbedder:
    """backend="jax" (default): frozen jitted JAX forward on the default
    device (TPU when present). backend="torch": HF EsmModel on CPU/GPU."""

    def __init__(self, model_name: str = MODEL_NAME, device: str = "cpu",
                 backend: str = "jax"):
        self.backend = backend
        if backend == "jax":
            from protein_ensemble_vae_tpu.models.esm2 import (
                ESM2Embedder, load_hf_esm2)
            try:
                params, cfg = load_hf_esm2(model_name)
            except Exception as e:  # noqa: BLE001
                raise RuntimeError(_LOAD_HINT.format(name=model_name)) from e
            self._jax = ESM2Embedder(params, cfg)
            return
        try:
            import torch
            from transformers import AutoTokenizer, EsmModel
        except ImportError as e:
            raise RuntimeError(
                "transformers/torch required for ESM embedding") from e
        try:
            self.tokenizer = AutoTokenizer.from_pretrained(model_name)
            self.model = EsmModel.from_pretrained(model_name)
        except Exception as e:
            raise RuntimeError(_LOAD_HINT.format(name=model_name)) from e
        self.model.eval().to(device)
        self.device = device
        self.torch = torch

    def embed(self, sequence: str) -> np.ndarray:
        """[L, 1280] layer-33 per-residue representations, CLS/EOS stripped."""
        if len(sequence) > MAX_TOKENS:
            raise ValueError(f"sequence length {len(sequence)} exceeds ESM-2 "
                             f"cap {MAX_TOKENS}")
        if self.backend == "jax":
            return self._jax.embed(sequence)
        toks = self.tokenizer(sequence, return_tensors="pt")
        toks = {k: v.to(self.device) for k, v in toks.items()}
        with self.torch.no_grad():
            out = self.model(**toks)
        reps = out.last_hidden_state[0, 1:-1]  # strip CLS/EOS
        return reps.cpu().numpy().astype(np.float32)


def add_embeddings_to_h5(h5_path: str, embedder: ESMEmbedder,
                         overwrite: bool = False, verbose: bool = True
                         ) -> bool:
    import h5py

    with h5py.File(h5_path, "a") as fh:
        if GROUP in fh and not overwrite:
            if verbose:
                print(f"[esm] exists, skipping: {h5_path}")
            return False
        if "sequence" not in fh:
            if verbose:
                print(f"[esm] no sequence in {h5_path}")
            return False
        raw = fh["sequence"][()]
        seq = raw.decode() if isinstance(raw, (bytes, bytearray)) else str(raw)
        emb = embedder.embed(seq)
        if GROUP in fh:
            del fh[GROUP]
        ds = fh.create_dataset(GROUP, data=emb, compression="gzip")
        ds.attrs["model"] = MODEL_NAME
        ds.attrs["layer"] = 33
        ds.attrs["sequence_md5"] = hashlib.md5(seq.encode()).hexdigest()
        ds.attrs["dim"] = emb.shape[-1]
    if verbose:
        print(f"[esm] wrote {emb.shape} -> {h5_path}")
    return True


def embed_manifests(manifest_csvs: list[str], device: str = "cpu",
                    overwrite: bool = False) -> int:
    embedder = ESMEmbedder(device=device)
    done = 0
    seen = set()
    for manifest in manifest_csvs:
        with open(manifest) as f:
            for row in csv.DictReader(f):
                p = row["h5_path"].strip()
                if p in seen or not os.path.exists(p):
                    continue
                seen.add(p)
                if add_embeddings_to_h5(p, embedder, overwrite=overwrite):
                    done += 1
    return done


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Add ESM-2 embeddings to H5s")
    ap.add_argument("--manifest_train", default=None)
    ap.add_argument("--manifest_val", default=None)
    ap.add_argument("--manifest_test", default=None)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args(argv)

    manifests = [m for m in (args.manifest_train, args.manifest_val,
                             args.manifest_test) if m]
    if not manifests:
        ap.error("provide at least one manifest")
    n = embed_manifests(manifests, device=args.device,
                        overwrite=args.overwrite)
    print(f"[esm] embedded {n} H5 files")


if __name__ == "__main__":
    main()
