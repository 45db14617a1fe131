"""Length-bucketed padded batching for XLA static shapes.

The reference pads each batch to its own Lmax (``data.py:197-266``), which
would retrigger XLA compilation on nearly every step. Here lengths are padded
up to a small set of bucket sizes so the jitted train step compiles once per
(bucket, batch-size) and is reused. Pair batches keep the reference's
(input, target) 7-field layout.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class ConformerBatch:
    n: np.ndarray           # [B, L, 3]
    ca: np.ndarray          # [B, L, 3]
    c: np.ndarray           # [B, L, 3]
    mask: np.ndarray        # [B, L]
    seq_emb: Optional[np.ndarray]   # [B, L, D] or None
    dihedrals: np.ndarray   # [B, L, 6]
    seq_labels: np.ndarray  # [B, L] int32

    def as_dict(self):
        return dataclasses.asdict(self)


@dataclasses.dataclass
class PairBatch:
    inp: ConformerBatch
    tgt: ConformerBatch


def bucket_for(length: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if length <= b:
            return b
    raise ValueError(f"length {length} exceeds largest bucket {buckets[-1]}")


def pad_conformers(items: Sequence[dict], L_pad: int,
                   seqemb_dim: Optional[int]) -> ConformerBatch:
    """Pad a list of processed conformer dicts to [B, L_pad, ...]."""
    B = len(items)
    n = np.zeros((B, L_pad, 3), np.float32)
    ca = np.zeros((B, L_pad, 3), np.float32)
    c = np.zeros((B, L_pad, 3), np.float32)
    mask = np.zeros((B, L_pad), np.float32)
    dih = np.zeros((B, L_pad, 6), np.float32)
    labels = np.zeros((B, L_pad), np.int32)
    seq_emb = (np.zeros((B, L_pad, seqemb_dim), np.float32)
               if seqemb_dim else None)

    for i, it in enumerate(items):
        L = it["mask"].shape[0]
        n[i, :L] = it["n"]
        ca[i, :L] = it["ca"]
        c[i, :L] = it["c"]
        mask[i, :L] = it["mask"]
        dih[i, :L] = it["dihedrals"]
        labels[i, :L] = it["seq_labels"]
        if seq_emb is not None and it["seq_emb"] is not None:
            seq_emb[i, :L] = it["seq_emb"][:L]
    return ConformerBatch(n=n, ca=ca, c=c, mask=mask, seq_emb=seq_emb,
                          dihedrals=dih, seq_labels=labels)


def make_epoch_batches(dataset, batch_size: int,
                       buckets: Sequence[int],
                       shuffle: bool,
                       seed: int,
                       drop_remainder: bool = False,
                       ) -> Iterator[PairBatch]:
    """Yield PairBatches grouped by length bucket.

    With ``drop_remainder`` the trailing partial batch of each bucket is
    dropped (use for throughput-critical training to keep one compiled shape
    per bucket); otherwise partial batches compile one extra variant each.
    """
    seqemb_dim = dataset.seqemb_dim if dataset.use_seqemb else None
    by_bucket: dict[int, list[int]] = {}
    for idx in range(len(dataset)):
        b = bucket_for(dataset.pair_length(idx), buckets)
        by_bucket.setdefault(b, []).append(idx)

    rng = np.random.default_rng(seed)
    order = sorted(by_bucket)
    if shuffle:
        for b in order:
            rng.shuffle(by_bucket[b])

    chunks: list[tuple[int, list[int]]] = []
    for b in order:
        ids = by_bucket[b]
        for s in range(0, len(ids), batch_size):
            chunk = ids[s:s + batch_size]
            if drop_remainder and len(chunk) < batch_size:
                continue
            chunks.append((b, chunk))
    if shuffle:
        rng.shuffle(chunks)

    for L_pad, chunk in chunks:
        pairs = [dataset[i] for i in chunk]
        inp = pad_conformers([p[0] for p in pairs], L_pad, seqemb_dim)
        tgt = pad_conformers([p[1] for p in pairs], L_pad, seqemb_dim)
        yield PairBatch(inp=inp, tgt=tgt)
