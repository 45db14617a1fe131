"""Typed configuration dataclasses.

The reference uses plain argparse defaults as the de-facto config
(``models/vae.py:18-79``) and persists a hyperparameter dict inside each
checkpoint. Here configs are frozen dataclasses that serialize to/from JSON so
that "architecture travels with the checkpoint" (reference
``generate_ensemble_pdbs.py:719-754``) is a first-class contract.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters.

    Defaults mirror the reference CLI (``models/vae.py:29-37``) with one
    deliberate fix: the reference's ``--decoder_hidden`` flag (default 512) is
    silently ignored — its decoder hardcodes hidden=256 / 8 layers /
    max_neighbors=40 (``models/en_gnn_decoder.py:343-349``). We default to the
    *effective* values and actually honor the knobs.
    """

    seqemb_dim: int = 1280          # ESM-2 t33 layer-33 width
    d_model: int = 512
    nhead: int = 8
    ff: int = 1024
    nlayers: int = 6
    z_global: int = 512
    z_local: int = 256
    dropout: float = 0.1
    decoder_hidden: int = 256
    decoder_layers: int = 8
    max_neighbors: int = 40
    degree_normalize: bool = True
    decoder_remat: bool = False     # remat EGNN layers (memory vs FLOPs)
    use_pallas_egnn: object = "auto"  # fused band kernel: True|False|"auto"
                                      # (auto: TPU and 64-aligned L >= 128,
                                      #  where it measured 1.3-2.7x over the
                                      #  XLA path — ops/routing.py)
    use_seqemb: bool = True
    use_dihedrals: bool = True
    num_aa_types: int = 20
    max_len: int = 4096             # sinusoidal PE table size (encoder.py:16)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Loss-term weights. Defaults per reference ``models/vae.py:39-50``."""

    w_rec: float = 10.0
    w_pair: float = 10.0
    pair_stride: int = 8
    klw_global: float = 1.0
    klw_local: float = 0.5
    w_dihedral: float = 20.0
    w_rama: float = 400.0
    w_bond: float = 500.0
    w_angle: float = 500.0
    w_seq: float = 50.0
    w_clash: float = 300.0
    # -- beyond-reference geometry options (defaults = exact reference
    # parity). The reference's huber deltas (losses.py:318-355) are so small
    # that a 2 A broken peptide bond costs ~0.02 loss units — the root cause
    # of its 0 % geometry-gate pass rate on sampled conformers (measured in
    # runs/h2h/gen_report.json). `--strict_geometry` raises the deltas so
    # the quadratic region covers real errors, and adds a virtual CA-CA
    # spacing bond (3.81 A) — the quantity the generation gate actually
    # checks.
    bond_delta: float = 1.0          # multiplier on the reference huber deltas
    w_ca_spacing: float = 0.0        # virtual CA(i)-CA(i+1) ~ 3.81 A bond
    # vdW-overlap clash surrogate matched to the MolProbity clashscore event
    # (losses.vdw_clash_loss) — the training-side fix for the objective/
    # metric mismatch (flat 3.2 A loss vs Probe-overlap score, VERDICT r4
    # weak #7). 0.0 = exact reference parity.
    w_clash_vdw: float = 0.0

    @classmethod
    def from_dict(cls, d: dict) -> "LossWeights":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop hyperparameters (reference ``models/vae.py:21-26,52-75``)."""

    batch_size: int = 2
    epochs: int = 200
    lr: float = 3e-5
    seed: int = 13
    grad_clip: float = 10.0         # training.py:149
    # KL annealing (honors --kl_schedule, unlike the reference which hardcodes
    # cyclical at training.py:231-236 despite accepting 4 choices).
    kl_schedule: str = "cyclical"   # cyclical | monotonic | adaptive | exponential
    kl_cycles: int = 4
    kl_ratio: float = 0.4
    kl_warmup_epochs: int = 20
    # ReduceLROnPlateau on val reconstruction (training.py:213-215)
    plateau_factor: float = 0.5
    plateau_patience: int = 10
    plateau_min_lr: float = 1e-6
    plateau_threshold: float = 1e-4
    # Early stopping (training.py:345-419)
    early_stopping_patience: int = 20
    early_stopping_metric: str = "rec"   # rec | loss | rmsd
    early_stopping_delta: float = 1e-4
    # Checkpointing
    save_path: str = "checkpoints/hier_cvae"
    checkpoint_every: int = 0       # extra periodic checkpoint cadence, 0 = off
    resume: bool = False            # resume optimizer/scheduler/epoch state
    # Performance
    compute_dtype: str = "float32"  # float32 | bfloat16 compute path
    bucket_sizes: tuple[int, ...] = (64, 128, 192, 256, 320, 384, 448, 512, 576, 640)
    # Mesh
    dp: int = 1                     # data-parallel mesh size
    tp: int = 1                     # tensor-parallel mesh size

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in fields}
        if "bucket_sizes" in d:
            d["bucket_sizes"] = tuple(d["bucket_sizes"])
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Aggregate config persisted alongside every checkpoint."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossWeights = dataclasses.field(default_factory=LossWeights)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def to_json(self) -> str:
        return json.dumps(
            {
                "model": dataclasses.asdict(self.model),
                "loss": dataclasses.asdict(self.loss),
                "train": dataclasses.asdict(self.train),
            },
            indent=2,
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "RunConfig":
        d = json.loads(s)
        return cls(
            model=ModelConfig.from_dict(d.get("model", {})),
            loss=LossWeights.from_dict(d.get("loss", {})),
            train=TrainConfig.from_dict(d.get("train", {})),
        )


AA_ORDER = "ARNDCQEGHILKMFPSTWYV"
AA_TO_IDX = {aa: i for i, aa in enumerate(AA_ORDER)}  # data.py:180-183 table
IDX_TO_AA = {i: aa for aa, i in AA_TO_IDX.items()}

AA_3TO1 = {
    "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C",
    "GLN": "Q", "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I",
    "LEU": "L", "LYS": "K", "MET": "M", "PHE": "F", "PRO": "P",
    "SER": "S", "THR": "T", "TRP": "W", "TYR": "Y", "VAL": "V",
}
AA_1TO3 = {v: k for k, v in AA_3TO1.items()}

# Idealized backbone geometry (Engh & Huber), used across losses and IO.
BOND_N_CA = 1.46
BOND_CA_C = 1.52
BOND_C_N = 1.33
BOND_C_O = 1.23
ANGLE_N_CA_C_DEG = 110.0
ANGLE_C_N_CA_DEG = 121.0
ANGLE_CA_C_N_DEG = 116.0
