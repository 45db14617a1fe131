"""Minimal mmCIF backbone parser (no BioPython dependency).

Parses the ``_atom_site`` loop of an mmCIF file into per-model, per-chain
N/CA/C backbone arrays — the subset of parsing the reference does through
BioPython's MMCIFParser (``prepare_data.py:520-551,853-855``). Handles
multi-model NMR entries, altloc filtering (first altloc wins), and
insertion-code-free auth numbering.
"""

from __future__ import annotations

import gzip
import io
from typing import Optional

import numpy as np

from protein_ensemble_vae_tpu.config import AA_3TO1

_BACKBONE = ("N", "CA", "C")


def _tokenize_cif_line(line: str) -> list[str]:
    """Split a CIF data line respecting quoted tokens."""
    out, i, n = [], 0, len(line)
    while i < n:
        while i < n and line[i] in " \t":
            i += 1
        if i >= n:
            break
        if line[i] in "'\"":
            q = line[i]
            j = line.find(q, i + 1)
            if j < 0:
                j = n
            out.append(line[i + 1:j])
            i = j + 1
        else:
            j = i
            while j < n and line[j] not in " \t":
                j += 1
            out.append(line[i:j])
            i = j
    return out


def parse_mmcif_backbone(path_or_text: str, is_text: bool = False) -> dict:
    """Parse backbone atoms.

    Returns ``{chain_id: {"models": {model_num: {resseq: {atom: xyz}}},
    "resnames": {resseq: resname}}}``.
    """
    if is_text:
        fh = io.StringIO(path_or_text)
    elif path_or_text.endswith(".gz"):
        fh = io.TextIOWrapper(gzip.open(path_or_text, "rb"))
    else:
        fh = open(path_or_text)

    chains: dict = {}
    header: list[str] = []
    in_loop = False
    collecting = False

    with fh:
        for raw in fh:
            line = raw.rstrip("\n")
            s = line.strip()
            if s == "loop_":
                in_loop = True
                header = []
                collecting = False
                continue
            if in_loop and s.startswith("_"):
                header.append(s.split()[0])
                collecting = header and header[0].startswith("_atom_site.")
                continue
            if in_loop and header:
                if (not s) or s.startswith("#") or s.startswith("_") \
                        or s.startswith("loop_") or s.startswith("data_"):
                    in_loop = s == "loop_"
                    if in_loop:
                        header = []
                    collecting = False
                    continue
                if not collecting:
                    continue
                tokens = _tokenize_cif_line(s)
                if len(tokens) != len(header):
                    continue
                rec = dict(zip(header, tokens))
                if rec.get("_atom_site.group_PDB") != "ATOM":
                    continue
                atom = rec.get("_atom_site.label_atom_id", "")
                if atom not in _BACKBONE:
                    continue
                alt = rec.get("_atom_site.label_alt_id", ".")
                if alt not in (".", "A", "?"):
                    continue
                chain = rec.get("_atom_site.auth_asym_id",
                                rec.get("_atom_site.label_asym_id", "A"))
                try:
                    resseq = int(rec.get("_atom_site.auth_seq_id",
                                         rec.get("_atom_site.label_seq_id")))
                    model = int(rec.get("_atom_site.pdbx_PDB_model_num", "1"))
                    xyz = np.array([float(rec["_atom_site.Cartn_x"]),
                                    float(rec["_atom_site.Cartn_y"]),
                                    float(rec["_atom_site.Cartn_z"])],
                                   np.float32)
                except (TypeError, ValueError):
                    continue
                resname = rec.get("_atom_site.label_comp_id", "UNK")
                ch = chains.setdefault(chain, {"models": {}, "resnames": {}})
                m = ch["models"].setdefault(model, {})
                r = m.setdefault(resseq, {})
                if atom not in r:   # first altloc wins
                    r[atom] = xyz
                ch["resnames"].setdefault(resseq, resname)
    return chains


def chain_to_arrays(chain: dict, min_models: int = 2
                    ) -> Optional[dict]:
    """Chain dict -> fixed arrays over the union of residues present.

    Returns ``{"coords_n/ca/c": [K, L, 3], "mask": [K, L], "sequence": str,
    "resseqs": [L]}`` — a residue is valid in a model iff all of N/CA/C are
    present (matching the reference's completeness requirement).
    """
    models = sorted(chain["models"])
    if len(models) < min_models:
        return None
    resseqs = sorted({r for m in models for r in chain["models"][m]})
    if not resseqs:
        return None
    L, K = len(resseqs), len(models)
    idx = {r: i for i, r in enumerate(resseqs)}
    coords = {a: np.zeros((K, L, 3), np.float32) for a in _BACKBONE}
    mask = np.zeros((K, L), np.float32)
    for k, m in enumerate(models):
        for r, atoms in chain["models"][m].items():
            if all(a in atoms for a in _BACKBONE):
                i = idx[r]
                mask[k, i] = 1.0
                for a in _BACKBONE:
                    coords[a][k, i] = atoms[a]
    sequence = "".join(AA_3TO1.get(chain["resnames"].get(r, ""), "X")
                       for r in resseqs)
    return dict(coords_n=coords["N"], coords_ca=coords["CA"],
                coords_c=coords["C"], mask=mask, sequence=sequence,
                resseqs=np.array(resseqs, np.int32))
