#!/usr/bin/env python3
"""Generate ``messy_9xyz.cif`` — a deterministic mmCIF fixture that
reproduces real RCSB-file messiness the synthetic test strings don't
(VERDICT r2 missing #3): full 21-column RCSB ``_atom_site`` layout,
3 NMR models, a 2-character auth chain id, negative auth_seq_id start,
a numbering gap, an insertion-code residue (30 + 30A), A/B altlocs,
hydrogens/OXT side atoms, MSE (selenomethionine), interleaved HETATM
ligand + waters with quoted primed atom names, a too-short second chain,
semicolon text blocks, a multi-row ``_struct_ref`` loop (UNP + PDB rows),
and a trailing ``_atom_site_anisotrop`` loop.

Run from the repo root: ``python tests/fixtures/make_messy_cif.py``.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from protein_ensemble_vae_tpu.data.synthetic import helix_backbone  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "messy_9xyz.cif")

AA3 = ["ALA", "GLY", "LEU", "LYS", "SER", "VAL", "THR", "GLU", "ASP", "PHE"]

HEADER = """\
data_9XYZ
#
_entry.id   9XYZ
#
_struct.title
;Solution NMR structure of a deliberately messy synthetic test protein,
second line of a semicolon text block
;
#
_exptl.entry_id 9XYZ
_exptl.method   'SOLUTION NMR'
#
loop_
_struct_ref.id
_struct_ref.db_name
_struct_ref.db_code
_struct_ref.pdbx_db_accession
_struct_ref.entity_id
_struct_ref.pdbx_seq_one_letter_code
_struct_ref.pdbx_align_begin
1 UNP CSPA_ECOLI P0A9X9 1
;MSGKMTGIVKWFNADKGFGFITPDDGSKDVFVHFSAIQNDGYKSLDEGQKVSFTIESGAKGPAAGNVTSL
;
1
2 PDB 9XYZ ? 2 ? 1
#
loop_
_entity.id
_entity.type
_entity.pdbx_description
1 polymer 'messy test protein'
2 polymer 'short decoy chain'
3 non-polymer "adenosine-5'-monophosphate"
4 water .
#
"""

ATOM_COLS = [
    "group_PDB", "id", "type_symbol", "label_atom_id", "label_alt_id",
    "label_comp_id", "label_asym_id", "label_entity_id", "label_seq_id",
    "pdbx_PDB_ins_code", "Cartn_x", "Cartn_y", "Cartn_z", "occupancy",
    "B_iso_or_equiv", "pdbx_formal_charge", "auth_seq_id", "auth_comp_id",
    "auth_asym_id", "auth_atom_id", "pdbx_PDB_model_num",
]


def atom_row(aid, atom, alt, comp, lasym, ent, lseq, icode, xyz, occ, auth_seq,
             aasym, model, group="ATOM", elem=None):
    if elem is None:
        elem = "SE" if atom == "SE" else atom[0]
    q = f'"{atom}"' if "'" in atom else atom
    return (f"{group} {aid} {elem} {q} {alt} {comp} {lasym} {ent} {lseq} "
            f"{icode} {xyz[0]:.3f} {xyz[1]:.3f} {xyz[2]:.3f} {occ:.2f} "
            f"0.00 ? {auth_seq} {comp} {aasym} {q} {model}")


def main():
    rng = np.random.default_rng(99)

    # chain "AA": residue ids -2..57 skipping 21,22,23, plus (30, 'A')
    res_ids = [(i, "") for i in range(-2, 58) if i not in (21, 22, 23)]
    res_ids.insert([r[0] for r in res_ids].index(31), (30, "A"))
    L = len(res_ids)
    assert L == 58
    comps = [AA3[i % len(AA3)] for i in range(L)]
    comps[10] = "MSE"          # selenomethionine -> 'M'
    comps[40] = "XYZ"          # unknown residue -> 'X'
    n0, ca0, c0 = helix_backbone(L)

    lines = [HEADER.rstrip("\n"), "loop_"]
    lines += [f"_atom_site.{c}" for c in ATOM_COLS]
    aid = 1
    for model in (1, 2, 3):
        jit = rng.normal(0, 0.35, (L, 3))
        for i, (seq_num, icode) in enumerate(res_ids):
            ic = icode if icode else "?"
            comp = comps[i]
            for atom, base in (("N", n0), ("CA", ca0), ("C", c0)):
                alt = "."
                occ = 1.0
                if i == 7 and atom == "CA":
                    # altloc pair: A first (wins), then B
                    lines.append(atom_row(aid, atom, "A", comp, "A", 1, i + 1,
                                          ic, base[i] + jit[i], 0.60, seq_num,
                                          "AA", model))
                    aid += 1
                    lines.append(atom_row(aid, atom, "B", comp, "A", 1, i + 1,
                                          ic, base[i] + jit[i] + 0.8, 0.40,
                                          seq_num, "AA", model))
                    aid += 1
                    continue
                lines.append(atom_row(aid, atom, alt, comp, "A", 1, i + 1, ic,
                                      base[i] + jit[i], occ, seq_num, "AA",
                                      model))
                aid += 1
            # side atoms the parser must skip
            lines.append(atom_row(aid, "O", ".", comp, "A", 1, i + 1, ic,
                                  c0[i] + jit[i] + [0.0, 0.0, 1.23], 1.0,
                                  seq_num, "AA", model))
            aid += 1
            lines.append(atom_row(aid, "H", ".", comp, "A", 1, i + 1, ic,
                                  n0[i] + jit[i] + [0.5, 0.5, 0.0], 1.0,
                                  seq_num, "AA", model, elem="H"))
            aid += 1
            if comp == "MSE":
                lines.append(atom_row(aid, "SE", ".", comp, "A", 1, i + 1, ic,
                                      ca0[i] + jit[i] + [1.0, 1.0, 1.0], 1.0,
                                      seq_num, "AA", model))
                aid += 1
        # OXT on the final residue
        lines.append(atom_row(aid, "OXT", ".", comps[-1], "A", 1, L, "?",
                              c0[-1] + jit[-1] + [0.7, 0.7, 0.0], 1.0,
                              res_ids[-1][0], "AA", model, elem="O"))
        aid += 1

        # decoy chain "B": 10 residues only (fails the min_len=50 gate)
        nb, cab, cb = helix_backbone(10)
        jb = rng.normal(0, 0.35, (10, 3))
        for i in range(10):
            for atom, base in (("N", nb), ("CA", cab), ("C", cb)):
                lines.append(atom_row(aid, atom, ".", "GLY", "B", 2, i + 1,
                                      "?", base[i] + jb[i] + 40.0, 1.0, i + 1,
                                      "B", model))
                aid += 1

        # HETATM ligand with primed (quoted) atom names + waters
        for atom in ("P", "O5'", "C5'", "C1'"):
            lines.append(atom_row(aid, atom, ".", "AMP", "C", 3, ".", "?",
                                  rng.normal(0, 1, 3) + 20.0, 1.0, 201, "AA",
                                  model, group="HETATM",
                                  elem=atom[0]))
            aid += 1
        for w in range(2):
            lines.append(atom_row(aid, "O", ".", "HOH", "D", 4, ".", "?",
                                  rng.normal(0, 1, 3) - 20.0, 1.0, 301 + w,
                                  "AA", model, group="HETATM", elem="O"))
            aid += 1
    lines.append("#")

    # anisotropic displacement loop AFTER atom_site (parsers must not trip)
    lines += ["loop_", "_atom_site_anisotrop.id",
              "_atom_site_anisotrop.U[1][1]", "_atom_site_anisotrop.U[2][2]",
              "_atom_site_anisotrop.U[3][3]"]
    for i in range(1, 4):
        lines.append(f"{i} 0.0100 0.0200 0.0150")
    lines += ["#", ""]

    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
