#!/usr/bin/env python3
"""Refinement-weight sweep toward the BASELINE.md post-fix targets.

Round 3's refine defaults reached 82.9 % Ramachandran favored vs the >= 85 %
target (VERDICT r3 'Next #2'). This sweeps the refine knobs the module's
docstring names (w_rama/w_omega, anchor_weight, steps) over RAW generated
ensembles and scores every BASELINE.md post-fix row per setting:

  bond error <= 0.005 A | angle err 2-5 deg | favored >= 85 % |
  outliers < 5 % | MolProbity-style backbone clashscore < 20

plus gate pass-rate and preserved ensemble diversity (the cost axis).

  python scripts/refine_sweep.py --pdb_dir runs/flagship_strict_ft/generated_raw \
      [--out runs/refine_sweep.json] [--quick]

Reads every ``*_ensemble.pdb`` in --pdb_dir, refines each ensemble on the
default jax backend (TPU if free, CPU otherwise; one jit per (steps, L)),
and writes a JSON table + the winning setting. The winner must pass ALL
scoreable targets; ties break toward the highest retained diversity.
"""

from __future__ import annotations

import argparse
import glob
import itertools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def load_raw(pdb_dir):
    from protein_ensemble_vae_tpu.infer.pdb_io import read_pdb_backbone
    out = []
    for path in sorted(glob.glob(os.path.join(pdb_dir, "*_ensemble.pdb"))):
        ens = read_pdb_backbone(path)
        out.append((os.path.basename(path), ens))
    if not out:
        raise SystemExit(f"no *_ensemble.pdb under {pdb_dir}")
    return out


def score(n, ca, c, mask):
    """Per-ensemble means of every BASELINE.md post-fix target metric."""
    from protein_ensemble_vae_tpu.eval.analyze import (bond_length_stats,
                                                       molprobity_clashscore)
    from protein_ensemble_vae_tpu.eval.metrics import compute_ensemble_diversity
    from protein_ensemble_vae_tpu.eval.ramachandran import (
        classify_ramachandran, phi_psi_from_backbone)
    from protein_ensemble_vae_tpu.infer.gate import validate_protein_geometry
    from protein_ensemble_vae_tpu.infer.pdb_io import compute_backbone_oxygen

    K = n.shape[0]
    fav, out_, mp, mp_o, gate_ok = [], [], [], [], 0
    bond_errs = {"n_ca": [], "ca_c": [], "c_n": []}
    angle_errs = []
    for k in range(K):
        phi, psi, v = phi_psi_from_backbone(n[k], ca[k], c[k], mask)
        r = classify_ramachandran(phi, psi, v)
        fav.append(r["favored"])
        out_.append(r["outlier"])
        mp.append(molprobity_clashscore(n[k], ca[k], c[k], None, mask))
        o = compute_backbone_oxygen(n[k], ca[k], c[k], mask)
        mp_o.append(molprobity_clashscore(n[k], ca[k], c[k], o, mask))
        stats = bond_length_stats(n[k], ca[k], c[k], mask)
        for b in bond_errs:
            bond_errs[b].append(stats[b]["mean_error"])
        if validate_protein_geometry(ca[k], mask)[0]:
            gate_ok += 1
        # backbone bond-angle mean abs error (deg) vs ideal, same targets
        # as losses.bond_angle_loss (110/121/116 deg)
        angle_errs.append(_angle_err_deg(n[k], ca[k], c[k], mask))
    div, _ = compute_ensemble_diversity(ca[:, mask > 0.5])
    return dict(favored=float(np.mean(fav)), outlier=float(np.mean(out_)),
                mp_clash=float(np.mean(mp)), mp_clash_o=float(np.mean(mp_o)),
                gate=gate_ok / K, diversity=float(div),
                bond_err={b: float(np.mean(v)) for b, v in bond_errs.items()},
                angle_err_deg=float(np.mean(angle_errs)))


def _angle_err_deg(n, ca, c, mask):
    v = mask > 0.5
    n, ca, c = n[v], ca[v], c[v]

    def ang(a, b, cc):
        u, w = a - b, cc - b
        cs = np.sum(u * w, -1) / (np.linalg.norm(u, axis=-1)
                                  * np.linalg.norm(w, axis=-1) + 1e-9)
        return np.degrees(np.arccos(np.clip(cs, -1, 1)))

    errs = [np.abs(ang(n, ca, c) - 110.0)]
    if len(ca) > 1:
        errs.append(np.abs(ang(c[:-1], n[1:], ca[1:]) - 121.0))
        errs.append(np.abs(ang(ca[:-1], c[:-1], n[1:]) - 116.0))
    return float(np.mean(np.concatenate(errs)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pdb_dir", required=True)
    ap.add_argument("--out", default=os.path.join(REPO, "runs",
                                                  "refine_sweep.json"))
    ap.add_argument("--quick", action="store_true",
                    help="3-setting sanity sweep instead of the full grid")
    ap.add_argument("--grid", default="rama",
                    choices=["rama", "clash", "strict", "vdw", "max",
                             "torsion", "polish"],
                    help="'rama' sweeps w_rama/anchor/steps at w_clash=5 "
                         "(the round-3 favored-%% axis); 'clash' holds the "
                         "rama winner (w=2.0, anchor=0.03) and sweeps "
                         "w_clash x steps toward the MolProbity <20 target; "
                         "'strict' is the hard-relaxation preset (long "
                         "anneals, low anchor, raised angle/clash weights) "
                         "aiming to pass EVERY post-fix row at once; "
                         "'vdw' adds the round-5 remedies — the "
                         "MolProbity-event vdW clash surrogate "
                         "(losses.vdw_clash_loss) and cosine lr decay "
                         "(kills the Adam jitter floor on bonds/angles); "
                         "'torsion' optimizes in torsion space on the "
                         "ideal-geometry NeRF manifold (bond/angle rows "
                         "exact by construction); 'polish' = the vdw "
                         "grid's best Cartesian row once, then the "
                         "torsion-space sweep on its output (two-stage)")
    args = ap.parse_args()

    from protein_ensemble_vae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()   # sweep executables persist across runs

    from protein_ensemble_vae_tpu.infer.refine import refine_backbone

    ensembles = load_raw(args.pdb_dir)
    print(f"[sweep] {len(ensembles)} ensembles from {args.pdb_dir}",
          flush=True)

    # (w_rama=w_omega, anchor, steps, lr, w_clash, w_angle[, w_clash_vdw,
    # lr_decay]); round-3 default = (0.5, .05, 150, .05, 5.0, 0.5, 0, False)
    w_bond = 1.0
    if args.quick:
        grid = [(0.5, 0.05, 150, 0.05, 5.0, 0.5),
                (1.0, 0.05, 150, 0.05, 5.0, 0.5),
                (1.0, 0.03, 300, 0.05, 5.0, 0.5)]
    elif args.grid == "clash":
        grid = [(2.0, 0.03, s, 0.05, wc, 0.5)
                for wc, s in itertools.product((5.0, 25.0, 100.0, 400.0),
                                               (300, 600))]
    elif args.grid == "strict":
        grid = [(2.0, a, s, 0.05, wc, wa)
                for a, s, wc, wa in itertools.product(
                    (0.01, 0.003), (600, 1200), (100.0, 400.0), (2.0, 8.0))]
    elif args.grid == "vdw":
        grid = [(2.0, a, s, 0.05, 5.0, wa, wv, True)
                for a, s, wv, wa in itertools.product(
                    (0.015, 0.003), (300, 600), (100.0, 400.0), (2.0, 8.0))]
        # the round-5 noise experiment (RESULTS.md) needed w_bond=4.0 on
        # top of lr decay to push bonds through the 0.005 A bar
        w_bond = 4.0
    elif args.grid == "max":
        # chase the last two floors the 'vdw' grid left (mp ~88 at wv=400,
        # C-N ~0.012 at steps=600): longer anneal + heavier clash/bond
        grid = [(2.0, 0.003, 1200, 0.05, 5.0, 8.0, wv, True)
            for wv in (400.0, 1600.0, 6400.0)]
        w_bond = 8.0
    elif args.grid == "torsion":
        # torsion-space refinement (infer/torsion_refine.py): covalent
        # rows hold by construction, so the grid only spans the
        # clash-vs-rama-vs-anchor trade the manifold leaves open
        grid = [dict(steps=s, lr=lr, anchor_weight=a, w_rama=wr,
                     w_omega=wr / 2.0, w_clash_vdw=wv, lr_decay=True)
                for (s, lr), a, (wr, wv) in itertools.product(
                    ((300, 0.03), (600, 0.03)),
                    (0.003, 0.01, 0.03),
                    ((4.0, 400.0), (8.0, 1600.0)))]
    elif args.grid == "polish":
        # two-stage: the vdw grid's best-mp Cartesian row ONCE per
        # ensemble (runs/refine_sweep_vdw.json: favored 88.9%, mp 42.6,
        # angle 3.5 deg), then a torsion-space polish sweep on its
        # output — the measured torsion-sweep lesson is that the rama
        # gradient can hold/raise favored-% near the basins but cannot
        # recover favored-24% raws, while bonds/angles/mp are its strong
        # axes. Every weight is traced: one compile per `steps` value.
        grid = [dict(steps=300, lr=lr, anchor_weight=a, w_rama=wr,
                     w_omega=wr / 2.0, w_clash_vdw=wv, lr_decay=True,
                     vdw_include_o=True)
                for lr, a, (wr, wv) in itertools.product(
                    (0.01, 0.03),
                    (0.01, 0.03),
                    ((2.0, 400.0), (4.0, 1600.0)))]
    else:
        grid = [(w, a, s, 0.05, 5.0, 0.5)
                for w, a, s in itertools.product((0.5, 1.0, 2.0),
                                                 (0.05, 0.03, 0.015),
                                                 (150, 300))]
    if args.grid not in ("torsion", "polish"):
        grid = [g if len(g) == 8 else g + (0.0, False) for g in grid]

    rows = []
    raw_scores = []
    for name, ens in ensembles:
        raw_scores.append(score(ens["n"], ens["ca"], ens["c"], ens["mask"]))
    raw_agg = _mean_rows(raw_scores)
    print(f"[sweep] raw: {json.dumps(raw_agg)}", flush=True)

    if args.grid in ("torsion", "polish"):
        from protein_ensemble_vae_tpu.infer.torsion_refine import \
            refine_torsions

    if args.grid == "polish":
        # stage 1: Cartesian pre-refinement, once per ensemble
        pre = dict(steps=600, lr=0.05, anchor_weight=0.003, w_bond=4.0,
                   w_rama=2.0, w_omega=2.0, w_clash=5.0, w_angle=8.0,
                   w_clash_vdw=400.0, lr_decay=True)
        staged = []
        for name, ens in ensembles:
            mask = ens["mask"]
            K = ens["ca"].shape[0]
            mk = np.broadcast_to(mask[None], (K, mask.shape[0])).copy()
            rn, rca, rc = refine_backbone(ens["n"], ens["ca"], ens["c"],
                                          mk, **pre)
            staged.append((name, dict(n=np.asarray(rn), ca=np.asarray(rca),
                                      c=np.asarray(rc), mask=mask)))
        ensembles = staged
        stage1 = _mean_rows([score(e["n"], e["ca"], e["c"], e["mask"])
                             for _, e in ensembles])
        print(f"[sweep] after Cartesian stage: {json.dumps(stage1)}",
              flush=True)

    for cfg in grid:
        per = []
        for name, ens in ensembles:
            mask = ens["mask"]
            K = ens["ca"].shape[0]
            mk = np.broadcast_to(mask[None], (K, mask.shape[0])).copy()
            if args.grid in ("torsion", "polish"):
                rn, rca, rc = refine_torsions(ens["n"], ens["ca"],
                                              ens["c"], mk, **cfg)
            else:
                w, anchor, steps, lr, w_clash, w_angle, w_vdw, decay = cfg
                rn, rca, rc = refine_backbone(
                    ens["n"], ens["ca"], ens["c"], mk, steps=steps, lr=lr,
                    anchor_weight=anchor, w_bond=w_bond, w_rama=w,
                    w_omega=w, w_clash=w_clash, w_angle=w_angle,
                    w_clash_vdw=w_vdw, lr_decay=decay)
            per.append(score(np.asarray(rn), np.asarray(rca),
                             np.asarray(rc), mask))
        agg = _mean_rows(per)
        if args.grid in ("torsion", "polish"):
            agg.update(mode=args.grid, **cfg)
        else:
            w, anchor, steps, lr, w_clash, w_angle, w_vdw, decay = cfg
            agg.update(w_rama=w, anchor=anchor, steps=steps, lr=lr,
                       w_clash=w_clash, w_angle=w_angle, w_clash_vdw=w_vdw,
                       lr_decay=decay, w_bond=w_bond)
        agg["targets_pass"] = _targets_pass(agg)
        agg["targets_pass_o"] = _targets_pass(agg, mp_key="mp_clash_o")
        rows.append(agg)
        print(f"[sweep] {json.dumps(cfg)}: "
              f"fav={agg['favored']:.3f} out={agg['outlier']:.3f} "
              f"mp={agg['mp_clash']:.1f} gate={agg['gate']:.2f} "
              f"div={agg['diversity']:.3f} "
              f"C-N={agg['bond_err']['c_n']:.4f} "
              f"ang={agg['angle_err_deg']:.1f} "
              f"pass={agg['targets_pass']}", flush=True)

    passing = [r for r in rows if r["targets_pass"]]
    best = (max(passing, key=lambda r: r["diversity"]) if passing
            else max(rows, key=lambda r: (r["favored"], r["diversity"])))
    result = dict(pdb_dir=args.pdb_dir, raw=raw_agg, grid=rows, best=best)
    if args.grid == "polish":
        result["cartesian_stage"] = dict(config=pre, scores=stage1)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[sweep] best: {json.dumps(best)}")
    print(f"[sweep] wrote {args.out}")


def _targets_pass(agg, mp_key="mp_clash"):
    """All BASELINE.md post-fix rows that are scoreable on backbones.
    ``mp_key="mp_clash_o"`` scores the stricter O-inclusive clash event
    (carbonyl O placed by infer.pdb_io, Probe H-bond allowance)."""
    return bool(agg["favored"] >= 0.85 and agg["outlier"] < 0.05
                and agg[mp_key] < 20.0 and agg["angle_err_deg"] <= 5.0
                and agg["gate"] >= 0.99
                and all(v <= 0.005 for v in agg["bond_err"].values()))


def _mean_rows(per):
    out = dict()
    for k in ("favored", "outlier", "mp_clash", "mp_clash_o", "gate",
              "diversity", "angle_err_deg"):
        out[k] = float(np.mean([p[k] for p in per]))
    out["bond_err"] = {b: float(np.mean([p["bond_err"][b] for p in per]))
                       for b in per[0]["bond_err"]}
    return out


if __name__ == "__main__":
    main()
