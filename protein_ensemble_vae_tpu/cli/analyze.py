"""Analysis CLI — reference ``analyze_ensemble.py`` equivalent.

    pev-analyze --pdb_dir generated/ [--output report.txt]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description="Analyze generated ensembles")
    ap.add_argument("--pdb_dir", required=True)
    ap.add_argument("--output", default=None)
    args = ap.parse_args(argv)

    from protein_ensemble_vae_tpu.eval.analyze import analyze_directory

    output = args.output or os.path.join(args.pdb_dir, "analysis_report.txt")
    out = analyze_directory(args.pdb_dir, output_path=output)
    agg = out["aggregate"]
    print(f"[analyze] {agg['n_structures']} structures | "
          f"diversity {agg['mean_diversity']:.3f}A | "
          f"rama favored {agg['mean_rama_favored']*100:.1f}% | "
          f"clash {agg['mean_clash_score']:.1f} | "
          f"mp_clash {agg['mean_molprobity_clashscore']:.1f} | "
          f"report: {output}")


if __name__ == "__main__":
    main()
