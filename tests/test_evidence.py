"""Evidence hygiene: every artifact path RESULTS.md cites must resolve to a
file tracked in git (VERDICT r3 weak #2 — claims whose supporting runs live
only in a gitignored directory, or were never written, are unverifiable)."""

import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git_tracked() -> set:
    out = subprocess.run(["git", "ls-files"], cwd=REPO, capture_output=True,
                         text=True, check=True).stdout
    return set(out.splitlines())


def test_results_md_runs_paths_are_tracked_in_git():
    text = open(os.path.join(REPO, "RESULTS.md")).read()
    cited = sorted(set(re.findall(r"runs/[A-Za-z0-9_./-]+", text)))
    assert cited, "RESULTS.md cites no runs/ artifacts — check the regex"
    tracked = _git_tracked()
    missing = []
    for path in cited:
        p = path.rstrip("/.")
        # a cited directory resolves if ANY tracked file lives under it
        if p in tracked or any(t.startswith(p + "/") for t in tracked):
            continue
        missing.append(path)
    assert not missing, (
        "RESULTS.md cites artifacts that are not tracked in git — commit "
        f"them (force-add past .gitignore's runs/ rule) or reword: {missing}")


def test_results_md_quoted_section_titles_exist():
    """A quoted «"..." section» cross-reference must name a real heading —
    round 4 shipped a pointer to a "Generation-quality targets" section
    that did not exist (VERDICT r4 weak #5a)."""
    text = open(os.path.join(REPO, "RESULTS.md")).read()
    headings = {m.group(1).strip()
                for m in re.finditer(r"^#{1,4}\s+(.+?)\s*$", text,
                                     re.MULTILINE)}
    cited = re.findall(r"[“\"]([^“”\"]{3,80})[”\"]\s+"
                       r"section", text)
    missing = [c for c in cited
               if not any(c.lower() in h.lower() for h in headings)]
    assert not missing, (
        f"RESULTS.md references sections that have no heading: {missing}")
