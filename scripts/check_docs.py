#!/usr/bin/env python
"""Docs ↔ artifact consistency checker.

Round-3 VERDICT item #5: RESULTS.md quoted numbers that disagreed with the
artifacts it cited (the artifact had been regenerated under the doc). This
checker mechanizes the reference's one-source-of-truth stdout→CSV chain
(/root/reference/parse-out2csv.sh): every doc line that cites a
``bench_out/<file>`` artifact must quote only numbers that actually appear
in that artifact.

Rules, per markdown line in docs/*.md and README.md:
  * if the line mentions ``bench_out/X`` (one or more), every decimal
    number on the line (e.g. 49.2, 0.886, 2.44e-06) must appear in at
    least one cited artifact — matched as a string prefix of a number in
    the artifact (so a doc's "49.2" matches the artifact's "49.23").
  * integers are not checked (shape/context values like 4096 are config,
    not measurements).
  * a line ending with ``<!-- historical -->`` is skipped (explicitly
    marked as describing a superseded artifact state).
  * a cited artifact that does not exist flags the line.

Exit 0 = consistent; exit 1 = flagged lines printed.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOC_FILES = sorted((REPO / "docs").glob("*.md")) + [REPO / "README.md"]

CITE_RE = re.compile(r"bench_out/([A-Za-z0-9_.\-]+)")
# decimals incl. scientific notation; NOT bare integers
NUM_RE = re.compile(r"(?<![\w.])(\d+\.\d+(?:e[+-]?\d+)?|\d+(?:\.\d+)?e[+-]?\d+)", re.I)


def _norm(s: str) -> str:
    return s.lower().replace("e-0", "e-").replace("e+0", "e+")


def number_in_text(num: str, text: str) -> bool:
    """True if ``num`` appears in ``text`` as (a prefix of) a number."""
    num = _norm(num)
    for m in NUM_RE.finditer(text):
        if _norm(m.group(0)).startswith(num):
            return True
    return False


def main() -> int:
    flagged = []
    checked = 0
    artifact_cache: dict[str, str | None] = {}

    def artifact_text(name: str) -> str | None:
        if name not in artifact_cache:
            p = REPO / "bench_out" / name
            artifact_cache[name] = (
                _norm(p.read_text(errors="replace")) if p.exists() else None
            )
        return artifact_cache[name]

    for doc in DOC_FILES:
        if not doc.exists():
            continue
        for ln, line in enumerate(doc.read_text().splitlines(), 1):
            cites = CITE_RE.findall(line)
            if not cites:
                continue
            if line.rstrip().endswith("<!-- historical -->"):
                continue
            nums = [
                n for n in NUM_RE.findall(line)
                # exclude numbers that are part of the citation path itself
                if not any(n in c for c in cites)
            ]
            if not nums:
                continue
            checked += 1
            texts = []
            missing_artifacts = []
            for c in cites:
                t = artifact_text(c)
                if t is None:
                    missing_artifacts.append(c)
                else:
                    texts.append(t)
            if missing_artifacts and not texts:
                flagged.append(
                    f"{doc.relative_to(REPO)}:{ln}: cites missing artifact(s) "
                    f"{missing_artifacts}: {line.strip()[:120]}"
                )
                continue
            bad = [n for n in nums if not any(number_in_text(n, t) for t in texts)]
            if bad:
                flagged.append(
                    f"{doc.relative_to(REPO)}:{ln}: numbers {bad} not found in "
                    f"{cites}: {line.strip()[:120]}"
                )

    # Stamp freshness (round-4): every STAMPED artifact must describe the
    # code at HEAD — i.e. the diff from its stamped commit to HEAD over
    # the code paths that affect measurements must be empty. Artifacts
    # predating the stamp system (round ≤3) are skipped; docs-only
    # commits after a hardware run keep artifacts valid by construction.
    import subprocess

    stamp_re = re.compile(r"^\[stamp\] git=([0-9a-f]{8,})(\+dirty)?", re.M)
    code_paths = [
        "smmb_tpu", "scripts", "bench.py", "__graft_entry__.py", "tests",
    ]
    stale = []
    bench_dir = REPO / "bench_out"
    if bench_dir.exists():
        for p in sorted(bench_dir.glob("*.txt")):
            try:
                m = stamp_re.search(p.read_text(errors="replace"))
            except OSError:
                continue
            if not m:
                continue
            sha, dirty = m.group(1), m.group(2)
            if dirty:
                stale.append(f"{p.name}: stamped DIRTY ({sha}{dirty})")
                continue
            r = subprocess.run(
                ["git", "diff", "--quiet", f"{sha}..HEAD", "--", *code_paths],
                cwd=REPO, capture_output=True,
            )
            if r.returncode == 1:
                stale.append(
                    f"{p.name}: stamped {sha}, code paths changed since"
                )
            elif r.returncode not in (0, 1):
                stale.append(f"{p.name}: stamp {sha} not resolvable in git")

    print(f"check_docs: {checked} cited lines checked, {len(flagged)} flagged")
    for f in flagged:
        print("  FLAG", f)
    print(
        f"stamp_freshness: {len(stale)} stamped artifact(s) stale vs HEAD"
    )
    for s in stale:
        print("  STALE", s)
    return 1 if flagged or stale else 0


if __name__ == "__main__":
    sys.exit(main())
