#!/usr/bin/env python
"""Sync the hand-visible test count in the docs with reality.

Hand-written counts always drift (round-3 and round-4 VERDICTs both caught
it), so the count is now generated: this script collects the suite and
rewrites every ``N-test``/``N tests`` claim in the files below;
``tests/test_docs.py::test_doc_test_counts_match_collected`` fails CI
whenever the docs and the collected count disagree, pointing here.

Usage: python scripts/sync_test_count.py [--check]
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# (file, pattern with one group around the number)
CLAIMS = [
    ("README.md", r"# (\d+) tests, ~\d+ min"),
    ("docs/TESTING.md", r"framework's (\d+)-test suite"),
    ("PARITY.md", r"pytest suite, (\d+) tests"),
    ("docs/MIGRATION.md", r"a (\d+)-test suite"),
]


def stale_claims(n: int) -> list[tuple[str, int]]:
    """Every CLAIMS entry whose quoted count differs from ``n`` — shared by
    ``main`` (--check) and tests/test_docs.py so the two can't drift."""
    out = []
    for rel, pat in CLAIMS:
        m = re.search(pat, (ROOT / rel).read_text())
        if not m:
            raise SystemExit(f"{rel}: pattern {pat!r} not found")
        if int(m.group(1)) != n:
            out.append((rel, int(m.group(1))))
    return out


def collected_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=ROOT, capture_output=True, text=True, timeout=600,
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    if not m:
        raise SystemExit(f"could not parse collection output:\n{out[-2000:]}")
    return int(m.group(1))


def main() -> int:
    check = "--check" in sys.argv
    n = collected_count()
    stale = stale_claims(n)
    if not check:
        for rel, _ in stale:
            path = ROOT / rel
            text = path.read_text()
            m = re.search(dict(CLAIMS)[rel], text)
            start, end = m.span(1)
            path.write_text(text[:start] + str(n) + text[end:])
    if stale:
        verb = "STALE" if check else "updated"
        for rel, old in stale:
            print(f"{verb}: {rel} said {old}, suite collects {n}")
        return 1 if check else 0
    print(f"docs in sync: {n} tests")
    return 0


if __name__ == "__main__":
    sys.exit(main())
