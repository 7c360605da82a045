"""Docs-vs-reality tripwires (round-4 VERDICT task 3).

Hand-written claims that previous rounds let drift are now asserted:
the test count quoted in README.md / docs/TESTING.md / PARITY.md must equal
what the suite actually collects. Fails with the one-line fix
(``python scripts/sync_test_count.py``) in the message.
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from sync_test_count import CLAIMS, ROOT, collected_count


def test_doc_test_counts_match_collected():
    n = collected_count()
    stale = []
    for rel, pat in CLAIMS:
        m = re.search(pat, (ROOT / rel).read_text())
        assert m, f"{rel}: test-count claim not found (pattern {pat!r})"
        if int(m.group(1)) != n:
            stale.append(f"{rel} says {m.group(1)}, suite collects {n}")
    assert not stale, (
        "doc test counts drifted — run `python scripts/sync_test_count.py`: "
        + "; ".join(stale)
    )
