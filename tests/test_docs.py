"""Docs-vs-reality tripwires (round-4 VERDICT task 3).

Hand-written claims that previous rounds let drift are now asserted:
the test count quoted in README.md / docs/TESTING.md / PARITY.md /
docs/MIGRATION.md must equal what the suite actually collects. Fails with
the one-line fix (``python scripts/sync_test_count.py``) in the message.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from sync_test_count import collected_count, stale_claims


def test_doc_test_counts_match_collected():
    n = collected_count()
    stale = stale_claims(n)
    assert not stale, (
        "doc test counts drifted — run `python scripts/sync_test_count.py`: "
        + "; ".join(f"{rel} says {old}, suite collects {n}"
                    for rel, old in stale)
    )
