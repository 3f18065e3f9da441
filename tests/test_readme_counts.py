"""README test counts must match actual collection (VERDICT r4 weak #6 —
mechanized: tools/update_readme_counts.py is the single writer, this test
is the drift alarm in the fast tier)."""

import sys
from pathlib import Path


def test_readme_counts_match_collection():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.update_readme_counts import main

    assert main(["--check"]) == 0
