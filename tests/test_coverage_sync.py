"""COVERAGE.md is the coverage contract; its counts header must equal
the live registry (VERDICT r4: the header had silently frozen at an
earlier round's counts). scripts/update_coverage.py regenerates the
marked block; this test fails whenever the committed file and the
registry disagree — run the script to re-sync."""

from __future__ import annotations

import os
import re

from scripts.update_coverage import BEGIN, END, counts_block

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_counts_match_registry():
    with open(os.path.join(REPO, "COVERAGE.md")) as fh:
        text = fh.read()
    m = re.search(re.escape(BEGIN) + r".*?" + re.escape(END), text, re.S)
    assert m, "COVERAGE.md missing AUTO-COUNTS markers"
    assert m.group(0) == counts_block(), (
        "COVERAGE.md counts stale — run scripts/update_coverage.py"
    )


def test_counts_block_reflects_all_specs():
    from nosql_triple_store_spark.registry import all_specs

    blk = counts_block()
    assert f"**{len(all_specs())} registered queries**" in blk
