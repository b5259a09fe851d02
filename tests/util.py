"""Differential-compare helper mirroring the driver's t2 check:
row count + schema (sorted column names) + order-insensitive values."""

from __future__ import annotations

import datetime
import decimal
import math


def _norm(v):
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return int(f) if f.is_integer() else f
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, float) and v == 0.0:
        return 0.0  # canonicalize -0.0 (repr-sort alignment hazard)
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.replace(tzinfo=None)
    return v


def compare_to_duckdb(spark_df, con, sql: str, float_places: int | None = None):
    """Assert the Spark result equals the DuckDB oracle result.

    Columns are matched by (sorted) name, rows as order-insensitive
    multisets — the same contract as the driver's value-hash.
    """
    cols = sorted(spark_df.columns)
    s_rows = [tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()]

    rel = con.sql(sql)
    names = list(rel.columns)
    assert sorted(names) == cols, f"schema mismatch: spark={cols} duckdb={sorted(names)}"
    idx = [names.index(c) for c in cols]
    d_rows = [tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()]

    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    if float_places is not None:
        rnd = lambda t: tuple(  # noqa: E731
            round(v, float_places) if isinstance(v, float) else v for v in t
        )
        s_rows = [rnd(t) for t in s_rows]
        d_rows = [rnd(t) for t in d_rows]
    s_rows.sort(key=repr)
    d_rows.sort(key=repr)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
