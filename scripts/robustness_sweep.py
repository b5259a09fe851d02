"""Robustness sweep: the full oracle check under DELIBERATELY hostile
session settings — the configurations a vanilla external driver might
legitimately run with, which pytest's tuned session never exercises.

Axes (pick with --mode; default is `partitions` — one JVM per run, so
run each axis as its own process):
  partitions  local[3] + spark.sql.shuffle.partitions=7 (odd counts
              catch partition-dependent results: unkeyed tie-breaks,
              order-sensitive float folds, per-partition id leakage)
  tz          TZ=America/New_York + session timeZone set to match
              (catches session-TZ-typed timestamp columns; found 3
              such queries in round 4, since fixed + schema-asserted)

Usage: python scripts/robustness_sweep.py [--mode partitions|tz] [sf_dir]
Exit 0 iff every oracle-backed query still matches DuckDB exactly.

NOTE: compares with fetchall() + repr-key sort exactly like
scripts/driver_check.py — a pandas fetchdf() compare is WRONG here
(NULL bigints coerce to NaN floats and 16 queries false-positive).
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return int(f) if f.is_integer() else f
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, float) and v == 0.0:
        return 0.0
    return v


def main() -> int:
    args = sys.argv[1:]
    mode = "partitions"
    if args and args[0] == "--mode":
        mode = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(f"robust-{mode}").config(
        "spark.ui.enabled", "false"
    )
    if mode == "partitions":
        b = b.master("local[3]").config("spark.sql.shuffle.partitions", "7")
    elif mode == "tz":
        os.environ["TZ"] = "America/New_York"
        time.tzset()
        b = b.master("local[4]").config(
            "spark.sql.session.timeZone", "America/New_York"
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failed = []
    for name in sorted(osql):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            cols = sorted(df.columns)
            s = sorted(
                [tuple(_norm(r[c]) for c in cols) for r in df.collect()],
                key=repr,
            )
            rel = con.sql(osql[name])
            names = list(rel.columns)
            idx = [names.index(c) for c in cols]
            d = sorted(
                [tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()],
                key=repr,
            )
            ok = s == d
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            print(f"{name:28s} ERROR {str(e)[:90]}")
            failed.append(name)
            continue
        print(f"{name:28s} match={ok} {time.time() - t0:5.1f}s", flush=True)
        if not ok:
            failed.append(name)
    print(f"checked {len(osql)}  failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
