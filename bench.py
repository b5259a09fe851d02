"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], printing ONE
JSON line for the driver's BENCH record.

Execution is forced with a noop-format write (full pipeline runs on
executors; no driver-side collect serialization skewing the numbers).
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from nosql_triple_store_spark.registry import all_specs
    from nosql_triple_store_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_specs()
    # Warm the JVM/codegen once on a trivial job so q1 isn't charged startup,
    # then touch every table so alphabetically-early queries aren't charged
    # first-read parquet footer/IO warmup either.
    spark.range(1000).selectExpr("sum(id)").collect()
    from nosql_triple_store_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name in sorted(specs):
        # time plan construction + full execution: some operators run
        # eagerly inside the query fn (streaming drains, iterative graph
        # algorithms), so t0 must precede the fn call
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        # drop python refs to checkpointed/iterative plans so the JVM
        # ContextCleaner can free their blocks before the next query —
        # otherwise graph-query checkpoint blocks linger and skew later
        # timings (measured: q_grouping_sets 0.2s -> 6.6s when starved)
        del df
        gc.collect()

    total = round(sum(timings.values()), 4)
    # Full per-query timings go to a side file; the stdout JSON line keeps
    # only the 12 headline queries (PLANS.md) so the line stays well under
    # the driver's stdout-tail capture window (a 213-entry dict is ~8 KB and
    # got truncated mid-line in round 1 -> "parsed": null in BENCH_r01.json).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
        "w",
    ) as f:
        json.dump(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "queries": timings,
                "sf": sf,
            },
            f,
            indent=1,
            sort_keys=True,
        )

    headline = [
        "q_point_lookup",
        "q_agg_pricing",
        "q_lww_latest",
        "q_lww_merge",
        "q_join_multiway",
        "q_topk",
        "q_join_asof",
        "q_dedup_near",
        "q_tpch_q5",
        "q_join_bucketed",
        "q_skyline",
        "q_zorder_prune",
        "q_join_dpp",
    ]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "queries": {k: timings[k] for k in headline if k in timings},
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
