"""Isolated per-query profiler for the optimization rounds.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_queries.py \
        [--plans-dir plans/r11 --suffix before] q_name1 q_name2 ...

For each named query: builds the DataFrame, writes `.explain("formatted")`
to <plans-dir>/<name>_<suffix>.txt (when --plans-dir is given), then times
N noop-sink runs (default 4; first run reported separately as cold).
Prints one line per query: name, cold, warm runs, warm median.

Methodology matches bench.py (guide §1.4): noop sink, jobs labelled via
setJobDescription, layout builds drained out of the timed region.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from nosql_triple_store_spark.registry import all_specs
    from nosql_triple_store_spark.scratch import drain_build_seconds
    from nosql_triple_store_spark.session import get_spark

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    # same warmup as bench.py so run 0 isn't charged JVM/codegen startup
    spark.range(1000).selectExpr("sum(id)").collect()
    from nosql_triple_store_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    import tempfile

    (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="prof_warm_"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    for name in args.names:
        if name not in specs:
            print(f"{name}: NOT REGISTERED")
            continue
        fn = specs[name].fn
        if args.plans_dir:
            try:
                df = fn(spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                os.makedirs(args.plans_dir, exist_ok=True)
                with open(
                    os.path.join(
                        args.plans_dir, f"{name}_{args.suffix}.txt"
                    ),
                    "w",
                ) as f:
                    f.write(plan)
                del df
            except Exception as ex:  # plan capture best-effort
                print(f"{name}: explain failed: {ex}")
        times = []
        builds = []
        for i in range(args.runs):
            drain_build_seconds()
            # ADVICE r11: unpersist only blocks created during the run
            try:
                pre_ids = set(
                    spark.sparkContext._jsc.getPersistentRDDs().keys()
                )
            except Exception:
                pre_ids = set()
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            built = drain_build_seconds()
            if built:
                builds.append(sum(built.values()))
                el = max(0.0, el - sum(built.values()))
            times.append(el)
            del df
            gc.collect()
            # same deterministic checkpoint-block cleanup as bench.py
            try:
                for rid, jrdd in (
                    spark.sparkContext._jsc.getPersistentRDDs().items()
                ):
                    if rid not in pre_ids:
                        jrdd.unpersist(False)
            except Exception:
                pass
        spark.sparkContext.setJobDescription(None)
        warm = sorted(times[1:])
        med = warm[len(warm) // 2] if warm else times[0]
        print(
            f"{name}: cold={times[0]:.3f} warm={[round(t, 3) for t in times[1:]]} "
            f"median={med:.3f}"
            + (f" (layout drained {sum(builds):.2f}s)" if builds else "")
        )


if __name__ == "__main__":
    main()
