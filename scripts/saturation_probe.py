"""Dump the dedup-ladder saturation-probe decisions for one or more SF
dirs as JSON — the measured decision artifact for VERDICT r10 #1: per
(corpus, kind, rung), the estimated exact-candidate volume, the corpus
shingle-row count, their ratio, and whether the exact prefix path is
selected (ratio <= SAT_MAX_BLOWUP) or the rung routes to banded-LSH
candidates + exact verify.

Usage:
    python scripts/saturation_probe.py [sf_dir ...] > SATURATION_DECISIONS.json

Defaults to the driver sf0.01/sf0.1 dirs plus /tmp/sfderived/sf{1,3}
when they exist.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    dirs = sys.argv[1:] or [
        d
        for d in (
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
            "/tmp/sfderived/sf1",
            "/tmp/sfderived/sf3",
        )
        if os.path.isdir(d)
    ]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from nosql_triple_store_spark.operators import dedup_prefix as dp

    # the rungs the registered queries actually run: the ladder's
    # routable rungs for both kinds
    rungs = {"jaccard": [(49, 50), (9, 10), (4, 5), (1, 2)],
             "containment": [(49, 50), (9, 10), (4, 5)]}
    for sf_dir in dirs:
        rs = dp.ranked_shingles(spark, sf_dir)
        for kind, pqs in rungs.items():
            for p, q in pqs:
                dp._exact_is_proportional(spark, sf_dir, rs, p, q, kind)
    print(
        json.dumps(
            {
                "sat_max_blowup": dp.SAT_MAX_BLOWUP,
                "decisions": dp.SATURATION_LOG,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
