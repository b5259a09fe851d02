"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over nosql_triple_store_spark: the engine's query registry
(nosql_triple_store_spark/registry.py) supplies queries() and oracle_sql();
entry() runs the flagship LWW-latest read (the reference's core register
semantic, SURVEY §7.1) on sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nosql_triple_store_spark import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn = _registry.queries()["q_lww_latest"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return _registry.oracle_sql()
