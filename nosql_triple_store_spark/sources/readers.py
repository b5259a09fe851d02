"""Sources & sinks, replacing the reference's storage plumbing Spark-first.

Reference lineage:
- R19 bulk load (MongoDBConnector.py:224-264): chunked pandas read_csv +
  row-at-a-time upserts → here one declarative spark.read.csv job; no
  driver-side loop, parallel scan, schema applied at read.
- R20 offline ETL (preprocess_notebook.ipynb cells 0-6): pandas
  sort_values + manual equal-row cuts + pairwise concat for replication →
  here repartitionByRange + sortWithinPartitions + parquet; replication is
  a filesystem concern (HDFS/S3), not an engine loop (SURVEY §1.5).
- Mongo/PG/SQLite connectors (3 × ~250 LoC of hand-written SQL/PyMongo) →
  spark.read.jdbc / the mongo-spark connector, gated behind availability
  since neither backend exists in this environment.

Scale notes: write_range_sharded is the layout that makes the triple
store's point lookups partition-prunable (sorted (s,p) ranges == the
reference's SHARDING dict, MasterServer.py:59-63, but maintained by the
writer instead of a hand-edited constant); write_predicate_partitioned is
the S2RDF vertical layout that turns constant-predicate BGP filters into
partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..session import ensure_runtime_confs

TRIPLES_SCHEMA = StructType(
    [
        StructField("subject", StringType()),
        StructField("predicate", StringType()),
        StructField("object", StringType()),
        StructField("timestamp", StringType()),
    ]
)


def read_triples_tsv(
    spark: SparkSession, path: str, has_timestamp: bool = True
) -> DataFrame:
    """Bulk-load a YAGO-style TSV triple file (R19) in one parallel job.

    Timestamps parse from the reference's "%Y-%m-%d %H:%M:%S.%f" string
    format (SQLite3DBConnector.py:74) into real timestamps; missing ones
    get the reference's datetime.min sentinel (MongoDBConnector.py:254).
    """
    ensure_runtime_confs(spark)
    schema = (
        TRIPLES_SCHEMA
        if has_timestamp
        else StructType(TRIPLES_SCHEMA.fields[:3])
    )
    df = spark.read.csv(path, sep="\t", schema=schema, header=False)
    if not has_timestamp:
        df = df.withColumn("timestamp", F.lit(None).cast("string"))
    return df.withColumn(
        "timestamp",
        F.coalesce(
            F.to_timestamp_ntz(
                F.col("timestamp"), F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")
            ),
            F.lit("0001-01-01 00:00:00").cast("timestamp_ntz"),
        ),
    )


def write_range_sharded(
    df: DataFrame, path: str, num_shards: int, *cols: str
) -> None:
    """R20: sorted range-sharded parquet layout — repartitionByRange picks
    balanced split points by sampling (the notebook's equal-row-count cuts,
    computed by the engine), sortWithinPartitions gives clustered files
    whose min/max stats row-group-prune point lookups."""
    (
        df.repartitionByRange(num_shards, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_predicate_partitioned(triples: DataFrame, path: str) -> None:
    """S2RDF vertical partitioning: one directory per predicate, so a BGP
    pattern with constant predicate scans exactly one partition."""
    (
        triples.write.mode("overwrite")
        .partitionBy("predicate")
        .parquet(path)
    )


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """PostgreSQL/SQLite-class backends (reference nodes 2-3) via
    spark.read.jdbc. Partitioned reads (partition_column + bounds) split
    the table into parallel range queries — the engine-side analog of the
    reference's shard routing. Requires the JDBC driver jar on the
    classpath; no database exists in this environment, so this is
    exercised only by its unit contract (option assembly), not a live DB.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def mongo_connector_available() -> bool:
    """Classpath probe for the mongo-spark connector jar, mirroring
    relational_ext9's spark-avro probe: the live read path registers
    only on runtimes that deploy the jar (plus a reachable mongod via
    $SPARK_GRAFT_MONGO_URI); elsewhere the registry records an
    explicit skip with the provisioning reason."""
    import glob as _glob

    import pyspark

    home = os.path.dirname(pyspark.__file__)
    return bool(
        _glob.glob(os.path.join(home, "jars", "mongo-spark-connector*.jar"))
    )


def read_mongo_collection(
    spark: SparkSession, uri: str, database: str, collection: str
) -> DataFrame:
    """MongoDB backend (reference node 1, MongoDBConnector.py:12) via the
    mongo-spark connector; import-gated since the connector jar is not
    present in this environment."""
    try:
        return (
            spark.read.format("mongodb")
            .option("connection.uri", uri)
            .option("database", database)
            .option("collection", collection)
            .load()
        )
    except Exception as e:  # pragma: no cover - connector not installed
        raise NotImplementedError(
            "mongo-spark connector not available in this environment; "
            "add org.mongodb.spark:mongo-spark-connector to spark.jars"
        ) from e
