"""Pure-Python Avro OCF codec roundtrip (sources/avro_py.py): the
distributed write (mapInPandas, one container file per partition) and
distributed read (binaryFile + mapInPandas decode) must be lossless
for every supported type, including nulls, unicode, and timestamps —
the jar-less fallback engine behind q_source_avro."""

from __future__ import annotations

import datetime
import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.scratch import scratch_tmp
from nosql_triple_store_spark.sources.avro_py import (
    read_avro_dir,
    spark_to_avro_schema,
    write_avro_dir,
)

from .conftest import SF_DIR


def test_roundtrip_all_types_with_nulls(spark):
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    rows = [
        Row(i=1, d=1.5, s="héllo ▶ unicode", b=True,
            ts=datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)),
        Row(i=None, d=None, s=None, b=None, ts=None),
        Row(i=-(2**40), d=-0.0, s="", b=False,
            ts=datetime.datetime(1969, 12, 31, 23, 59, 59)),
    ]
    df = spark.createDataFrame(rows, schema).repartition(2)
    out = scratch_tmp("avro_rt_")
    nfiles = write_avro_dir(df, out)
    assert nfiles == 2  # one container file per partition
    assert len(glob.glob(os.path.join(out, "*.avro"))) == 2
    back = read_avro_dir(spark, out, schema)
    assert back.schema == schema
    got = sorted(
        [tuple(r) for r in back.collect()],
        key=lambda t: (t[0] is None, t[0]),
    )
    want = sorted(
        [tuple(r) for r in rows], key=lambda t: (t[0] is None, t[0])
    )
    assert got == want


def test_roundtrip_orders_table_lossless(spark):
    orders = load_table(spark, SF_DIR, "orders")
    out = scratch_tmp("avro_orders_")
    write_avro_dir(orders, out)
    back = read_avro_dir(spark, out, orders.schema)
    # full-table equality as multisets via a symmetric diff
    diff = orders.exceptAll(back).count() + back.exceptAll(orders).count()
    assert diff == 0
    assert back.count() == orders.count()


def test_null_codec_readable_too(spark):
    schema = T.StructType([T.StructField("x", T.LongType())])
    df = spark.createDataFrame([Row(x=i) for i in range(100)], schema)
    out = scratch_tmp("avro_null_")
    write_avro_dir(df, out, codec="null")
    back = read_avro_dir(spark, out, schema)
    assert back.agg(F.sum("x")).collect()[0][0] == sum(range(100))


def test_unsupported_type_raises_loudly(spark):
    schema = T.StructType(
        [T.StructField("a", T.ArrayType(T.LongType()))]
    )
    try:
        spark_to_avro_schema(schema)
        raise AssertionError("expected TypeError")
    except TypeError as e:
        assert "no Avro mapping" in str(e)


def test_nullable_long_precision_past_2_53(spark):
    # ADVICE r5: the Arrow null-coercion to float64 silently rounded
    # |v| > 2^53 in nullable long columns; the null-mask write path
    # must round-trip them exactly.
    from pyspark.sql import Row
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("v", T.LongType())])
    big = 2**60 + 1
    rows = [Row(v=big), Row(v=None), Row(v=-(2**60) - 3), Row(v=7)]
    df = spark.createDataFrame(rows, schema).repartition(1)
    out = scratch_tmp("avro_bigint_")
    write_avro_dir(df, out)
    back = read_avro_dir(spark, out, schema)
    got = sorted(
        (r.v for r in back.collect()), key=lambda v: (v is None, v)
    )
    assert got == [-(2**60) - 3, 7, big, None]
