"""Pure-Python BSON dump codec (sources/bson_py.py): lossless
roundtrips for the scalar register types including nulls, bools, and
datetimes; loud rejection of unsupported BSON types; byte-level spec
checks on one known document."""

from __future__ import annotations

import datetime
import struct

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.scratch import scratch_tmp
from nosql_triple_store_spark.sources.bson_py import (
    decode_documents,
    encode_document,
    read_bson_dir,
    write_bson_dir,
)

from .conftest import SF_DIR


def test_known_document_bytes():
    # {"a": 1} per bsonspec.org: 0C000000 12 'a' 00 01000000 00000000 00
    b = encode_document(["a"], [1])
    assert b[:4] == struct.pack("<i", len(b))
    assert b[4] == 0x12 and b[5:7] == b"a\x00"
    assert struct.unpack("<q", b[7:15])[0] == 1
    assert b[-1] == 0
    assert decode_documents(b) == [{"a": 1}]


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
        Row(i=5, d=-2.25, s="héllo ✓", b=False,
            ts=datetime.datetime(2024, 6, 1, 8, 30, 15, 250000)),
        Row(i=None, d=None, s=None, b=None, ts=None),
        Row(i=-(2**50), d=0.0, s="", b=True,
            ts=datetime.datetime(1969, 12, 31, 23, 59, 59)),
    ]
    df = spark.createDataFrame(rows, schema).repartition(2)
    out = scratch_tmp("bson_rt_")
    assert write_bson_dir(df, out) == 2
    back = read_bson_dir(spark, out, schema)
    assert back.schema == schema
    key = lambda t: (t[0] is None, t[0])  # noqa: E731
    assert sorted(map(tuple, back.collect()), key=key) == sorted(
        map(tuple, rows), key=key
    )


def test_roundtrip_orders_projection_lossless(spark):
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    orders = load_table(spark, SF_DIR, "orders").select(*cols)
    out = scratch_tmp("bson_orders_")
    write_bson_dir(orders, out)
    back = read_bson_dir(spark, out, orders.schema)
    assert orders.exceptAll(back).count() == 0
    assert back.exceptAll(orders).count() == 0


def test_unsupported_type_raises():
    with pytest.raises(TypeError, match="no BSON mapping"):
        encode_document(["x"], [[1, 2]])
    # nested document type byte 0x03 rejected on decode
    inner = encode_document(["y"], [1])
    body = bytes([0x03]) + b"x\x00" + inner
    doc = struct.pack("<i", len(body) + 5) + body + b"\x00"
    with pytest.raises(ValueError, match="unsupported"):
        decode_documents(doc)


def test_corrupt_length_raises():
    with pytest.raises(ValueError, match="corrupt"):
        decode_documents(struct.pack("<i", 3) + b"\x00" * 10)


def test_nullable_long_precision_and_type_byte(spark):
    # ADVICE r5: nulls coerce int64 -> float64 at the Arrow boundary,
    # which used to (a) encode the column as BSON double 0x01 and
    # (b) lose precision past 2^53. The null-mask write path must keep
    # exact int64 values AND the int64 type byte 0x12 on disk.
    import glob

    schema = T.StructType([T.StructField("v", T.LongType())])
    big = 2**60 + 1  # not representable in float64
    rows = [Row(v=big), Row(v=None), Row(v=-(2**60) - 3), Row(v=7)]
    df = spark.createDataFrame(rows, schema).repartition(1)
    out = scratch_tmp("bson_bigint_")
    write_bson_dir(df, out)
    payload = b"".join(
        open(p, "rb").read() for p in sorted(glob.glob(out + "/*.bson"))
    )
    docs = decode_documents(payload)
    assert sorted(
        (d["v"] for d in docs), key=lambda v: (v is None, v)
    ) == [-(2**60) - 3, 7, big, None]
    # every non-null value must be type 0x12 (int64), never 0x01
    assert 0x01 not in {
        payload[i] for i in range(len(payload)) if payload[i + 1 : i + 3] == b"v\x00"
    }
    back = read_bson_dir(spark, out, schema)
    got = sorted(
        (r.v for r in back.collect()), key=lambda v: (v is None, v)
    )
    assert got == [-(2**60) - 3, 7, big, None]
