"""Pure-Python BSON dump reader/writer with distributed Spark plumbing —
the offline path for the reference's MongoDB backend
(MongoDBConnector.py:12 stores the triple register in Mongo; its
operational export format is `mongodump` .bson files: a raw
concatenation of BSON documents).

Implements the public BSON 1.1 spec (bsonspec.org): each document is
int32(total length, LE) + elements + 0x00, an element is
type-byte + cstring key + value. Types covered — the scalar set a
tabular register round-trips: double (0x01), string (0x02), bool
(0x08), UTC datetime (0x09, int64 ms), null (0x0A), int32 (0x10),
int64 (0x12). Nested documents/arrays/ObjectId raise loudly (a triple
register has no use for them; widening the codec is mechanical).

Distributed plumbing mirrors sources/avro_py.py:
- write: ``mapInPandas`` emits one .bson file per partition (Arrow
  batches stream through the encoder; driver only makes the dir);
- read: ``binaryFile`` fans whole files to tasks; each task walks its
  documents back to Arrow batches. mongodump files have no internal
  sync points, so file-granular parallelism is the correct unit (the
  same reason mongodump itself shards by collection chunk).

The LIVE connector path (read_mongo_collection) still requires the
mongo-spark jar + a server; this module makes the export/import path —
what a migration off the reference actually runs — real and verified.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _enc_value(v, out: bytearray) -> int:
    """Append the value bytes; return the BSON type byte."""
    import datetime

    import numpy as np

    if v is None or v != v:  # None / NaN / NaT
        return 0x0A
    if isinstance(v, (bool, np.bool_)):
        out.append(1 if v else 0)
        return 0x08
    if isinstance(v, (int, np.integer)):
        out += struct.pack("<q", int(v))
        return 0x12
    if isinstance(v, (float, np.floating)):
        out += struct.pack("<d", float(v))
        return 0x01
    if isinstance(v, str):
        b = v.encode("utf-8")
        out += struct.pack("<i", len(b) + 1) + b + b"\x00"
        return 0x02
    if isinstance(v, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1)
        ms = round((v - epoch).total_seconds() * 1000)
        out += struct.pack("<q", int(ms))
        return 0x09
    raise TypeError(f"no BSON mapping for {type(v).__name__}")


def encode_document(keys: list[str], values) -> bytes:
    body = bytearray()
    for k, v in zip(keys, values):
        tmp = bytearray()
        t = _enc_value(v, tmp)
        body.append(t)
        body += k.encode("utf-8") + b"\x00"
        body += tmp
    total = len(body) + 5
    return struct.pack("<i", total) + bytes(body) + b"\x00"


def decode_documents(payload: bytes) -> list[dict]:
    """Walk a mongodump stream: concatenated BSON documents."""
    docs = []
    pos = 0
    n = len(payload)
    while pos < n:
        (ln,) = struct.unpack_from("<i", payload, pos)
        end = pos + ln
        if ln < 5 or end > n:
            raise ValueError(f"corrupt BSON length {ln} at byte {pos}")
        p = pos + 4
        doc: dict = {}
        while p < end - 1:
            t = payload[p]
            p += 1
            z = payload.index(b"\x00", p)
            key = payload[p:z].decode("utf-8")
            p = z + 1
            if t == 0x0A:
                doc[key] = None
            elif t == 0x08:
                doc[key] = payload[p] == 1
                p += 1
            elif t == 0x10:
                (doc[key],) = struct.unpack_from("<i", payload, p)
                p += 4
            elif t == 0x12:
                (doc[key],) = struct.unpack_from("<q", payload, p)
                p += 8
            elif t == 0x01:
                (doc[key],) = struct.unpack_from("<d", payload, p)
                p += 8
            elif t == 0x09:
                (ms,) = struct.unpack_from("<q", payload, p)
                doc[key] = ("__bson_datetime_ms__", ms)
                p += 8
            elif t == 0x02:
                (sl,) = struct.unpack_from("<i", payload, p)
                doc[key] = payload[p + 4 : p + 3 + sl].decode("utf-8")
                p += 4 + sl
            else:
                raise ValueError(
                    f"BSON type 0x{t:02x} (key {key!r}) unsupported: "
                    "scalar register types only — widen _enc_value/"
                    "decode_documents for nested documents/arrays"
                )
        if payload[end - 1] != 0:
            raise ValueError(f"missing document terminator at {end - 1}")
        docs.append(doc)
        pos = end
    return docs


def write_bson_dir(df: DataFrame, out_dir: str) -> int:
    """One mongodump-style .bson file per partition; returns file count.

    Nullable integer columns would arrive in the Arrow->pandas writer
    as float64 (null coercion), mis-typing them as BSON double and
    losing precision past 2^53 (ADVICE r5). Fix is Spark-side: fill
    nulls with 0 and carry a boolean null-mask column, so the batch
    stays int64 end-to-end; the writer restores exact Python ints with
    None where the mask is set.
    """
    from pyspark.sql import functions as F

    keys = list(df.columns)
    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    int_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, int_types) and f.nullable
    ]
    proj = df
    for c in int_cols:
        proj = proj.withColumn(
            f"__mask_{c}", F.col(c).isNull()
        ).withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    os.makedirs(out_dir, exist_ok=True)

    def _write(it: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.bson")
        n = 0
        with open(path + ".tmp", "wb") as fh:
            for pdf in it:
                for c in int_cols:
                    pdf[c] = (
                        pdf[c]
                        .astype(object)
                        .mask(pdf[f"__mask_{c}"], None)
                    )
                for row in pdf[keys].itertuples(index=False):
                    fh.write(encode_document(keys, row))
                    n += 1
        os.replace(path + ".tmp", path)
        yield pd.DataFrame({"path": [path], "n": [n]})

    stats = proj.mapInPandas(_write, schema="path string, n long").collect()
    return len(stats)


def read_bson_dir(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Distributed mongodump read: binaryFile scan + per-task decode."""
    names = [f.name for f in schema.fields]
    ts_cols = {
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    }

    def _read(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            for content in pdf["content"]:
                docs = decode_documents(bytes(content))
                data = {}
                for name in names:
                    col = [d.get(name) for d in docs]
                    if name in ts_cols:
                        col = [
                            None if v is None else v[1] for v in col
                        ]
                        data[name] = pd.to_datetime(
                            pd.Series(col, dtype="float64"), unit="ms"
                        )
                    else:
                        data[name] = pd.Series(col, dtype=object)
                yield pd.DataFrame(data, columns=names)

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.bson")
    )
    return files.select("content").mapInPandas(_read, schema=schema)
