"""Shared fixtures: one SparkSession, one DuckDB connection with the
driver's table views registered (mirrors the driver's t2 oracle check)."""

from __future__ import annotations

import os

import duckdb
import pytest

from nosql_triple_store_spark.catalog import TABLES
from nosql_triple_store_spark.session import get_spark

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
