"""Shared fixtures: one local SparkSession + a DuckDB oracle harness.

Mirrors the driver's correctness gate (repo instructions): run the Spark
builder and the oracle SQL on the same parquet tables, sort columns by name,
sort rows, normalize floats, and compare values.
"""

from __future__ import annotations

import math
import os
from datetime import datetime

import tempfile

import duckdb
import pytest

from data_preparation_plugin_spark import get_spark
from data_preparation_plugin_spark.plans.registry import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_spark(
        app_name="dpp-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        warehouse_dir=tempfile.mkdtemp(prefix="dpp-spark-warehouse-"),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield session


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the test tables registered as views."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _normalize(value):
    if isinstance(value, bool):
        return int(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 6)
    if isinstance(value, datetime):
        return value.replace(tzinfo=None).isoformat()
    if hasattr(value, "isoformat"):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return tuple(_normalize(v) for v in value)
    if isinstance(value, int):
        return value
    return value


def canonical_rows(columns, rows):
    """Sort columns by name and rows by value — order-insensitive compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_normalize(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple(str(v) for v in r))
    return [columns[i] for i in order], out


def spark_result(df):
    return canonical_rows(df.columns, [tuple(r) for r in df.collect()])


def duckdb_result(con, sql):
    cur = con.execute(sql)
    columns = [d[0] for d in cur.description]
    return canonical_rows(columns, cur.fetchall())
