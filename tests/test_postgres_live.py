"""Live-PostgreSQL round trip over the COPY transport.

The reference's native habitat is a real Postgres (reference
``hooks/dataset.py:84-85,120-201``), tested there against a dockerized
server (reference ``README.md:183-207``). These tests start an actual
PostgreSQL server (unix socket, trust auth, throwaway data dir) and push
real data through ``sources.postgres_copy`` in both directions —
runtime evidence for the PG type contract that the Derby-backed JDBC
tests can only assert structurally. Skips cleanly where no server can
be started.
"""

from __future__ import annotations

import datetime
import decimal

import pytest

from pyspark.sql import Row
from pyspark.sql import types as T

from data_preparation_plugin_spark.sources import postgres_copy as pgc


@pytest.fixture(scope="module")
def conninfo():
    try:
        return pgc.ensure_postgres()
    except (RuntimeError, OSError) as exc:
        pytest.skip(f"no local PostgreSQL available: {exc}")


FULL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("small", T.ShortType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("ratio", T.DoubleType()),
        T.StructField("price", T.DecimalType(12, 2)),
        T.StructField("label", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("day", T.DateType()),
        T.StructField("at", T.TimestampType()),
    ]
)

TRICKY_ROWS = [
    Row(
        id=1,
        small=7,
        quantity=42,
        ratio=3.140000001,
        price=decimal.Decimal("19.99"),
        label='comma, "quote", and\nnewline',
        active=True,
        day=datetime.date(2024, 2, 29),
        at=datetime.datetime(2024, 2, 29, 23, 59, 59, 123456),
    ),
    Row(
        id=2,
        small=None,
        quantity=None,
        ratio=None,
        price=None,
        label=None,
        active=None,
        day=None,
        at=None,
    ),
    Row(
        id=3,
        small=-1,
        quantity=-2147483648,
        ratio=-0.0625,
        price=decimal.Decimal("-0.01"),
        label="unicode: déjà vu — ✓",
        active=False,
        day=datetime.date(1970, 1, 1),
        at=datetime.datetime(2001, 9, 9, 1, 46, 40),
    ),
]


def test_ddl_matches_information_schema(conninfo):
    """pg_ddl column types land in information_schema exactly as declared —
    the live counterpart of the PG_TYPE_MAP contract."""
    pgc.run_psql(conninfo, 'DROP TABLE IF EXISTS "dpp_ddl_probe"')
    pgc.run_psql(conninfo, pgc.pg_ddl(FULL_SCHEMA, "dpp_ddl_probe"))
    assert pgc.pg_table_types(conninfo, "dpp_ddl_probe") == {
        "id": "bigint",
        "small": "smallint",
        "quantity": "integer",
        "ratio": "double precision",
        "price": "numeric",
        "label": "text",
        "active": "boolean",
        "day": "date",
        "at": "timestamp without time zone",
    }


def test_copy_roundtrip_tricky_values(spark, conninfo):
    """Write tricky rows through COPY, read them back, get identical rows —
    quotes, newlines, unicode, NULLs in every type, negative decimals."""
    pgc.run_psql(conninfo, 'DROP TABLE IF EXISTS "dpp_roundtrip"')
    pgc.run_psql(conninfo, pgc.pg_ddl(FULL_SCHEMA, "dpp_roundtrip"))
    df = spark.createDataFrame(TRICKY_ROWS, FULL_SCHEMA)
    written = pgc.copy_dataframe_to_postgres(df, "dpp_roundtrip", conninfo)
    assert written == 3
    back = pgc.read_postgres_copy(spark, "dpp_roundtrip", FULL_SCHEMA, conninfo)
    got = sorted(back.collect(), key=lambda r: r.id)
    want = sorted(df.collect(), key=lambda r: r.id)
    assert got == want


def test_copy_roundtrip_single_partition_nullable_ints(spark, conninfo):
    """A SINGLE partition mixing NULL and non-NULL integers round-trips.

    Regression for ADVICE r8: Arrow->pandas widens an int column with any
    NULL to float64 within a partition, so ``to_csv`` emitted ``7.0``
    which PG COPY rejects for smallint/integer/bigint. The 3-row tricky
    test passed only because each row landed in its own partition; this
    coalesces to one partition so the mixed column truly widens.
    """
    pgc.run_psql(conninfo, 'DROP TABLE IF EXISTS "dpp_nullable_int"')
    pgc.run_psql(conninfo, pgc.pg_ddl(FULL_SCHEMA, "dpp_nullable_int"))
    df = spark.createDataFrame(TRICKY_ROWS, FULL_SCHEMA).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    assert pgc.copy_dataframe_to_postgres(df, "dpp_nullable_int", conninfo) == 3
    back = pgc.read_postgres_copy(
        spark, "dpp_nullable_int", FULL_SCHEMA, conninfo
    )
    got = sorted(back.collect(), key=lambda r: r.id)
    want = sorted(df.collect(), key=lambda r: r.id)
    assert got == want


def test_read_distinguishes_literal_backslash_n_from_null(spark, conninfo):
    """A genuine string ``\\N`` stored in PG reads back as the string.

    PG COPY quotes a data value equal to the NULL marker on output; the
    pyarrow CSV parse keeps that quoting, so only the unquoted marker
    becomes NULL (ADVICE r8 read-side fix).
    """
    pgc.run_psql(conninfo, 'DROP TABLE IF EXISTS "dpp_nullmark"')
    pgc.run_psql(
        conninfo, 'CREATE TABLE "dpp_nullmark" (id bigint, payload text)'
    )
    pgc.run_psql(
        conninfo,
        "INSERT INTO \"dpp_nullmark\" VALUES"
        " (1, E'\\\\N'), (2, NULL), (3, 'plain')",
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    back = pgc.read_postgres_copy(spark, "dpp_nullmark", schema, conninfo)
    got = {r.id: r.payload for r in back.collect()}
    assert got == {1: "\\N", 2: None, 3: "plain"}


def test_partitioned_read_covers_all_rows(spark, conninfo):
    """Range-split COPY read returns every row exactly once, including ids
    outside the declared bounds (Spark JDBC split semantics)."""
    pgc.run_psql(conninfo, 'DROP TABLE IF EXISTS "dpp_parts"')
    pgc.run_psql(
        conninfo, 'CREATE TABLE "dpp_parts" (id bigint, payload text)'
    )
    df = spark.range(0, 1000).selectExpr(
        "id", "concat('payload-', id) AS payload"
    )
    assert pgc.copy_dataframe_to_postgres(df, "dpp_parts", conninfo) == 1000
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    back = pgc.read_postgres_copy(
        spark,
        "dpp_parts",
        schema,
        conninfo,
        partition_column="id",
        # Bounds deliberately INSIDE the data range: rows below/above must
        # still arrive via the unbounded first/last splits.
        lower_bound=200,
        upper_bound=800,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    rows = back.collect()
    assert len(rows) == 1000
    assert {r.id for r in rows} == set(range(1000))
    assert all(r.payload == f"payload-{r.id}" for r in rows)


def test_split_predicates_partition_the_line():
    """Split predicates are exhaustive and disjoint on integer inputs."""
    preds = pgc._split_predicates("k", 0, 100, 4)
    assert len(preds) == 4
    assert "IS NULL" in preds[0]
    assert preds[-1] == '"k" >= 75'
