"""JDBC source/sink contract tests.

No PostgreSQL in the container, but Spark bundles embedded Derby (its
metastore backend), which speaks real JDBC inside the same JVM — so the
round-trip below exercises the actual `format("jdbc")` read and write
paths, not mocks. Against PostgreSQL only the url/driver pair changes
(reference habitat: hooks/dataset.py:62-86).
"""

from __future__ import annotations

import pytest

from data_preparation_plugin_spark.plans.registry import load_table
from data_preparation_plugin_spark.sources import (
    jdbc_reader_options,
    read_jdbc,
    write_jdbc,
)
from tests.conftest import SF_DIR

DERBY_URL = "jdbc:derby:memory:dpp_test;create=true"
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def test_reader_options_partitioned():
    opts = jdbc_reader_options(
        "jdbc:postgresql://db/x",
        "public.orders",
        partition_column="o_orderkey",
        num_partitions=16,
        lower_bound=0,
        upper_bound=60_000,
        fetchsize="5000",
    )
    assert opts == {
        "url": "jdbc:postgresql://db/x",
        "dbtable": "public.orders",
        "partitionColumn": "o_orderkey",
        "numPartitions": "16",
        "lowerBound": "0",
        "upperBound": "60000",
        "fetchsize": "5000",
    }


def test_reader_options_unpartitioned_has_no_partition_keys():
    opts = jdbc_reader_options("jdbc:postgresql://db/x", "t")
    assert opts == {"url": "jdbc:postgresql://db/x", "dbtable": "t"}


def test_reader_options_partition_without_bounds_raises():
    with pytest.raises(ValueError, match="bounds"):
        jdbc_reader_options(
            "jdbc:postgresql://db/x", "t", partition_column="id"
        )


def test_jdbc_roundtrip_embedded_derby(spark):
    """Real JDBC write + partitioned read against in-memory Derby."""
    src = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(500)
    )
    expected = sorted(
        (r.o_orderkey, r.o_custkey, round(r.o_totalprice, 2))
        for r in src.collect()
    )
    write_jdbc(
        src,
        DERBY_URL,
        "ORDERS_RT",
        mode="overwrite",
        driver=DERBY_DRIVER,
    )
    hi = max(k for k, _, _ in expected)
    got_df = read_jdbc(
        spark,
        DERBY_URL,
        "ORDERS_RT",
        partition_column="o_orderkey",
        num_partitions=4,
        lower_bound=0,
        upper_bound=hi + 1,
        driver=DERBY_DRIVER,
    )
    # The partitioned scan really splits into 4 range queries.
    assert got_df.rdd.getNumPartitions() == 4
    got = sorted(
        (r.o_orderkey, r.o_custkey, round(r.o_totalprice, 2))
        for r in got_df.collect()
    )
    assert got == expected


def test_pg_reader_options_is_config_only_delta():
    """Swapping Derby for PostgreSQL must change ONLY url/driver/creds —
    the partitioning contract travels unchanged (README 'JDBC')."""
    from data_preparation_plugin_spark.sources import (
        jdbc_reader_options,
        pg_reader_options,
    )

    common = dict(
        partition_column="o_orderkey",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1000,
    )
    derby = jdbc_reader_options(DERBY_URL, "ORDERS", **common)
    pg = pg_reader_options(
        "db.example.org", "tpch", "ORDERS",
        user="etl", password="s3cret", **common,
    )
    delta = {k for k in pg.keys() ^ derby.keys()} | {
        k for k in pg.keys() & derby.keys() if pg[k] != derby[k]
    }
    assert delta == {"url", "driver", "user", "password"}
    assert pg["url"] == "jdbc:postgresql://db.example.org:5432/tpch"
    assert pg["driver"] == "org.postgresql.Driver"
    assert pg["partitionColumn"] == derby["partitionColumn"]


def test_pg_type_map_targets_are_valid_spark_ddl(spark):
    """Every mapped Spark type must parse as DDL, so a reflected PG schema
    can be declared verbatim (reference hooks/dataset.py:163-170 parity)."""
    from data_preparation_plugin_spark.sources import PG_TYPE_MAP

    for pg_type, spark_type in PG_TYPE_MAP.items():
        ddl = spark_type.replace("(p,s)", "(10,2)").replace("(n)", "")
        # Parses or raises: an invalid type name fails the test.
        spark.createDataFrame([], schema=f"c {ddl}")
    # The core scalar types the reference round-trips must be present.
    for required in ("integer", "bigint", "numeric", "text", "timestamp",
                     "timestamptz", "serial", "boolean", "date", "bytea"):
        assert required in PG_TYPE_MAP
