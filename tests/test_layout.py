"""Layout utilities: partition pruning and skew-proof aggregation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_preparation_plugin_spark.layout import (
    month_key,
    salted_aggregate,
    with_salt,
    write_bucketed,
    write_partitioned,
)
from data_preparation_plugin_spark.plans.registry import load_table
from tests.conftest import SF_DIR


def test_write_partitioned_prunes(spark, tmp_path):
    path = str(tmp_path / "orders_by_month")
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_month", month_key("o_orderdate")
    )
    write_partitioned(orders, path, ["order_month"], target_files_per_partition=1)

    # One directory per month on disk.
    months = sorted(
        d for d in os.listdir(path) if d.startswith("order_month=")
    )
    assert len(months) > 12

    read = spark.read.parquet(path)
    one_month = read.filter(F.col("order_month") == "1997-03")
    plan = one_month._jdf.queryExecution().executedPlan().toString()
    # The month predicate must prune at the directory level, not post-scan.
    assert "PartitionFilters: [" in plan
    assert "order_month" in plan.split("PartitionFilters:")[1].split("]")[0]

    expected = orders.filter(F.col("order_month") == "1997-03").count()
    assert one_month.count() == expected


def test_bucketed_join_needs_no_exchange(spark):
    """Same-bucketed tables sort-merge join without shuffling either side."""
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    write_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], 8, sort_by=["l_orderkey"]
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        expected = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_with_salt_bounded(spark):
    orders = load_table(spark, SF_DIR, "orders")
    salts = (
        with_salt(orders, 8)
        .agg(F.min("__salt").alias("lo"), F.max("__salt").alias("hi"))
        .first()
    )
    assert salts.lo >= 0 and salts.hi <= 7


def test_salted_aggregate_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders")
    got = salted_aggregate(
        orders,
        ["o_custkey"],
        n_salts=8,
        partial_aggs={
            "total": ("o_totalprice", "sum"),
            "n": ("o_orderkey", "count"),
        },
    )
    expected = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("total"),
        F.count("o_orderkey").alias("n"),
    )
    g = {r.o_custkey: (round(r.total, 6), r.n) for r in got.collect()}
    e = {r.o_custkey: (round(r.total, 6), r.n) for r in expected.collect()}
    assert g == e


def test_aqe_splits_skewed_join(spark):
    """A pathologically skewed join completes and stays correct under AQE.

    90% of the probe side hits one key; AQE's skew-join split (enabled in
    session.py) breaks the hot partition into subpartitions at runtime.
    Local thresholds are too high to always trigger the split on test-size
    data, so the assertion is semantic (exact fan-out count) — the config
    contract is asserted explicitly.
    """
    import pyspark.sql.functions as SF

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    n, hot = 40_000, 7
    left = spark.range(n).select(
        SF.when(SF.col("id") % 10 < 9, hot).otherwise(SF.col("id")).alias("k")
    )
    right = spark.range(100).select(SF.col("id").alias("k"), SF.lit(1).alias("v"))
    got = left.join(right, "k").count()
    hot_rows = 9 * n // 10
    cold_matches = sum(1 for i in range(n) if i % 10 == 9 and i < 100)
    assert got == hot_rows + cold_matches


def test_agg_hll_within_tolerance(spark):
    """The in-query HLL tolerance bit holds and exact counts are right."""
    from data_preparation_plugin_spark.plans import QUERIES

    rows = QUERIES["agg_hll_sketch"].builder(spark, SF_DIR).collect()
    exact = {
        r.o_orderpriority: r.n
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert {r.o_orderpriority for r in rows} == exact.keys()
    for r in rows:
        assert r.hll_within_2pct, r
        assert r.n_customers_exact == exact[r.o_orderpriority], r


def test_compact_table(spark):
    from data_preparation_plugin_spark.layout import compact_table

    spark.sql("DROP TABLE IF EXISTS t_fragmented")
    try:
        load_table(spark, SF_DIR, "orders").repartition(16).write.saveAsTable(
            "t_fragmented"
        )
        before = spark.table("t_fragmented").count()
        assert (
            spark.table("t_fragmented").rdd.getNumPartitions() > 2
        )
        compact_table(spark, "t_fragmented", 2)
        assert spark.table("t_fragmented").count() == before
        files = spark.table("t_fragmented").inputFiles()
        assert len(files) == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS t_fragmented")
        spark.sql("DROP TABLE IF EXISTS t_fragmented__compacting")
        spark.sql("DROP TABLE IF EXISTS t_fragmented__precompact")


def test_compact_table_preserves_partitioning(spark):
    from data_preparation_plugin_spark.layout import compact_table, month_key

    table = "t_part_compact"
    for suffix in ("", "__compacting", "__precompact"):
        spark.sql(f"DROP TABLE IF EXISTS {table}{suffix}")
    try:
        orders = load_table(spark, SF_DIR, "orders").withColumn(
            "order_month", month_key("o_orderdate")
        )
        orders.repartition(8).write.partitionBy("order_month").saveAsTable(
            table
        )
        before = spark.table(table).count()
        compact_table(spark, table, 4)
        assert spark.table(table).count() == before
        # Partition columns survive the rewrite...
        part_cols = [
            c.name
            for c in spark.catalog.listColumns(table)
            if c.isPartition
        ]
        assert part_cols == ["order_month"]
        # ...and pruning still works: one directory's files only.
        one_month = spark.table(table).where(
            F.col("order_month") == "1997-03"
        )
        files = one_month.inputFiles()
        assert files and all("order_month=1997-03" in f for f in files)
        # No stray intermediate tables left behind.
        assert not spark.catalog.tableExists(f"{table}__compacting")
        assert not spark.catalog.tableExists(f"{table}__precompact")
    finally:
        for suffix in ("", "__compacting", "__precompact"):
            spark.sql(f"DROP TABLE IF EXISTS {table}{suffix}")


def test_agg_approx_percentile_within_tolerance(spark):
    """The in-query rank-band bits hold for every group."""
    from data_preparation_plugin_spark.plans import QUERIES

    rows = QUERIES["agg_approx_percentile"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.p50_in_rank_band, r
        assert r.p95_in_rank_band, r


def test_merge_upsert_semantics(spark):
    """All four row fates: kept, updated, inserted, deleted."""
    from data_preparation_plugin_spark.layout import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    changes = spark.createDataFrame(
        [(2, "B", 200.0, False), (4, "d", 40.0, False), (3, None, None, True)],
        "k long, s string, v double, _deleted boolean",
    )
    merged = merge_upsert(target, changes, ["k"], delete_col="_deleted")
    rows = {r.k: (r.s, r.v) for r in merged.collect()}
    assert rows == {1: ("a", 10.0), 2: ("B", 200.0), 4: ("d", 40.0)}
    # Plan shape: an anti join on the key, never a cartesian.
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan


def test_merge_upsert_without_deletes(spark):
    from data_preparation_plugin_spark.layout import merge_upsert

    target = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    changes = spark.createDataFrame([(2, 99.0), (5, 50.0)], "k long, v double")
    merged = merge_upsert(target, changes, ["k"])
    assert {(r.k, r.v) for r in merged.collect()} == {
        (1, 10.0), (2, 99.0), (5, 50.0)
    }


def test_refresh_rollup_incremental(spark):
    """A one-partition refresh matches the full recompute and rewrites
    only the touched partition's files."""
    from data_preparation_plugin_spark.layout import (
        materialize_rollup,
        month_key,
        refresh_rollup,
    )

    table = "t_rollup_events"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        events = load_table(spark, SF_DIR, "events").withColumn(
            "month", month_key("ts")
        )

        def build(df):
            return df.groupBy("month", "event_type").agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total"),
            )

        materialize_rollup(events, table, "month", build)
        before = {
            f for f in spark.table(table).inputFiles() if "month=2024-02" not in f
        }

        # Late data lands in 2024-02: double that month's values.
        changed = events.withColumn(
            "value",
            F.when(F.col("month") == "2024-02", F.col("value") * 2).otherwise(
                F.col("value")
            ),
        )
        refresh_rollup(spark, changed, table, "month", build, ["2024-02"])

        got = {
            (r.month, r.event_type): (r.n, r.total)
            for r in spark.table(table).collect()
        }
        want = {
            (r.month, r.event_type): (r.n, r.total)
            for r in build(changed).collect()
        }
        assert got == want
        after = {
            f for f in spark.table(table).inputFiles() if "month=2024-02" not in f
        }
        assert before == after  # untouched partitions keep their files
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_refresh_rollup_prunes_fact_scan(spark):
    """The refresh's fact-side read must prune to the changed partition
    when the fact table is directory-partitioned on the key."""
    import os

    from data_preparation_plugin_spark.layout import (
        month_key,
        refresh_rollup,
        write_partitioned,
    )

    fact_path = os.path.join("/tmp", "dpp-rollup-fact")
    table = "t_rollup_pruned"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        events = load_table(spark, SF_DIR, "events").withColumn(
            "month", month_key("ts")
        )
        write_partitioned(events, fact_path, ["month"])
        fact = spark.read.parquet(fact_path)

        def build(df):
            return df.groupBy("month").agg(F.count(F.lit(1)).alias("n"))

        build(fact).write.partitionBy("month").mode("overwrite").format(
            "parquet"
        ).saveAsTable(table)

        subset = fact.filter(F.col("month").isin(["2024-01"]))
        files = subset.inputFiles()
        assert files and all("month=2024-01" in f for f in files)

        refresh_rollup(spark, fact, table, "month", build, ["2024-01"])
        assert spark.table(table).count() == build(fact).count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_zorder_key_matches_reference_interleave(spark):
    """zorder_key must equal the classic bit-interleave (Morton) value."""
    import pandas as pd

    from data_preparation_plugin_spark.layout import zorder_key, zorder_key_sql

    def morton(x: int, y: int, bits: int = 8) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(0, 0), (255, 255), (1, 0), (0, 1), (170, 85), (200, 3)]
    pdf = pd.DataFrame(pts, columns=["x", "y"])
    df = spark.createDataFrame(pdf).select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    got = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    for x, y in pts:
        assert got[(x, y)] == morton(x, y), (x, y)
    # The SQL twin is literally the same arithmetic.
    sql_df = spark.createDataFrame(pdf)
    sql_df.createOrReplaceTempView("zpts")
    sql_got = {
        (r["x"], r["y"]): r["z"]
        for r in spark.sql(
            f"SELECT x, y, {zorder_key_sql('x', 'y')} AS z FROM zpts"
        ).collect()
    }
    assert sql_got == got


def test_zorder_sort_tightens_both_spans(spark):
    """Range-splitting the Morton order must bound BOTH dims' spans per
    chunk — the data-skipping property a 1-D sort cannot give."""
    import pandas as pd

    from data_preparation_plugin_spark.layout import zorder_key

    n = 4096
    pdf = pd.DataFrame(
        {"x": [i % 256 for i in range(n)], "y": [(i * 37) % 256 for i in range(n)]}
    )
    df = spark.createDataFrame(pdf).select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    n_chunks = 16
    chunked = df.withColumn(
        "chunk", F.floor(F.col("z") / F.lit(65536 / n_chunks)).cast("int")
    )
    spans = (
        chunked.groupBy("chunk")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    # 16 Morton chunks of a 256x256 domain are 64x64 tiles: both spans
    # must stay well under the 255 a 1-D sort leaves on the minor dim.
    assert spans, "no chunks"
    assert max(r["xs"] for r in spans) <= 63
    assert max(r["ys"] for r in spans) <= 63
