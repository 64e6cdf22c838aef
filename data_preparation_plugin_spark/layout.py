"""Physical table layout: partitioning, file sizing, and skew salting.

The reference's only layout lever is ``CREATE TABLE dst (LIKE src INCLUDING
indexes)`` (``operators/copy.py:9`` in the reference) — PostgreSQL b-trees.
Spark has no secondary indexes; the equivalent performance levers at 100 TB
are *layout*: directory partitioning (static + dynamic partition pruning),
file sizing (split granularity), and key salting (shuffle skew). SURVEY.md
§4.1 ("partition pruning ... we must *create* partitioned layouts to
benefit") and §4.2 item 3 put these in scope as thin, explicit utilities.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def month_key(ts_col: Column | str) -> Column:
    """Derive a 'yyyy-MM' partition key from an event-time column.

    Calendar-month directories keep partition counts sane at any scale
    (a 10-year corpus is 120 directories) while letting every query with a
    date predicate prune to the touched months only.
    """
    return F.date_format(ts_col, "yyyy-MM")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
    target_files_per_partition: int | None = None,
) -> None:
    """Write a directory-partitioned parquet table.

    ``partitionBy`` turns each distinct key tuple into a directory; reads
    with a predicate on the partition columns list only the matching
    directories (``PartitionFilters`` in the scan, zero I/O elsewhere).
    ``target_files_per_partition`` repartitions by the partition key first
    so each directory gets a bounded file count instead of one file per
    input task — the classic small-files guard: without it, T tasks x P
    partitions can emit T*P tiny files.
    """
    if target_files_per_partition is not None:
        df = df.repartition(target_files_per_partition, *partition_by)
    df.write.partitionBy(*partition_by).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed (optionally sorted) catalog table.

    Bucketing pre-shuffles the data *once at write time*: rows land in
    ``hash(key) % n_buckets`` files. Two tables bucketed the same way join
    with **no exchange on either side** — at 100 TB that converts every
    recurring fact-fact join (orders⋈lineitem on the order key) from the
    biggest shuffle in the pipeline into a local per-bucket merge. With
    ``sort_by`` the sort-merge join's sort phase is also eliminated.
    The closest Spark analogue to the reference's persistent-index copy
    (``operators/copy.py:9`` INCLUDING indexes).
    """
    writer = df.write.bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.mode(mode).format("parquet").saveAsTable(table)


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Add a uniform salt column in ``[0, n_salts)``.

    ``rand`` salting is for *aggregation* skew (any row may take any salt).
    For join skew, replicate the small side per salt value instead — or
    rely on AQE's skew-join splitting (on in session.py), which handles the
    common cases without plan changes.
    """
    return df.withColumn(
        salt_col, (F.rand(seed=42) * n_salts).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int,
    partial_aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Two-phase aggregation through a salted key: skew-proof group-by.

    ``partial_aggs`` maps output column -> (input column, agg) where agg is
    ``"sum"`` or ``"count"`` — the decomposable aggregates (count re-merges
    as sum). Phase 1 aggregates on (keys + salt): a hot key's rows spread
    over ``n_salts`` reducers instead of one. Phase 2 merges the per-salt
    partials — at most ``n_salts`` rows per key, negligible. Spark's own
    partial aggregation already gives this effect per *map task*; explicit
    salting is the stronger guarantee needed when a single reducer's merge
    of one giant key would otherwise dominate the stage.
    """
    salted = with_salt(df, n_salts)
    phase1 = []
    phase2 = []
    for out, (col, agg) in partial_aggs.items():
        if agg == "sum":
            phase1.append(F.sum(col).alias(out))
            phase2.append(F.sum(out).alias(out))
        elif agg == "count":
            phase1.append(F.count(col).alias(out))
            phase2.append(F.sum(out).cast("long").alias(out))
        else:
            raise ValueError(f"non-decomposable agg {agg!r}; use sum/count")
    partial = salted.groupBy(*keys, "__salt").agg(*phase1)
    return partial.groupBy(*keys).agg(*phase2)


def materialize_rollup(
    fact: DataFrame,
    rollup_table: str,
    partition_col: str,
    build,
) -> None:
    """Initial build of a partitioned rollup (materialized aggregate).

    ``build`` maps the fact frame to its aggregate and must retain
    ``partition_col`` in the output; the result is written as a
    directory-partitioned catalog table so later refreshes can replace
    single partitions.
    """
    build(fact).write.partitionBy(partition_col).mode(
        "overwrite"
    ).format("parquet").saveAsTable(rollup_table)


def refresh_rollup(
    spark,
    fact: DataFrame,
    rollup_table: str,
    partition_col: str,
    build,
    changed_keys: Sequence,
) -> None:
    """Incrementally refresh a rollup: recompute changed partitions only.

    The 100 TB materialized-view pattern: when late or corrected data
    lands in a few partitions, recomputing the whole aggregate rescans
    the entire fact table; this filters the fact scan to the changed
    partition keys (partition pruning — only those directories are read)
    and rewrites exactly the matching rollup partitions via dynamic
    partition overwrite. Work scales with the *change*, not the table.

    Requires ``build`` to be partition-local: every output row's
    ``partition_col`` must be derived from same-partition input rows
    (true for any groupBy that includes the partition key).
    """
    keys = list(changed_keys)
    subset = fact.filter(F.col(partition_col).isin(keys))
    result = build(subset)
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # insertInto is positional: align to the table's column order
        # (data columns first, partition column last).
        cols = [c.name for c in spark.catalog.listColumns(rollup_table)]
        result.select(*cols).write.mode("overwrite").insertInto(rollup_table)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics (upsert + optional delete) as a join rewrite.

    The reference's Postgres habitat gets row-level upsert from
    ``INSERT ... ON CONFLICT`` / SQL MERGE for free; a parquet-backed
    engine has no row-level mutation, so the Spark-native equivalent is a
    *relation rewrite*: keep every target row whose key is absent from the
    change batch (left-anti join), then union the change rows — matched
    keys are thereby replaced (UPDATE), new keys appended (INSERT), and
    rows flagged true in ``delete_col`` dropped entirely (DELETE). Source
    rows must be unique per key, the same precondition SQL MERGE enforces.

    At scale this is the CDC-compaction pattern: the anti join shuffles on
    the merge key, and because a change batch is normally tiny relative to
    the table, AQE demotes it to a broadcast anti join — the table itself
    streams through map-side with no shuffle. Pair with
    :func:`write_partitioned` on a key prefix to rewrite only touched
    partitions (dynamic partition overwrite).
    """
    change_keys = updates.select(*keys)
    survivors = target.join(change_keys, list(keys), "left_anti")
    if delete_col is not None:
        updates = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return survivors.unionByName(updates)


def compact_table(spark, table: str, target_files: int) -> None:
    """Rewrite a catalog table into ``target_files`` parquet files.

    The standard maintenance pass for streaming/append-heavy tables: many
    small files inflate task counts and listing time; a periodic
    repartition-overwrite restores scan efficiency. Writes to a side table,
    renames the original to a backup, renames the compacted table into
    place, and only then drops the backup — the original data exists under
    some catalog name at every step, so a failure at any point leaves a
    recoverable table (a crash between the two renames leaves it as
    ``<table>__precompact``). Directory partitioning is re-applied from the
    catalog; bucketed tables should be rewritten via :func:`write_bucketed`
    instead (bucket specs don't survive a DataFrame round-trip).
    """
    part_cols = [
        c.name for c in spark.catalog.listColumns(table) if c.isPartition
    ]
    df = spark.table(table)
    tmp = f"{table}__compacting"
    backup = f"{table}__precompact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    if part_cols:
        # Hash by the partition key: each key lands in one task, so each
        # directory gets one file; target_files bounds the task count.
        writer = df.repartition(target_files, *part_cols).write.partitionBy(
            *part_cols
        )
    else:
        writer = df.repartition(target_files).write
    writer.mode("overwrite").format("parquet").saveAsTable(tmp)

    def _rename(src: str, dst: str) -> None:
        spark.sql(f"ALTER TABLE {src} RENAME TO {dst}")
        if part_cols:
            # Managed-table rename moves the directory but leaves stale
            # absolute partition locations in the catalog; re-discover.
            spark.sql(f"MSCK REPAIR TABLE {dst}")

    spark.sql(f"DROP TABLE IF EXISTS {backup}")
    _rename(table, backup)
    try:
        _rename(tmp, table)
    except Exception:
        # Roll the original back into place before re-raising.
        _rename(backup, table)
        raise
    spark.sql(f"DROP TABLE {backup}")


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton (Z-order) key interleaving the low ``bits`` of two ints.

    Sorting/range-partitioning by this key clusters rows that are close in
    BOTH dimensions into the same parquet files, so min/max row-group
    stats prune two-dimensional range predicates — the Delta/Iceberg
    OPTIMIZE ZORDER effect with plain open-source Spark. Inputs must
    already be bounded to ``[0, 2**bits)`` (quantile-rank or mod them
    first); the key is pure integer arithmetic (``(x & 2^i) << i``
    per bit), stays in whole-stage codegen, and is reproducible in any
    SQL engine for verification.
    """
    terms: list[Column] = []
    for i in range(bits):
        mask = 1 << i
        # (x & 2^i) already carries weight 2^i; multiplying by 2^i
        # (resp. 2^(i+1)) lands the bit at position 2i (resp. 2i+1).
        terms.append(x.bitwiseAND(F.lit(mask)) * F.lit(mask))
        terms.append(y.bitwiseAND(F.lit(mask)) * F.lit(2 * mask))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """The identical Morton key as a SQL string (for oracles/other engines)."""
    terms = []
    for i in range(bits):
        mask = 1 << i
        terms.append(f"(({x_expr}) & {mask}) * {mask}")
        terms.append(f"(({y_expr}) & {mask}) * {2 * mask}")
    return " + ".join(terms)


__all__ = [
    "compact_table",
    "materialize_rollup",
    "merge_upsert",
    "month_key",
    "refresh_rollup",
    "salted_aggregate",
    "with_salt",
    "write_bucketed",
    "write_partitioned",
    "zorder_key",
    "zorder_key_sql",
]
