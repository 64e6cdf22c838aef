"""Declarative Python DataSource over live PostgreSQL (Embulk passthrough).

The reference's EmbulkOperator drives any input plugin from a declarative
config (reference ``operators/embulk.py:8-24``); these tests prove the
Spark-4 DataSource twin (``sources/python_datasource.py``) does the same
with reader options only: schema reflection (``embulk guess`` parity),
range partition planning with reflected bounds, query passthrough, and
the quoting-aware COPY transport. Skips cleanly where no server starts.
"""

from __future__ import annotations

import datetime
import decimal

import pytest

from data_preparation_plugin_spark.sources import postgres_copy as pgc
from data_preparation_plugin_spark.sources.python_datasource import (
    PgCopyDataSource,
    _reflect_schema,
)


@pytest.fixture(scope="module")
def conninfo():
    try:
        return pgc.ensure_postgres()
    except (RuntimeError, OSError) as exc:
        pytest.skip(f"no local PostgreSQL available: {exc}")


@pytest.fixture(scope="module")
def seeded(conninfo):
    """A typed PG table with NULL keys and tricky values, plus the format
    registered on the shared session."""
    table = "dpp_pyds_readings"
    pgc.run_psql(conninfo, f'DROP TABLE IF EXISTS "{table}"')
    pgc.run_psql(
        conninfo,
        f'CREATE TABLE "{table}" ('
        "id bigint, station integer, reading numeric(10,2), "
        "label text, ok boolean, day date, at timestamp)",
    )
    rows = []
    for i in range(1, 101):
        rows.append(
            f"({i}, {i % 7}, {i}.25, 'label {i}', {str(i % 2 == 0).lower()},"
            f" '2024-01-{i % 28 + 1:02d}', '2024-01-01 00:{i % 60:02d}:00')"
        )
    # NULL partition key + a literal '\N' string that must survive COPY.
    rows.append(r"(NULL, 99, NULL, E'\\N', NULL, NULL, NULL)")
    pgc.run_psql(
        conninfo, f'INSERT INTO "{table}" VALUES {", ".join(rows)}'
    )
    return table


@pytest.fixture(scope="module")
def reader(spark, seeded, conninfo):
    spark.dataSource.register(PgCopyDataSource)

    def make(**options):
        opts = {"conninfo": conninfo, "table": seeded, **options}
        return spark.read.format("dpp_pg_copy").options(**opts).load()

    return make


def test_schema_reflection_guess_parity(reader):
    df = reader()
    assert dict(df.dtypes) == {
        "id": "bigint",
        "station": "int",
        "reading": "decimal(10,2)",
        "label": "string",
        "ok": "boolean",
        "day": "date",
        "at": "timestamp_ntz",
    }


def test_unpartitioned_read_values(reader):
    rows = {r.id: r for r in reader().collect()}
    assert len(rows) == 101
    assert rows[7].station == 0
    assert rows[7].reading == decimal.Decimal("7.25")
    assert rows[7].label == "label 7"
    assert rows[7].ok is False
    assert rows[7].day == datetime.date(2024, 1, 8)
    assert rows[7].at == datetime.datetime(2024, 1, 1, 0, 7)
    # the NULL-keyed row and its quoted literal '\N' payload both survive
    null_row = rows[None]
    assert null_row.label == r"\N"
    assert null_row.reading is None and null_row.ok is None


def test_partition_planning_with_reflected_bounds(reader):
    df = reader(partition_column="id", num_partitions="8")
    assert df.rdd.getNumPartitions() == 8
    sizes = df.rdd.glom().map(len).collect()
    # Complete and disjoint: every row exactly once across the splits,
    # the NULL key absorbed by the first split (JDBC semantics), and the
    # planner genuinely spread rows (no single split holding everything).
    assert sum(sizes) == 101
    assert df.select("id").distinct().count() == 101
    assert max(sizes) < 101 and sum(1 for s in sizes if s) >= 7


def test_partition_planning_with_declared_bounds(reader):
    df = reader(
        partition_column="id",
        num_partitions="4",
        lower_bound="1",
        upper_bound="101",
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 101


def test_query_passthrough_with_declared_schema(spark, conninfo, seeded):
    df = (
        spark.read.format("dpp_pg_copy")
        .option("conninfo", conninfo)
        .option(
            "query",
            f'SELECT station, count(*) AS n FROM "{seeded}" '
            "GROUP BY station",
        )
        .option("schema", "station int, n bigint")
        .load()
    )
    got = {r.station: r.n for r in df.collect()}
    assert got[99] == 1
    assert sum(got.values()) == 101


def test_filter_and_projection_compose(reader):
    # The source yields rows; Spark applies projection/filter above it —
    # the declarative read composes with the full DataFrame API.
    df = reader(partition_column="id", num_partitions="4")
    got = (
        df.filter("station = 3")
        .groupBy("station")
        .count()
        .collect()
    )
    assert got[0]["count"] == 14  # i in 1..100 with i % 7 == 3


def test_option_validation(spark, conninfo, seeded):
    with pytest.raises(Exception, match="conninfo"):
        spark.read.format("dpp_pg_copy").option("table", seeded).load()
    with pytest.raises(Exception, match="exactly one"):
        (
            spark.read.format("dpp_pg_copy")
            .option("conninfo", conninfo)
            .load()
        )
    with pytest.raises(Exception, match="schema"):
        (
            spark.read.format("dpp_pg_copy")
            .option("conninfo", conninfo)
            .option("query", "SELECT 1 AS x")
            .load()
        )


def test_write_roundtrip_append_and_overwrite(spark, conninfo, seeded):
    """The output-plugin half: staged atomic COPY write, both save modes,
    read back through the same format."""
    table = "dpp_pyds_written"
    pgc.run_psql(conninfo, f'DROP TABLE IF EXISTS "{table}"')
    src = spark.createDataFrame(
        [
            (1, "plain", 1.5, True),
            (2, 'comma, "quote"\nnewline', None, None),
            (3, r"\N", 2.25, False),
            (4, "", 0.0, True),
            (None, None, None, None),
        ],
        "id bigint, label string, ratio double, ok boolean",
    )
    writer = (
        src.write.format("dpp_pg_copy")
        .option("conninfo", conninfo)
        .option("table", table)
    )
    writer.mode("append").save()
    writer.mode("append").save()  # append doubles
    df = (
        spark.read.format("dpp_pg_copy")
        .option("conninfo", conninfo)
        .option("table", table)
        .load()
    )
    assert df.count() == 10
    writer.mode("overwrite").save()  # overwrite resets
    rows = {
        r.id: r
        for r in spark.read.format("dpp_pg_copy")
        .option("conninfo", conninfo)
        .option("table", table)
        .load()
        .collect()
    }
    assert len(rows) == 5
    assert rows[2].label == 'comma, "quote"\nnewline'
    # lossless corners: a literal backslash-N STRING and an empty string
    # both survive the write (all_valid quoting makes them values; only
    # true nulls travel unquoted), where the pandas-CSV write path
    # documents collapsing them to NULL.
    assert rows[3].label == r"\N" and rows[3].ratio == 2.25
    assert rows[4].label == ""
    assert rows[None].label is None
    # commit is atomic and self-cleaning: no staging tables survive
    leftovers = pgc.run_psql(
        conninfo,
        "SELECT count(*) FROM information_schema.tables "
        f"WHERE table_name LIKE '{table}__stage_%'",
    ).strip()
    assert leftovers == "0"


def test_write_typed_roundtrip(spark, conninfo, reader):
    """The full writable type palette through the Arrow-CSV COPY path:
    decimals exact, both timestamp flavors to PG's zoneless 'timestamp'
    (instant preserved under the repo's UTC session; reflected back as
    timestamp_ntz), dates, floats, shorts — and NULLs in every column."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("price", T.DecimalType(12, 2)),
            T.StructField("day", T.DateType()),
            T.StructField("at_ntz", T.TimestampNTZType()),
            T.StructField("at_ltz", T.TimestampType()),
            T.StructField("f", T.FloatType()),
            T.StructField("sm", T.ShortType()),
        ]
    )
    ts = datetime.datetime(2024, 2, 29, 23, 59, 59, 123456)
    rows = [
        Row(
            id=1,
            price=decimal.Decimal("19.99"),
            day=datetime.date(2024, 2, 29),
            at_ntz=ts,
            at_ltz=ts,
            f=1.5,
            sm=7,
        ),
        Row(id=2, price=None, day=None, at_ntz=None, at_ltz=None, f=None, sm=None),
    ]
    table = "dpp_pyds_typed"
    pgc.run_psql(conninfo, f'DROP TABLE IF EXISTS "{table}"')
    (
        spark.createDataFrame(rows, schema)
        .write.format("dpp_pg_copy")
        .option("conninfo", conninfo)
        .option("table", table)
        .mode("overwrite")
        .save()
    )
    back = {
        r.id: r
        for r in spark.read.format("dpp_pg_copy")
        .option("conninfo", conninfo)
        .option("table", table)
        .load()
        .collect()
    }
    assert back[1].price == decimal.Decimal("19.99")
    assert back[1].day == datetime.date(2024, 2, 29)
    assert back[1].at_ntz == ts and back[1].at_ltz == ts
    assert back[1].f == 1.5 and back[1].sm == 7
    assert all(v is None for k, v in back[2].asDict().items() if k != "id")


def test_write_abort_drops_stagings(conninfo):
    from pyspark.sql import types as T

    from data_preparation_plugin_spark.sources.python_datasource import (
        _PgCopyWriter,
        _StageCommit,
    )

    schema = T.StructType([T.StructField("x", T.LongType())])
    stage = "dpp_pyds_abort__stage_deadbeef"
    pgc.run_psql(conninfo, f'DROP TABLE IF EXISTS "{stage}"')
    pgc.run_psql(conninfo, f'CREATE TABLE "{stage}" (x bigint)')
    w = _PgCopyWriter(
        {"conninfo": conninfo, "table": "dpp_pyds_abort"}, schema, False
    )
    w.abort([None, _StageCommit(stage_table=stage, n_rows=1),
             _StageCommit(stage_table=None, n_rows=0)])
    gone = pgc.run_psql(
        conninfo,
        "SELECT count(*) FROM information_schema.tables "
        f"WHERE table_name = '{stage}'",
    ).strip()
    assert gone == "0"
    # the never-created target stays never-created
    target = pgc.run_psql(
        conninfo,
        "SELECT count(*) FROM information_schema.tables "
        "WHERE table_name = 'dpp_pyds_abort'",
    ).strip()
    assert target == "0"


def test_write_option_validation(spark, conninfo):
    df = spark.range(1)
    with pytest.raises(Exception, match="table"):
        (
            df.write.format("dpp_pg_copy")
            .option("conninfo", conninfo)
            .mode("append")
            .save()
        )


@pytest.fixture(scope="module")
def roundtrip(spark, conninfo):
    """One write+read round trip through the declarative format."""
    spark.dataSource.register(PgCopyDataSource)

    def go(values: list[str | None]) -> list[str | None]:
        table = "dpp_pyds_prop"
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)], "id bigint, s string"
        )
        (
            df.coalesce(2)
            .write.format("dpp_pg_copy")
            .option("conninfo", conninfo)
            .option("table", table)
            .mode("overwrite")
            .save()
        )
        back = (
            spark.read.format("dpp_pg_copy")
            .option("conninfo", conninfo)
            .option("table", table)
            .load()
            .collect()
        )
        assert len(back) == len(values)
        return [r.s for r in sorted(back, key=lambda r: r.id)]

    return go


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# PostgreSQL text cannot hold NUL; lone surrogates can't encode to UTF-8.
_pg_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00"
    ),
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(st.one_of(st.none(), _pg_text), max_size=12))
def test_write_read_roundtrip_property(roundtrip, values):
    """Any UTF-8 text PostgreSQL can hold — quotes, newlines, the NULL
    marker, empty strings, unicode — survives write+read bit-exactly,
    and None stays None (the all_valid-quoting contract)."""
    assert roundtrip(values) == values


def test_streaming_sink_end_to_end(spark, conninfo, tmp_path):
    """writeStream.format('dpp_pg_copy'): a multi-batch file replay lands
    every source row exactly once in the target, with the epoch ledger
    recording each committed micro-batch."""
    table = "dpp_pyds_stream_sink"
    for t in (table, f"{table}__epochs"):
        pgc.run_psql(conninfo, f'DROP TABLE IF EXISTS "{t}"')
    src_dir = f"{tmp_path}/src"
    for i in range(3):  # three files -> multiple micro-batches
        spark.createDataFrame(
            [(i * 10 + j, f"v{i}_{j}") for j in range(10)],
            "id bigint, s string",
        ).coalesce(1).write.mode("append").parquet(src_dir)
    spark.dataSource.register(PgCopyDataSource)
    stream = (
        spark.readStream.schema("id bigint, s string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.format("dpp_pg_copy")
        .option("conninfo", conninfo)
        .option("table", table)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = (
        spark.read.format("dpp_pg_copy")
        .option("conninfo", conninfo)
        .option("table", table)
        .load()
        .collect()
    )
    assert sorted((r.id, r.s) for r in back) == [
        (i * 10 + j, f"v{i}_{j}") for i in range(3) for j in range(10)
    ]
    epochs = pgc.run_psql(
        conninfo, f'SELECT count(*) FROM "{table}__epochs"'
    ).strip()
    assert int(epochs) >= 2  # maxFilesPerTrigger=1 -> >=3 batches (some may be empty)


def test_streaming_sink_replayed_epoch_is_exactly_once(spark, conninfo):
    """Commit the SAME batchId twice with fresh stagings (what Structured
    Streaming does when a batch is replayed after a failure between sink
    commit and checkpoint write): the second commit must drop its
    stagings without inserting."""
    import pyarrow as pa

    from pyspark.sql import types as T

    from data_preparation_plugin_spark.sources.python_datasource import (
        _PgCopyStreamWriter,
    )

    table = "dpp_pyds_replay"
    for t in (table, f"{table}__epochs"):
        pgc.run_psql(conninfo, f'DROP TABLE IF EXISTS "{t}"')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    w = _PgCopyStreamWriter(
        {"conninfo": conninfo, "table": table}, schema, False
    )

    def staged(vals):
        batch = pa.record_batch(
            {"id": pa.array([v[0] for v in vals], pa.int64()),
             "s": pa.array([v[1] for v in vals], pa.string())}
        )
        return w.write(iter([batch]))

    w.commit([staged([(1, "a"), (2, "b")])], batchId=7)
    w.commit([staged([(1, "a"), (2, "b")])], batchId=7)  # replay
    w.commit([staged([(3, "c")])], batchId=8)
    rows = pgc.run_psql(
        conninfo, f'SELECT count(*) FROM "{table}"'
    ).strip()
    assert rows == "3"  # the replayed epoch inserted nothing
    leftovers = pgc.run_psql(
        conninfo,
        "SELECT count(*) FROM information_schema.tables "
        f"WHERE table_name LIKE '{table}__stage_%'",
    ).strip()
    assert leftovers == "0"  # replay stagings dropped, not leaked


def test_streaming_sink_distinct_queries_share_target(spark, conninfo):
    """The ledger is keyed on (query_id, batch_id), not batch_id alone:
    a second streaming query (or a restart with a fresh checkpoint,
    where batch ids restart at 0) writing to the same target must NOT
    have its epochs swallowed by the first query's ledger rows
    (ADVICE r12 — the silent data-loss path)."""
    import pyarrow as pa

    from pyspark.sql import types as T

    from data_preparation_plugin_spark.sources.python_datasource import (
        _PgCopyStreamWriter,
    )

    table = "dpp_pyds_two_queries"
    for t in (table, f"{table}__epochs"):
        pgc.run_psql(conninfo, f'DROP TABLE IF EXISTS "{t}"')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )

    def writer(qid):
        return _PgCopyStreamWriter(
            {"conninfo": conninfo, "table": table, "query_id": qid},
            schema,
            False,
        )

    def staged(w, vals):
        batch = pa.record_batch(
            {"id": pa.array([v[0] for v in vals], pa.int64()),
             "s": pa.array([v[1] for v in vals], pa.string())}
        )
        return w.write(iter([batch]))

    a, b = writer("query-a"), writer("query-b")
    a.commit([staged(a, [(1, "a")])], batchId=0)
    # Same batchId, different query: must land (the r12 bug dropped it).
    b.commit([staged(b, [(2, "b")])], batchId=0)
    # Replay within each query still exactly-once.
    a.commit([staged(a, [(1, "a")])], batchId=0)
    b.commit([staged(b, [(9, "z")])], batchId=1)
    rows = pgc.run_psql(
        conninfo, f'SELECT id FROM "{table}" ORDER BY id'
    ).split()
    assert rows == ["1", "2", "9"]
    ledger = pgc.run_psql(
        conninfo,
        f'SELECT query_id || \'|\' || batch_id FROM "{table}__epochs" '
        "ORDER BY 1",
    ).split()
    assert ledger == ["query-a|0", "query-b|0", "query-b|1"]


def test_streaming_sink_ledger_migrates_from_batchid_only(spark, conninfo):
    """A pre-(query_id) ledger left by an older build migrates in place:
    its rows get the 'default' identity, so an in-flight query that only
    ever used the fallback key stays exactly-once across the upgrade."""
    import pyarrow as pa

    from pyspark.sql import types as T

    from data_preparation_plugin_spark.sources.python_datasource import (
        _PgCopyStreamWriter,
    )

    table = "dpp_pyds_ledger_migrate"
    for t in (table, f"{table}__epochs"):
        pgc.run_psql(conninfo, f'DROP TABLE IF EXISTS "{t}"')
    # Old-shape ledger: batch 3 already committed, batch_id column only.
    pgc.run_psql(
        conninfo,
        f'CREATE TABLE "{table}__epochs" (batch_id BIGINT); '
        f'INSERT INTO "{table}__epochs" VALUES (3)',
    )
    schema = T.StructType([T.StructField("id", T.LongType())])
    w = _PgCopyStreamWriter({"conninfo": conninfo, "table": table}, schema, False)

    def staged(vals):
        return w.write(iter([pa.record_batch({"id": pa.array(vals, pa.int64())})]))

    w.commit([staged([30])], batchId=3)  # replay of the pre-upgrade epoch
    w.commit([staged([40])], batchId=4)  # genuinely new epoch
    rows = pgc.run_psql(conninfo, f'SELECT id FROM "{table}" ORDER BY id')
    assert rows.split() == ["40"]


def test_stage_failure_surfaces_psql_error_and_drops_staging(conninfo):
    """A mid-COPY psql death must (a) raise with psql's real error, never
    a bare BrokenPipeError, and (b) drop its own staging table — a failed
    task produces no commit message, so driver-side abort() could never
    clean it up (ADVICE r12 follow-on)."""
    import pyarrow as pa

    from pyspark.sql import types as T

    from data_preparation_plugin_spark.sources.python_datasource import (
        _stage_arrow_batches,
    )

    table = "dpp_pyds_stage_err"
    schema = T.StructType([T.StructField("id", T.LongType())])
    bad = pa.record_batch({"id": pa.array(["not a number"], pa.string())})
    with pytest.raises(RuntimeError, match="invalid input syntax"):
        _stage_arrow_batches(conninfo, table, schema, iter([bad]))
    leftovers = pgc.run_psql(
        conninfo,
        "SELECT count(*) FROM information_schema.tables "
        f"WHERE table_name LIKE '{table}__stage_%'",
    ).strip()
    assert leftovers == "0"


def test_reflection_scoped_to_current_schema(conninfo):
    """A same-named table in another schema must not merge its columns
    into the reflected DDL (ADVICE r12)."""
    table = "dpp_pyds_shadow"
    pgc.run_psql(
        conninfo,
        f'DROP TABLE IF EXISTS "{table}"; '
        "CREATE SCHEMA IF NOT EXISTS dpp_other; "
        f'DROP TABLE IF EXISTS dpp_other."{table}"; '
        f'CREATE TABLE "{table}" (id bigint); '
        f'CREATE TABLE dpp_other."{table}" (id bigint, extra text)',
    )
    assert _reflect_schema(conninfo, table) == "id bigint"
    assert (
        _reflect_schema(conninfo, table, pg_schema="dpp_other")
        == "id bigint, extra string"
    )


def test_streaming_sink_rejects_complete_mode(spark, conninfo):
    from pyspark.sql import types as T

    from data_preparation_plugin_spark.sources.python_datasource import (
        _PgCopyStreamWriter,
    )

    with pytest.raises(ValueError, match="append-only"):
        _PgCopyStreamWriter(
            {"conninfo": conninfo, "table": "x"},
            T.StructType([T.StructField("id", T.LongType())]),
            True,
        )


def test_reflection_rejects_unknown_types(conninfo):
    table = "dpp_pyds_badtype"
    pgc.run_psql(conninfo, f'DROP TABLE IF EXISTS "{table}"')
    pgc.run_psql(conninfo, f'CREATE TABLE "{table}" (pt point)')
    with pytest.raises(TypeError, match="point"):
        _reflect_schema(conninfo, table)


def test_stage_python_side_failure_drops_staging_and_kills_psql(conninfo):
    """The OTHER leak path (r13 review): when the failure originates on
    the PYTHON side mid-COPY — upstream iterator error, task kill — the
    staging table must still be dropped and the psql child terminated
    (so EOF can't commit a partial stage). The psql-death path is
    covered above; this pins the symmetric one."""
    import pyarrow as pa

    from pyspark.sql import types as T

    from data_preparation_plugin_spark.sources.python_datasource import (
        _stage_arrow_batches,
    )

    table = "dpp_pyds_pyerr"
    schema = T.StructType([T.StructField("id", T.LongType())])

    def batches():
        yield pa.record_batch({"id": pa.array([1, 2], pa.int64())})
        raise ValueError("upstream task failure")

    with pytest.raises(ValueError, match="upstream task failure"):
        _stage_arrow_batches(conninfo, table, schema, batches())
    leftovers = pgc.run_psql(
        conninfo,
        "SELECT count(*) FROM information_schema.tables "
        f"WHERE table_name LIKE '{table}__stage_%'",
    ).strip()
    assert leftovers == "0"


def test_stage_ddl_then_spawn_failure_drops_staging(conninfo, monkeypatch):
    """The THIRD leak path (ADVICE r13): the staging DDL runs BEFORE
    TemporaryFile()/Popen, so a spawn failure (EMFILE, ENOMEM, exec
    failure) between them leaves ``proc is None`` with a freshly created
    stage table. The cleanup must gate on the DDL having run, not on the
    child existing. Simulated at ``tempfile.TemporaryFile`` (between the
    DDL and Popen) because ``run_psql``'s own ``subprocess.run`` calls
    ``Popen`` internally — patching Popen would break the DDL too."""
    import tempfile as _tempfile

    import pyarrow as pa

    from pyspark.sql import types as T

    from data_preparation_plugin_spark.sources.python_datasource import (
        _stage_arrow_batches,
    )

    table = "dpp_pyds_spawnerr"
    schema = T.StructType([T.StructField("id", T.LongType())])
    batch = pa.record_batch({"id": pa.array([1], pa.int64())})

    def no_fd(*args, **kwargs):
        raise OSError("too many open files")

    monkeypatch.setattr(_tempfile, "TemporaryFile", no_fd)
    with pytest.raises(OSError, match="too many open files"):
        _stage_arrow_batches(conninfo, table, schema, iter([batch]))
    monkeypatch.undo()
    leftovers = pgc.run_psql(
        conninfo,
        "SELECT count(*) FROM information_schema.tables "
        f"WHERE table_name LIKE '{table}__stage_%'",
    ).strip()
    assert leftovers == "0"


def test_stream_sketch_sink_exactly_once_cells(spark, conninfo):
    """The sketch-dashboard round trip (r13 verdict item 5): after the
    registered query replays the histogram stream through the streaming
    COPY sink, the PG serving table must hold every (window, type, bin)
    cell EXACTLY once — append mode emits each finalized window in one
    epoch, and the (query_id, batch_id) ledger must show one committed
    row per epoch with no duplicates even though emission spans several
    micro-batches."""
    from data_preparation_plugin_spark.plans.events import (
        sink_stream_quantile_pg,
    )

    from data_preparation_plugin_spark.plans.events import (
        quantile_sink_table,
    )

    sink_stream_quantile_pg(spark, "/root/testdata/sf0.001")
    table = quantile_sink_table("/root/testdata/sf0.001")
    dup_cells = pgc.run_psql(
        conninfo,
        f'SELECT count(*) FROM (SELECT window_start, event_type, bin '
        f'FROM "{table}" GROUP BY 1, 2, 3 HAVING count(*) > 1) d',
    ).strip()
    assert dup_cells == "0"
    ledger_dups = pgc.run_psql(
        conninfo,
        f'SELECT count(*) FROM (SELECT batch_id, query_id '
        f'FROM "{table}__epochs" GROUP BY 1, 2 HAVING count(*) > 1) d',
    ).strip()
    assert ledger_dups == "0"
    epochs = int(
        pgc.run_psql(
            conninfo, f'SELECT count(*) FROM "{table}__epochs"'
        ).strip()
    )
    assert epochs >= 1
    qid = pgc.run_psql(
        conninfo,
        f'SELECT DISTINCT query_id FROM "{table}__epochs"',
    ).strip()
    assert qid == "sink_stream_quantile_pg"


def test_quantile_sink_cleans_checkpoint_and_isolates_fixtures(spark):
    """The sink must not accumulate /tmp checkpoint dirs across runs, and
    its PG table name must differ per fixture so concurrent runs on one
    PG instance cannot clobber each other (r15 ADVICE)."""
    import glob

    from data_preparation_plugin_spark.plans.events import (
        quantile_sink_table,
        sink_stream_quantile_pg,
    )

    before = set(glob.glob("/tmp/dpp-quantile-pg-ckpt-*"))
    sink_stream_quantile_pg(spark, "/root/testdata/sf0.001").collect()
    leaked = set(glob.glob("/tmp/dpp-quantile-pg-ckpt-*")) - before
    assert leaked == set(), leaked
    assert quantile_sink_table("/root/testdata/sf0.001") != quantile_sink_table(
        "/root/testdata/sf0.01"
    )


def test_stream_pg_sink_restart_processes_only_the_delta(
    spark, conninfo, tmp_path
):
    """Exactly-once ACROSS RESTART for the ledgered COPY sink: a stopped
    streaming query restarted from the same checkpoint (same query_id)
    must ingest only files that arrived during downtime — the PG target
    holds every event exactly once and the ledger holds both runs'
    epochs without collisions."""
    from data_preparation_plugin_spark.plans.registry import load_table
    from data_preparation_plugin_spark.streaming import events_stream

    spark.dataSource.register(PgCopyDataSource)
    src = tmp_path / "src"
    src.mkdir()
    full = load_table(
        spark, "/root/testdata/sf0.001", "events"
    ).select("event_id", "user_id", "event_type")
    half1 = full.where("user_id % 2 = 0")
    half2 = full.where("user_id % 2 = 1")
    half1.coalesce(2).write.mode("append").parquet(str(src))

    table = "dpp_pyds_stream_restart"
    pgc.run_psql(
        conninfo,
        f'DROP TABLE IF EXISTS "{table}"; '
        f'DROP TABLE IF EXISTS "{table}__epochs"',
    )
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            events_stream(
                spark,
                str(src),
                schema="event_id LONG, user_id LONG, event_type STRING",
                max_files_per_trigger=1,
            )
            .writeStream.format("dpp_pg_copy")
            .option("conninfo", conninfo)
            .option("table", table)
            .option("query_id", "restart-test")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = int(
        pgc.run_psql(conninfo, f'SELECT count(*) FROM "{table}"').strip()
    )
    assert n1 == half1.count()
    epochs1 = int(
        pgc.run_psql(
            conninfo, f'SELECT count(*) FROM "{table}__epochs"'
        ).strip()
    )
    # Downtime: the other half lands, then the SAME query restarts.
    half2.coalesce(2).write.mode("append").parquet(str(src))
    run_once()
    total = full.count()
    got = int(
        pgc.run_psql(conninfo, f'SELECT count(*) FROM "{table}"').strip()
    )
    distinct = int(
        pgc.run_psql(
            conninfo, f'SELECT count(DISTINCT event_id) FROM "{table}"'
        ).strip()
    )
    assert got == total and distinct == total  # no loss, no replay
    epochs2 = int(
        pgc.run_psql(
            conninfo, f'SELECT count(*) FROM "{table}__epochs"'
        ).strip()
    )
    assert epochs2 > epochs1  # the restart committed NEW epochs
    ledger_dups = pgc.run_psql(
        conninfo,
        f'SELECT count(*) FROM (SELECT batch_id, query_id FROM '
        f'"{table}__epochs" GROUP BY 1, 2 HAVING count(*) > 1) d',
    ).strip()
    assert ledger_dups == "0"
