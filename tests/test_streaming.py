"""Streaming tests: replay the events fixture and assert batch equivalence.

SURVEY.md §7.2 step 6: the streaming slice is validated by running the same
aggregation in batch mode over the same input (deterministic replay with
``availableNow``).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_preparation_plugin_spark.plans import QUERIES
from data_preparation_plugin_spark.plans.registry import load_table
from data_preparation_plugin_spark.streaming import (
    dedup_within_watermark,
    events_stream,
    run_to_memory,
    sessionize_stream,
    sliding_aggregate,
    stateful_user_totals,
    tumbling_aggregate,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Stage the events fixture as a multi-file parquet directory so the
    file stream source replays it across several micro-batches."""
    path = str(tmp_path_factory.mktemp("events-stream"))
    load_table(spark, SF_DIR, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_tumbling_stream_matches_batch(spark, events_dir):
    stream = tumbling_aggregate(
        events_stream(spark, events_dir, max_files_per_trigger=2)
    )
    got = run_to_memory(
        stream, "t_tumbling", spark, output_mode="complete"
    ).withColumn("window_start", F.col("window_start").cast("timestamp_ntz"))
    batch = QUERIES["events_tumbling_hourly"].builder(spark, SF_DIR)
    s_rows = sorted(
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in got.collect()
    )
    b_rows = sorted(
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in batch.collect()
    )
    assert s_rows == b_rows


def test_session_stream_matches_batch_sessionize(spark, events_dir):
    """session_window output must carry the same per-session aggregates as
    the batch lag/cumsum sessionization (same 30-minute gap)."""
    stream = sessionize_stream(
        events_stream(spark, events_dir), gap="30 minutes"
    )
    got = run_to_memory(
        stream, "t_sessions", spark, output_mode="complete"
    ).withColumn("session_start", F.col("session_start").cast("timestamp_ntz"))
    batch = QUERIES["events_sessionize"].builder(spark, SF_DIR)
    s_rows = sorted(
        (r.user_id, r.session_start, r.n_events, r.session_value)
        for r in got.collect()
    )
    b_rows = sorted(
        (r.user_id, r.session_start, r.n_events, r.session_value)
        for r in batch.collect()
    )
    assert s_rows == b_rows


def test_sliding_stream_matches_batch(spark, events_dir):
    """Sliding windows (1h size, 30m slide) match the same agg in batch."""
    stream = sliding_aggregate(
        events_stream(spark, events_dir, max_files_per_trigger=2)
    )
    got = run_to_memory(
        stream, "t_sliding", spark, output_mode="complete"
    ).withColumn("window_start", F.col("window_start").cast("timestamp_ntz"))
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    s_rows = sorted(
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in got.collect()
    )
    b_rows = sorted(
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in batch.collect()
    )
    assert s_rows == b_rows


def test_stateful_user_totals_matches_batch(spark, events_dir):
    """applyInPandasWithState running totals converge to the batch group-by.

    The replay spans multiple micro-batches (maxFilesPerTrigger=2), so a
    user's totals are emitted several times with increasing counts; the
    final emission per user must equal the batch aggregate — proof the
    state carried correctly across batches.
    """
    stream = stateful_user_totals(
        events_stream(spark, events_dir, max_files_per_trigger=2)
    )
    got = run_to_memory(stream, "t_stateful", spark, output_mode="update")
    final = {}
    for r in got.collect():
        prev = final.get(r.user_id)
        if prev is None or r.n_events > prev[0]:
            final[r.user_id] = (r.n_events, r.total_value)
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    expected = {
        r.user_id: (r.n_events, r.total_value) for r in batch.collect()
    }
    assert final == expected


def test_dedup_within_watermark(spark, tmp_path):
    """Duplicated event_ids collapse to one row each."""
    events = load_table(spark, SF_DIR, "events").limit(200)
    doubled_dir = str(tmp_path / "doubled")
    events.unionByName(events).repartition(3).write.mode("overwrite").parquet(
        doubled_dir
    )
    stream = dedup_within_watermark(events_stream(spark, doubled_dir))
    got = run_to_memory(stream, "t_dedup", spark, output_mode="append")
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """An event older than the committed watermark is dropped.

    Micro-batch N filters with the watermark committed after batch N-1, so
    the sequence needs three batches: (recent events) -> (one more event to
    commit the advanced watermark) -> (the too-late event, dropped).
    """
    import os
    import time

    schema = (
        "event_id LONG, ts STRING, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )

    def mk(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp_ntz")
        )

    src = tmp_path / "late-src"
    batches = [
        ("0-recent", [(1, "2024-06-01 10:00:00", 1, "click", 1.0, None),
                      (2, "2024-06-01 11:00:00", 1, "click", 1.0, None)]),
        ("1-advance", [(3, "2024-06-01 12:00:00", 1, "click", 1.0, None)]),
        ("2-late", [(4, "2024-06-01 01:00:00", 1, "click", 1.0, None)]),
    ]
    now = time.time()
    # The file source orders by modification time: stamp each file strictly
    # newer than the previous so they land in separate micro-batches.
    for i, (name, rows) in enumerate(batches):
        mk(rows).coalesce(1).write.mode("overwrite").parquet(str(src / name))
        for root, _, files in os.walk(src / name):
            for f in files:
                os.utime(os.path.join(root, f), (now + 60 * i, now + 60 * i))
    stream = tumbling_aggregate(
        events_stream(spark, str(src / "*"), max_files_per_trigger=1),
        window_size="1 hour",
        watermark="1 hour",
    )
    # update mode: the watermark filter actively drops late input rows
    # (in complete mode watermarks have no effect — state is never evicted).
    got = run_to_memory(
        stream, "t_late", spark, output_mode="update"
    ).withColumn("window_start", F.col("window_start").cast("timestamp_ntz"))
    starts = sorted(r.window_start.isoformat() for r in got.collect())
    # The 01:00 late event must NOT appear; the three on-time windows must.
    assert starts == [
        "2024-06-01T10:00:00",
        "2024-06-01T11:00:00",
        "2024-06-01T12:00:00",
    ]


def test_stream_to_table_checkpointed_appends(spark, events_dir, tmp_path):
    """foreachBatch sink lands every micro-batch exactly once; a restart
    with the same checkpoint re-ingests nothing."""
    from data_preparation_plugin_spark.streaming import stream_to_table

    ckpt = str(tmp_path / "ckpt")
    table = "t_stream_sink"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        src = events_stream(spark, events_dir, max_files_per_trigger=2)
        stream_to_table(src, table, spark, ckpt)
        expected = load_table(spark, SF_DIR, "events").count()
        assert spark.table(table).count() == expected
        # Restart from the same checkpoint: no new input, no new rows.
        src2 = events_stream(spark, events_dir, max_files_per_trigger=2)
        stream_to_table(src2, table, spark, ckpt)
        assert spark.table(table).count() == expected
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_checkpoint_restart_processes_only_the_delta(spark, tmp_path):
    """Exactly-once across a stop/restart WITH new data: the restarted
    query resumes from the checkpoint, ingests only files that arrived
    while it was down, and the union holds every event exactly once —
    the recovery contract a production deployment leans on."""
    from data_preparation_plugin_spark.streaming import stream_to_table

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    full = load_table(spark, SF_DIR, "events")
    half1 = full.where("user_id % 2 = 0")
    half2 = full.where("user_id % 2 = 1")
    half1.coalesce(2).write.mode("append").parquet(str(src_dir))

    ckpt = str(tmp_path / "ckpt")
    table = "t_stream_recovery"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        stream_to_table(
            events_stream(spark, str(src_dir), max_files_per_trigger=1),
            table, spark, ckpt,
        )
        n1 = spark.table(table).count()
        assert n1 == half1.count()
        # "Downtime": more files land, then an identical query restarts
        # from the same checkpoint.
        half2.coalesce(2).write.mode("append").parquet(str(src_dir))
        stream_to_table(
            events_stream(spark, str(src_dir), max_files_per_trigger=1),
            table, spark, ckpt,
        )
        total = full.count()
        assert spark.table(table).count() == total  # no loss, no replay
        assert (
            spark.table(table).select("event_id").distinct().count() == total
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_batch_writer_replay_is_idempotent(spark):
    """Re-delivering a micro-batch (same batch_id) must not duplicate rows —
    foreachBatch is at-least-once, so the sink carries the idempotence."""
    from data_preparation_plugin_spark.streaming import idempotent_batch_writer

    table = "t_replay_sink"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        write = idempotent_batch_writer(table)
        b0 = load_table(spark, SF_DIR, "events").limit(40)
        b1 = load_table(spark, SF_DIR, "events").limit(100).subtract(b0)
        write(b0, 0)
        write(b1, 1)
        total = spark.table(table).count()
        # Replay both batches (failure-recovery path): counts unchanged.
        write(b1, 1)
        write(b0, 0)
        assert spark.table(table).count() == total
        # And the union of batches is intact, not clobbered.
        assert (
            spark.table(table).select("event_id").distinct().count() == total
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _tws_ready(spark) -> bool:
    """True when a protobuf runtime is importable or stageable — the
    self-healing gate from streaming/protobuf_compat.py."""
    from data_preparation_plugin_spark.streaming.protobuf_compat import (
        ensure_protobuf,
    )

    return ensure_protobuf(spark)


def test_tws_user_profile_matches_batch(spark, events_dir):
    """Spark 4 transformWithStateInPandas (ValueState + MapState) converges
    to the batch group-by across a multi-batch replay."""
    if not _tws_ready(spark):
        pytest.skip(
            "no protobuf runtime importable or stageable on this host"
        )
    from data_preparation_plugin_spark.streaming import tws_user_profile

    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = tws_user_profile(
        events_stream(spark, events_dir, max_files_per_trigger=2),
        watermark="30 days",
    )
    try:
        got = run_to_memory(stream, "t_tws", spark, output_mode="update")
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", saved
            )
    final = {}
    for r in got.collect():
        prev = final.get(r.user_id)
        if prev is None or r.n_events > prev[0]:
            final[r.user_id] = (r.n_events, r.max_value, r.n_types)
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.coalesce("value", F.lit(0.0))).alias("max_value"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )
    expected = {
        r.user_id: (r.n_events, r.max_value, r.n_types)
        for r in batch.collect()
    }
    assert final == expected


def test_tws_gate_reports_cleanly_without_protobuf(spark, events_dir):
    """Without protobuf the v2 operator must fail with the protocol
    ImportError surfaced by Spark, not silently wrong results."""
    if _tws_ready(spark):
        pytest.skip("protobuf runtime available (stock or staged): gating moot")
    from data_preparation_plugin_spark.streaming import tws_user_profile

    stream = tws_user_profile(
        events_stream(spark, events_dir, max_files_per_trigger=2),
        watermark="30 days",
    )
    with pytest.raises(Exception, match="protobuf|STREAM|crashed"):
        run_to_memory(stream, "t_tws_gate", spark, output_mode="update")


def test_sketch_cells_merge_across_micro_batch_sizes(spark, events_dir):
    """The sketch-state contract: CMS and histogram cells must be
    mergeable by addition, so replaying the same data in 1-file vs
    4-file micro-batches (4 merges vs 1) yields IDENTICAL cells — the
    property that makes restart/scale-out safe by construction."""
    from data_preparation_plugin_spark.plans.events import (
        HIST_BIN_W,
        HIST_BINS,
        STREAM_CMS_PARAMS,
        STREAM_CMS_PRIME,
        STREAM_CMS_WIDTH,
    )
    from data_preparation_plugin_spark.streaming import (
        cms_cell_counts,
        histogram_cell_counts,
    )

    def replay(builder, name, n_files):
        stream = builder(
            events_stream(spark, events_dir, max_files_per_trigger=n_files)
        )
        got = run_to_memory(
            stream, f"t_sketch_{name}_{n_files}", spark,
            output_mode="complete",
        )
        return sorted(tuple(r) for r in got.collect())

    cms = lambda s: cms_cell_counts(
        s, STREAM_CMS_PARAMS, STREAM_CMS_PRIME, STREAM_CMS_WIDTH
    )
    hist = lambda s: histogram_cell_counts(s, HIST_BIN_W, HIST_BINS)
    assert replay(cms, "cms", 1) == replay(cms, "cms", 4)
    assert replay(hist, "hist", 1) == replay(hist, "hist", 4)
