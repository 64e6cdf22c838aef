"""Streaming twins of the batch event-time queries (plans/events.py).

SURVEY.md §2.B "Streaming": the ``events`` fixture is the driver's stream
table; the vocabulary is ``readStream`` → watermark → windowed aggregation /
session windows / stateful dedup → sink. Each function here is the
Structured Streaming form of a batch query in ``plans/events.py`` and the
test suite asserts batch/stream equivalence by replaying the fixture with
``trigger(availableNow=True)``.

Watermarks are explicit parameters: at 100 TB the watermark delay *is* the
state-size knob (events later than the delay are dropped; everything
younger is buffered in the state store), so operators never hardcode it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Schema of the events table (FIXTURES.md §B), required up front by
#: readStream (streaming sources cannot infer schemas). ``ts`` must be
#: TIMESTAMP (with local timezone): Spark watermarks reject TIMESTAMP_NTZ.
#: The engine pins the session timezone to UTC (session.py), so values
#: align exactly with the batch NTZ reads.
# ts must be TIMESTAMP (with-local-timezone): Spark rejects TIMESTAMP_NTZ
# event-time columns for watermarks (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
# The staged parquet stores wall-clock micros; under a UTC session the two
# types coincide, so bounded replays pin the session timezone to UTC for
# their duration (see plans/events._replay) to stay session-independent.
EVENTS_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, "
    "event_type STRING, value DOUBLE, props STRING"
)


def events_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of events parquet files in ``source_dir``.

    ``maxFilesPerTrigger`` bounds micro-batch size (ingestion rate
    control); tests use it to force multi-batch replays.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(source_dir)


def tumbling_aggregate(
    stream: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time aggregation — streaming twin of
    ``events_tumbling_hourly``.

    Same ``F.window`` operator as the batch form; the watermark bounds
    state and drops events later than the delay. ``countDistinct`` is not
    available incrementally, so the streaming form reports
    ``approx_count_distinct`` for users (documented divergence from the
    batch query, which reports the exact count).
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users_approx",
        )
    )


def enrich_aggregate(
    stream: "DataFrame",
    dim: "DataFrame",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
) -> "DataFrame":
    """Stream-static enrichment join + windowed aggregate.

    The canonical "enrich events with a dimension" streaming shape: the
    static side is joined per micro-batch with an explicit broadcast hint
    — no streaming state is kept for the join itself (only the downstream
    window aggregate holds state, bounded by the watermark). At scale the
    dimension is the small side by construction (users/segments vs the
    event firehose), exactly the case Spark's stream-static join is built
    for.
    """
    enriched = stream.withWatermark("ts", watermark).join(
        F.broadcast(dim), "user_id"
    )
    return (
        enriched.groupBy(F.window("ts", window_size).alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    stream: DataFrame,
    gap: str | Column = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user — streaming twin of ``events_sessionize``.

    Uses the native ``session_window`` operator (dynamic-gap state merging
    in the state store) rather than the batch lag/cumsum idiom. ``gap``
    may be a Column of duration strings for PER-EVENT gaps (the
    ``events_stream_session_dynamic`` surface).
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def sliding_aggregate(
    stream: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (overlapping) event-time windows per event type.

    Each event lands in ``size/slide`` windows; Spark expands the event to
    its window set *before* aggregation, so state per (window, key) stays
    one row and the watermark drops whole windows as they age out.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    max_delay_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner interval join: right events following left
    events for the same user within ``max_delay_minutes``.

    The attribution-join shape (purchase → subsequent click). Both sides
    carry a watermark — for an *inner* interval join Spark uses them plus
    the time-bound condition to expire buffered rows, so per-side state is
    bounded by (watermark + interval) of input, not the whole stream.
    Emits in append mode as soon as a match arrives; a bounded replay that
    must not drop cross-batch matches on out-of-order files should pass a
    watermark exceeding the replayed time span (the delay is a semantics
    knob, not a constant).
    """
    l = (
        left.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("left_id"),
            F.col("user_id"),
            F.col("ts").alias("left_ts"),
        )
    )
    r = (
        right.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("right_id"),
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("right_ts"),
        )
    )
    cond = (
        (l.user_id == r.r_user_id)
        & (r.right_ts > l.left_ts)
        & (
            r.right_ts
            <= l.left_ts + F.expr(f"INTERVAL {max_delay_minutes} MINUTES")
        )
    )
    return l.join(r, cond, "inner").select(
        "user_id",
        "left_id",
        "right_id",
        (F.unix_micros("right_ts") - F.unix_micros("left_ts")).alias(
            "delay_micros"
        ),
    )


def stateful_user_totals(
    stream: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    ``applyInPandasWithState`` (SURVEY.md §2.B "UDF surface" / streaming).

    The state is a single (count, sum) pair per user — constant size per
    key regardless of stream length — updated from Arrow batches and
    re-emitted each micro-batch the user appears in. This is the escape
    hatch for stateful logic the built-in operators can't express
    (per-key models, custom sessionization, decaying counters); built-ins
    stay preferable when they fit (tumbling/session aggs above).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            # .sum() skips NaN, so this IS coalesce(value, 0) summed —
            # without the per-key fillna copy (this callback runs once
            # per key per micro-batch, so per-call constants dominate).
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id LONG, n_events LONG, total_value DOUBLE",
            stateStructType="n LONG, total DOUBLE",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tws_user_profile_bucketed(
    stream: DataFrame,
    buckets: int = 64,
    watermark: str = "2 hours",
) -> DataFrame:
    """Bucketed-key form of :func:`tws_user_profile` — the v2 scale path.

    Same per-user profile (event count, running max, distinct type
    count), but the ``transformWithStateInPandas`` grouping key is
    ``user_id % buckets`` and the per-user accumulators live inside a
    single ``MapState`` keyed by user — so the v2 state-server protocol
    (one round trip per key-group per micro-batch, measured ~linear in
    distinct keys on the x8 probe) is paid at most ``buckets`` times per
    micro-batch. MapState is exactly the right primitive for the demux:
    point lookups and updates per user, no whole-bucket rewrite. Type
    sets ride a second MapState keyed by (user, type) — both maps are
    partition-local state-store column families on RocksDB.
    """
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class BucketProfiles(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # n_types is carried IN the per-user value and incremented on
            # first sight of a (user, type) key — never by iterating the
            # type map, which would be O(bucket state) per micro-batch.
            self._users = handle.getMapState(
                "user_totals", "user_id BIGINT", "n BIGINT, mx DOUBLE, nt BIGINT"
            )
            self._types = handle.getMapState(
                "user_types", "k STRING", "one TINYINT"
            )
            # Worker-local POSITIVE cache over _types membership. A key
            # enters the cache ONLY from the containsKey-true branch —
            # i.e. a marker some PRIOR batch committed — never right
            # after this batch's own uncommitted write, so the cached
            # fact ("marker committed") holds even if a processor
            # instance outlived a rolled-back batch and replayed it
            # (ADVICE r12). In practice pyspark re-deserializes the
            # processor per task, so the cache is per-task/intra-batch;
            # the invariant just doesn't depend on that. Restart or
            # rescheduling empties it and falls back to containsKey —
            # never wrong, only cold. Memory is one short string per
            # distinct committed (user, type) re-seen by this worker.
            self._seen_types: set[str] = set()

        def handleInputRows(self, key, rows, timer_values):
            # Values written this batch are emitted from `current`, not
            # re-read from MapState — the final getValue-per-touched-user
            # pass was pure protocol overhead (r12).
            current: dict[int, tuple] = {}
            # Markers written by THIS (uncommitted) batch — dedups
            # repeats across pdf chunks without poisoning _seen_types,
            # whose entries must mean "committed by a prior batch".
            batch_writes: set[str] = set()
            for pdf in rows:
                grouped = pdf.groupby("user_id")
                sizes = grouped.size()
                maxes = grouped["value"].max()  # NaN-skipping, like v1
                new_types: dict[int, int] = {}
                for uid, t in (
                    pdf[["user_id", "event_type"]]
                    .drop_duplicates()
                    .itertuples(index=False)
                ):
                    uid = int(uid)
                    mk = f"{uid}|{t}"
                    if mk in self._seen_types or mk in batch_writes:
                        continue
                    if self._types.containsKey((mk,)):
                        # Confirmed committed by a prior batch — only
                        # this branch may populate the cache.
                        self._seen_types.add(mk)
                    else:
                        self._types.updateValue((mk,), (1,))
                        batch_writes.add(mk)
                        new_types[uid] = new_types.get(uid, 0) + 1
                for uid, cnt in sizes.items():
                    uid = int(uid)
                    # getValue returns None when absent: one round trip,
                    # not containsKey + getValue.
                    prev = (
                        current.get(uid)
                        or self._users.getValue((uid,))
                        or (0, None, 0)
                    )
                    n = prev[0] + int(cnt)
                    mx = prev[1]
                    nt = prev[2] + new_types.get(uid, 0)
                    m = maxes[uid]
                    if pd.notna(m) and (mx is None or float(m) > mx):
                        mx = float(m)
                    self._users.updateValue((uid,), (n, mx, nt))
                    current[uid] = (n, mx, nt)
            out = sorted(current)
            yield pd.DataFrame(
                {
                    "user_id": out,
                    "n_events": [current[u][0] for u in out],
                    "max_value": [current[u][1] for u in out],
                    "n_types": [current[u][2] for u in out],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.withWatermark("ts", watermark)
        .withColumn("state_bucket", F.pmod(F.col("user_id"), F.lit(buckets)))
        .groupBy("state_bucket")
        .transformWithStateInPandas(
            statefulProcessor=BucketProfiles(),
            outputStructType=(
                "user_id BIGINT, n_events BIGINT, "
                "max_value DOUBLE, n_types BIGINT"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )


def stateful_user_totals_bucketed(
    stream: DataFrame,
    buckets: int = 64,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user running totals with a BUCKETED state key — the batched
    form of :func:`stateful_user_totals`.

    The round-8 isolation measured ``applyInPandasWithState``'s cost as
    ~0.7 ms per key-group Arrow invocation — with per-user keys that is
    one protocol round trip per (user, micro-batch), and the machinery,
    not the arithmetic, dominated the ×5.3 scale probe. Here the state
    key is ``user_id % buckets``, so each micro-batch drives at most
    ``buckets`` protocol invocations regardless of user cardinality; the
    callback demuxes per user with a vectorized pandas group-by and
    keeps the whole bucket's accumulators in one state row (parallel
    arrays — constant width per USER, ``buckets``-way partition-
    parallel). Snapshots are emitted only for users touched in the
    micro-batch, exactly like the per-user form, so the two variants
    are output-equivalent.

    Bucket count is the shuffle-parallelism / protocol-amortization
    trade: at 100 TB pick ``buckets`` ≈ a few × total cores so every
    state partition stays busy while invocations stay batch-sized.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        users, ns, totals = (
            state.get if state.exists else ([], [], [])
        )
        acc = {
            int(u): (int(n), float(t))
            for u, n, t in zip(users, ns, totals)
        }
        touched: set[int] = set()
        for pdf in pdf_iter:
            grouped = pdf.groupby("user_id")["value"]
            sizes = grouped.size()
            # .sum() skips NaN, so this IS coalesce(value, 0) summed.
            sums = grouped.sum()
            for uid, cnt in sizes.items():
                n0, t0 = acc.get(int(uid), (0, 0.0))
                acc[int(uid)] = (
                    n0 + int(cnt),
                    t0 + float(sums[uid]),
                )
                touched.add(int(uid))
        state.update(
            (
                list(acc.keys()),
                [n for n, _t in acc.values()],
                [t for _n, t in acc.values()],
            )
        )
        out = sorted(touched)
        yield pd.DataFrame(
            {
                "user_id": out,
                "n_events": [acc[u][0] for u in out],
                "total_value": [round(acc[u][1], 2) for u in out],
            }
        )

    return (
        stream.withWatermark("ts", watermark)
        .withColumn("state_bucket", F.pmod(F.col("user_id"), F.lit(buckets)))
        .groupBy("state_bucket")
        .applyInPandasWithState(
            update,
            outputStructType="user_id LONG, n_events LONG, total_value DOUBLE",
            stateStructType=(
                "users ARRAY<LONG>, ns ARRAY<LONG>, totals ARRAY<DOUBLE>"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful streaming dedup on ``keys`` (default ``event_id``).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes — bounded state, unlike an unbounded distinct.
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def idempotent_batch_writer(table: str):
    """A ``foreachBatch`` body whose replays cannot duplicate rows.

    ``foreachBatch`` is at-least-once: a micro-batch that fails after a
    partial write, or a restart between the write and the checkpoint
    commit, re-runs with the same ``batch_id``. A blind append would
    duplicate those rows; instead each batch lands in its own
    ``_batch_id`` partition under dynamic partition overwrite, so a
    replay overwrites exactly its own partition and nothing else —
    idempotence keyed on the one value Spark guarantees stable across
    retries.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        df = batch_df.withColumn("_batch_id", F.lit(batch_id).cast("long"))
        sess = df.sparkSession
        # Scope the dynamic-overwrite mode to this write: a bare conf.set
        # would leak into every later write on the shared session and turn
        # an unrelated static-mode overwrite into a partial one.
        saved = sess.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            if sess.catalog.tableExists(table):
                # Position-based: _batch_id is last in both df and table.
                df.write.mode("overwrite").insertInto(table)
            else:
                df.write.partitionBy("_batch_id").format("parquet").saveAsTable(
                    table
                )
        finally:
            if saved is None:
                sess.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                sess.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", saved
                )

    return write_batch


def stream_to_table(
    stream: DataFrame,
    table: str,
    spark: SparkSession,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Sink a stream into a catalog table via ``foreachBatch``.

    The production sink shape: each micro-batch lands in a
    ``_batch_id``-keyed partition (see :func:`idempotent_batch_writer`),
    with restart bookkeeping from the checkpoint directory — replayed
    batches overwrite themselves instead of appending duplicates. Works
    for any non-complete-mode stream (raw events, deduped streams,
    update-mode stateful output).
    """

    writer = (
        stream.writeStream.foreachBatch(idempotent_batch_writer(table))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query


def run_to_memory(
    stream: DataFrame,
    query_name: str,
    spark: SparkSession,
    output_mode: str = "append",
) -> DataFrame:
    """Replay a stream to completion into an in-memory table (test sink).

    ``availableNow`` processes all currently-available input in bounded
    micro-batches, then stops — the deterministic-replay harness from
    SURVEY.md §7.3. Aggregations should pass ``output_mode="complete"``:
    in append mode a window is only emitted once the watermark passes it,
    which never happens for the trailing windows of a bounded replay.
    """
    query = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(query_name)


def tws_user_profile(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user profile via ``transformWithStateInPandas`` (Spark 4 API).

    The successor API to ``applyInPandasWithState`` (SPARK-46815,
    "arbitrary stateful processing v2"): typed, composable state
    primitives on a ``StatefulProcessor`` instead of one opaque tuple.
    This processor carries TWO independent states per user — a
    ``ValueState`` (event count + running max value) and a ``MapState``
    (per-event-type counts, whose key cardinality is the bounded type
    vocabulary) — and re-emits the cumulative profile snapshot every
    micro-batch the user appears in (update mode).

    Scale: state lives in the state store keyed by user — O(1) + O(types)
    per key, partition-parallel, RocksDB-backed on a real cluster; the
    Arrow transport batches rows per key exactly like the v1 operator.

    Dependency gate: the v2 API's state-server protocol needs a
    ``protobuf`` runtime; ``streaming/protobuf_compat.ensure_protobuf``
    locates the stock package or stages a pure-Python donor runtime for
    the driver, the task workers, and the TWS driver-worker process.
    Exercised by the registry query ``events_stream_tws_profile`` (on
    the RocksDB state store — the v2 protocol needs one column family
    per state variable) and by
    tests/test_streaming.py::test_tws_user_profile_matches_batch.
    """
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # n_types rides IN the value state and is incremented on
            # first sight of a type (its per-type count read returns
            # None) — counting by iterating MapState.keys() would be an
            # O(type vocabulary) state-server walk per active user per
            # batch (r12: removing it cut the per-user replay ~2x).
            self._totals = handle.getValueState(
                "totals", "n BIGINT, mx DOUBLE, nt BIGINT"
            )
            self._types = handle.getMapState(
                "type_counts", "event_type STRING", "cnt BIGINT"
            )

        def handleInputRows(self, key, rows, timer_values):
            # get()/getValue() return None when absent — one protocol
            # round trip instead of exists()+get() (each state op is a
            # state-server round trip; see SCALE.md on the per-key cost).
            n, mx, nt = self._totals.get() or (0, None, 0)
            for pdf in rows:
                n += len(pdf)
                vals = pdf["value"].fillna(0.0)
                if len(vals):
                    batch_mx = float(vals.max())
                    mx = batch_mx if mx is None or batch_mx > mx else mx
                for t, cnt in pdf["event_type"].value_counts().items():
                    prev = self._types.getValue((t,))
                    if prev is None:
                        nt += 1
                    self._types.updateValue((t,), ((prev or (0,))[0] + int(cnt),))
            self._totals.update((n, mx, nt))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "max_value": [mx],
                    "n_types": [nt],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserProfile(),
            outputStructType=(
                "user_id BIGINT, n_events BIGINT, "
                "max_value DOUBLE, n_types BIGINT"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )


def interval_join_stream_outer(
    left: DataFrame,
    right: DataFrame,
    max_delay_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: matches plus abandonments.

    The outer attribution shape — purchases WITH their follow-up click
    when one exists, and emitted WITH NULLs once the watermark proves no
    click can still arrive. Unlike the inner form, outer results cannot
    emit on arrival: Spark buffers each left row until the watermark
    passes ``left_ts + interval``, so the watermark delay directly sets
    both the state bound and the null-emission latency. Rows whose
    expiry the watermark never passes (the tail of a bounded replay)
    are NOT emitted — a deterministic, documented property the
    registered query's oracle reproduces in closed form.
    """
    l = left.withWatermark("ts", watermark).select(
        F.col("event_id").alias("left_id"),
        F.col("user_id"),
        F.col("ts").alias("left_ts"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("event_id").alias("right_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("right_ts"),
    )
    cond = (
        (l.user_id == r.r_user_id)
        & (r.right_ts > l.left_ts)
        & (
            r.right_ts
            <= l.left_ts + F.expr(f"INTERVAL {max_delay_minutes} MINUTES")
        )
    )
    return l.join(r, cond, "leftOuter").select(
        "user_id",
        "left_id",
        "right_id",
        F.expr(
            "CAST(timestampdiff(MICROSECOND, left_ts, right_ts) AS BIGINT)"
        ).alias("delay_micros"),
    )


def chained_window_rollup(
    stream: DataFrame,
    inner_window: str = "15 minutes",
    outer_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """TWO stateful windowed aggregations chained in ONE streaming query.

    The multiple-stateful-operator support Spark added for exactly this
    pre-aggregation pattern: a fine-grained window (state bounded by the
    15-minute key space) feeds a coarse rollup window downstream —
    at firehose scale the inner aggregate collapses the stream BEFORE
    the wide hourly state, the same partial-aggregation physics as
    batch map-side combine. ``window_time`` re-derives the event-time
    column from the finalized inner window so the outer watermark
    propagates; append mode is required for chained stateful operators,
    so only watermark-finalized hours emit (the oracle models that
    cutoff).
    """
    inner = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", inner_window).alias("w15"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_15m"))
    )
    return (
        inner.groupBy(
            F.window(F.window_time("w15"), outer_window).alias("w"),
            "event_type",
        )
        .agg(
            F.sum("n_15m").alias("n_events"),
            F.count(F.lit(1)).alias("n_subwindows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_subwindows").cast("bigint").alias("n_subwindows"),
        )
    )


def tws_session_finalize(
    stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap sessions finalized by EVENT-TIME TIMERS (transformWithState).

    The third leg of the v2 stateful API after value/map state: TIMERS.
    Mid-stream sessions close exactly as in every sessionizer — a new
    event more than ``gap_minutes`` after the last one closes the open
    session in-row.  But the LAST session of a key has no next event to
    close it; the timer is the engine primitive for that tail: each
    batch re-registers an event-time timer at ``last_ts + gap``, and
    when the WATERMARK passes it, ``handleExpiredTimer`` fires, emits
    the session with ``closed_by='timer'``, and clears the state — the
    state store never accumulates dead sessions.  Batches are
    vectorized (numpy gap-split per key), and the one registered timer
    per key is tracked in the value state so re-registration deletes
    its predecessor.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_minutes * 60 * 1_000_000
    epoch = pd.Timestamp("1970-01-01")

    class SessionFinalize(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            # (start_us, last_us, n, timer_ms)
            self._sess = handle.getValueState(
                "sess", "start_us BIGINT, last_us BIGINT,"
                " n BIGINT, timer_ms BIGINT"
            )

        def handleInputRows(self, key, rows, timer_values):
            ts_us_parts = []
            for pdf in rows:
                ts_us_parts.append(
                    ((pdf["ts"] - epoch) // pd.Timedelta(microseconds=1))
                    .to_numpy(dtype="int64")
                )
            ts = np.sort(np.concatenate(ts_us_parts))
            state = self._sess.get()
            if state is not None:
                start, last, n, timer_ms = state
            else:
                start, last, n, timer_ms = None, None, 0, None
            out = []
            for t in ts.tolist():
                if last is not None and t - last >= gap_us:
                    out.append((key[0], start, last, n, "gap"))
                    start, last, n = t, t, 1
                else:
                    start = t if start is None else start
                    last, n = t, n + 1
            if timer_ms is not None:
                self._handle.deleteTimer(timer_ms)
            new_timer = last // 1000 + gap_minutes * 60 * 1000
            self._handle.registerTimer(new_timer)
            self._sess.update((start, last, n, new_timer))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "user_id", "start_us", "end_us", "n_events",
                        "closed_by",
                    ],
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            state = self._sess.get()
            if state is not None:
                start, last, n, _timer = state
                self._sess.clear()
                yield pd.DataFrame(
                    [(key[0], start, last, n, "timer")],
                    columns=[
                        "user_id", "start_us", "end_us", "n_events",
                        "closed_by",
                    ],
                )

        def close(self) -> None:
            pass

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionFinalize(),
            outputStructType=(
                "user_id BIGINT, start_us BIGINT, end_us BIGINT,"
                " n_events BIGINT, closed_by STRING"
            ),
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def cms_cell_counts(
    stream: DataFrame,
    depth_params: tuple[tuple[int, int], ...],
    prime: int,
    width: int,
    key: str = "user_id",
) -> DataFrame:
    """Streaming count-min sketch as a BOUNDED-key aggregation.

    The deployment shape for streaming frequency over an unbounded key
    space (the per-user stateful processors are flagged ``didactic`` for
    exactly this reason — their state grows with active keys): each event
    increments ``depth`` counters chosen by modular hashes, so the whole
    sketch is a plain streaming group-by over depth x width cells —
    state bounded by construction, map-side combinable, mergeable across
    partitions and restarts by addition. No watermark is needed: cells
    never expire; complete-mode emission returns the current sketch.
    """
    dims = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for i, (a, b) in enumerate(depth_params)
        ]
    )
    cells = stream.select(
        F.explode(dims).alias("d"), F.col(key).alias("k")
    ).select(
        F.col("d.i").alias("i"),
        (
            (F.col("d.a") * F.col("k") + F.col("d.b")) % prime % width
        ).alias("bucket"),
    )
    return cells.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("c"))


def histogram_cell_counts(
    stream: DataFrame,
    bin_width: float,
    n_bins: int,
    key: str = "event_type",
    value: str = "value",
) -> DataFrame:
    """Streaming value histogram as a BOUNDED-key aggregation.

    The quantile twin of :func:`cms_cell_counts`: per-(key, bin) counts
    are mergeable across partitions, micro-batches and restarts by
    addition, so streaming percentile dashboards need no per-key value
    state at all — state is ``keys x n_bins`` cells whatever the event
    volume. NULL values are dropped explicitly (the two engines order
    NULL bins differently; a real pipeline routes them to a quarantine
    metric instead).
    """
    bin_col = F.least(
        F.floor(F.col(value) / bin_width), F.lit(n_bins - 1)
    ).cast("long")
    return (
        stream.filter(F.col(value).isNotNull())
        .select(F.col(key), bin_col.alias("bin"))
        .groupBy(key, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
