"""Structured Streaming operators over the ``events`` stream table."""

from data_preparation_plugin_spark.streaming.events import (
    EVENTS_SCHEMA,
    dedup_within_watermark,
    enrich_aggregate,
    events_stream,
    idempotent_batch_writer,
    interval_join_stream,
    interval_join_stream_outer,
    run_to_memory,
    sessionize_stream,
    sliding_aggregate,
    stateful_user_totals,
    stateful_user_totals_bucketed,
    tws_user_profile,
    tws_user_profile_bucketed,
    stream_to_table,
    tumbling_aggregate,
)

__all__ = [
    "EVENTS_SCHEMA",
    "dedup_within_watermark",
    "enrich_aggregate",
    "events_stream",
    "idempotent_batch_writer",
    "interval_join_stream",
    "interval_join_stream_outer",
    "run_to_memory",
    "sessionize_stream",
    "sliding_aggregate",
    "stateful_user_totals",
    "stateful_user_totals_bucketed",
    "tws_user_profile",
    "tws_user_profile_bucketed",
    "stream_to_table",
    "tumbling_aggregate",
]
