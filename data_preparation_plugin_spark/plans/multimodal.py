"""Multimodal-column capability queries.

Driver mandate: treat image/audio/video as opaque ``binary`` columns with
typed metadata, decoded via Arrow-batched Pandas UDFs over ``mapInPandas``.
The container has no image/audio libraries (per the environment contract),
so the *decode* is a clearly-marked deterministic fake — but the Spark-side
plumbing is real: a binary payload column, a ``mapInPandas`` UDF with an
explicit output schema, Arrow batches, and partition-parallel execution.
The fake decode is a pure function of the payload bytes, which lets the
DuckDB oracle verify the whole pipeline end-to-end — a stronger check than
rows-only.

Real decoders plug in at ``operators/multimodal.py`` behind an import-try.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_preparation_plugin_spark.plans.registry import load_table, register


@register(
    "multimodal_binary_meta",
    category="multimodal",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS payload_bytes,
           md5(text)                  AS payload_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary payload column.

    The payload is the utf-8 encoding of ``text`` standing in for image
    bytes; size + digest is the standard binary-column bookkeeping
    (computed JVM-side, the bytes never reach Python).
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("payload_bytes"),
        F.md5("text").alias("payload_md5"),
    )


#: Output schema of the fake decoder — what a real image decoder would emit.
_DECODE_SCHEMA = (
    "doc_id long, payload_bytes long, width int, height int, n_channels int"
)


def _fake_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """FAKE image decode: metadata derived deterministically from byte size.

    Stands in for PIL/libvips decode (unavailable in this container — see
    module docstring). A real decoder replaces the body; the signature,
    Arrow batch shape, and output schema are the production ones.
    """
    for pdf in batches:
        n = pdf["payload"].str.len().astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": n,
                "width": (n % 640 + 1).astype("int32"),
                "height": (n % 480 + 1).astype("int32"),
                "n_channels": (n % 3 + 1).astype("int32"),
            }
        )


@register(
    "multimodal_decode_meta",
    category="multimodal",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))                              AS payload_bytes,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER)   AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER)   AS height,
           CAST(octet_length(encode(text)) % 3 + 1 AS INTEGER)     AS n_channels
    FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode pipeline through ``mapInPandas`` (Arrow-batched).

    Exercises the real multimodal path: binary payload -> Arrow batch ->
    pandas UDF -> typed metadata, partition-parallel with no shuffle. The
    oracle reproduces the deterministic fake decode in SQL, verifying the
    UDF plumbing value-for-value.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(_fake_decode_batches, schema=_DECODE_SCHEMA)


@register(
    "multimodal_frame_sample",
    category="multimodal",
    oracle="""
    SELECT doc_id, unnest(range(0, n_frames)) AS frame_idx
    FROM (
        SELECT doc_id,
               octet_length(encode(text)) % 7 + 1 AS n_frames
        FROM documents
        WHERE doc_id % 50 = 0
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling shape: one row per (video, frame index).

    A video column decodes to N frames; sampling explodes a bounded frame
    index per row — the cardinality-controlled explode used before a
    per-frame feature UDF. Deterministic fake frame count from byte size.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    )
    n_frames = (
        F.octet_length(F.encode("text", "UTF-8")) % 7 + 1
    )
    return docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))
