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


def _synth_ppm_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic PPM (P6) image synthesis — the fake *capture* step.

    Dimensions and pixel bytes are pure functions of doc_id, so the
    decode's output (including pixel statistics) is reproducible in SQL.
    """
    import numpy as np

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            w = int(doc_id) % 16 + 4
            h = int(doc_id) % 12 + 3
            n = w * h * 3
            header = f"P6\n{w} {h}\n255\n".encode()
            k = np.arange(n, dtype=np.int64)
            body = ((int(doc_id) * 7 + k) % 256).astype(np.uint8).tobytes()
            payloads.append(header + body)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


@register(
    "multimodal_decode_ppm",
    category="multimodal",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               doc_id % 16 + 4 AS w,
               doc_id % 12 + 3 AS h
        FROM documents
    ), px AS (
        SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS k
        FROM dims
    )
    SELECT doc_id,
           CAST(3 + length(CAST(w AS VARCHAR)) + 1
                  + length(CAST(h AS VARCHAR)) + 1 + 4
                  + w * h * 3 AS BIGINT)        AS payload_bytes,
           CAST(w AS INTEGER)                   AS width,
           CAST(h AS INTEGER)                   AS height,
           CAST(3 AS INTEGER)                   AS n_channels,
           round(avg((doc_id * 7 + k) % 256), 4) AS mean_pixel
    FROM px
    GROUP BY doc_id, w, h
    """,
)
def multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, no codec library: binary PPM through mapInPandas.

    Two Arrow-batched passes, zero shuffles: a deterministic synthesizer
    writes real binary PPM (P6) images into a payload column (the fake
    *capture* — this container ships no camera either), then
    ``operators.multimodal.decode_ppm`` genuinely parses the header and
    pixel buffer with numpy and reports dimensions + mean pixel value.
    The oracle recomputes every output — including the pixel mean — from
    the synthesis function in SQL, so a single corrupted byte offset in
    the parser hash-fails the driver compare.
    """
    from data_preparation_plugin_spark.operators.multimodal import decode_ppm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_ppm_batches, schema="doc_id long, payload binary"
    )
    decoded = decode_ppm(payloads)
    return decoded.select(
        "doc_id",
        "payload_bytes",
        "width",
        "height",
        "n_channels",
        F.round("mean_pixel", 4).alias("mean_pixel"),
    )


@register(
    "multimodal_resize_ppm",
    category="multimodal",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               doc_id % 16 + 4 AS w,
               doc_id % 12 + 3 AS h
        FROM documents
    ), px AS (
        SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS k
        FROM dims
    )
    SELECT doc_id,
           CAST(w AS INTEGER)            AS width,
           CAST(h AS INTEGER)            AS height,
           CAST((w + 1) // 2 AS INTEGER) AS out_width,
           CAST((h + 1) // 2 AS INTEGER) AS out_height,
           avg((doc_id * 7 + k) % 256)   AS mean_pixel_resized
    FROM px
    WHERE ((k // 3) // w) % 2 = 0
      AND ((k // 3) % w) % 2 = 0
    GROUP BY doc_id, w, h
    """,
)
def multimodal_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: strided nearest-neighbor over decoded pixels.

    The preprocessing step between decode and feature extraction: the
    synthesized binary PPMs are parsed and genuinely subsampled
    (``img[::2, ::2, :]`` on the numpy pixel array), and the mean over the
    *resampled* pixels is value-checked against the oracle's closed-form
    reconstruction of exactly the even-row/even-column pixel set — a
    wrong stride, axis order, or channel handling shifts the sampled set
    and hash-fails. Pixel sums are integers below 2^53, so the float64
    mean is exact in any summation order; no rounding needed.
    """
    from data_preparation_plugin_spark.operators.multimodal import (
        resize_ppm_nearest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_ppm_batches, schema="doc_id long, payload binary"
    )
    return resize_ppm_nearest(payloads, stride=2)


def _synth_wav_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic canonical PCM WAV synthesis — the fake *capture* step.

    16-bit mono 8 kHz; sample values are a pure function of doc_id, so
    every decoded statistic is reproducible in SQL.
    """
    import struct

    import numpy as np

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            n = d % 500 + 100
            samples = (
                ((d * 31 + 17 * np.arange(n, dtype=np.int64)) % 65536) - 32768
            ).astype("<i2")
            data = samples.tobytes()
            header = struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF",
                36 + len(data),
                b"WAVE",
                b"fmt ",
                16,
                1,      # PCM
                1,      # mono
                8000,   # sample rate
                16000,  # byte rate
                2,      # block align
                16,     # bits per sample
                b"data",
                len(data),
            )
            payloads.append(header + data)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


@register(
    "multimodal_decode_wav",
    category="multimodal",
    oracle="""
    WITH sam AS (
        SELECT doc_id,
               doc_id % 500 + 100 AS n,
               unnest(range(0, doc_id % 500 + 100)) AS i
        FROM documents
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER)              AS sample_rate,
           CAST(1 AS INTEGER)                 AS n_channels,
           CAST(16 AS INTEGER)                AS bits_per_sample,
           CAST(n AS BIGINT)                  AS n_samples,
           CAST(n * 125 AS BIGINT)            AS duration_us,
           avg((doc_id * 31 + i * 17) % 65536 - 32768) AS mean_sample,
           CAST(min((doc_id * 31 + i * 17) % 65536 - 32768) AS INTEGER)
                                              AS min_sample,
           CAST(max((doc_id * 31 + i * 17) % 65536 - 32768) AS INTEGER)
                                              AS max_sample
    FROM sam
    GROUP BY doc_id, n
    """,
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, no codec library: canonical PCM WAV end-to-end.

    The audio twin of ``multimodal_decode_ppm``: a synthesizer writes
    genuine RIFF/WAVE binaries (44-byte canonical header + int16 PCM),
    then ``operators.multimodal.decode_wav`` parses the header with
    ``struct`` and the sample buffer with numpy, reporting format fields,
    duration, and sample statistics. Every output — including the exact
    float64 sample mean — is reconstructed by the oracle in closed form,
    so a single wrong header offset or endianness mistake hash-fails.
    Two chained ``mapInPandas`` passes, Arrow-batched, zero shuffle.
    """
    from data_preparation_plugin_spark.operators.multimodal import decode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_wav_batches, schema="doc_id long, payload binary"
    )
    return decode_wav(payloads)


#: Number of distinct images behind the 500 docs in the phash-dedup
#: fixture — doc_id % 40 keys the synthesis, so each image recurs ~12x.
PHASH_IMG_KEYS = 40


def _synth_dup_ppm_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """PPM synthesis keyed on ``doc_id % PHASH_IMG_KEYS`` — the duplicated
    corpus for image dedup (same closed form as ``_synth_ppm_batches``,
    but many docs share one image)."""
    import numpy as np

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            img = int(doc_id) % PHASH_IMG_KEYS
            w = img % 16 + 4
            h = img % 12 + 3
            n = w * h * 3
            header = f"P6\n{w} {h}\n255\n".encode()
            k = np.arange(n, dtype=np.int64)
            body = ((img * 7 + k) % 256).astype(np.uint8).tobytes()
            payloads.append(header + body)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


@register(
    "multimodal_phash_dedup",
    category="multimodal",
    oracle=f"""
    WITH img AS (
        SELECT doc_id,
               doc_id % {PHASH_IMG_KEYS}            AS img,
               (doc_id % {PHASH_IMG_KEYS}) % 16 + 4 AS w,
               (doc_id % {PHASH_IMG_KEYS}) % 12 + 3 AS h
        FROM documents
    ), bits AS (
        SELECT doc_id, img, w, h,
               unnest(range(0, 32)) AS b
        FROM img
    ), grays AS (
        SELECT doc_id, b,
               ((b // 8) * h) // 4                    AS yi,
               ((b % 8) * w) // 9                     AS xi1,
               (((b % 8) + 1) * w) // 9               AS xi2,
               img, w
        FROM bits
    ), cmp AS (
        SELECT doc_id, b,
               ((img * 7 + (yi * w + xi1) * 3) % 256)
             + ((img * 7 + (yi * w + xi1) * 3 + 1) % 256)
             + ((img * 7 + (yi * w + xi1) * 3 + 2) % 256) AS gray_l,
               ((img * 7 + (yi * w + xi2) * 3) % 256)
             + ((img * 7 + (yi * w + xi2) * 3 + 1) % 256)
             + ((img * 7 + (yi * w + xi2) * 3 + 2) % 256) AS gray_r
        FROM grays
    ), hashes AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN gray_l > gray_r
                             THEN CAST(1 AS BIGINT) << b ELSE 0 END)
                    AS BIGINT) AS phash
        FROM cmp
        GROUP BY doc_id
    )
    SELECT phash,
           count(*)    AS n_images,
           min(doc_id) AS keeper_doc_id
    FROM hashes
    GROUP BY phash
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL perceptual-hash image dedup: dHash + group-by, end-to-end.

    The image-corpus dedup pass a multimodal training pipeline runs
    before captioning/training: synthesize a *duplicated* image corpus
    (500 docs over {PHASH_IMG_KEYS} distinct PPMs), dHash every payload
    with real numpy decode + strided grayscale resize (``operators.
    multimodal.dhash_ppm``), and collapse equal hashes exactly like
    ``dedup_exact_fingerprint`` does for text. The oracle recomputes all
    32 comparison bits per image in closed form from the synthesis
    function — a wrong resize index, channel order, or bit order changes
    the hash and fails the driver compare. Map-only until the final
    (phash) count shuffle, which moves 8-byte hashes, never pixels.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_dup_ppm_batches, schema="doc_id long, payload binary"
    )
    from data_preparation_plugin_spark.operators.multimodal import dhash_ppm

    return (
        dhash_ppm(payloads)
        .groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


@register(
    "multimodal_audio_features",
    category="multimodal",
    oracle="""
    WITH sam AS (
        SELECT doc_id,
               doc_id % 500 + 100 AS n,
               unnest(range(0, doc_id % 500 + 100)) AS i
        FROM documents
    ), vals AS (
        SELECT doc_id, n, i,
               (doc_id * 31 + i * 17) % 65536 - 32768 AS s,
               CASE WHEN i >= 1
                    THEN (doc_id * 31 + (i - 1) * 17) % 65536 - 32768
               END AS s_prev
        FROM sam
    )
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(sum(CASE WHEN s * s_prev < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS zero_crossings,
           round(sqrt(sum(s * s) * 1.0 / max(n)), 4) AS rms
    FROM vals
    GROUP BY doc_id
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction: RMS energy + zero-crossing rate.

    The stage after ``multimodal_decode_wav`` in a speech-data pipeline —
    silence and noise gating run on exactly these two features. The
    synthesized PCM buffers are genuinely parsed and the features computed
    with numpy; the oracle rebuilds both from the synthesis closed form —
    sample sums of squares stay integer (exact below 2^53) so the RMS
    sqrt matches bit-for-bit, and the crossing count is pure integer
    logic. Chained mapInPandas, Arrow batches, zero shuffle.
    """
    from data_preparation_plugin_spark.operators.multimodal import (
        audio_features,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_wav_batches, schema="doc_id long, payload binary"
    )
    return audio_features(payloads)


@register(
    "multimodal_patch_extract",
    category="multimodal",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               doc_id % 16 + 4 AS w,
               doc_id % 12 + 3 AS h
        FROM documents
    ), px AS (
        SELECT doc_id, w, h, unnest(range(0, w * h)) AS p
        FROM dims
    ), g AS (
        SELECT doc_id,
               ((doc_id * 7 + p * 3) % 256)
             + ((doc_id * 7 + p * 3 + 1) % 256)
             + ((doc_id * 7 + p * 3 + 2) % 256)            AS gray,
               CASE WHEN (p // w) < h // 2 THEN 0 ELSE 1 END AS patch_y,
               CASE WHEN (p % w) < w // 2 THEN 0 ELSE 1 END AS patch_x
        FROM px
    )
    SELECT doc_id,
           CAST(patch_y AS BIGINT)  AS patch_y,
           CAST(patch_x AS BIGINT)  AS patch_x,
           CAST(count(*) AS BIGINT) AS n_px,
           round(sum(gray) * 1.0 / count(*), 4) AS mean_gray
    FROM g
    GROUP BY doc_id, patch_y, patch_x
    """,
)
def multimodal_patch_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image patchification: 2x2 quadrant features per decoded PPM.

    The ViT front-door (image → patch grid → per-patch features), run as
    genuine numpy slicing over parsed pixel buffers in ``mapInPandas``.
    Quadrant boundaries are ``h//2``/``w//2`` (uneven halves for odd
    dimensions — the oracle reproduces the same split), and the gray mean
    is an exact integer sum divided once, so both engines agree to the
    4dp round. Bounded 4× fan-out per image, zero shuffle — the plan a
    per-patch embedding UDF slots straight into.
    """
    from data_preparation_plugin_spark.operators.multimodal import (
        extract_patches,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_ppm_batches, schema="doc_id long, payload binary"
    )
    return extract_patches(payloads)


def _frame_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-frame feature extraction over synthesized frame pixels.

    The *capture* is the deterministic fake (pixels are a pure function
    of (doc_id, frame_idx) — same contract as ``_synth_ppm_batches``);
    the *extraction* is real vectorized numpy over the decoded array,
    exactly what a production per-frame featurizer does after a codec
    decode. Integer sums/maxes so downstream pooling is order-exact.
    """
    import numpy as np

    for pdf in batches:
        sums, maxes, npxs = [], [], []
        for doc_id, fi in zip(pdf["doc_id"], pdf["frame_idx"]):
            w = (int(doc_id) + int(fi)) % 8 + 4
            h = int(doc_id) % 6 + 3
            n = w * h * 3
            k = np.arange(n, dtype=np.int64)
            px = (int(doc_id) * 7 + int(fi) * 13 + k) % 256
            sums.append(int(px.sum()))
            maxes.append(int(px.max()))
            npxs.append(n)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "frame_idx": pdf["frame_idx"],
                "f_sum": pd.Series(sums, dtype="int64"),
                "f_max": pd.Series(maxes, dtype="int32"),
                "n_px": pd.Series(npxs, dtype="int64"),
            }
        )


@register(
    "multimodal_video_temporal_pool",
    category="multimodal",
    oracle="""
    WITH vids AS (
        SELECT doc_id,
               octet_length(encode(text)) % 7 + 1 AS n_frames
        FROM documents WHERE doc_id % 10 = 0
    ), frames AS (
        SELECT doc_id, unnest(range(0, n_frames)) AS fi FROM vids
    ), px AS (
        SELECT doc_id, fi,
               (doc_id + fi) % 8 + 4 AS w,
               doc_id % 6 + 3        AS h
        FROM frames
    ), feat AS (
        SELECT doc_id, fi,
               CAST(sum((doc_id * 7 + fi * 13 + k) % 256) AS BIGINT) AS f_sum,
               CAST(max((doc_id * 7 + fi * 13 + k) % 256) AS INTEGER) AS f_max,
               CAST(w * h * 3 AS BIGINT) AS n_px
        FROM (SELECT doc_id, fi, w, h, unnest(range(0, w * h * 3)) AS k
              FROM px)
        GROUP BY doc_id, fi, w, h
    )
    SELECT doc_id,
           count(*)                                    AS n_frames,
           CAST((CAST(sum(f_sum) AS BIGINT) * 10000)
                // CAST(sum(n_px) AS BIGINT) AS BIGINT) AS mean_pixel_e4,
           max(f_max)                                  AS peak_pixel,
           CAST(max((f_sum * 10000) // n_px)
               - min((f_sum * 10000) // n_px) AS BIGINT) AS motion_range_e4
    FROM feat
    GROUP BY doc_id
    """,
)
def multimodal_video_temporal_pool(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Video shape end-to-end: frame sample -> per-frame features -> pooling.

    The full video-column pipeline composed from its registered pieces:
    ``multimodal_frame_sample``'s bounded explode produces one row per
    (video, frame), an Arrow-batched ``mapInPandas`` featurizer runs
    real numpy over each frame's pixel array (synthesized
    deterministically — the codec stays behind the
    ``operators/multimodal.py`` import gate), and temporal pooling
    aggregates per video: global mean brightness, peak pixel, and a
    motion proxy (range of per-frame means). All frame features are
    integers, so pooling is exact in any order and the SQL oracle
    re-derives every pixel.

    Scale shape: explode fan-out is bounded (<= 7 frames here; real
    samplers cap frames per video), the featurizer is partition-local
    Arrow batches with ZERO shuffle before it, and the only exchange is
    the final map-side-combinable groupBy on doc_id — which AQE
    coalesces, since its input is (video x frame) feature rows, not
    pixels. Pixel bytes never shuffle and never reach the driver.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    n_frames = F.octet_length(F.encode("text", "UTF-8")) % 7 + 1
    frames = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))
    feat = frames.mapInPandas(
        _frame_feature_batches,
        schema="doc_id long, frame_idx long, f_sum long, f_max int, n_px long",
    )
    frame_mean = F.expr("(f_sum * 10000) div n_px")
    return feat.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.expr("(sum(f_sum) * 10000) div sum(n_px)").alias("mean_pixel_e4"),
        F.max("f_max").alias("peak_pixel"),
        (F.max(frame_mean) - F.min(frame_mean)).alias("motion_range_e4"),
    )


#: VAD parameters: frame width in samples, activity threshold on the
#: integer frame energy (~the fixture's median), and the doc stride.
VAD_FRAME = 32
VAD_THRESH = 22_500_000_000
VAD_DOC_MOD = 25


def _frame_energy_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-frame energy over synthesized PCM — the real DSP half.

    Synthesizes the same deterministic 16-bit PCM stream as
    ``_synth_wav_batches`` and computes framewise sum-of-squares with
    vectorized numpy (exact integers), one row per frame. A production
    VAD swaps the synth for a codec decode and keeps the framing.
    """
    import numpy as np

    for pdf in batches:
        out_doc, out_frame, out_energy = [], [], []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            n = d % 500 + 100
            s = ((d * 31 + 17 * np.arange(n, dtype=np.int64)) % 65536) - 32768
            n_frames = (n + VAD_FRAME - 1) // VAD_FRAME
            for f in range(n_frames):
                chunk = s[f * VAD_FRAME : (f + 1) * VAD_FRAME]
                out_doc.append(d)
                out_frame.append(f)
                out_energy.append(int((chunk * chunk).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_frame, dtype="int64"),
                "energy": pd.Series(out_energy, dtype="int64"),
            }
        )


@register(
    "multimodal_audio_vad_segments",
    category="multimodal",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id FROM documents WHERE doc_id % {VAD_DOC_MOD} = 0
    ), samples AS (
        SELECT doc_id, k,
               ((doc_id * 31 + 17 * k) % 65536) - 32768 AS v,
               k // {VAD_FRAME} AS frame_idx
        FROM docs,
             LATERAL (SELECT unnest(range(0, doc_id % 500 + 100)) AS k)
    ), frames AS (
        SELECT doc_id, frame_idx,
               CAST(sum(v * v) AS BIGINT) AS energy
        FROM samples GROUP BY doc_id, frame_idx
    ), flagged AS (
        SELECT doc_id, frame_idx, energy,
               energy > {VAD_THRESH} AS active,
               CASE WHEN (energy > {VAD_THRESH}) AND NOT coalesce(
                        lag(energy > {VAD_THRESH}) OVER w, FALSE)
                    THEN 1 ELSE 0 END AS is_new
        FROM frames
        WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    ), numbered AS (
        SELECT doc_id, frame_idx, energy, active,
               sum(is_new) OVER (PARTITION BY doc_id ORDER BY frame_idx
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS seg_id
        FROM flagged
    )
    SELECT doc_id,
           CAST(seg_id AS BIGINT)      AS seg_id,
           min(frame_idx)              AS start_frame,
           max(frame_idx)              AS end_frame,
           count(*)                    AS n_frames,
           max(energy)                 AS peak_energy
    FROM numbered WHERE active
    GROUP BY doc_id, seg_id
    """,
)
def multimodal_audio_vad_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Voice-activity segmentation: energy gate + islands over frames.

    The audio-preprocessing step between a decoded waveform and an ASR
    or speech-dataset pipeline: frame the PCM stream, compute each
    frame's energy (vectorized numpy in ``mapInPandas`` — exact integer
    sums of squares), gate on a threshold, and merge consecutive active
    frames into segments with the islands idiom (``lag`` transition →
    running sum → per-segment aggregate) — the same construction as
    ``transform_scd2`` and ``events_sessionize``, here applied to a
    multimodal decode product. The oracle regenerates every sample and
    frame in SQL, so the segmentation is value-checked end to end.

    Scale shape: synth+framing is partition-local Arrow batches with no
    shuffle and frame rows (1/{VAD_FRAME} of samples) are the ONLY
    thing that leaves Python; islands ride one ``doc_id`` exchange
    shared by the lag window, the running sum, and the segment
    aggregate. Raw samples never shuffle.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % VAD_DOC_MOD == 0
    )
    frames = docs.select("doc_id").mapInPandas(
        _frame_energy_batches,
        schema="doc_id long, frame_idx long, energy long",
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("doc_id").orderBy("frame_idx")
    active = F.col("energy") > VAD_THRESH
    flagged = frames.select(
        "doc_id",
        "frame_idx",
        "energy",
        active.alias("active"),
        F.when(
            active & ~F.coalesce(F.lag(active).over(w), F.lit(False)), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    numbered = flagged.withColumn("seg_id", F.sum("is_new").over(cum))
    return (
        numbered.where("active")
        .groupBy("doc_id", F.col("seg_id").cast("long").alias("seg_id"))
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.max("energy").alias("peak_energy"),
        )
    )


def _synth_bmp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic 24bpp BMP synthesis — real format, fake capture.

    Logical top-down RGB byte k carries ``(doc_id*11 + k) % 256``; the
    encoder then applies the format's real storage rules (bottom-up rows,
    BGR channel order, rows zero-padded to 4 bytes) so the decoder has
    something genuine to undo.
    """
    import struct

    import numpy as np

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = d % 13 + 3, d % 9 + 2
            k = np.arange(w * h * 3, dtype=np.int64)
            rgb = ((d * 11 + k) % 256).astype(np.uint8).reshape(h, w, 3)
            bgr_bottom_up = rgb[::-1, :, ::-1]
            stride = (w * 3 + 3) // 4 * 4
            rows = np.zeros((h, stride), np.uint8)
            rows[:, : w * 3] = bgr_bottom_up.reshape(h, w * 3)
            body = rows.tobytes()
            header = struct.pack(
                "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
            ) + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
            )
            payloads.append(header + body)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


@register(
    "multimodal_decode_bmp",
    category="multimodal",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               doc_id % 13 + 3 AS w,
               doc_id % 9 + 2  AS h
        FROM documents
    ), px AS (
        SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS k
        FROM dims
    )
    SELECT doc_id,
           CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS BIGINT) AS payload_bytes,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           avg((doc_id * 11 + k) % 256)                    AS mean_pixel,
           avg(CASE WHEN k % 3 = 0
                    THEN (doc_id * 11 + k) % 256 END)      AS mean_red,
           avg(CASE WHEN k < w * 3
                    THEN (doc_id * 11 + k) % 256 END)      AS top_row_mean
    FROM px
    GROUP BY doc_id, w, h
    """,
)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode: little-endian headers, row flip, BGR, stride pad.

    The third fully-real decoder beside PPM and WAV — BMP adds the
    mechanics codec formats actually have and PPM lacks: binary
    little-endian header fields, BOTTOM-UP row storage, BGR channel
    order, and 4-byte row padding. Each is individually pinned by the
    oracle: a decoder that skips the vertical flip fails top_row_mean, a
    BGR/RGB mix-up fails mean_red, a stride error shifts every pixel and
    fails everything. Pixel sums are integers below 2^53, so the float64
    means are exact in any summation order — no rounding at all.

    Scale shape: two chained Arrow ``mapInPandas`` passes (synthesize,
    decode), zero shuffles; identical envelope to the PPM path at any
    corpus size.
    """
    from data_preparation_plugin_spark.operators.multimodal import decode_bmp

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_bmp_batches, schema="doc_id long, payload binary"
    )
    return decode_bmp(payloads)


@register(
    "multimodal_pair_audit",
    category="multimodal",
    oracle="""
    SELECT d.lang,
           count(*)                                        AS n_docs,
           CAST(sum(CASE WHEN e.vec_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT)     AS n_paired,
           CAST(sum(CASE WHEN e.vec_id IS NOT NULL
                          AND len(e.embedding) = 64
                         THEN 1 ELSE 0 END) AS BIGINT)     AS n_valid_vec,
           CAST(sum(CASE WHEN e.vec_id IS NOT NULL
                          AND d.n_chars >= 32
                         THEN 1 ELSE 0 END) AS BIGINT)     AS n_trainable
    FROM documents d
    LEFT JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang
    """,
)
def multimodal_pair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal pairing audit: which text rows have a usable embedding.

    The LAION-style completeness check a paired text/vector (or
    text/image) dataset runs before training: per language, how many
    documents exist, how many have a modality partner at all, how many
    partners pass shape validation (the declared 64-d), and how many
    pairs clear the text-length floor — the per-slice accounting that
    catches a pipeline silently dropping one modality for one language.

    Scale shape: a key equi-join (broadcast when one modality is small,
    shuffle otherwise — AQE's call) feeding a bounded-key conditional
    aggregate; the embedding payload contributes only its length, so
    column pruning keeps vectors out of the shuffle when the join is
    broadcast.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.size("embedding").alias("vec_len")
    )
    paired = docs.join(emb, docs["doc_id"] == emb["vec_id"], "left")
    has = F.col("vec_id").isNotNull()
    return paired.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(has, 1).otherwise(0)).cast("long").alias("n_paired"),
        F.sum(F.when(has & (F.col("vec_len") == 64), 1).otherwise(0))
        .cast("long")
        .alias("n_valid_vec"),
        F.sum(F.when(has & (F.col("n_chars") >= 32), 1).otherwise(0))
        .cast("long")
        .alias("n_trainable"),
    )


#: Shot boundary: a frame opens a new shot when its mean brightness moves
#: more than this (e4 scale, 0..2,550,000) from the previous frame —
#: ~10% of the dynamic range, the classic hard-cut detector setting.
SHOT_THRESH_E4 = 250_000


@register(
    "multimodal_shot_boundaries",
    category="multimodal",
    oracle=f"""
    WITH vids AS (
        SELECT doc_id,
               octet_length(encode(text)) % 7 + 1 AS n_frames
        FROM documents WHERE doc_id % 10 = 0
    ), frames AS (
        SELECT doc_id, unnest(range(0, n_frames)) AS fi FROM vids
    ), px AS (
        SELECT doc_id, fi,
               (doc_id + fi) % 8 + 4 AS w,
               doc_id % 6 + 3        AS h
        FROM frames
    ), feat AS (
        SELECT doc_id, fi,
               CAST(sum((doc_id * 7 + fi * 13 + k) % 256) AS BIGINT) * 10000
                   // CAST(w * h * 3 AS BIGINT) AS mean_e4
        FROM (SELECT doc_id, fi, w, h, unnest(range(0, w * h * 3)) AS k
              FROM px)
        GROUP BY doc_id, fi, w, h
    ), flagged AS (
        SELECT doc_id, fi, mean_e4,
               CASE WHEN lag(mean_e4) OVER (PARTITION BY doc_id ORDER BY fi)
                         IS NULL
                    OR abs(mean_e4 - lag(mean_e4)
                           OVER (PARTITION BY doc_id ORDER BY fi))
                       > {SHOT_THRESH_E4}
                    THEN 1 ELSE 0 END AS is_cut
        FROM feat
    ), shots AS (
        SELECT doc_id, fi, mean_e4,
               CAST(sum(is_cut) OVER (PARTITION BY doc_id ORDER BY fi
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS BIGINT)
                   AS shot_seq
        FROM flagged
    )
    SELECT doc_id, shot_seq,
           CAST(min(fi) AS BIGINT)     AS start_frame,
           CAST(max(fi) AS BIGINT)     AS end_frame,
           CAST(count(*) AS BIGINT)    AS n_frames,
           CAST(sum(mean_e4) // count(*) AS BIGINT) AS shot_mean_e4
    FROM shots
    GROUP BY doc_id, shot_seq
    """,
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection: hard cuts from frame-brightness jumps.

    The standard first pass of video curation — segmenting footage into
    shots so sampling/captioning operates per shot, not per raw frame.
    Reuses the SAME Arrow featurizer as the temporal-pool pipeline
    (``_frame_feature_batches`` — real numpy over deterministic synthetic
    pixels; the codec stays behind the import gate), then declares a cut
    wherever consecutive frames' integer mean brightness differs by more
    than ``SHOT_THRESH_E4`` and groups frames into shots with the
    lag + cumulative-sum islands idiom. Every feature is integer
    arithmetic, so the oracle re-derives the pixels and the cut
    decisions exactly.

    Scale shape: frame explode is bounded fan-out, the featurizer is
    partition-local Arrow with zero upstream shuffle, and the only
    exchange partitions (video, frame) feature rows by doc_id for the
    ordered lag window — the same single-exchange shape as every
    sessionize. Pixels never shuffle.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    n_frames = F.octet_length(F.encode("text", "UTF-8")) % 7 + 1
    frames = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))
    feat = frames.mapInPandas(
        _frame_feature_batches,
        schema="doc_id long, frame_idx long, f_sum long, f_max int, n_px long",
    ).select(
        "doc_id",
        "frame_idx",
        F.expr("(f_sum * 10000) div n_px").alias("mean_e4"),
    )
    order = W.partitionBy("doc_id").orderBy("frame_idx")
    frame = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag("mean_e4").over(order)
    is_cut = (
        prev.isNull() | (F.abs(F.col("mean_e4") - prev) > SHOT_THRESH_E4)
    ).cast("long")
    return (
        feat.withColumn("is_cut", is_cut)
        .withColumn("shot_seq", F.sum("is_cut").over(frame))
        .groupBy("doc_id", "shot_seq")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.expr("sum(mean_e4) div count(1)").alias("shot_mean_e4"),
        )
    )


#: Dominant-frequency extraction: FFT window (power of two, one full
#: number of cycles per synthesized tone so the peak lands exactly on a
#: bin) and the synthesis amplitude.
FFT_N = 256
TONE_AMP = 12000


def _synth_tone_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Pure-sine PCM WAV per doc at bin ``doc_id % 100 + 5`` of a
    ``FFT_N``-sample window — an integer number of cycles, so the
    spectrum is a single exact line."""
    import struct

    import numpy as np

    for pdf in batches:
        ids = pdf["doc_id"].to_numpy()
        ks = ids % 100 + 5                                  # (B,)
        i = np.arange(FFT_N, dtype=np.float64)              # (N,)
        # One vectorized synthesis for the whole Arrow batch: (B, N).
        waves = np.round(
            TONE_AMP * np.sin(2.0 * np.pi * ks[:, None] * i[None, :] / FFT_N)
        ).astype("<i2")
        data_len = FFT_N * 2
        header = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + data_len, b"WAVE", b"fmt ", 16,
            1, 1, 8000, 16000, 2, 16, b"data", data_len,
        )
        payloads = [header + row.tobytes() for row in waves]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _dominant_freq_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Parse the WAV, run a real ``numpy.fft.rfft``, report the argmax
    magnitude bin (DC excluded)."""
    import numpy as np

    for pdf in batches:
        mat = np.stack(
            [
                np.frombuffer(bytes(p)[44 : 44 + FFT_N * 2], dtype="<i2")
                for p in pdf["payload"]
            ]
        ).astype(np.float64)                                # (B, N)
        mags = np.abs(np.fft.rfft(mat, axis=1))             # one batched FFT
        mags[:, 0] = 0.0  # exclude DC
        bins = np.argmax(mags, axis=1).astype(np.int64)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "dominant_bin": bins})


@register(
    "multimodal_audio_dominant_freq",
    scale_note="0.3s x1 denominator — absolute x8 cost ~2s, parallelism-bound; one vectorized rfft per Arrow batch",
    category="multimodal",
    oracle=f"""
    SELECT doc_id,
           CAST(doc_id % 100 + 5 AS BIGINT) AS dominant_bin,
           CAST((doc_id % 100 + 5) * 3125 AS BIGINT) AS freq_centihz
    FROM documents
    """,
)
def multimodal_audio_dominant_freq(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL spectral analysis: FFT dominant frequency per audio clip.

    The first genuinely spectral member of the audio family (RMS/ZCR
    and VAD are time-domain): each clip is a synthesized pure tone at a
    known bin of a ``FFT_N``-sample window, the extractor runs an
    actual ``numpy.fft.rfft`` over the decoded PCM and reports the
    argmax magnitude bin — and because every tone completes an integer
    number of cycles, the spectrum is an exact line and the argmax is
    closed-form (``doc_id % 100 + 5``), giving a transcendental DSP
    kernel a hash-exact integer oracle. Reported alongside as
    centi-hertz (``bin x fs / N`` = bin x 31.25 Hz, exact in integer
    centi-Hz). Real pipelines swap the synthesizer for the binaryFile
    scan and keep the identical two-stage Arrow shape.

    Scale shape: chained mapInPandas (synthesize -> FFT) — Arrow
    batches, partition-parallel, zero shuffles, zero pixel/sample bytes
    moved; the FFT is O(N log N) per clip with a fixed N.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_tone_batches, schema="doc_id long, payload binary"
    )
    feats = payloads.mapInPandas(
        _dominant_freq_batches, schema="doc_id long, dominant_bin long"
    )
    return feats.select(
        "doc_id",
        "dominant_bin",
        (F.col("dominant_bin") * 3125).cast("bigint").alias("freq_centihz"),
    )


def _gray_sql(p: str) -> str:
    """Closed-form grayscale (channel sum) of synthesized pixel ``p``."""
    return (
        f"((doc_id * 7 + ({p}) * 3) % 256"
        f" + (doc_id * 7 + ({p}) * 3 + 1) % 256"
        f" + (doc_id * 7 + ({p}) * 3 + 2) % 256)"
    )


@register(
    "multimodal_image_sharpness",
    category="multimodal",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id,
               doc_id % 16 + 4 AS w,
               doc_id % 12 + 3 AS h
        FROM documents
    ), pix AS (
        SELECT doc_id, w, h, unnest(range(0, w * h)) AS p
        FROM dims
    ), lap AS (
        SELECT doc_id, w, h,
               4 * {_gray_sql("p")}
               - {_gray_sql("p - w")} - {_gray_sql("p + w")}
               - {_gray_sql("p - 1")} - {_gray_sql("p + 1")} AS v
        FROM pix
        WHERE (p // w) BETWEEN 1 AND h - 2
          AND (p % w) BETWEEN 1 AND w - 2
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST((w - 2) * (h - 2) AS BIGINT) AS n_interior,
           CAST(sum(v * v) AS BIGINT) AS lap_sse,
           CAST(sum(v * v) // ((w - 2) * (h - 2)) AS BIGINT) AS lap_mse
    FROM lap
    GROUP BY doc_id, w, h
    """,
)
def multimodal_image_sharpness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blur / sharpness gate: Laplacian energy over REAL decoded pixels.

    The standard image-quality filter for vision-language corpora
    (variance-of-Laplacian blur detection): decode the image, take the
    grayscale channel sum, convolve the interior with the 4-neighbor
    Laplacian, and score by its mean square — low energy means a blurry
    or flat capture a curation funnel should drop. The decode is the
    repo's genuine numpy PPM parser over synthesized binary payloads
    (the multimodal discipline: fake capture, REAL decode), and every
    output is an exact integer — grayscale stays a channel SUM (never a
    rounded luma), so the Laplacian, its squares, and the integer-div
    mean are reproduced closed-form by the oracle; one transposed axis
    or off-by-one neighbor offset hash-fails.

    Scale shape: two chained Arrow stages over the scan (synth, then
    parse + convolve — each batch one vectorized numpy pass), zero
    shuffles, bounded per-image output. Pixels never leave the stage.
    """
    import numpy as np

    from data_preparation_plugin_spark.operators.multimodal import _parse_ppm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_ppm_batches, schema="doc_id long, payload binary"
    )

    def sharpness(batches):
        # Parse per row (header scan is cheap), but convolve per SHAPE
        # GROUP: all same-sized images stack into one (B, h, w) tensor and
        # one vectorized Laplacian — the batched-kernel discipline that
        # fixed multimodal_audio_dominant_freq's 10x per-row-loop constant.
        for pdf in batches:
            parsed = [
                _parse_ppm(bytes(p)) for p in pdf["payload"]
            ]  # (w, h, c, flat_pixels)
            ids = pdf["doc_id"].to_numpy()
            groups: dict[tuple[int, int], list[int]] = {}
            for idx, (w, h, _c, _px) in enumerate(parsed):
                groups.setdefault((w, h), []).append(idx)
            n = len(parsed)
            width = np.empty(n, dtype="int32")
            height = np.empty(n, dtype="int32")
            n_interior = np.empty(n, dtype="int64")
            lap_sse = np.empty(n, dtype="int64")
            for (w, h), idxs in groups.items():
                stack = np.stack(
                    [parsed[i][3] for i in idxs]
                ).reshape(len(idxs), h, w, 3)
                gray = stack.astype("int64").sum(axis=3)  # (B, h, w)
                lap = (
                    4 * gray[:, 1:-1, 1:-1]
                    - gray[:, :-2, 1:-1] - gray[:, 2:, 1:-1]
                    - gray[:, 1:-1, :-2] - gray[:, 1:-1, 2:]
                )
                sse = (lap * lap).sum(axis=(1, 2))
                ii = np.array(idxs)
                width[ii] = w
                height[ii] = h
                n_interior[ii] = (h - 2) * (w - 2)
                lap_sse[ii] = sse
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": width,
                    "height": height,
                    "n_interior": n_interior,
                    "lap_sse": lap_sse,
                    "lap_mse": lap_sse // n_interior,
                }
            )

    return payloads.mapInPandas(
        sharpness,
        "doc_id long, width int, height int,"
        " n_interior long, lap_sse long, lap_mse long",
    )


#: Decimation factor for the audio resample stage (8 kHz -> 2 kHz).
AUDIO_DECIMATE = 4


@register(
    "multimodal_audio_resample",
    category="multimodal",
    oracle=f"""
    WITH sam AS (
        SELECT doc_id,
               doc_id % 500 + 100 AS n,
               unnest(range(0, doc_id % 500 + 100)) AS i
        FROM documents
    ), vals AS (
        SELECT doc_id, n, i,
               (doc_id * 31 + i * 17) % 65536 - 32768 AS s
        FROM sam
        WHERE i % {AUDIO_DECIMATE} = 0
    )
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_samples_in,
           CAST(count(*) AS BIGINT) AS n_samples_out,
           CAST(sum(s * s) AS BIGINT) AS energy_out,
           CAST(min(s) AS BIGINT) AS min_sample,
           CAST(max(s) AS BIGINT) AS max_sample
    FROM vals
    GROUP BY doc_id
    """,
)
def multimodal_audio_resample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL audio decimation: 8 kHz PCM -> 2 kHz by integer stride.

    The sample-rate normalization every speech corpus runs before
    featurization (models want one rate; capture devices deliver
    many).  Integer-factor decimation — keep every
    {AUDIO_DECIMATE}th sample — is the exact, aliasing-accepting
    baseline (production prepends an anti-alias FIR; the
    data-movement shape is identical).  The WAV payloads are genuinely
    parsed (struct header + np.frombuffer) and strided in numpy; the
    oracle rebuilds the kept sample set from the synthesis closed
    form, so a stride off-by-one, a header misparse, or an endianness
    slip changes the exact output energy and hash-fails.

    Scale shape: chained Arrow ``mapInPandas`` (synthesize -> decode ->
    decimate) with zero shuffle; per-clip output is 5 scalars, so
    nothing audio-sized ever crosses a stage boundary.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_wav_batches, schema="doc_id long, payload binary"
    )

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                (n_data,) = struct.unpack("<I", raw[40:44])
                samples = np.frombuffer(
                    raw, dtype="<i2", count=n_data // 2, offset=44
                ).astype(np.int64)
                kept = samples[::AUDIO_DECIMATE]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples_in": int(samples.size),
                        "n_samples_out": int(kept.size),
                        "energy_out": int(np.sum(kept * kept)),
                        "min_sample": int(kept.min()),
                        "max_sample": int(kept.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(
        resample,
        "doc_id long, n_samples_in long, n_samples_out long,"
        " energy_out long, min_sample long, max_sample long",
    )


@register(
    "multimodal_keyframe_select",
    category="multimodal",
    oracle=f"""
    WITH vids AS (
        SELECT doc_id,
               octet_length(encode(text)) % 7 + 1 AS n_frames
        FROM documents WHERE doc_id % 10 = 0
    ), frames AS (
        SELECT doc_id, unnest(range(0, n_frames)) AS fi FROM vids
    ), px AS (
        SELECT doc_id, fi,
               (doc_id + fi) % 8 + 4 AS w,
               doc_id % 6 + 3        AS h
        FROM frames
    ), feat AS (
        SELECT doc_id, fi,
               CAST(sum((doc_id * 7 + fi * 13 + k) % 256) AS BIGINT)
                   AS f_sum,
               CAST(max((doc_id * 7 + fi * 13 + k) % 256) AS BIGINT)
                   AS f_max,
               CAST(w * h * 3 AS BIGINT) AS n_px,
               CAST(sum((doc_id * 7 + fi * 13 + k) % 256) AS BIGINT)
                   * 10000 // CAST(w * h * 3 AS BIGINT) AS mean_e4
        FROM (SELECT doc_id, fi, w, h, unnest(range(0, w * h * 3)) AS k
              FROM px)
        GROUP BY doc_id, fi, w, h
    ), flagged AS (
        SELECT doc_id, fi, f_sum, f_max, n_px, mean_e4,
               CASE WHEN lag(mean_e4) OVER (PARTITION BY doc_id
                                            ORDER BY fi) IS NULL
                    OR abs(mean_e4 - lag(mean_e4)
                           OVER (PARTITION BY doc_id ORDER BY fi))
                       > {SHOT_THRESH_E4}
                    THEN 1 ELSE 0 END AS is_cut
        FROM feat
    ), shots AS (
        SELECT *, CAST(sum(is_cut) OVER (PARTITION BY doc_id ORDER BY fi
                                         ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS shot_seq
        FROM flagged
    ), scored AS (
        SELECT doc_id, shot_seq, fi,
               f_max * n_px - f_sum AS score,
               row_number() OVER (PARTITION BY doc_id, shot_seq
                                  ORDER BY f_max * n_px - f_sum DESC,
                                           fi) AS rn,
               count(*) OVER (PARTITION BY doc_id, shot_seq) AS n_frames
        FROM shots
    )
    SELECT doc_id, shot_seq,
           CAST(fi AS BIGINT) AS keyframe_idx,
           CAST(score AS BIGINT) AS keyframe_score,
           CAST(n_frames AS BIGINT) AS n_frames
    FROM scored WHERE rn = 1
    """,
)
def multimodal_keyframe_select(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keyframe selection: the best frame of every shot, by argmax.

    The stage after shot segmentation in a video-curation pipeline:
    captioning/embedding budgets are per SHOT, so each shot must
    nominate one representative frame.  Reuses the same Arrow frame
    featurizer and the same cut rule as
    ``multimodal_shot_boundaries``, then picks each shot's frame with
    the highest contrast proxy (peak-minus-mean pixel mass,
    ``f_max·n_px − f_sum`` — pure integers), ties broken to the
    earliest frame — a deterministic ``max_by`` expressed as one
    ranked window, so both engines agree on every nomination.

    Scale shape: identical to the shot pipeline (bounded frame
    explode, partition-local Arrow featurizer, one doc-keyed
    exchange); the argmax adds a window over the SAME partitioning —
    no second shuffle, and pixels still never move.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    n_frames = F.octet_length(F.encode("text", "UTF-8")) % 7 + 1
    frames = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))
    feat = frames.mapInPandas(
        _frame_feature_batches,
        schema="doc_id long, frame_idx long, f_sum long, f_max int, n_px long",
    ).select(
        "doc_id",
        "frame_idx",
        "f_sum",
        "f_max",
        "n_px",
        F.expr("(f_sum * 10000) div n_px").alias("mean_e4"),
    )
    order = W.partitionBy("doc_id").orderBy("frame_idx")
    cum = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag("mean_e4").over(order)
    is_cut = (
        prev.isNull() | (F.abs(F.col("mean_e4") - prev) > SHOT_THRESH_E4)
    ).cast("long")
    shots = feat.withColumn("is_cut", is_cut).withColumn(
        "shot_seq", F.sum("is_cut").over(cum)
    )
    score = F.col("f_max") * F.col("n_px") - F.col("f_sum")
    shot_w = W.partitionBy("doc_id", "shot_seq").orderBy(
        score.desc(), "frame_idx"
    )
    scored = shots.select(
        "doc_id",
        "shot_seq",
        "frame_idx",
        score.alias("score"),
        F.row_number().over(shot_w).alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("doc_id", "shot_seq"))
        .alias("n_frames"),
    )
    return scored.filter(F.col("rn") == 1).select(
        "doc_id",
        F.col("shot_seq").cast("bigint").alias("shot_seq"),
        F.col("frame_idx").cast("bigint").alias("keyframe_idx"),
        F.col("score").cast("bigint").alias("keyframe_score"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
    )


@register(
    "multimodal_image_entropy",
    category="multimodal",
    scale_note=(
        "x3.02 at x8 on a 0.57s denominator — zero-shuffle chained Arrow "
        "map passes; wall tracks decoded pixel bytes sub-linearly vs the "
        "x8 input (same family as the other sub-second multimodal probes)"
    ),
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               doc_id % 16 + 4 AS w,
               doc_id % 12 + 3 AS h
        FROM documents
    ), px AS (
        SELECT doc_id, w, h,
               ((doc_id * 7 + unnest(range(0, w * h * 3))) % 256) // 32 AS bin
        FROM dims
    ), hist AS (
        SELECT doc_id, w, h, bin, count(*) AS c
        FROM px GROUP BY doc_id, w, h, bin
    )
    SELECT doc_id,
           CAST(w AS INTEGER)        AS width,
           CAST(h AS INTEGER)        AS height,
           CAST(8 AS INTEGER)        AS n_bins,
           CAST(count(*) AS INTEGER) AS n_bins_occupied,
           round(-sum((c * 1.0 / (w * h * 3))
                      * log2(c * 1.0 / (w * h * 3))), 4) AS entropy_bits
    FROM hist
    GROUP BY doc_id, w, h
    """,
)
def multimodal_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-quality signal: pixel-histogram entropy per image.

    The blank/flat-capture detector a VLM curation pipeline runs after
    decode: synthesized binary PPMs are genuinely parsed
    (``operators.multimodal.image_entropy_ppm``) and each image's 8-bin
    pixel histogram Shannon entropy is computed from the actual pixel
    buffer with numpy. The oracle reconstructs every histogram in closed
    form from the synthesis function and recomputes the entropy in SQL —
    a parser that drops, shifts, or duplicates a single byte changes a
    bin count and hash-fails.

    Scale shape: identical to ``multimodal_decode_ppm`` — two chained
    Arrow-batched ``mapInPandas`` passes (synthesize -> parse+histogram),
    zero shuffles, embarrassingly parallel per partition. The histogram
    is a shift + ``bincount`` per image; entropy is an 8-term sum.
    """
    from data_preparation_plugin_spark.operators.multimodal import (
        image_entropy_ppm,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _synth_ppm_batches, schema="doc_id long, payload binary"
    )
    scored = image_entropy_ppm(payloads, bins=8)
    return scored.select(
        "doc_id",
        "width",
        "height",
        "n_bins",
        "n_bins_occupied",
        F.round("entropy_bits", 4).alias("entropy_bits"),
    )
