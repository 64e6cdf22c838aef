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
