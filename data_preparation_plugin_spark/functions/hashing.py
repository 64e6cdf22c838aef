"""Deterministic, cross-engine hashing helpers.

md5 is the only hash with bit-identical output in both Spark and DuckDB, so
every oracle-checkable fingerprint/MinHash in this engine builds on it.
Engine-internal paths (SimHash, salting) may use ``F.xxhash64`` — faster,
but rows-only checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_preparation_plugin_spark.functions.text import normalized_text


def md5_fingerprint(text: Column | str) -> Column:
    """Content fingerprint of normalized text."""
    return F.md5(normalized_text(text))


def minhash_hex(shingle: Column | str, seed: int) -> Column:
    """One string-MinHash term: md5 of the seed-prefixed shingle.

    ``min`` over these hex digests is an order-preserving stand-in for a
    seeded permutation; identical SQL (`min(md5(seed || ':' || s))`) runs on
    the DuckDB oracle side.
    """
    return F.md5(F.concat(F.lit(f"{seed}:"), shingle))
