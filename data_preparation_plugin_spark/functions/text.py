"""Text normalization / tokenization / shingling column helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(text: Column | str) -> Column:
    """Lowercase, trim, collapse whitespace — the canonical dedup key."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of lowercased text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles; falls back to the whole text when shorter than k."""
    toks = tokens(text)
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + off) for off in range(k)]),
    )
    return F.when(n >= k, windows).otherwise(F.array(F.concat_ws(" ", toks)))
