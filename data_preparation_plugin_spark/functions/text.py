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


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles of a tokens array; whole text if shorter than k.

    ``toks`` should be a *materialized column reference*, not an inline
    ``split(...)`` expression: higher-order functions are interpreted (no
    whole-stage codegen, no common-subexpression elimination), so an inline
    expression would be re-evaluated for every ``element_at`` of every
    shingle — O(tokens^2) regex splits per document. Reading an attribute
    from the row is O(1). See ``exploded_shingles`` for the plan shape that
    guarantees this.
    """
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + off) for off in range(k)]),
    )
    return F.when(n >= k, windows).otherwise(F.array(F.concat_ws(" ", toks)))


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles; falls back to the whole text when shorter than k.

    Convenience composition — prefer ``exploded_shingles`` in hot paths
    (see ``shingles_from_tokens`` for why).
    """
    return shingles_from_tokens(tokens(text), k)


def exploded_shingles(df, id_cols: list[str], text_col: str = "text",
                      k: int = 3, distinct: bool = False):
    """``df`` -> one row per (ids, shingle), tokenizing once per document.

    Two-step plan: a Project materializes the token array, then a Generate
    (explode) node consumes it. Projections do not collapse across Generate,
    so the regex split runs exactly once per input row — measured ~5x faster
    than exploding ``shingles(text)`` directly, where the split expression is
    inlined into the transform lambda and re-evaluated per shingle element.

    ``distinct=True`` dedups shingles PER DOCUMENT in-row
    (``array_distinct`` before the explode) instead of the caller's
    ``.distinct()`` after it. (ids, shingle) duplicates can only come
    from repeats inside one document, so the two are equivalent — but
    the in-row form removes a full exchange of the exploded shingle
    strings (the ``.distinct()`` shuffle), which at corpus scale is the
    single widest shuffle these pipelines carry.
    """
    toks = df.select(*id_cols, tokens(F.col(text_col)).alias("__toks"))
    sh = shingles_from_tokens(F.col("__toks"), k)
    if distinct:
        sh = F.array_distinct(sh)
    return toks.select(*id_cols, F.explode(sh).alias("shingle"))
