"""Column-level helper functions.

All helpers return ``pyspark.sql.Column`` expressions built from built-in
functions (JVM-side, whole-stage-codegen friendly) — the engine's equivalent
of the reference's reliance on PostgreSQL expressions. No row-at-a-time
Python UDFs live here.
"""

from data_preparation_plugin_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    lit_vector,
)
from data_preparation_plugin_spark.functions.text import (
    exploded_shingles,
    normalized_text,
    shingles,
    shingles_from_tokens,
    tokens,
)
from data_preparation_plugin_spark.functions.hashing import (
    md5_fingerprint,
    minhash_hex,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "lit_vector",
    "exploded_shingles",
    "normalized_text",
    "shingles",
    "shingles_from_tokens",
    "tokens",
    "md5_fingerprint",
    "minhash_hex",
]
