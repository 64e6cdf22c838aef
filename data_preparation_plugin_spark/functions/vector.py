"""Vector math over ``array<float|double>`` columns, pure built-ins.

Per the repo mandate: similarity math uses ``F.zip_with`` / ``F.aggregate``
(higher-order functions evaluated JVM-side) rather than Python UDFs, so a
dot product over a 100 TB embedding column never crosses the Python boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_vector(values: Sequence[float]) -> Column:
    """A literal ``array<double>`` column from Python floats."""
    return F.array(*[F.lit(float(v)) for v in values])


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise product + fold — runs as codegen'd array ops."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; compute in double for cross-engine determinism.

    Convenience form — it folds BOTH norms per evaluation. In a scoring
    join (pairs >> rows) stage the norms once per row instead and divide
    the dot by their product (``plans.similarity.staged_vectors`` /
    ``paired_cosine``): same IEEE doubles, one fold per pair not three.
    """
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
