"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's declared-query registry
(``data_preparation_plugin_spark.plans``): ``queries()`` exposes every
implemented capability from SURVEY.md §2, ``oracle_sql()`` the matching
DuckDB SQL, and ``entry()`` runs the flagship pipeline on sf0.001.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_preparation_plugin_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q3_shipping_priority"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.QUERIES[FLAGSHIP].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented capability (SURVEY.md §2)."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return plans.oracle_sql()
