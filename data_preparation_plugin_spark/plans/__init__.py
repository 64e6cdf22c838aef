"""Declared-query registry.

Every capability from SURVEY.md §2 is exposed as a named query over the
driver's test tables, together with an equivalent ANSI-SQL oracle string that
DuckDB can run on the same parquet files. The registry is the single source
of truth consumed by ``__spark_entry__.py`` (the driver contract), the pytest
parity harness, and ``bench.py``.
"""

from data_preparation_plugin_spark.plans.registry import (
    QUERIES,
    Query,
    load_table,
    oracle_sql,
    queries,
    register,
)

# Importing the modules populates the registry.
from data_preparation_plugin_spark.plans import relational  # noqa: E402,F401
from data_preparation_plugin_spark.plans import events  # noqa: E402,F401
from data_preparation_plugin_spark.plans import text  # noqa: E402,F401
from data_preparation_plugin_spark.plans import dedup  # noqa: E402,F401
from data_preparation_plugin_spark.plans import similarity  # noqa: E402,F401
from data_preparation_plugin_spark.plans import multimodal  # noqa: E402,F401
from data_preparation_plugin_spark.plans import sampling  # noqa: E402,F401
from data_preparation_plugin_spark.plans import ingest  # noqa: E402,F401
from data_preparation_plugin_spark.plans import udfs  # noqa: E402,F401

__all__ = [
    "QUERIES",
    "Query",
    "load_table",
    "oracle_sql",
    "queries",
    "register",
]
