"""data_preparation_plugin_spark — a PySpark-native data-preparation engine.

A from-scratch re-expression of the capability surface of
MTES-MCT/data-preparation-plugin (an Airflow plugin for PostgreSQL-centric
ETL; see /root/reference, surveyed in SURVEY.md) as an idiomatic Apache
Spark engine:

- ``dataset``    — the table abstraction (reference: hooks/dataset.py) on top
                   of the Spark catalog / Parquet instead of PostgreSQL.
- ``operators``  — pipeline operators (ingest, copy, transform, join,
                   aggregate, window, dedup, similarity, text, multimodal),
                   runnable standalone or wrapped in any orchestrator.
- ``functions``  — column-level helpers (hashing, text, vector math) built on
                   ``pyspark.sql.functions`` (JVM-side, codegen-friendly).
- ``plans``      — the declared-query registry: every capability is exposed
                   as a named query over the test star schema with a DuckDB
                   oracle for correctness checking.
- ``streaming``  — Structured Streaming variants over the ``events`` table.
- ``layout``     — physical-layout levers (directory partitioning, file
                   sizing, skew salting) — the Spark equivalent of the
                   reference's index-aware table copy.

Everything executes through the DataFrame / Spark SQL API so Catalyst and
Tungsten choose physical strategies (pushdown, pruning, broadcast joins, AQE).
"""

from data_preparation_plugin_spark.session import get_spark
from data_preparation_plugin_spark.dataset import (
    Dataset,
    DatasetWriter,
    merge_dtype,
    row2dict,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Dataset",
    "DatasetWriter",
    "merge_dtype",
    "row2dict",
    "__version__",
]
