"""Pipeline operators (SURVEY.md §2.A #1-4 + §2.B transform vocabulary).

The reference ships four Airflow operators that shell out to external tools
(wget/unzip, Embulk, shp2pgsql, psql). Here an operator is a plain Python
object with ``execute(spark)`` — runnable standalone, trivially wrappable by
any orchestrator (an Airflow ``PythonOperator`` calling ``execute`` is the
whole integration) — and all data movement happens inside Spark jobs instead
of subprocesses.
"""

from data_preparation_plugin_spark.operators.base import BaseOperator, Pipeline
from data_preparation_plugin_spark.operators.download import DownloadUnzipOperator
from data_preparation_plugin_spark.operators.load import CsvLoadOperator, LoadSpec
from data_preparation_plugin_spark.operators.copy import CopyTableOperator
from data_preparation_plugin_spark.operators.shapefile import (
    ShapefileLoadOperator,
    read_shapefile,
)
from data_preparation_plugin_spark.operators.transform import (
    AggregateOperator,
    ComputeOperator,
    DedupOperator,
    FilterOperator,
    JoinOperator,
    ProjectOperator,
    RegexExtractOperator,
    SortLimitOperator,
    SqlOperator,
    UnionOperator,
    WindowOperator,
)

__all__ = [
    "BaseOperator",
    "Pipeline",
    "DownloadUnzipOperator",
    "CsvLoadOperator",
    "LoadSpec",
    "CopyTableOperator",
    "ShapefileLoadOperator",
    "read_shapefile",
    "AggregateOperator",
    "ComputeOperator",
    "DedupOperator",
    "FilterOperator",
    "JoinOperator",
    "ProjectOperator",
    "RegexExtractOperator",
    "SortLimitOperator",
    "SqlOperator",
    "UnionOperator",
    "WindowOperator",
]
