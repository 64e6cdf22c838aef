"""Declarative bulk load (Embulk parity).

Parity: ``EmbulkOperator`` (reference ``operators/embulk.py:8-24``) shells
out to the Embulk JVM bulk loader with a YAML config — "mainly used to load
data from a csv file to a Postgres table" (``embulk.py:14-15``). Spark *is*
a parallel bulk loader, so the YAML config becomes a :class:`LoadSpec`
(format + options + schema + target) and the load is
``spark.read.format(...).load(...)`` → ``saveAsTable`` — input splits give
the parallelism Embulk got from its executor threads, with no subprocess.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from data_preparation_plugin_spark.dataset import Dataset
from data_preparation_plugin_spark.operators.base import BaseOperator


@dataclass
class LoadSpec:
    """Declarative load config — the engine's equivalent of an Embulk YAML.

    ``schema`` is a DDL string (``"a INT, b STRING"``) or None to infer.
    ``options`` go straight to the DataFrameReader (header, sep, nullValue,
    timestampFormat, ...). ``partition_by`` controls output layout — the
    scale lever the reference delegated to Postgres indexes.
    """

    path: str
    table: str
    db_schema: str | None = None
    format: str = "csv"
    schema: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    mode: str = "overwrite"
    partition_by: tuple[str, ...] = ()


class CsvLoadOperator(BaseOperator):
    """Load files into a catalog table per a :class:`LoadSpec`."""

    def __init__(self, spec: LoadSpec, **kwargs) -> None:
        super().__init__(**kwargs)
        self.spec = spec

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format(self.spec.format).options(**self.spec.options)
        if self.spec.schema:
            reader = reader.schema(self.spec.schema)
        elif self.spec.format == "csv":
            # No declared schema: pay one extra pass to infer, explicitly.
            reader = reader.option("inferSchema", "true")
        return reader.load(self.spec.path)

    def execute(self, spark: SparkSession) -> DataFrame:
        df = self.read(spark)
        dataset = Dataset(self.spec.table, schema=self.spec.db_schema, spark=spark)
        dataset._ensure_database()
        writer = df.write.mode(self.spec.mode).format("parquet")
        if self.spec.partition_by:
            writer = writer.partitionBy(*self.spec.partition_by)
        writer.saveAsTable(dataset.qualified_name)
        return spark.table(dataset.qualified_name)
