"""Source readers.

Each reference ingestion path (SURVEY.md §2.A #1-3) maps to a reader here:

- CSV / parquet / JSON: :class:`~data_preparation_plugin_spark.operators.load.LoadSpec`
  driven ``spark.read`` (Embulk parity).
- Shapefile: :func:`~data_preparation_plugin_spark.operators.shapefile.read_shapefile`.
- zip-from-URL: :class:`~data_preparation_plugin_spark.operators.download.DownloadUnzipOperator`
  staging + any reader above.
- JDBC (the reference's native habitat): :func:`read_jdbc` below, for real
  PostgreSQL compatibility when a database is reachable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Parallel JDBC scan of one table (PostgresDataset.get_dataframe parity).

    Unlike the reference's single-connection full fetch
    (``hooks/dataset.py:120-126``), a partition column splits the scan into
    ``num_partitions`` concurrent range queries — the JDBC equivalent of
    input splits. Untested in this container (no database); kept thin on
    purpose: everything downstream is ordinary DataFrame code.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for key, value in options.items():
        reader = reader.option(key, value)
    return reader.load()


__all__ = ["read_jdbc"]
