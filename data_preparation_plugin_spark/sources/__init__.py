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


def jdbc_reader_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> dict[str, str]:
    """Build the option map for a (possibly partitioned) JDBC scan.

    Pure function so the partitioned-read contract is testable without a
    live database: a partition column requires both bounds, and the four
    partitioning options travel together or not at all.
    """
    opts = {"url": url, "dbtable": table}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    opts.update(options)
    return opts


#: PostgreSQL column type → Spark SQL type, as Spark's JDBC PostgresDialect
#: maps them on read. This is the contract that makes the reference's
#: native habitat (PostgresDataset over psycopg2, reference
#: ``hooks/dataset.py:120-137``: SQLAlchemy reflection + pandas implicit
#: conversions) a config-only swap from the embedded-Derby tests: the
#: url/driver pair changes, the downstream DataFrame schema follows this
#: table. ``serial``/``bigserial`` are storage aliases for int/bigint with
#: a sequence default — the scan sees the integer type. ``numeric`` with
#: no declared precision arrives as Spark's maximum decimal;
#: ``timestamptz`` is normalized to the session timezone (an instant, like
#: the reference's pandas ``datetime64[ns, tz]``).
PG_TYPE_MAP: dict[str, str] = {
    "smallint": "smallint",
    "integer": "int",
    "bigint": "bigint",
    "serial": "int",
    "bigserial": "bigint",
    "real": "float",
    "double precision": "double",
    "numeric": "decimal(38,18)",
    "numeric(p,s)": "decimal(p,s)",
    "text": "string",
    "varchar(n)": "string",
    "char(n)": "string",
    "boolean": "boolean",
    "bytea": "binary",
    "date": "date",
    "timestamp": "timestamp",
    "timestamptz": "timestamp",
    "uuid": "string",
    "json": "string",
    "jsonb": "string",
}


def pg_reader_options(
    host: str,
    database: str,
    table: str,
    port: int = 5432,
    user: str | None = None,
    password: str | None = None,
    **kwargs,
) -> dict[str, str]:
    """Postgres-flavoured :func:`jdbc_reader_options`.

    Produces the exact option map :func:`read_jdbc` needs for a live
    PostgreSQL — the only delta from the Derby-backed tests is the
    url/driver/credential entries this helper adds, which is the
    config-only-swap contract ``tests/test_jdbc.py`` pins.
    """
    url = f"jdbc:postgresql://{host}:{port}/{database}"
    opts = jdbc_reader_options(url, table, **kwargs)
    opts["driver"] = "org.postgresql.Driver"
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts


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
    input splits. Exercised in-container against Spark's bundled embedded
    Derby (tests/test_jdbc.py); against PostgreSQL the only delta is the
    url/driver pair. Kept thin on purpose: everything downstream is
    ordinary DataFrame code.
    """
    reader = spark.read.format("jdbc")
    for key, value in jdbc_reader_options(
        url,
        table,
        partition_column,
        num_partitions,
        lower_bound,
        upper_bound,
        **options,
    ).items():
        reader = reader.option(key, value)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """Write a DataFrame to a database table (reference ``to_sql`` parity,
    ``hooks/dataset.py:49-59,189-201``).

    Each partition opens one connection and inserts in ``batchsize`` row
    batches — the write parallelism IS the partition count, so
    ``df.repartition(n)`` is the knob that matches the reference's
    chunked ``to_sql`` while actually running n-way parallel.
    """
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batchsize))
    for key, value in options.items():
        writer = writer.option(key, value)
    writer.mode(mode).save()


__all__ = [
    "PG_TYPE_MAP",
    "jdbc_reader_options",
    "pg_reader_options",
    "read_jdbc",
    "write_jdbc",
]
