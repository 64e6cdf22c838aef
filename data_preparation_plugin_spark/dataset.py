"""Dataset: the table abstraction, Spark-native.

Reference parity (SURVEY.md §1, §2.A): the reference's ``PostgresDataset``
(``data_preparation_plugin/hooks/dataset.py:62-205``) binds to one
``(pg_schema, name)`` PostgreSQL table and exposes reflection, pandas
readers, a row-dict iterator, buffered writers, and schema (dtype)
read/write. Here a :class:`Dataset` binds to one Spark catalog table (or a
bare Parquet path) and exposes the same surface with Spark semantics:

- reads are **lazy DataFrames** (never a driver-side materialization — the
  reference's ``get_dataframe`` pulls the full table into worker RAM,
  ``dataset.py:120-126``; ours returns ``spark.table(...)``),
- ``iter_rows`` **streams** via ``toLocalIterator`` (the reference
  materializes the whole result as a list despite its docstring,
  ``dataset.py:155`` — a bug we deliberately do not replicate),
- writes go through the DataFrame writer (parallel, columnar) with a thin
  buffered row-dict shim for API compatibility
  (``PostgresDatasetWriter``, ``dataset.py:13-59``).

Also provides the README's "phantom helpers" that the reference documents
but never defines (``README.md:80,151,169``): ``write_from_dataframe``,
``merge_dtype``, ``row2dict``.
"""

from __future__ import annotations

import copy as _copy
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def row2dict(row: Row) -> dict[str, Any]:
    """Convert a Spark Row to a plain dict.

    Parity with the closure inside the reference's ``iter_rows``
    (``hooks/dataset.py:144-148``) and the ``row2dict`` the README
    references but never defines (``README.md:169``).
    """
    return row.asDict(recursive=True)


def merge_dtype(*dtypes: StructType | list[StructField]) -> StructType:
    """Concatenate schemas, de-duplicating by column name (first wins).

    The README's join example derives the output schema by concatenating the
    two input dtypes and passing them through an undefined ``merge_dtype``
    helper (``README.md:149-153``). This is the real implementation: the
    natural output schema of a join whose duplicate key columns collapse.
    """
    seen: dict[str, StructField] = {}
    for dtype in dtypes:
        fields = dtype.fields if isinstance(dtype, StructType) else list(dtype)
        for field in fields:
            if field.name not in seen:
                seen[field.name] = field
    return StructType(list(seen.values()))


class DatasetWriter:
    """Buffered row-dict writer; context manager.

    Parity: ``PostgresDatasetWriter`` (``hooks/dataset.py:13-59``) buffers
    row dicts and flushes a multi-row INSERT every ``chunksize`` rows
    (``dataset.py:18,43-47``). Here a flush becomes
    ``spark.createDataFrame(buffer, schema).write.mode("append")``.

    This is an API-compatibility shim, not the bulk path: driver-side row
    buffering is inherently single-process. Bulk writes should use
    :meth:`write_dataframe` / :meth:`Dataset.write_with_schema`, which stay
    distributed end-to-end.
    """

    def __init__(self, dataset: "Dataset", chunksize: int = 1000) -> None:
        self.dataset = dataset
        self.chunksize = chunksize
        self.rows: list[dict[str, Any]] = []

    def __enter__(self) -> "DatasetWriter":
        return self

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        if exc_type is None:
            self.flush()

    def write_row_dict(self, row: dict[str, Any]) -> None:
        """Buffer one row dict; flush when the buffer reaches ``chunksize``.

        Parity: ``write_row_dict`` (``hooks/dataset.py:43-47``).
        """
        self.rows.append(row)
        if len(self.rows) >= self.chunksize:
            self.flush()

    def write_dataframe(self, df) -> None:
        """Append a DataFrame (Spark or pandas) whose schema matches.

        Parity: ``PostgresDatasetWriter.write_dataframe``
        (``hooks/dataset.py:49-59``).
        """
        self.dataset.write_dataframe(df, mode="append")

    def flush(self) -> None:
        """Write the buffer as one append. Parity: ``hooks/dataset.py:30-41``."""
        if not self.rows:
            return
        schema = self.dataset.reflect()
        df = self.dataset.spark.createDataFrame(self.rows, schema=schema)
        self.dataset.write_dataframe(df, mode="append")
        self.rows = []


class Dataset:
    """Handle on one catalog table (``schema.name``) or Parquet path.

    Parity: ``PostgresDataset`` (``hooks/dataset.py:62-86``) binds to
    ``(pg_schema, name)``; Postgres schemas map to Spark SQL databases
    (namespaces). Pass ``path=`` to bind to a bare Parquet directory instead
    of a catalog table (the driver's testdata layout).
    """

    def __init__(
        self,
        name: str,
        schema: str | None = None,
        spark: SparkSession | None = None,
        path: str | None = None,
    ) -> None:
        if spark is None:
            spark = SparkSession.active()
        self.spark = spark
        self.name = name
        self.schema = schema
        self.path = path
        self._dtype: StructType | None = None

    # -- identity -----------------------------------------------------------

    @property
    def qualified_name(self) -> str:
        if self.schema:
            return f"`{self.schema}`.`{self.name}`"
        return f"`{self.name}`"

    def _ensure_database(self) -> None:
        if self.schema:
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{self.schema}`")

    # -- read paths ---------------------------------------------------------

    def reflect(self, force: bool = False) -> StructType:
        """Live schema of the table, memoized like the reference.

        Parity: ``PostgresDataset.reflect`` (``hooks/dataset.py:88-118``)
        reflects the PG catalog into an ORM class and memoizes it
        (``dataset.py:113-118``), with ``force=True`` to refresh. Spark
        tables are schema-carrying so reflection is just ``df.schema``; the
        memoization (and ``force``) is kept for API parity.
        """
        if self._dtype is None or force:
            self._dtype = self.get_dataframe().schema
        return self._dtype

    def get_dataframe(self) -> DataFrame:
        """The table as a **lazy** DataFrame.

        Parity: ``get_dataframe`` (``hooks/dataset.py:120-126``) runs
        ``SELECT * from {schema}.{name}`` into pandas — an eager full scan
        with no pushdown. Ours is a logical plan leaf: any downstream filter
        or projection reaches the Parquet scan via Catalyst.
        """
        if self.path is not None:
            return self.spark.read.parquet(self.path)
        return self.spark.table(self.qualified_name)

    def get_dataframes(self, chunksize: int) -> Iterator:
        """Iterate the table as pandas DataFrames of ``<= chunksize`` rows.

        Parity: ``get_dataframes`` (``hooks/dataset.py:128-137``) via
        ``pandas.read_sql(chunksize=...)``. Spark-side we stream partitions
        through ``toLocalIterator`` (one partition in driver memory at a
        time) and re-chunk to the requested size.
        """
        import pandas as pd

        schema = self.reflect()
        columns = [f.name for f in schema.fields]
        buffer: list[Row] = []
        for row in self.get_dataframe().toLocalIterator(prefetchPartitions=True):
            buffer.append(row)
            if len(buffer) >= chunksize:
                yield pd.DataFrame([r.asDict() for r in buffer], columns=columns)
                buffer = []
        if buffer:
            yield pd.DataFrame([r.asDict() for r in buffer], columns=columns)

    def iter_rows(self, head: int | None = None) -> Iterator[dict[str, Any]]:
        """Stream rows as dicts, optionally limited to ``head`` rows.

        Parity: ``iter_rows`` (``hooks/dataset.py:139-157``); its ``head``
        maps to ``LIMIT`` (``dataset.py:153-154``). The reference loads the
        entire result into a Python list (``dataset.py:155``) — ours
        actually streams via ``toLocalIterator``.
        """
        df = self.get_dataframe()
        if head is not None:
            df = df.limit(head)
        for row in df.toLocalIterator():
            yield row2dict(row)

    # -- schema (dtype) paths ----------------------------------------------

    def read_dtype(self) -> list[StructField]:
        """Schema as a list of detached StructField copies.

        Parity: ``read_dtype`` (``hooks/dataset.py:163-170``) returns
        detached ``Column`` copies so callers can build a new table's schema
        from an existing one (``README.md:44``). StructFields are plain
        values, but we still copy so callers may mutate freely.
        """
        return [_copy.deepcopy(f) for f in self.reflect(force=True).fields]

    def write_dtype(self, dtype: StructType | list[StructField]) -> None:
        """Drop-and-recreate the table with the given schema, empty.

        Parity: ``write_dtype`` (``hooks/dataset.py:172-187``) — builds a
        table from a column list, ``drop(checkfirst=True)`` then ``create``.
        Spark: overwrite with an empty DataFrame of that schema.
        """
        schema = dtype if isinstance(dtype, StructType) else StructType(list(dtype))
        empty = self.spark.createDataFrame([], schema=schema)
        self.write_dataframe(empty, mode="overwrite")
        self._dtype = schema

    # -- write paths --------------------------------------------------------

    def get_writer(self, chunksize: int = 1000) -> DatasetWriter:
        """Buffered writer factory. Parity: ``hooks/dataset.py:159-161``."""
        return DatasetWriter(self, chunksize=chunksize)

    def write_dataframe(self, df, mode: str = "append") -> None:
        """Write a Spark or pandas DataFrame to the table.

        Parity: ``write_dataframe`` (``hooks/dataset.py:49-59``) appends a
        pandas df whose schema must match. Spark accepts either kind; the
        write is distributed and columnar.
        """
        if not isinstance(df, DataFrame):
            df = self.spark.createDataFrame(df)
        if self.path is not None:
            df.write.mode(mode).parquet(self.path)
        else:
            self._ensure_database()
            df.write.mode(mode).format("parquet").saveAsTable(self.qualified_name)
        self._dtype = None

    # README.md:80 calls this name; alias for the intended surface.
    write_from_dataframe = write_dataframe

    def write_with_schema(self, df, id_column: str = "id") -> None:
        """Overwrite the table from a DataFrame, adding a dense ``id`` column.

        Parity: ``write_with_schema`` (``hooks/dataset.py:189-201``) does
        ``to_sql(index=True, index_label="id", if_exists="replace")`` — the
        pandas row index becomes an ``id`` column (verified by the reference
        test at ``hooks/tests/test_dataset.py:154-174``).

        For a pandas input the actual index values are preserved exactly.
        For a Spark input there is no index; we synthesize a dense 0-based id
        with ``row_number() - 1`` over a zipWithIndex-style ordering. Note
        the required total ordering costs a pass; at true scale prefer
        ``monotonically_increasing_id`` (sparse ids) and say so here rather
        than hiding a global sort in an innocuous-looking API.
        """
        if isinstance(df, DataFrame):
            if id_column not in df.columns:
                # Dense ids without a global single-partition sort:
                # per-partition offsets computed from partition sizes.
                df = _with_dense_id(df, id_column)
            self.write_dataframe(df, mode="overwrite")
        else:
            pdf = df.reset_index(names=id_column) if df.index.name != id_column else df
            self.write_dataframe(pdf, mode="overwrite")

    def get_session(self) -> SparkSession:
        """Parity shim for ``get_session`` (``hooks/dataset.py:203-205``)."""
        return self.spark


def _with_dense_id(df: DataFrame, id_column: str) -> DataFrame:
    """Add a dense sequential 0-based id column, distributed.

    A ``row_number()`` over a global window funnels every row through one
    partition — unusable at scale. Instead decode
    ``monotonically_increasing_id`` (upper 31 bits = partition id, lower 33
    = row index within the partition), collect only the per-partition row
    counts (one tiny job), and add cumulative offsets: a narrow second pass
    with no shuffle at all. Assumes a deterministic input plan (the two
    passes must see identical partitioning — true for file scans and any
    deterministic transformation chain).
    """
    mid = F.monotonically_increasing_id()
    with_mid = df.withColumn("__mid", mid)
    pid = F.shiftright("__mid", 33)
    local_idx = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    sizes = with_mid.groupBy(pid.alias("__pid")).count().collect()
    offsets: list[tuple[int, int]] = []
    total = 0
    for row in sorted(sizes, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], total))
        total += row["count"]
    offset_col = F.element_at(
        F.create_map(*[F.lit(x) for p, off in offsets for x in (p, off)]),
        pid.cast("int"),
    )
    return (
        with_mid.withColumn(id_column, (local_idx + offset_col).cast("long"))
        .select(id_column, *df.columns)
    )
