"""Dataset golden tests, mirroring the reference's unit suite.

Each test reproduces an assertion from
``data_preparation_plugin/hooks/tests/test_dataset.py`` (cited per test)
against the Spark-native Dataset.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql.types import LongType, StringType, StructField, StructType

from data_preparation_plugin_spark import Dataset, merge_dtype, row2dict

DB = "testdb"


@pytest.fixture()
def dataset(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{DB}`")
    ds = Dataset("test", schema=DB, spark=spark)
    yield ds
    spark.sql(f"DROP TABLE IF EXISTS `{DB}`.`test`")


def _seed(ds, rows):
    schema = StructType(
        [StructField("id", LongType()), StructField("foo", StringType())]
    )
    ds.write_dtype(schema)
    ds.spark.createDataFrame(rows, schema).write.mode("append").format(
        "parquet"
    ).saveAsTable(ds.qualified_name)


def test_iter_rows_golden(dataset):
    """Reference test_iter_rows (test_dataset.py:119-132): literal row dicts."""
    _seed(dataset, [(1, "foo1"), (2, "foo2")])
    rows = sorted(dataset.iter_rows(), key=lambda r: r["id"])
    assert rows == [{"id": 1, "foo": "foo1"}, {"id": 2, "foo": "foo2"}]


def test_iter_rows_head(dataset):
    """Reference head/LIMIT behavior (hooks/dataset.py:153-154) — and ours
    actually streams instead of materializing (dataset.py:155 bug)."""
    _seed(dataset, [(i, f"foo{i}") for i in range(1, 11)])
    assert len(list(dataset.iter_rows(head=3))) == 3


def test_writer_100_rows(dataset):
    """Reference test_writer (test_dataset.py:93-100): 100 buffered rows."""
    _seed(dataset, [])
    with dataset.get_writer(chunksize=10) as writer:
        for i in range(100):
            writer.write_row_dict({"id": i, "foo": f"foo{i}"})
    assert dataset.get_dataframe().count() == 100


def test_writer_flushes_remainder_on_exit(dataset):
    """Buffer smaller than chunksize must flush at context exit
    (reference __exit__, hooks/dataset.py:22-28)."""
    _seed(dataset, [])
    with dataset.get_writer(chunksize=1000) as writer:
        writer.write_row_dict({"id": 1, "foo": "x"})
    assert dataset.get_dataframe().count() == 1


def test_chunked_read(dataset):
    """Reference test_get_dataframes (test_dataset.py:144-152): 5 rows with
    chunksize 2 -> 3 chunks."""
    _seed(dataset, [(i, f"foo{i}") for i in range(5)])
    chunks = list(dataset.get_dataframes(chunksize=2))
    assert [len(c) for c in chunks] == [2, 2, 1]
    assert isinstance(chunks[0], pd.DataFrame)


def test_dtype_roundtrip_detached(dataset):
    """Reference read_dtype detachment (test_dataset.py:102-117): returned
    fields are copies, column names/order preserved."""
    _seed(dataset, [(1, "a")])
    dtype = dataset.read_dtype()
    assert [f.name for f in dtype] == ["id", "foo"]
    dtype[0].name = "mutated"  # must not affect the dataset
    assert [f.name for f in dataset.read_dtype()] == ["id", "foo"]


def test_write_dtype_creates_empty_table(dataset):
    """Reference write_dtype (hooks/dataset.py:172-187): drop + create."""
    schema = StructType(
        [StructField("some_id", LongType()), StructField("foo", StringType())]
    )
    dataset.write_dtype(schema)
    df = dataset.get_dataframe()
    assert df.count() == 0
    assert df.columns == ["some_id", "foo"]


def test_write_with_schema_pandas_index_becomes_id(dataset):
    """Reference test_write_with_schema (test_dataset.py:154-174): pandas
    index -> id column at position 0, inferred types."""
    pdf = pd.DataFrame({"column1": [1, 2, 3, 4], "column2": ["a", "b", "c", "d"]})
    dataset.write_with_schema(pdf)
    out = dataset.get_dataframe()
    assert out.columns == ["id", "column1", "column2"]
    rows = sorted((r.id, r.column1, r.column2) for r in out.collect())
    assert rows == [(0, 1, "a"), (1, 2, "b"), (2, 3, "c"), (3, 4, "d")]


def test_write_with_schema_spark_dense_ids(dataset, spark):
    """Spark-input path synthesizes dense 0-based ids across partitions."""
    sdf = spark.range(0, 97, 1, 8).selectExpr("id * 2 AS column1")
    dataset.write_with_schema(sdf)
    ids = sorted(r.id for r in dataset.get_dataframe().select("id").collect())
    assert ids == list(range(97))


def test_merge_dtype_dedups_by_name():
    """The README's phantom merge_dtype (README.md:149-153): concat two
    schemas, first occurrence of a duplicate column wins."""
    a = StructType([StructField("id", LongType()), StructField("x", StringType())])
    b = StructType([StructField("id", LongType()), StructField("y", StringType())])
    merged = merge_dtype(a, b)
    assert [f.name for f in merged.fields] == ["id", "x", "y"]


def test_row2dict(dataset):
    """The README's phantom row2dict (README.md:169)."""
    _seed(dataset, [(1, "foo1")])
    row = dataset.get_dataframe().collect()[0]
    assert row2dict(row) == {"id": 1, "foo": "foo1"}
