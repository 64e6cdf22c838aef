"""Tests for the optional Airflow adapter (operators/airflow_compat.py).

Three layers of signal, so the adapter is tested wherever it runs:

1. Import-gating contract — in an Airflow-less environment (this
   container), ``as_airflow_task`` must raise ImportError and the engine
   package itself must import fine without Airflow on the path.
2. Wiring — a minimal stand-in for ``airflow.operators.python`` installed
   via sys.modules verifies the adapter's actual logic (task_id
   passthrough, kwargs passthrough, and that the python_callable really
   drives ``operator.execute(spark)``) without needing the scheduler.
3. Real Airflow — where ``airflow`` IS installed, the same assertions run
   against the genuine PythonOperator (skipped cleanly here).
"""

from __future__ import annotations

import importlib.util
import sys
import types

import pytest

from pyspark.sql import functions as F

from data_preparation_plugin_spark.operators.base import BaseOperator

HAS_AIRFLOW = importlib.util.find_spec("airflow") is not None


class _ProbeOperator(BaseOperator):
    """Engine operator that records the spark session it was handed."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.seen_spark = None

    def execute(self, spark):
        self.seen_spark = spark
        return spark.range(3).agg(F.count(F.lit(1)).alias("n")).collect()[0].n


@pytest.mark.skipif(HAS_AIRFLOW, reason="airflow installed: gating moot")
def test_as_airflow_task_raises_without_airflow():
    from data_preparation_plugin_spark.operators.airflow_compat import (
        as_airflow_task,
    )

    with pytest.raises(ImportError):
        as_airflow_task(_ProbeOperator(task_id="t"))


def test_engine_importable_without_airflow():
    """The adapter module must not pull airflow at import time."""
    assert "data_preparation_plugin_spark.operators.airflow_compat" or True
    import data_preparation_plugin_spark.operators.airflow_compat  # noqa: F401

    # Importing the adapter must not have imported airflow as a side
    # effect (import-gated inside the function only).
    if not HAS_AIRFLOW:
        assert "airflow" not in sys.modules


def _install_airflow_stub(monkeypatch):
    """Minimal airflow.operators.python with a recording PythonOperator."""

    class PythonOperator:
        def __init__(self, task_id, python_callable, **kwargs):
            self.task_id = task_id
            self.python_callable = python_callable
            self.kwargs = kwargs

    mod_airflow = types.ModuleType("airflow")
    mod_ops = types.ModuleType("airflow.operators")
    mod_py = types.ModuleType("airflow.operators.python")
    mod_py.PythonOperator = PythonOperator
    mod_airflow.operators = mod_ops
    mod_ops.python = mod_py
    monkeypatch.setitem(sys.modules, "airflow", mod_airflow)
    monkeypatch.setitem(sys.modules, "airflow.operators", mod_ops)
    monkeypatch.setitem(sys.modules, "airflow.operators.python", mod_py)
    return PythonOperator


@pytest.mark.skipif(HAS_AIRFLOW, reason="real airflow covers this")
def test_adapter_wiring_with_stub(monkeypatch, spark):
    stub_cls = _install_airflow_stub(monkeypatch)
    from data_preparation_plugin_spark.operators.airflow_compat import (
        as_airflow_task,
    )

    op = _ProbeOperator(task_id="probe_task")
    task = as_airflow_task(op, retries=2)
    assert isinstance(task, stub_cls)
    assert task.task_id == "probe_task"
    assert task.kwargs == {"retries": 2}
    # The callable must drive the engine operator with a live session.
    assert task.python_callable() == 3
    assert op.seen_spark is not None


def _csv_load_operator(tmp_path):
    """A real CsvLoadOperator over a staged CSV — the reference's primary
    ingestion operator (Embulk CSV -> table), wrapped for the scheduler."""
    from data_preparation_plugin_spark.operators.load import (
        CsvLoadOperator,
        LoadSpec,
    )

    src = tmp_path / "nations.csv"
    src.write_text("n_nationkey,n_name\n0,ALGERIA\n1,ARGENTINA\n")
    spec = LoadSpec(
        path=str(src),
        table="airflow_smoke_nation",
        format="csv",
        options={"header": "true"},
        schema="n_nationkey INT, n_name STRING",
        mode="overwrite",
    )
    return CsvLoadOperator(spec, task_id="csv_load_smoke")


def _assert_csv_task_loads(task, spark):
    result = task.python_callable()
    assert result.count() == 2
    assert spark.table("airflow_smoke_nation").count() == 2
    spark.sql("DROP TABLE IF EXISTS airflow_smoke_nation")


@pytest.mark.skipif(HAS_AIRFLOW, reason="real airflow covers this")
def test_csv_load_through_adapter_stub(monkeypatch, spark, tmp_path):
    """The wrapped callable executes a REAL ingestion operator end to end
    (CSV -> catalog table) — the smoke the scheduler would run."""
    _install_airflow_stub(monkeypatch)
    from data_preparation_plugin_spark.operators.airflow_compat import (
        as_airflow_task,
    )

    task = as_airflow_task(_csv_load_operator(tmp_path))
    assert task.task_id == "csv_load_smoke"
    _assert_csv_task_loads(task, spark)


@pytest.mark.skipif(not HAS_AIRFLOW, reason="airflow not installed")
def test_adapter_against_real_airflow(spark, tmp_path):
    from airflow.operators.python import PythonOperator

    from data_preparation_plugin_spark.operators.airflow_compat import (
        as_airflow_task,
    )

    op = _ProbeOperator(task_id="probe_task")
    task = as_airflow_task(op)
    assert isinstance(task, PythonOperator)
    assert task.task_id == "probe_task"
    assert task.python_callable() == 3
    # And the reference's primary ingestion operator through the genuine
    # PythonOperator: build, execute once, observe the loaded table.
    csv_task = as_airflow_task(_csv_load_operator(tmp_path))
    assert isinstance(csv_task, PythonOperator)
    _assert_csv_task_loads(csv_task, spark)
