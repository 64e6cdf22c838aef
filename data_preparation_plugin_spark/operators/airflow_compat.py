"""Optional Airflow adapter for the pipeline operators.

The reference is an Airflow plugin (``data_preparation_plugin.py:11-18``
registers operators with the scheduler); this engine's operators are plain
Python classes runnable standalone (``BaseOperator.execute(spark)``), which
is what the tests and the driver exercise. When a real Airflow deployment
is present, ``as_airflow_task`` wraps any engine operator into an Airflow
task without the engine importing Airflow at module load (the scheduler
environment owns that dependency, per the reference's own split).
"""

from __future__ import annotations

from typing import Any

from data_preparation_plugin_spark.operators.base import BaseOperator
from data_preparation_plugin_spark.session import get_spark


def as_airflow_task(operator: BaseOperator, **airflow_kwargs: Any):
    """Wrap an engine operator into an ``airflow.operators.python``
    PythonOperator. Raises ImportError where Airflow is absent (this
    container), by design — the engine itself never depends on Airflow.
    """
    from airflow.operators.python import PythonOperator  # import-gated

    def _run(**_context: Any):
        spark = get_spark(app_name=f"dpp-{operator.task_id or 'task'}")
        return operator.execute(spark)

    return PythonOperator(
        task_id=operator.task_id or operator.__class__.__name__.lower(),
        python_callable=_run,
        **airflow_kwargs,
    )


__all__ = ["as_airflow_task"]
