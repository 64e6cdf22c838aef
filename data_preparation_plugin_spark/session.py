"""SparkSession factory with scale-oriented defaults.

The reference delegates all execution to PostgreSQL/pandas (SURVEY.md §4.1:
"there is no optimizer"). Here the session *is* the engine, so the defaults
matter: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), explicit shuffle parallelism, Arrow for any pandas interchange,
and a UTC session timezone so event-time semantics are host-independent.

All knobs are overridable via environment (used by the driver) or kwargs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for local[32] testing but written for cluster scale: every
#: one of these is standard on a 1000-executor deployment as well.
_DEFAULT_CONF: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones, demote sort-merge joins to broadcast when runtime stats allow.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Keep Spark's default parallelismFirst=true: post-shuffle coalescing
    # preserves one partition per core, which a min-of-3 A/B measured
    # ~20% faster on the explode-heavy LSH stage at local scale (small
    # shuffles underfill 32 cores when collapsed to the 64MB advisory
    # size). A 100 TB deployment with large shuffles should flip this to
    # false per the Spark SQL guide — there the advisory target governs
    # and per-core partitioning only inflates task counts.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-batched transfer for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic event-time semantics regardless of host timezone; the
    # DuckDB oracle treats parquet timestamps as naive/UTC.
    "spark.sql.session.timeZone": "UTC",
    # Keep timestamps NTZ like the oracle where parquet says so.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # Parquet TIMESTAMP(NANOS) columns (the events fixture) are unreadable
    # by Spark's vectorized reader; read them as raw long nanos and convert
    # explicitly (see plans.registry.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Small dims (region/nation/supplier...) must broadcast, never shuffle.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Target ~128MB input splits (default, stated explicitly for clarity).
    "spark.sql.files.maxPartitionBytes": "134217728",
    # local-mode heap: driver IS the executor here, and Spark's 1g default
    # cannot back 32 concurrent tasks' aggregate hash maps (the x8 scale
    # probe OOMed a 110M-row pair aggregate at 1g). 8g is conservative on
    # this 128 GiB host; a cluster deployment sizes executors instead and
    # this knob is inert. Env-overridable like the rest.
    "spark.driver.memory": "8g",
}


def get_spark(
    app_name: str = "data-preparation-plugin-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``$SPARK_GRAFT_MASTER`` or ``local[N]`` with
    ``N = $SPARK_GRAFT_CPUS`` (fallback ``local[*]``). ``shuffle_partitions``
    defaults to ``$SPARK_GRAFT_CPUS`` or 32 — sized so each shuffle partition
    at the test scale factors fits comfortably in executor memory; on a real
    cluster AQE coalescing makes the static number mostly a ceiling.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = os.environ.get(
            "SPARK_GRAFT_MASTER", f"local[{cpus}]" if cpus else "local[*]"
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem:
        conf["spark.driver.memory"] = mem
    if warehouse_dir is not None:
        conf["spark.sql.warehouse.dir"] = warehouse_dir
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
