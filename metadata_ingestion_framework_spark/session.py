"""SparkSession factory with scale-appropriate defaults.

The reference tunes its sessions at HistLoadStart.scala:27-31 (AQE on,
shuffle.partitions = 4x parallelism, small maxPartitionBytes). We keep the
same intent but Spark-4-idiomatic: AQE owns runtime partition coalescing and
skew-join splitting, so a static 4x multiplier is unnecessary; we set an
upper bound and let AQE coalesce down.

At 100 TB the same code runs unchanged on a real cluster: every knob here is
either harmless (UTC, Arrow) or adaptive (AQE); nothing assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One shared warehouse/checkpoint scratch root for local runs and tests.
SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/mifs_spark")


def get_spark(
    app_name: str = "metadata_ingestion_framework_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Defaults mirror the reference's session tuning (HistLoadStart.scala:27-31)
    re-expressed for Spark 4: AQE + partition coalescing + skew-join handle at
    runtime what the reference set statically.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")

    n_shuffle = shuffle_partitions or int(cpus)
    conf = {
        # AQE: runtime re-plan — coalesce post-shuffle partitions, split skew.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Upper bound for shuffles; AQE coalesces below it.
        "spark.sql.shuffle.partitions": str(n_shuffle),
        # Arrow for every pandas_udf / toPandas boundary.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Deterministic cross-engine comparison (duckdb oracle is UTC-naive).
        "spark.sql.session.timeZone": "UTC",
        # Parquet TIMESTAMP(NANOS) (e.g. pandas-written events tables) has no
        # Spark timestamp type; read as long and convert with integer math
        # (see catalog_queries.t / with_event_time).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # timestamp[us] without UTC adjustment must read as LTZ instants
        # (TIMESTAMP_NTZ breaks unix_micros and epoch arithmetic parity).
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        # Local-run ergonomics; no-ops on a real cluster deployment.
        "spark.sql.warehouse.dir": os.path.join(SCRATCH, "warehouse"),
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": os.environ.get("SPARK_GRAFT_UI", "false"),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
