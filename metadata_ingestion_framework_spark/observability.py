"""Observability tables (reference parity: Task.scala:52-142, LocalCreate:38-80).

Three append tables: ``pipeline_status`` (per-task state + offsets),
``pipeline_fact`` (row-count facts, mergeSchema on), ``pipeline_error_logs``
(failed rows serialized + stacktrace). The reference writes status via raw
SQL INSERT string interpolation (Task.scala:57) — we use DataFrame appends
(parameterized, injection-free; SURVEY.md §7.4).
"""

from __future__ import annotations

import time
import traceback
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATUS_SCHEMA = (
    "pipeline_id string, task_name string, status string, topic string, "
    "partition int, startOffset long, endOffset long, batch_id long, "
    "run_id string, message string, last_update timestamp"
)
FACT_SCHEMA = (
    "pipeline_id string, task_name string, metric string, value long, "
    "batch_id long, last_update timestamp"
)
ERROR_SCHEMA = (
    "pipeline_id string, task_name string, row_data string, error string, "
    "batch_id long, last_update timestamp"
)


@dataclass
class ObservabilityStore:
    """Parquet-backed status/fact/error sinks under one root path."""

    spark: SparkSession
    root: str

    def _append(self, df: DataFrame, name: str, merge_schema: bool = False) -> None:
        writer = df.write.mode("append")
        if merge_schema:
            writer = writer.option("mergeSchema", "true")
        writer.parquet(f"{self.root}/{name}")

    def _read(self, name: str, schema: str) -> DataFrame:
        try:
            return self.spark.read.parquet(f"{self.root}/{name}")
        except Exception:
            return self.spark.createDataFrame([], schema)

    # -- status (Task.scala:52-64) --------------------------------------
    def write_status(
        self,
        pipeline_id: str,
        task_name: str,
        status: str,
        offset_ranges: DataFrame | None = None,
        batch_id: int = -1,
        run_id: str = "",
        message: str = "",
    ) -> None:
        base = self.spark.createDataFrame(
            [(pipeline_id, task_name, status, batch_id, run_id, message)],
            "pipeline_id string, task_name string, status string, batch_id long, run_id string, message string",
        )
        # empty offsets must not swallow the status row (crossJoin with an
        # empty frame yields zero rows) — fall back to the null-offset shape
        if offset_ranges is not None and not offset_ranges.isEmpty():
            row = base.crossJoin(offset_ranges)
        else:
            row = (
                base.withColumn("topic", F.lit(None).cast("string"))
                .withColumn("partition", F.lit(None).cast("int"))
                .withColumn("startOffset", F.lit(None).cast("long"))
                .withColumn("endOffset", F.lit(None).cast("long"))
            )
        self._append(row.withColumn("last_update", F.current_timestamp()), "pipeline_status")

    def read_status(self) -> DataFrame:
        return self._read("pipeline_status", STATUS_SCHEMA)

    # -- facts (Task.scala:76,96 — mergeSchema append) --------------------
    def write_fact(
        self, pipeline_id: str, task_name: str, metric: str, value: int, batch_id: int = -1
    ) -> None:
        df = self.spark.createDataFrame(
            [(pipeline_id, task_name, metric, value, batch_id)],
            "pipeline_id string, task_name string, metric string, value long, batch_id long",
        ).withColumn("last_update", F.current_timestamp())
        self._append(df, "pipeline_fact", merge_schema=True)

    def read_facts(self) -> DataFrame:
        return self._read("pipeline_fact", FACT_SCHEMA)

    # -- error rows (Task.scala:90-142) -----------------------------------
    def write_errors(
        self, pipeline_id: str, task_name: str, failed: DataFrame, exc: BaseException, batch_id: int = -1
    ) -> None:
        err = "".join(traceback.format_exception(type(exc), exc, exc.__traceback__))[:8000]
        rows = failed.select(
            F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in failed.columns]).alias("row_data")
        )
        out = (
            rows.withColumn("pipeline_id", F.lit(pipeline_id))
            .withColumn("task_name", F.lit(task_name))
            .withColumn("error", F.lit(err))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .withColumn("last_update", F.current_timestamp())
        )
        self._append(out, "pipeline_error_logs")

    def read_errors(self) -> DataFrame:
        return self._read("pipeline_error_logs", ERROR_SCHEMA)


def timed(fn, *args, **kwargs) -> tuple[object, float]:
    """Run fn, return (result, wall seconds) — bench helper."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    return out, time.perf_counter() - t0


def observe_stage(df: DataFrame, name: str, metrics: dict | None = None):
    """Attach plan-level metrics to a pipeline stage: returns
    ``(df, Observation)`` where the observation's named metrics (default:
    ``rows`` count) are computed BY THE SAME JOB that executes the plan —
    zero extra passes, unlike a ``.count()`` fact (which re-runs the
    stage; at 100 TB a per-stage recount IS a second pipeline). Read
    ``obs.get`` after any action on a descendant DataFrame and feed it to
    :meth:`ObservabilityStore.write_fact`.

    Scale/parity note: this is the Spark-native ``Dataset.observe`` API
    (public); the reference's count facts (Task.scala:99-141) re-count.
    Batch only — for streams use the query-progress listener's
    ``observedMetrics`` with the same expressions.
    """
    from pyspark.sql import Observation

    metrics = metrics or {"rows": F.count(F.lit(1))}
    obs = Observation(name)
    out = df.observe(obs, *[v.alias(k) for k, v in metrics.items()])
    return out, obs


def write_observed_facts(
    store: "ObservabilityStore",
    pipeline_id: str,
    task_name: str,
    observations: list,
    batch_id: int = 0,
) -> None:
    """Land ``(stage_name, Observation)`` pairs from :func:`observe_stage`
    as fact rows (one per metric) after the action that populated them."""
    for stage, obs in observations:
        for metric, value in obs.get.items():
            store.write_fact(
                pipeline_id, task_name, f"{stage}.{metric}", int(value), batch_id
            )


def store_health_trends(facts: DataFrame) -> DataFrame:
    """Per-(pipeline, store, run) dedup-store health rollup (r18,
    VERDICT r17 item 5) — the reference's pipeline_fact pattern
    (Task.scala:52-141) applied to the 100 TB dedup-health story: roll
    the per-ingest decision facts ``_emit_ingest_facts`` lands
    (incremental.py) into a drop-rate / bucket-touch TIME SERIES. A
    drop rate collapsing to ~0 means dead dedup state; a spike means a
    feedback loop is re-crawling its own corpus; a bucket-touch count
    growing toward n_buckets is the hash-bucket degeneration mode the
    id-range layouts are designed against (CLAUDE.md).

    One output row per ingest: ``n_batch``, total ``n_dropped`` (summed
    over modalities), integer ``drop_rate_ppm`` recomputed from the
    totals, ``rate_delta_ppm`` vs the SAME store's previous run (NULL
    on its first), and total ``buckets_touched``. Runs order by their
    INGEST TIME (min ``last_update`` of the run's fact rows, run_id
    tiebreak) — a lexicographic run_id order would mis-sequence the
    repo's own 'rN' convention at N >= 10 ('r10' < 'r2') and compute
    the delta against the wrong predecessor (r18 review). A fact frame
    without ``last_update`` (in-plan emulations) falls back to run_id
    order.

    Scale shape: the fact table is telemetry-sized (a handful of rows
    per ingest), so the groupBy and the per-store LAG window are
    trivially bounded; no corpus data flows here."""
    f = facts.filter(F.col("metric").startswith("ingest."))
    has_ts = "last_update" in facts.columns
    parsed = f.select(
        "pipeline_id",
        F.substring_index("task_name", ":", 1).alias("store"),
        F.expr(
            "substring(task_name, instr(task_name, ':') + 1)"
        ).alias("run_id"),
        "metric",
        "value",
        *(["last_update"] if has_ts else []),
    )
    g = parsed.groupBy("pipeline_id", "store", "run_id").agg(
        *(
            [F.min("last_update").alias("__ingested_at")]
            if has_ts else []
        ),
        F.max(
            F.when(F.col("metric") == "ingest.n_batch", F.col("value"))
        ).alias("n_batch"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("metric").startswith("ingest.n_dropped."),
                    F.col("value"),
                )
            ),
            F.lit(0),
        ).cast("long").alias("n_dropped"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("metric").startswith("ingest.buckets_touched."),
                    F.col("value"),
                )
            ),
            F.lit(0),
        ).cast("long").alias("buckets_touched"),
    )
    rate = F.when(
        F.col("n_batch") > 0,
        F.expr("(n_dropped * 1000000) div n_batch"),
    ).otherwise(F.lit(0)).cast("long")
    g = g.withColumn("drop_rate_ppm", rate)
    from pyspark.sql import Window

    order = (
        [
            F.col("__ingested_at").asc_nulls_last(),
            F.col("run_id").asc_nulls_last(),
        ]
        if has_ts
        else [F.col("run_id").asc_nulls_last()]
    )
    w = Window.partitionBy("pipeline_id", "store").orderBy(*order)
    return g.select(
        "pipeline_id",
        "store",
        F.row_number().over(w).cast("long").alias("run_seq"),
        "run_id",
        "n_batch",
        "n_dropped",
        "drop_rate_ppm",
        (
            F.col("drop_rate_ppm")
            - F.lag("drop_rate_ppm").over(w)
        ).cast("long").alias("rate_delta_ppm"),
        "buckets_touched",
    )
