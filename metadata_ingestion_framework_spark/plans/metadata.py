"""Metadata-driven pipeline configuration (reference parity: Start.scala:131-191).

The reference's control plane is rows in `orchestration_db.table_details`
(schema at StartTest.scala:29-54; see FIXTURES.md §3): each row carries the
source/target identity, CSV-encoded key lists, a JSON ``op_config`` (stream
writer options) and a JSON ``merge_cond`` (ordered merge clauses). This
module decodes one row into a typed :class:`PipelineConfig` and applies the
``pii_column_details`` catalog to a DataFrame.

Driver-side work here is bounded by the number of PIPELINES, never by data:
the only collect is over the metadata join (one row per source table), the
reference's own pattern (Start.scala:227 ``df.collect``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.functions.pii import (
    encrypt_it,
    hash_it_partial,
    identify_columns,
)
from metadata_ingestion_framework_spark.functions.hashing import hash_it_complete
from metadata_ingestion_framework_spark.operators.merge import MergeClause
from metadata_ingestion_framework_spark.streaming.write_config import WriteStreamConfig


@dataclass
class PipelineConfig:
    """Typed decode of one table_details row (Start.scala:131-191)."""

    pipeline_def_id: str
    product_name: str
    table_name: str
    scd_type: str = "scd1"
    primary_keys: list[str] = field(default_factory=list)
    join_keys: list[str] = field(default_factory=list)
    partition_col: str | None = None
    updated_at_col: str | None = None
    omitted_cols: list[str] = field(default_factory=list)
    write_config: WriteStreamConfig = field(default_factory=WriteStreamConfig)
    merge_clauses: list[MergeClause] | None = None
    extra_join_condition: str | None = None
    reader_type: str = "parquet"
    reader_options: dict[str, str] = field(default_factory=dict)


def _csv_list(v: Any) -> list[str]:
    """The reference stores key lists as comma-joined strings (Start:165-183)."""
    if not v or (isinstance(v, str) and not v.strip()):
        return []
    return [s.strip() for s in str(v).split(",") if s.strip()]


def decode_op_config(js: str | None) -> WriteStreamConfig:
    """JSON ``op_config`` -> WriteStreamConfig (Start.scala:139).

    Accepts the reference's field names (`format`, `triggerMode`,
    `triggerDuration`, `checkpointLocation`, `outputMode`, `partitionBy`).
    """
    if not js:
        return WriteStreamConfig()
    d = json.loads(js)
    trigger = None
    mode = (d.get("triggerMode") or "").lower()
    if mode == "processingtime":
        trigger = {"processingTime": d.get("triggerDuration", "0 seconds")}
    elif mode == "once":
        trigger = {"once": True}
    elif mode == "availablenow":
        trigger = {"availableNow": True}
    elif mode == "continuous":
        trigger = {"continuous": d.get("triggerDuration", "1 second")}
    return WriteStreamConfig(
        checkpoint_location=d.get("checkpointLocation"),
        output_mode=d.get("outputMode", "append"),
        partition_by=_csv_list(d.get("partitionBy")),
        fmt=d.get("format", "parquet"),
        query_name=d.get("queryName"),
        trigger=trigger,
        txn_version=d.get("txnVersion"),
        txn_app_id=d.get("txnAppId"),
        extra_options={k: str(v) for k, v in d.get("extraOptions", {}).items()},
    )


def decode_merge_cond(js: str | None) -> list[MergeClause] | None:
    """JSON ``merge_cond`` -> ordered MergeClause list (Start.scala:143-163).

    Accepts BOTH the reference's encoding —
    ``[{"condtionType": "match"|"notmatch", "condition": ..,
    "updateInsertMap": {"target.col": "expr"}}]`` (the 'condtion' typo is the
    reference's, parquet2delta.csv:2) — and this engine's plainer
    ``{"when","action","condition","set"}`` shape.
    """
    if not js:
        return None
    raw = json.loads(js)
    out: list[MergeClause] = []
    for c in raw:
        if "when" in c:  # native shape
            out.append(MergeClause(
                when=c["when"], action=c["action"],
                condition=c.get("condition"), set=c.get("set"),
            ))
            continue
        ctype = (c.get("condtionType") or c.get("conditionType") or "").lower()
        setmap = c.get("updateInsertMap")
        if setmap:  # strip the reference's 'target.' prefix on assignment keys
            setmap = {k.split(".", 1)[-1]: v for k, v in setmap.items()}
        if ctype == "match":
            action = (c.get("action") or "update").lower()
            out.append(MergeClause("matched", action, c.get("condition"), setmap))
        elif ctype == "notmatch":
            out.append(MergeClause("not_matched", "insert", c.get("condition"), setmap))
        else:
            raise ValueError(f"unknown merge_cond entry: {c}")
    return out


def extract_fields(row: Row | dict) -> PipelineConfig:
    """One table_details row -> PipelineConfig (Start.scala:131-191)."""
    d = row.asDict() if isinstance(row, Row) else dict(row)
    return PipelineConfig(
        pipeline_def_id=d.get("pipeline_def_id", ""),
        product_name=d.get("product_name", ""),
        table_name=d.get("table_name", ""),
        scd_type=(d.get("scd_type") or "scd1").lower(),
        primary_keys=_csv_list(d.get("primary_key")),
        join_keys=_csv_list(d.get("join_key")) or _csv_list(d.get("primary_key")),
        partition_col=(d.get("partition_id_col") or None),
        updated_at_col=(d.get("updated_at_col") or None),
        omitted_cols=_csv_list(d.get("omitted_cols")),
        write_config=decode_op_config(d.get("op_config")),
        merge_clauses=decode_merge_cond(d.get("merge_cond")),
        extra_join_condition=(d.get("extra_join_cond") or None),
        reader_type=(d.get("reader_type") or "parquet").lower(),
        reader_options=json.loads(d["reader_options"]) if d.get("reader_options") else {},
    )


def pipelines_for_batch(
    table_details: DataFrame, batch_map: DataFrame, batch_ids: list[str]
) -> list[PipelineConfig]:
    """Metadata join (J7, Start.scala:228-243): one PipelineConfig per source
    table in the requested batches. Bounded collect — one row per pipeline."""
    rows = (
        table_details.alias("t")
        .join(F.broadcast(batch_map.alias("b")), "pipeline_def_id")
        .filter(F.col("b.batch_id").isin(batch_ids))
        .select("t.*")
        .distinct()
        .collect()
    )
    return [extract_fields(r) for r in rows]


def jdbc_options_for_shard(
    shard: Row | dict,
    secret_resolver=None,
    driver: str = "com.mysql.cj.jdbc.Driver",
) -> dict[str, str]:
    """shard_details row -> JDBC reader options (PipelineBuilder.scala:107-129).

    The reference pulls user/password from a Databricks secret scope named
    by the shard row; ``secret_resolver(scope, key) -> str`` abstracts that
    (default: environment variables ``<SCOPE>_<KEY>``, uppercased) so the
    same metadata drives any secret backend.
    """
    import os

    d = shard.asDict() if isinstance(shard, Row) else dict(shard)

    def resolve(scope: str, key: str) -> str:
        if secret_resolver is not None:
            return secret_resolver(scope, key)
        return os.environ.get(f"{scope}_{key}".upper().replace("-", "_"), "")

    scope = d.get("secret_scope", "")
    return {
        "driver": driver,
        "url": f"jdbc:mysql://{d.get('endpoint', '')}/{d.get('database_name', '')}",
        "user": resolve(scope, d.get("secret_user", "user")),
        "password": resolve(scope, d.get("secret_password", "password")),
    }


def failed_runs_for_rerun(status: DataFrame, batch_ids: list[str]) -> DataFrame:
    """Latest run per batch, kept only if it failed (Start.scala:198-218).

    rank() over (partition by batch order by last_update desc) = 1, status
    'Error' -> the (batch_id, run_id) pairs the RERUN path re-executes.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("batch_id").orderBy(F.col("last_update").desc())
    return (
        status.filter(F.col("batch_id").isin(batch_ids))
        .withColumn("__rk", F.rank().over(w))
        .filter((F.col("__rk") == 1) & (F.col("status") == "Error"))
        .select("batch_id", "run_id")
        .distinct()
    )


def apply_pii_governance(
    df: DataFrame,
    pii_catalog: list[Row] | list[dict],
    product_name: str | None = None,
    encryption_key: str | None = None,
) -> DataFrame:
    """Apply the ``pii_column_details`` catalog to a DataFrame.

    Catalog schema (FIXTURES.md §2, pii_columns_list.csv): per row
    ``pii_column_name``, ``common_flag`` (exact vs substring resolution,
    Utility.scala:209-223), ``encryption_flag`` (AES), ``anonymization_flag``
    in {'complete' (per-column SHA-256), 'partial' (free-text PII scan)}.
    Parity: BaseProcessor.scala:70-82 — the processor resolves the catalog
    against the frame's columns, then chains hash/encrypt transforms.
    """
    rows = [r.asDict() if isinstance(r, Row) else dict(r) for r in pii_catalog]
    if product_name is not None:
        rows = [r for r in rows if r.get("product_name") in (None, product_name)]

    def resolve(filtered: list[dict]) -> list[str]:
        wanted = [(r["pii_column_name"], bool(r["common_flag"])) for r in filtered]
        return identify_columns(df.columns, wanted)

    complete = resolve([r for r in rows if (r.get("anonymization_flag") or "") == "complete"])
    partial = resolve([r for r in rows if (r.get("anonymization_flag") or "") == "partial"])
    encrypted = resolve([r for r in rows if r.get("encryption_flag")])

    if complete:
        df = hash_it_complete(df, 256, *complete)
    if partial:
        df = hash_it_partial(df, *partial)
    if encrypted:
        df = encrypt_it(df, *encrypted, key=encryption_key)
    return df
