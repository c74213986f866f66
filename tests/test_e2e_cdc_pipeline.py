"""The §3.1 flagship lifecycle as ONE composed flow (SURVEY.md §3.1):

metadata row -> PipelineConfig -> 3-node DAG (reader -> processor -> writer)
-> CDC envelope split + shard enrich + PII governance + flag columns
-> SCD2 merge into the versioned store, with status/fact observability.

Mirrors Start.main's structure with the reference's class DAG replaced by
function composition (SURVEY.md §7.1 design stance).
"""

from __future__ import annotations

import json

from pyspark.sql import Row, functions as F

from metadata_ingestion_framework_spark.functions.transforms import add_flag_columns, drop_it
from metadata_ingestion_framework_spark.observability import ObservabilityStore
from metadata_ingestion_framework_spark.operators.cdc import (
    enrich_with_shard,
    split_cdc_envelope,
)
from metadata_ingestion_framework_spark.operators.merge import scd2_merge
from metadata_ingestion_framework_spark.plans.metadata import (
    apply_pii_governance,
    extract_fields,
)
from metadata_ingestion_framework_spark.plans.pipeline import Pipeline, PipelineTask
from metadata_ingestion_framework_spark.plans.tablestore import VersionedParquetStore


def _envelope(op, before, after):
    return Row(value=Row(op=op, before=before, after=after,
                         source=Row(db="db1", server_id=7)))


def test_full_cdc_scd2_pipeline(spark, tmp_path):
    store = VersionedParquetStore(spark, str(tmp_path / "tables"))
    obs = ObservabilityStore(spark, str(tmp_path / "obs"))

    # --- metadata (Start.scala:131-191) -----------------------------------
    cfg = extract_fields({
        "pipeline_def_id": "pd_emp", "product_name": "hr", "table_name": "emp_dim",
        "primary_key": "empid", "join_key": "empid",
        "updated_at_col": "updated_at", "omitted_cols": "internal_note",
        "scd_type": "SCD2", "op_config": json.dumps({"format": "parquet"}),
    })

    # --- seed target (current dimension state) ----------------------------
    target = add_flag_columns(
        spark.createDataFrame(
            [(1, "ada", "a@x.com", "AMS", "2020-01-01"),
             (2, "bob", "b@x.com", "NYC", "2020-01-01")],
            "empid int, ename string, email string, place string, updated_at string",
        ),
        with_timestamps=False,
    )
    store.write(target, cfg.table_name)

    # --- CDC batch: update ada's place, insert carol, delete bob ----------
    rec = lambda i, n, e, p, u: Row(empid=i, ename=n, email=e, place=p,  # noqa: E731
                                    updated_at=u, internal_note="x")
    cdc_raw = spark.createDataFrame([
        _envelope("u", rec(1, "ada", "a@x.com", "BER", "2021-06-01"),
                  rec(1, "ada", "a@x.com", "BER", "2021-06-01")),
        _envelope("c", None, rec(3, "carol", "c@x.com", "SFO", "2021-06-01")),
        _envelope("d", rec(2, "bob", "b@x.com", "NYC", "2021-06-01"), None),
    ])
    shards = spark.createDataFrame(
        [("db1", 7, "shard-eu")], "db string, server_id long, shard_name string"
    )
    pii_catalog = [
        {"product_name": "hr", "pii_column_name": "email", "common_flag": True,
         "encryption_flag": False, "anonymization_flag": "complete"},
    ]

    # --- DAG (Start.scala:86-102 shape, function-composed) ----------------
    def reader(_):
        return {"rawdf": cdc_raw}

    def processor(o):
        df = split_cdc_envelope(o["rawdf"])             # T13 + U1
        df = enrich_with_shard(df, shards)              # J2
        df = drop_it(df, *cfg.omitted_cols)             # T7
        df = apply_pii_governance(df, pii_catalog, "hr")  # T2 chain
        df = (
            df.withColumn("current_flag", F.lit(True))  # T16
            .withColumn("expiry_at", F.lit(None).cast("string"))
            .withColumn("deleted_flag", F.col("deleted_flag"))
        )
        return {"processedDf": df}

    def writer(o):
        updates = o["processedDf"].select(
            "empid", "ename", "email", "place", "updated_at",
            "row_active", "deleted_flag", "current_flag", "expiry_at", "email_hash",
        )
        tgt = store.read(cfg.table_name).withColumn(
            "email_hash", F.sha2(F.coalesce(F.col("email"), F.lit("n/a")), 256)
        )
        merged = scd2_merge(
            tgt, updates, cfg.join_keys,
            match_condition="target.current_flag = true AND target.place <> updates.place",
            updated_at_col=cfg.updated_at_col,
        )
        store.write(merged, cfg.table_name)
        obs.write_fact(cfg.pipeline_def_id, "writer", "output_rows", merged.count())
        return {}

    p = Pipeline(cfg.pipeline_def_id, obs=obs)
    p.add_task(PipelineTask("reader", reader))
    p.add_task(PipelineTask("processor", processor, after=["reader"]))
    p.add_task(PipelineTask("writer", writer, after=["processor"]))
    p.run()

    # --- assertions --------------------------------------------------------
    out = store.read(cfg.table_name).cache()
    ada = out.filter("empid = 1").orderBy("updated_at").collect()
    assert len(ada) == 2                      # SCD2: expired old + new current
    assert ada[0]["place"] == "AMS" and ada[0]["current_flag"] is False
    assert str(ada[0]["expiry_at"]).startswith("2021-06-01")  # timestamp col
    assert ada[1]["place"] == "BER" and ada[1]["current_flag"] is True
    bob = out.filter("empid = 2").collect()[0]
    assert bob["deleted_flag"] is True        # soft delete from CDC 'd' op
    carol = out.filter("empid = 3").collect()[0]
    assert carol["place"] == "SFO" and carol["current_flag"] is True
    assert len(carol["email_hash"]) == 64     # PII governance applied
    assert "internal_note" not in out.columns  # omitted column dropped

    statuses = {r["task_name"]: r["status"] for r in obs.read_status().collect()}
    assert statuses == {"reader": "Finished", "processor": "Finished", "writer": "Finished"}
    assert obs.read_facts().filter("metric = 'output_rows'").count() == 1
