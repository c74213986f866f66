"""Live Debezium-shaped streaming lifecycle, broker-free (VERDICT r4 item 9 /
r5 next-round item 7).

One real Structured Streaming query drives the reference's §3.1 CDC path
end-to-end: a ``rate-micro-batch`` source synthesizes Confluent-wire-format
Kafka records (5-byte header + envelope payload), which flow through

    decode (wire-strip + envelope parse, ``json_decode_cdc`` — the
    executable twin of ``avro_decode_cdc``; spark-avro is not installable
    here, see readers.py docstring)
    -> split_cdc_envelope -> SCD1 merge per micro-batch (foreachBatch)
    -> offset bookkeeping + status/fact observability
    -> recover_starting_offsets resume JSON

exactly as Readers.scala:108-152 + BaseProcessor.scala:28-115 +
Task.scala:90-142 compose them. The rate payload is a pure function of
``value``, so the final SCD1 state and every recorded offset range are
replayed exactly in Python and asserted value-for-value.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.observability import ObservabilityStore
from metadata_ingestion_framework_spark.operators.cdc import split_cdc_envelope
from metadata_ingestion_framework_spark.operators.merge import scd1_merge
from metadata_ingestion_framework_spark.plans.tablestore import VersionedParquetStore
from metadata_ingestion_framework_spark.sources.readers import json_decode_cdc
from metadata_ingestion_framework_spark.streaming.offsets import (
    offset_ranges_for_batch,
    recover_starting_offsets,
)
from metadata_ingestion_framework_spark.streaming.output import (
    guarded_batch_fn,
    process_output_stream_batch,
)
from metadata_ingestion_framework_spark.streaming.write_config import WriteStreamConfig

ROWS_PER_BATCH = 60
N_KEYS = 30
TOPIC = "emp_cdc"
ENVELOPE_DDL = (
    "op string, "
    "before struct<empid:bigint,ename:string,sal:double,updated_at:bigint>, "
    "after struct<empid:bigint,ename:string,sal:double,updated_at:bigint>, "
    "source struct<db:string,server_id:int>"
)


def _op_for(val: int) -> str:
    if val % 10 == 7:
        return "d"
    return "c" if val % 2 == 0 else "u"


def _synthesized_kafka_stream(spark):
    """Kafka-shaped (value binary, topic, partition, offset, timestamp)
    stream whose every byte is a deterministic function of ``value``."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", ROWS_PER_BATCH)
        .option("numPartitions", 2)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )
    v = F.col("value")
    op = F.when(v % 10 == 7, F.lit("d")).otherwise(
        F.when(v % 2 == 0, F.lit("c")).otherwise(F.lit("u"))
    )
    row = F.struct(
        (v % N_KEYS).alias("empid"),
        F.concat(F.lit("e"), (v % N_KEYS).cast("string")).alias("ename"),
        v.cast("double").alias("sal"),
        v.alias("updated_at"),
    )
    envelope = F.to_json(
        F.struct(
            op.alias("op"),
            F.when(op == "d", row).alias("before"),
            F.when(op != "d", row).alias("after"),
            F.struct(F.lit("db0").alias("db"), F.lit(7).alias("server_id")).alias("source"),
        )
    )
    return raw.select(
        # Confluent wire format: magic 0x00 + 4-byte schema id, then payload
        F.concat(F.lit(b"\x00\x00\x00\x00\x01"), F.encode(envelope, "UTF-8")).alias("value"),
        F.lit(TOPIC).alias("topic"),
        (v % 3).cast("int").alias("partition"),
        v.alias("offset"),
        "timestamp",
    )


def test_rate_cdc_scd1_offsets_live(spark, tmp_path):
    decoded = json_decode_cdc(_synthesized_kafka_stream(spark), ENVELOPE_DDL)
    assert decoded.isStreaming

    store = VersionedParquetStore(spark, str(tmp_path / "tables"))
    obs = ObservabilityStore(spark, str(tmp_path / "obs"))
    done: list[int] = []

    def apply_batch(batch, batch_id):
        flat = split_cdc_envelope(batch)
        target = store.read("emp_dim") if store.exists("emp_dim") else None
        store.write(scd1_merge(target, flat, ["empid"], updated_at_col="updated_at"), "emp_dim")
        done.append(batch_id)

    cfg = WriteStreamConfig(
        checkpoint_location=str(tmp_path / "ckpt"), query_name="rate_cdc_e2e"
    )
    q = process_output_stream_batch(
        decoded,
        cfg,
        guarded_batch_fn(
            apply_batch, obs, "pl_rate", "t_cdc", offset_fn=offset_ranges_for_batch
        ),
        test_mode=False,
    )
    try:
        deadline = time.time() + 90
        finished = 0
        while finished < 2 and time.time() < deadline:
            time.sleep(0.3)
            if len(done) < 2:
                continue
            finished = (
                obs.read_status()
                .filter((F.col("status") == "Finished") & F.col("topic").isNotNull())
                .select("batch_id").distinct().count()
            )
    finally:
        q.stop()
        try:
            q.awaitTermination(30)
        except Exception:
            # stop() may interrupt an in-flight micro-batch mid-write; the
            # committed batches below are still asserted value-for-value
            pass
    assert finished >= 2, f"only {finished} batches finished within the deadline"

    # --- SCD1 state: exact Python replay of every processed envelope -------
    # within a batch the EARLIEST row per key wins (_dedup_updates orders
    # ASCENDING — deliberate Utility.scala:406-413 parity); across batches
    # the later batch's winner upserts over the stored row
    n_batches = store.current_version("emp_dim")
    state: dict[int, int] = {}
    for b in range(n_batches):
        winners: dict[int, int] = {}
        for val in range(b * ROWS_PER_BATCH, (b + 1) * ROWS_PER_BATCH):
            winners.setdefault(val % N_KEYS, val)
        state.update(winners)
    expected = {}
    for e, val in state.items():
        op = _op_for(val)
        expected[e] = (
            e, f"e{e}", float(val), val, "db0", 7, op, op != "d", op == "d"
        )
    got = {
        r["empid"]: (
            r["empid"], r["ename"], r["sal"], r["updated_at"], r["src_db"],
            r["src_server_id"], r["cdc_op"], r["row_active"], r["deleted_flag"],
        )
        for r in store.read("emp_dim").collect()
    }
    assert got == expected

    # --- offset bookkeeping: ranges match the rate source's value layout ---
    status = obs.read_status()
    ranges = (
        status.filter((F.col("status") == "Finished") & F.col("topic").isNotNull())
        .select("batch_id", "partition", "startOffset", "endOffset")
        .collect()
    )
    committed = sorted({r["batch_id"] for r in ranges})
    assert committed == list(range(len(committed))) and len(committed) >= 2
    for r in ranges:
        b, p = r["batch_id"], r["partition"]
        vals = [
            v for v in range(b * ROWS_PER_BATCH, (b + 1) * ROWS_PER_BATCH) if v % 3 == p
        ]
        assert (r["startOffset"], r["endOffset"]) == (min(vals), max(vals))

    # --- resume JSON (Utility.scala:226-249 parity) ------------------------
    import json

    resume = recover_starting_offsets(status, TOPIC, partition_count=3)
    per_part = json.loads(resume)[TOPIC]
    hi = max(c for c in committed) * ROWS_PER_BATCH + ROWS_PER_BATCH
    for p in range(3):
        expect_next = max(v for v in range(hi) if v % 3 == p) + 1
        assert per_part[str(p)] == expect_next
    # a topic with MORE partitions than the status table covers must resume
    # from earliest, not a partial offsets map
    assert recover_starting_offsets(status, TOPIC, partition_count=4) == "earliest"

    # row-count facts recorded per batch
    facts = obs.read_facts().filter(F.col("metric") == "input_rows").collect()
    assert {f["value"] for f in facts} == {ROWS_PER_BATCH}
