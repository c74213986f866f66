"""Cross-batch stateful streaming dedup (applyInPandasWithState)."""

from __future__ import annotations

from metadata_ingestion_framework_spark.streaming.stateful import stateful_stream_dedup


def test_stateful_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "docs")
    schema = "doc_id long, text string"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    feed([(1, "alpha"), (2, "beta"), (3, "alpha")])  # 3 dups 1 in-batch

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    deduped = stateful_stream_dedup(stream, "doc_id", ["text"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory").queryName("dedup_state")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        feed([(4, "alpha"), (5, "gamma")])  # 4 dups 1 across batches
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r["doc_id"]: r["text"] for r in spark.table("dedup_state").collect()}
    # first occurrence per content wins — in-batch (3) and cross-batch (4)
    # duplicates suppressed; new content (5) passes
    assert rows == {1: "alpha", 2: "beta", 5: "gamma"}
