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


def test_guarded_batch_fn_error_flow(spark, tmp_path):
    """Task.scala:90-142 parity: failed batch -> error rows + Error status
    with message, then re-raise; successful batch -> Finished + fact."""
    from metadata_ingestion_framework_spark.observability import ObservabilityStore
    from metadata_ingestion_framework_spark.streaming.output import guarded_batch_fn

    obs = ObservabilityStore(spark, str(tmp_path / "obs"))
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")

    ok = guarded_batch_fn(lambda b, i: None, obs, "p1", "writer")
    ok(batch, 7)
    status = obs.read_status().collect()
    assert any(r["status"] == "Finished" and r["batch_id"] == 7 for r in status)
    assert obs.read_facts().filter("metric = 'input_rows' AND value = 2").count() == 1

    import pytest as _pytest

    def boom(b, i):
        raise RuntimeError("merge failed")

    guarded = guarded_batch_fn(boom, obs, "p1", "writer")
    with _pytest.raises(RuntimeError):
        guarded(batch, 8)
    errs = obs.read_errors().collect()
    assert len(errs) == 2 and "merge failed" in errs[0]["error"]
    assert obs.read_status().filter("status = 'Error' AND batch_id = 8").count() == 1
