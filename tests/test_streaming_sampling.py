"""Streaming face of the deterministic sampling family (r8).

Content-hash membership (``hash_bucket`` rule) is a pure per-row predicate,
so the training-mix operators are stream-safe BY CONSTRUCTION: a doc's
membership never depends on what else is in the micro-batch. This test
proves it end-to-end — a file-source stream pushed through foreachBatch
with ``stratified_sample`` and ``deterministic_sample`` accumulates
EXACTLY the batch cut of the same corpus, regardless of how the files
split into micro-batches. (``temperature_mix`` is deliberately NOT
stream-safe per micro-batch: its rates depend on global stratum counts —
the correct streaming form computes rates over the accumulated corpus,
which is the batch operator run downstream.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.functions.sampling import (
    deterministic_sample,
    stratified_sample,
)

RATES = {"en": 0.8, "de": 0.5, "fr": 0.5}


def _corpus(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )


def test_stream_sampling_equals_batch_cut(spark, tmp_path):
    corpus = _corpus(spark)
    src = str(tmp_path / "docs")
    # two files -> at least two micro-batches under maxFilesPerTrigger=1
    corpus.filter("doc_id < 150").coalesce(1).write.parquet(src)
    corpus.filter("doc_id >= 150").coalesce(1).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "sampled")

    def sample_batch(batch, batch_id):
        if batch.isEmpty():
            return
        cut = stratified_sample(batch, "lang", RATES, ["doc_id"], salt="mix1")
        cut = deterministic_sample(cut, ["doc_id"], rate=0.9, salt="thin")
        cut.write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sample_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(60)

    streamed = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    batch_cut = {
        r.doc_id
        for r in deterministic_sample(
            stratified_sample(corpus, "lang", RATES, ["doc_id"], salt="mix1"),
            ["doc_id"], rate=0.9, salt="thin",
        ).collect()
    }
    assert streamed == batch_cut
    assert 0 < len(streamed) < 400  # the cut actually cut something
