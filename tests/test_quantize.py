"""int8 embedding quantization: bound, zero-vector, and contract checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.quantize import (
    dequantize,
    quantization_error_stats,
    quantize_embeddings,
)


def test_quantize_roundtrip_within_one_step(spark):
    rows = [
        (1, "a", [0.5, -1.25, 3.75, 0.0]),
        (2, "a", [100.0, -100.0, 50.0, 25.0]),
        (3, "b", [1e-6, -1e-6, 0.0, 0.0]),
        (4, "b", [0.0, 0.0, 0.0, 0.0]),  # zero vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    q = quantize_embeddings(df)
    out = q.withColumn(
        "deq", dequantize(F.col("embedding_q"), F.col("embedding_scale"))
    ).collect()
    for r in out:
        assert all(abs(v) <= 127 for v in r["embedding_q"])
        for orig, rec in zip(r["embedding"], r["deq"]):
            bound = r["embedding_scale"] if r["embedding_scale"] > 0 else 1e-12
            assert abs(orig - rec) <= bound + 1e-12
    zero = [r for r in out if r["vec_id"] == 4][0]
    assert zero["embedding_scale"] == 0.0
    assert zero["embedding_q"] == [0, 0, 0, 0] and zero["deq"] == [0.0] * 4


def test_quantization_error_stats_contract(spark):
    df = spark.createDataFrame(
        [(i, "g", [float(i), float(-i), i / 3.0, 0.1 * i]) for i in range(1, 40)],
        "vec_id long, label string, embedding array<double>",
    )
    stats = quantization_error_stats(df, "label").collect()
    assert len(stats) == 1
    r = stats[0]
    assert r["n_vectors"] == 39 and r["n_within_bound"] == 39
    assert 0.0 <= r["avg_max_err"] < 1.0
