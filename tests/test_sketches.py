"""Count-min sketch (operators/sketches.py): one-sided guarantee over
EVERY key, mergeability, weighted counts, and bounded counter table."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.sketches import (
    cms_build,
    cms_estimate,
)


def _words(spark, n=3000, vocab=200):
    return spark.range(n).select(
        F.concat(F.lit("w"), F.pmod(F.xxhash64("id"), F.lit(vocab))).alias("key")
    )


def test_one_sided_guarantee_every_key(spark):
    """est >= true for ALL keys (not just heavy hitters) — the CMS
    theorem, checked exhaustively on a colliding config."""
    df = _words(spark)
    depth, width = 3, 64  # 200 keys -> heavy collisions
    sketch = cms_build(df, "key", depth=depth, width=width)
    true = df.groupBy("key").agg(F.count(F.lit(1)).alias("true_n"))
    est = cms_estimate(true, sketch, "key", depth=depth, width=width)
    bad = est.filter(F.col("cms_est") < F.col("true_n")).count()
    assert bad == 0
    # counter table is bounded by the CONFIG, not the key cardinality
    assert sketch.count() <= depth * width


def test_sketches_merge_by_counter_addition(spark):
    """sketch(A ∪ B) == counter-wise sum of sketch(A) and sketch(B) —
    the property that makes per-partition/per-batch sketches combinable."""
    a, b = _words(spark, 1000), _words(spark, 1500, vocab=150)
    u = a.unionByName(b)
    depth, width = 3, 128
    su = cms_build(u, "key", depth, width)
    merged = (
        cms_build(a, "key", depth, width)
        .unionByName(cms_build(b, "key", depth, width))
        .groupBy("seed", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, su.collect())) == sorted(map(tuple, merged.collect()))


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 2), ("b", 1)], "key string, w int"
    )
    sketch = cms_build(df, "key", depth=2, width=1024, weight_col="w")
    est = cms_estimate(
        df.select("key").distinct(), sketch, "key", depth=2, width=1024
    )
    got = {r.key: r.cms_est for r in est.collect()}
    assert got["a"] >= 7 and got["b"] >= 1


def test_absent_key_estimates_nonnegative(spark):
    df = _words(spark, 500)
    sketch = cms_build(df, "key", depth=3, width=4096)
    probe = spark.createDataFrame([("never-seen",)], "key string")
    est = cms_estimate(probe, sketch, "key", depth=3, width=4096).collect()
    assert est[0].cms_est >= 0
