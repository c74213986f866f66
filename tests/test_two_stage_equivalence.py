"""Randomized equivalence lock for the two-stage de-skewed windows (r8).

token_budget_select / calibrate_scores / quota_sample / deterministic_
shuffle are range-sharded reformulations of single-window operators; the
whole design rests on the claim that their output is BIT-IDENTICAL to the
naive ``Window.partitionBy(group)`` formulation for any input. The
oracles prove it on the fixed corpus; this locks it on seeded random data
with adversarial shapes — duplicate scores (id tiebreaks live), null
scores and null groups, empty groups, single-row groups, and more shards
than rows.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _random_rows(seed: int, n: int = 120):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        grp = rng.choice(["a", "b", "c", None, "huge"])
        if grp == "huge" or (grp and rng.random() < 0.3):
            pass
        score = rng.choice([None, 0.0, 0.5, round(rng.random(), 2)])
        n_toks = rng.randint(0, 6)
        rows.append((i, grp, score, " ".join(["w"] * n_toks)))
    # skew: most rows in one group
    rows += [(1000 + i, "huge", round(random.Random(seed + i).random(), 2), "x y z")
             for i in range(80)]
    return rows


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_token_budget_two_stage_equals_single_window(spark, seed):
    from metadata_ingestion_framework_spark.functions.sampling import (
        token_budget_select,
    )
    from metadata_ingestion_framework_spark.functions.text import token_count

    df = spark.createDataFrame(
        _random_rows(seed), "doc_id int, grp string, score double, text string"
    )
    got = token_budget_select(
        df, "text", "doc_id", "score", budget_tokens=17, by=["grp"], shards=16
    ).select("doc_id", "n_tokens", "cum_before")
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("score").desc_nulls_last(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = (
        df.withColumn("n_tokens", token_count(F.col("text")).cast("long"))
        .withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .filter(F.col("cum_before") < 17)
        .select("doc_id", "n_tokens", "cum_before")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    for dep in getattr(got, "_persisted_deps", ()):
        dep.unpersist()


@pytest.mark.parametrize("seed", [5, 31])
def test_calibrate_two_stage_equals_percent_rank(spark, seed):
    from metadata_ingestion_framework_spark.functions.sampling import (
        calibrate_scores,
    )

    df = spark.createDataFrame(
        [(i, g, s) for i, g, s, _ in _random_rows(seed)],
        "doc_id int, grp string, score double",
    )
    got = calibrate_scores(df, "score", "doc_id", by=["grp"], shards=16).select(
        "doc_id", "score_pct"
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("score").asc_nulls_first(), F.col("doc_id").asc()
    )
    naive = df.withColumn("score_pct", F.round(F.percent_rank().over(w), 6)).select(
        "doc_id", "score_pct"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    for dep in getattr(got, "_persisted_deps", ()):
        dep.unpersist()


@pytest.mark.parametrize("seed", [7])
def test_quota_two_stage_equals_row_number(spark, seed):
    from metadata_ingestion_framework_spark.functions.sampling import quota_sample

    df = spark.createDataFrame(
        [(i, g, s) for i, g, s, _ in _random_rows(seed)],
        "doc_id int, grp string, score double",
    )
    got = quota_sample(df, "score", "doc_id", cap=5, by=["grp"], shards=16).select(
        "doc_id", "grp_rank"
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc_nulls_last(), F.col("doc_id").asc()
    )
    naive = (
        df.withColumn("grp_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("grp_rank") <= 5)
        .select("doc_id", "grp_rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    for dep in getattr(got, "_persisted_deps", ()):
        dep.unpersist()


def test_det_shuffle_equals_global_sort_rank(spark):
    from metadata_ingestion_framework_spark.functions.sampling import (
        deterministic_shuffle,
        hash_key60,
    )

    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    got = deterministic_shuffle(df, ["doc_id"], salt="eq", shards=16).select(
        "doc_id", "shuffle_rank"
    )
    w = Window.orderBy(hash_key60(["doc_id"], "eq").asc(), F.col("doc_id").asc())
    naive = df.withColumn("shuffle_rank", F.row_number().over(w).cast("long")).select(
        "doc_id", "shuffle_rank"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    for dep in getattr(got, "_persisted_deps", ()):
        dep.unpersist()


def test_deps_exclude_caller_persisted_input(spark):
    """ADVICE r9: releasing an operator's _persisted_deps must not unpersist
    a cache the CALLER created on the input (probe_skew's docs.persist()
    was cooled by the first operator's dep cleanup)."""
    from pyspark.sql import functions as F

    from metadata_ingestion_framework_spark.functions.sampling import (
        calibrate_scores,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(100)], "id long, src string"
    ).persist()
    try:
        df.count()
        out = calibrate_scores(
            df, F.col("id").cast("double"), "id", by=["src"], shards=4
        )
        out.count()
        deps = list(getattr(out, "_persisted_deps", ()))
        assert all(d is not df for d in deps), "caller's own persist leaked into deps"
        for d in deps:
            d.unpersist()
        # the caller's cache must still be live after the release loop
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
    finally:
        df.unpersist()


def test_small_input_bypass_fires_and_matches(spark, tmp_path):
    """r9 (VERDICT r8 item 3): under SINGLE_WINDOW_MAX_BYTES the operators
    use the plain single-window form — no persisted intermediate, no
    range-shard exchange — and produce bit-identical values; an explicit
    shards arg still forces the two-stage path."""
    from pyspark.sql import functions as F

    from metadata_ingestion_framework_spark.functions.sampling import (
        calibrate_scores,
        quota_sample,
        token_budget_select,
    )

    # parquet-backed: RDD-backed plans (createDataFrame) report UNKNOWN
    # size (Long.MaxValue), which correctly keeps the sharded path — the
    # bypass needs real file-stat estimates, like every catalog query has
    spark.createDataFrame(
        [(i, f"s{i % 3}", float(i % 7), "w " * (i % 5 + 1)) for i in range(200)],
        "doc_id long, src string, score double, text string",
    ).write.parquet(str(tmp_path / "docs"))
    df = spark.read.parquet(str(tmp_path / "docs"))

    for fn in (
        lambda s: token_budget_select(
            df, "text", "doc_id", "score", budget_tokens=50, by=["src"], shards=s
        ),
        lambda s: calibrate_scores(df, "score", "doc_id", by=["src"], shards=s),
        lambda s: quota_sample(df, "score", "doc_id", cap=9, by=["src"], shards=s),
    ):
        auto, forced = fn(None), fn(8)
        # bypass: no operator-owned persists; forced: exactly one
        assert not getattr(auto, "_persisted_deps", ()), "bypass should not persist"
        forced_deps = list(getattr(forced, "_persisted_deps", ()))
        assert len(forced_deps) == 1
        auto_plan = auto._jdf.queryExecution().executedPlan().toString().lower()
        assert "rangepartitioning" not in auto_plan, \
            "bypass plan should not range-shard"
        a = {tuple(r) for r in auto.collect()}
        b = {tuple(r) for r in forced.collect()}
        assert a == b, "bypass and sharded values must be identical"
        for d in forced_deps:
            d.unpersist()
