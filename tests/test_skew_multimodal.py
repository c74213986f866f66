"""Skew-mitigation operators + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)
from metadata_ingestion_framework_spark.operators.skew import salted_join, two_stage_agg


def _skewed(spark):
    # one hot key (k=1, 500 rows), a few cold keys
    hot = spark.range(500).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(10).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    return hot.union(cold)


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([(1, "hot"), (3, "cold"), (99, "none")], "k long, name string")
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, ["k"], salt=8).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # the physical shuffle key includes the salt
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_salted_join_left_outer(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([(3, "cold")], "k long, name string")
    plain = left.join(right, "k", "left").select("k", "v", "name")
    salted = salted_join(left, right, ["k"], salt=4, how="left").select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_two_stage_agg_collect_list(spark):
    df = _skewed(spark)
    out = two_stage_agg(df, ["k"], "v", salt=8, finisher=F.sort_array)
    got = {r["k"]: r["vs"] for r in out.collect()}
    assert got[1] == sorted(range(500))  # hot key intact after 2-stage merge
    assert got[2] == [0]


def test_two_stage_agg_collect_set(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (1, "b")], "k int, v string")
    out = two_stage_agg(df, ["k"], "v", salt=4, collect="collect_set", finisher=F.sort_array)
    assert out.collect()[0]["vs"] == ["a", "b"]


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document body number {i} with some content") for i in range(30)],
        "doc_id long, text string",
    )
    return synthesize_media(docs, "doc_id", "text")


def test_synthesize_media_schema(media):
    assert media.count() == 30
    row = media.first()
    assert isinstance(row["payload"], bytearray | bytes)
    assert row["kind"] in {"image", "audio", "video"}
    assert row["width"] >= 64 and row["duration_ms"] >= 1000


def test_extract_features_batched(media):
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(abs(sum(r["features"]) - 1.0) < 1e-9 for r in rows)  # histogram sums to 1


def test_extract_features_strict_marks_missing_codecs(media):
    with pytest.raises(NotImplementedError):
        extract_features(media, strict=True)


def test_resize_images_only_images(media):
    n_images = media.filter("kind = 'image'").count()
    out = resize_images(media, 64, 64)
    assert out.count() == n_images
    assert out.select(F.min("width"), F.max("width")).collect()[0] == (64, 64)


def test_sample_frames_cadence(media):
    vids = media.filter("kind = 'video'")
    expected = vids.select(
        F.sum(F.floor((F.col("duration_ms") - 1) / 1000) + 1).alias("n")
    ).collect()[0]["n"]
    frames = sample_frames(vids, every_ms=1000)
    assert frames.count() == expected
    assert frames.filter("frame_ts % 1000 != 0").count() == 0
