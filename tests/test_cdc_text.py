"""CDC envelope + text-analysis tests."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from metadata_ingestion_framework_spark.functions.text import (
    detect_language,
    fingerprint,
    quality_score,
    token_count,
    word_token_count,
)
from metadata_ingestion_framework_spark.operators.cdc import (
    enrich_with_shard,
    split_cdc_envelope,
)


def _envelope(op, before, after, db="db1", server_id=7):
    return Row(value=Row(op=op, before=before, after=after, source=Row(db=db, server_id=server_id)))


def _cdc_df(spark):
    rec = lambda i, n: Row(id=i, name=n)  # noqa: E731
    rows = [
        _envelope("c", None, rec(1, "ada")),
        _envelope("u", rec(2, "bob"), rec(2, "bob2")),
        _envelope("d", rec(3, "carol"), None),
        _envelope("r", None, rec(9, "snapshot")),  # unknown op -> dropped
    ]
    return spark.createDataFrame(rows)


def test_split_cdc_envelope(spark):
    out = split_cdc_envelope(_cdc_df(spark)).cache()
    assert out.count() == 3  # 'r' rows dropped (filter op in c,u,d)
    ups = {r["id"]: r for r in out.filter("row_active").collect()}
    assert set(ups) == {1, 2}
    assert ups[2]["name"] == "bob2"  # upserts read value.after
    assert ups[1]["cdc_op"] == "c" and ups[1]["deleted_flag"] is False
    dels = out.filter("NOT row_active").collect()
    assert len(dels) == 1 and dels[0]["id"] == 3 and dels[0]["name"] == "carol"
    assert dels[0]["deleted_flag"] is True  # deletes read value.before
    assert dels[0]["src_db"] == "db1" and dels[0]["src_server_id"] == 7


def test_enrich_with_shard_broadcast(spark):
    cdc = split_cdc_envelope(_cdc_df(spark))
    shards = spark.createDataFrame(
        [("db1", 7, "shard-eu"), ("db2", 8, "shard-us")],
        "db string, server_id long, shard_name string",
    )
    out = enrich_with_shard(cdc, shards)
    assert out.count() == 3
    assert {r["shard_name"] for r in out.collect()} == {"shard-eu"}
    # inner join drops CDC rows with no shard mapping
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world, it's 42 degrees",)], "t string")
    row = df.select(
        token_count(F.col("t")).alias("ws"),
        word_token_count(F.col("t")).alias("bpe"),
    ).collect()[0]
    assert row["ws"] == 5
    # hello|world|,|it|'|s|42|degrees
    assert row["bpe"] == 8


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is happy"),
            (2, "el gato esta en la casa y es feliz"),
            (3, "zzz qqq xxx"),
        ],
        "id int, t string",
    )
    out = {r["id"]: r["lang"] for r in df.select("id", detect_language(F.col("t")).alias("lang")).collect()}
    assert out[1] == "en" and out[2] == "es" and out[3] == "und"


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [(1, "A well formed readable english sentence flows nicely."),
         (2, "!!! ### $$$ %%% ^^^ &&&")],
        "id int, t string",
    )
    out = {r["id"]: r["q"] for r in df.select("id", quality_score(F.col("t")).alias("q")).collect()}
    assert 0.0 <= out[2] < out[1] <= 1.0


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different")], "id int, t string"
    )
    out = {r["id"]: r["fp"] for r in df.select("id", fingerprint(F.col("t")).alias("fp")).collect()}
    assert out[1] == out[2] != out[3]
