"""Late-data semantics: watermarked event-time windows drop late rows and
bound state (north-star extension over the reference, SURVEY.md §2.10);
plus the SCD2 streaming foreachBatch flow."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.merge import scd2_merge
from metadata_ingestion_framework_spark.plans.tablestore import VersionedParquetStore
from metadata_ingestion_framework_spark.streaming.windows import (
    session_window_agg,
    watermarked_window_agg,
)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, "ts string, user string, value int").select(
        F.col("ts").cast("timestamp"), "user", "value"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "events")
    schema = "ts timestamp, user string, value int"

    # batch 1: on-time events up to 12:00 -> watermark advances to 11:50
    _write_events(spark, src, [
        ("2021-01-01 10:05:00", "a", 1),
        ("2021-01-01 10:20:00", "a", 1),
        ("2021-01-01 12:00:00", "b", 1),
    ])

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    agg = watermarked_window_agg(
        stream, "ts", "1 hour", "10 minutes", ["user"],
        [F.count(F.lit(1)).alias("n")],
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("wm_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one late event (10:30 < watermark 11:50) + one on-time
        _write_events(spark, src, [
            ("2021-01-01 10:30:00", "a", 1),   # LATE -> dropped
            ("2021-01-01 13:00:00", "b", 1),
        ])
        q.processAllAvailable()
        # batch 3: push the watermark forward so 12:00's window can emit
        _write_events(spark, src, [("2021-01-01 14:00:00", "c", 1)])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {(str(r["window_start"]), r["user"]): r["n"]
            for r in spark.table("wm_test").collect()}
    # the 10:00 window emitted with 2 events — the late 10:30 row was dropped
    assert rows[("2021-01-01 10:00:00", "a")] == 2
    assert rows[("2021-01-01 12:00:00", "b")] == 1


def test_session_window_batch(spark):
    df = spark.createDataFrame(
        [
            ("2021-01-01 10:00:00", "a", 1),
            ("2021-01-01 10:03:00", "a", 1),   # same session (gap 5m)
            ("2021-01-01 10:30:00", "a", 1),   # new session
            ("2021-01-01 10:00:00", "b", 1),
        ],
        "ts string, user string, value int",
    ).select(F.col("ts").cast("timestamp"), "user", "value")
    out = session_window_agg(df, "ts", "5 minutes", ["user"], [F.count(F.lit(1)).alias("n")])
    got = {(r["user"], str(r["session_start"])): r["n"] for r in out.collect()}
    assert got[("a", "2021-01-01 10:00:00")] == 2
    assert got[("a", "2021-01-01 10:30:00")] == 1
    assert got[("b", "2021-01-01 10:00:00")] == 1


def test_streaming_scd2_foreachbatch(spark, tmp_path):
    """SCD2 inside foreachBatch — the reference's stream variant
    (Utility.scala:831-942) reuses the batch merge per micro-batch."""
    store = VersionedParquetStore(spark, str(tmp_path / "tables"))
    target = spark.createDataFrame(
        [(1, "AMS", True, None, "2020-01-01"), (2, "NYC", True, None, "2020-01-01")],
        "empid int, place string, current_flag boolean, expiry_at string, updated_at string",
    )
    store.write(target, "dim_scd2")

    src = str(tmp_path / "updates")
    spark.createDataFrame(
        [(1, "BER", True, None, "2021-06-01")],
        "empid int, place string, current_flag boolean, expiry_at string, updated_at string",
    ).write.parquet(src)

    stream = spark.readStream.schema(target.schema).parquet(src)

    def merge_batch(batch, batch_id):
        if batch.isEmpty():
            return
        merged = scd2_merge(
            store.read("dim_scd2"), batch, ["empid"],
            match_condition="target.current_flag = true AND target.place <> updates.place",
            updated_at_col="updated_at",
        )
        store.write(merged, "dim_scd2")

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(60)

    out = store.read("dim_scd2").cache()
    assert out.count() == 3
    versions = out.filter("empid = 1").orderBy("updated_at").collect()
    assert versions[0]["current_flag"] is False and versions[0]["expiry_at"] == "2021-06-01"
    assert versions[1]["current_flag"] is True and versions[1]["place"] == "BER"


def test_streaming_struct_multiplex_demux(spark, tmp_path):
    """U3 (DeltaWritter.scala:38-39): two streams multiplexed through ONE
    foreachBatch via struct-wrap + union, demuxed inside the batch fn."""
    schema = "id int, v string"
    src_a, src_b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame([(1, "a1"), (2, "a2")], schema).write.parquet(src_a)
    spark.createDataFrame([(9, "b1")], schema).write.parquet(src_b)

    sa = spark.readStream.schema(schema).parquet(src_a)
    sb = spark.readStream.schema(schema).parquet(src_b)
    struct_t = sa.select(F.struct(*sa.columns).alias("x")).schema["x"].dataType
    muxed = sa.select(
        F.struct(*sa.columns).alias("main"),
        F.lit(None).cast(struct_t).alias("side"),
    ).unionByName(
        sb.select(
            F.lit(None).cast(struct_t).alias("main"),
            F.struct(*sb.columns).alias("side"),
        )
    )

    seen = {"main": [], "side": []}

    def demux(batch, batch_id):
        seen["main"].extend(
            r["id"] for r in batch.filter(F.col("main").isNotNull()).select("main.*").collect()
        )
        seen["side"].extend(
            r["id"] for r in batch.filter(F.col("side").isNotNull()).select("side.*").collect()
        )

    q = (
        muxed.writeStream.foreachBatch(demux)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(60)
    assert sorted(seen["main"]) == [1, 2]
    assert seen["side"] == [9]


def test_streaming_scd4_foreachbatch(spark, tmp_path):
    """SCD4 inside foreachBatch (Utility.scala:956-1045): history pre-image
    captured per micro-batch, current table upserted."""
    from metadata_ingestion_framework_spark.operators.merge import scd4_merge

    store = VersionedParquetStore(spark, str(tmp_path / "t4"))
    target = spark.createDataFrame(
        [(1, "AMS", "2020-01-01", True), (2, "NYC", "2020-01-01", True)],
        "empid int, place string, updated_at string, row_active boolean",
    )
    store.write(target, "dim4")

    src = str(tmp_path / "u4")
    spark.createDataFrame(
        [(1, "BER", "2021-06-01", True), (3, "SFO", "2021-06-01", True)],
        "empid int, place string, updated_at string, row_active boolean",
    ).write.parquet(src)

    def merge_batch(batch, batch_id):
        if batch.isEmpty():
            return
        hist = store.read("dim4_history") if store.exists("dim4_history") else None
        cur, new_hist = scd4_merge(
            store.read("dim4"), hist, batch, ["empid"], updated_at_col="updated_at"
        )
        # write history first (cur plan reads the pre-merge dim4 version)
        store.write(new_hist, "dim4_history")
        store.write(cur, "dim4")

    stream = spark.readStream.schema(target.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "c4"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(60)

    cur = {r["empid"]: r["place"] for r in store.read("dim4").collect()}
    assert cur == {1: "BER", 2: "NYC", 3: "SFO"}
    hist = store.read("dim4_history").collect()
    assert len(hist) == 1 and hist[0]["place"] == "AMS"
    assert hist[0]["history_created_at"] == "2021-06-01"


def test_stream_stream_interval_join_with_watermarks(spark, tmp_path):
    """Streaming face of the range-join family: two watermarked file
    streams joined on key + a time interval (Spark's native stream-stream
    interval join). Verifies the joined pairs equal the batch inequality
    join of the same data — and that the watermark bounds state (the query
    runs with both sides' state eviction conditions present)."""
    import datetime as dt

    from pyspark.sql import functions as F

    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return T0 + dt.timedelta(minutes=minutes)

    clicks = [(1, 10, ts(0)), (2, 10, ts(30)), (3, 11, ts(10))]
    buys = [(100, 10, ts(5)), (101, 10, ts(90)), (102, 11, ts(11))]
    c_src, b_src = str(tmp_path / "clicks"), str(tmp_path / "buys")
    spark.createDataFrame(clicks, "cid long, user long, cts timestamp").write.parquet(c_src)
    spark.createDataFrame(buys, "bid long, user long, bts timestamp").write.parquet(b_src)

    cs = (
        spark.readStream.schema("cid long, user long, cts timestamp")
        .parquet(c_src).withWatermark("cts", "10 minutes")
    )
    bs = (
        spark.readStream.schema("bid long, user long, bts timestamp")
        .parquet(b_src).withWatermark("bts", "10 minutes")
    )
    # buy within [click, click + 20 minutes]
    joined = cs.join(
        bs,
        (cs.user == bs.user)
        & (bs.bts >= cs.cts)
        & (bs.bts <= cs.cts + F.expr("INTERVAL 20 MINUTES")),
    ).select("cid", "bid")

    q = (
        joined.writeStream.format("memory").queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["cid"], r["bid"]) for r in spark.sql("SELECT * FROM ssj").collect()}
    expect = {
        (c, b)
        for c, cu, ct in clicks
        for b, bu, bt in buys
        if cu == bu and ct <= bt <= ct + dt.timedelta(minutes=20)
    }
    assert got == expect and expect == {(1, 100), (3, 102)}
