"""spill_barrier (operators/barrier.py, r18 OPT): the lineage barrier
behind pretrain_corpus_e2e's 40s -> 13s rewrite must preserve rows and
schema exactly, truncate the plan to a bare scan, release the frames it
is told to, and delete its scratch dir through the _persisted_deps
protocol (BarrierHandle.unpersist)."""

import os

from pyspark import StorageLevel
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.barrier import (
    BarrierHandle,
    spill_barrier,
)


def test_barrier_preserves_rows_schema_and_truncates_plan(spark):
    df = (
        spark.range(100)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("s"),
        )
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.max("s").alias("mx"))
    )
    out = spill_barrier(df)
    # file-source reads widen nullability; names and types are exact
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))
    # plan is a bare parquet scan: no Exchange/Aggregate survives
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "HashAggregate" not in plan
    deps = out._persisted_deps
    assert len(deps) == 1 and isinstance(deps[0], BarrierHandle)
    path = deps[0].path
    assert os.path.isdir(path)
    deps[0].unpersist()
    assert not os.path.exists(path)


def test_barrier_releases_the_frames_it_is_given(spark):
    base = spark.range(50).select(F.col("id").alias("k")).persist()
    inner = spark.range(10).select(F.col("id").alias("j")).persist()
    inner.count()
    carrier = base.filter("k < 25")
    carrier._persisted_deps = [inner]
    base.count()
    assert base.storageLevel != StorageLevel.NONE
    out = spill_barrier(carrier, release=(carrier, base))
    # base unpersisted directly, inner released via carrier's deps
    assert base.storageLevel == StorageLevel.NONE
    assert inner.storageLevel == StorageLevel.NONE
    assert out.count() == 25
    out._persisted_deps[0].unpersist()


def test_barrier_path_is_unique_per_call(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    a, b = spill_barrier(df), spill_barrier(df)
    pa, pb = a._persisted_deps[0].path, b._persisted_deps[0].path
    assert pa != pb  # fresh uuid per invocation: no cross-run reuse
    a._persisted_deps[0].unpersist()
    b._persisted_deps[0].unpersist()
