"""Write-time layout -> partition-pruned scans: the documented 100 TB scale
path for the similarity family (an n_probe/n_cells fraction of the corpus
read per query instead of a full pass)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.similarity import (
    ivf_assign,
    lsh_topk,
    random_centroids,
)


def _fake_embeddings(spark, n=200, dim=8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0 - 1.0),
        ).cast("array<float>").alias("embedding"),
    )


def test_ivf_cell_layout_prunes_partitions(spark, tmp_path):
    """Corpus written partitionBy(__ivf_cell): probing 2 cells must produce
    a scan whose PartitionFilters carry the cell predicate (directory-level
    pruning — only n_probe/n_cells of the files are touched)."""
    emb = _fake_embeddings(spark)
    cents = random_centroids(8, 4, seed=7)
    path = str(tmp_path / "ivf_layout")
    ivf_assign(emb, cents).write.partitionBy("__ivf_cell").parquet(path)

    schema = spark.read.parquet(path).schema
    scan = spark.read.schema(schema).parquet(path).filter(F.col("__ivf_cell").isin(0, 1))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__ivf_cell" in plan.split("PartitionFilters")[1][:200]

    expected = ivf_assign(emb, cents).filter(F.col("__ivf_cell").isin(0, 1)).count()
    assert expected > 0

    # behavioral proof the pruning is file-level, not a post-scan filter:
    # corrupt every file of a NON-probed cell — a pruned scan never opens
    # them and still succeeds; an unpruned scan of the same layout fails.
    import glob
    import pytest as _pytest

    corrupted = glob.glob(f"{path}/__ivf_cell=2/*.parquet")
    assert corrupted, "expected cell-2 files in the layout"
    for f in corrupted:
        with open(f, "wb") as fh:
            fh.write(b"not a parquet file")
    assert scan.count() == expected
    with _pytest.raises(Exception):
        spark.read.schema(schema).parquet(path).count()


def test_lsh_multi_probe_superset_recall(spark):
    """Multi-probe candidates strictly contain the single-probe candidates
    (same plane constants -> same buckets, plus the Hamming-1 neighbors),
    so per-query recall against brute force can only improve."""
    emb = _fake_embeddings(spark, n=300)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    single = lsh_topk(emb, queries, dim=8, k=5, n_planes=4)
    multi = lsh_topk(emb, queries, dim=8, k=5, n_planes=4, multi_probe=2)
    s = {(r["query_id"], r["vec_id"], r["score"]) for r in single.collect()}
    m_all = lsh_topk(emb, queries, dim=8, k=10**6, n_planes=4, multi_probe=2)
    m = {(r["query_id"], r["vec_id"], r["score"]) for r in m_all.collect()}
    assert s <= m  # candidate superset
    # no duplicate (query, vec) pairs from the probe expansion
    assert multi.groupBy("query_id", "vec_id").count().filter("count > 1").count() == 0


def test_int8_cell_layout_prunes_and_shrinks(spark, tmp_path):
    """The ivf_topk_int8 write-time layout: codes + scale + cell, float
    vectors in a separate table. Proves (a) the code table is materially
    smaller on disk than the float table, (b) probing cells prunes the
    code-table scan at directory level."""
    import glob
    import os

    from metadata_ingestion_framework_spark.operators.quantize import (
        quantize_embeddings,
    )

    # near-unique float values so neither table dictionary-compresses —
    # the on-disk ratio then reflects the 1-vs-4 bytes/dim physical width
    # instead of toy-scale encodings
    emb = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2**31)) / F.lit(2.0**30)
                - 1.0
            ),
        ).cast("array<float>").alias("embedding"),
    )
    cents = random_centroids(64, 4, seed=7)
    qz = ivf_assign(quantize_embeddings(emb, "embedding"), cents)
    codes_path = str(tmp_path / "codes")
    float_path = str(tmp_path / "floats")
    (
        qz.select(
            "vec_id",
            F.col("embedding_q").cast("array<byte>").alias("codes"),
            "embedding_scale",
            "__ivf_cell",
        )
        .write.partitionBy("__ivf_cell")
        .parquet(codes_path)
    )
    emb.write.parquet(float_path)

    def disk(p):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(f"{p}/**/*.parquet", recursive=True)
        )

    assert disk(codes_path) < disk(float_path) * 0.6  # int8 codes ~4x denser

    schema = spark.read.parquet(codes_path).schema
    scan = (
        spark.read.schema(schema)
        .parquet(codes_path)
        .filter(F.col("__ivf_cell").isin(0, 1))
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "__ivf_cell" in plan.split("PartitionFilters")[1][:200]
    assert scan.count() == qz.filter(F.col("__ivf_cell").isin(0, 1)).count()


def test_zorder_layout_prunes_2d_boxes(spark, tmp_path):
    """Morton-clustered files cover compact 2D boxes: a predicate on the
    SECOND dimension intersects only a few files' min/max stats, where a
    plain sort on the first dimension leaves every file covering the full
    second-dimension range (no pruning possible). Also proves scan
    correctness and that the predicate reaches parquet (PushedFilters)."""
    import glob

    from pyspark.sql import functions as F

    from metadata_ingestion_framework_spark.plans.layout import write_zordered

    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zpath, spath = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    write_zordered(grid, zpath, ["x", "y"], bits=6, n_files=16)
    (
        grid.repartitionByRange(16, "x").sortWithinPartitions("x")
        .write.parquet(spath)
    )

    def files_intersecting_y(path, lo, hi):
        hit = 0
        for f in glob.glob(f"{path}/*.parquet"):
            mn, mx = spark.read.parquet(f).agg(F.min("y"), F.max("y")).collect()[0]
            if mn <= hi and lo <= mx:
                hit += 1
        return hit

    z_hits = files_intersecting_y(zpath, 0, 15)
    s_hits = files_intersecting_y(spath, 0, 15)
    assert s_hits == 16          # x-sorted layout: every file spans all y
    assert z_hits <= 6           # morton layout: ~a quarter of the files

    # correctness + pushdown of the 2D box query on the z layout
    scan = spark.read.parquet(zpath).filter(
        (F.col("x") <= 15) & (F.col("y") <= 15)
    )
    assert scan.count() == 16 * 16
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan


def test_zorder_value_matches_python_reference(spark):
    """Bit-interleave semantics vs a pure-Python Morton encode, including
    null->0 and the signed-long bits guard."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from metadata_ingestion_framework_spark.plans.layout import zorder_value

    def morton(x, y, bits=6):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (63, 63), (5, 9), (None, 3)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = df.select("x", "y", zorder_value(["x", "y"], bits=6).alias("z")).collect()
    for r in out:
        assert r["z"] == morton(r["x"] or 0, r["y"] or 0)
    with _pytest.raises(ValueError):
        zorder_value(["x", "y"], bits=32)
