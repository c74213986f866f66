"""Round-6 regression locks (r5 ADVICE items 2-4):

- Arrow vector kernels must tolerate null / ragged embedding rows (emit
  NULL for the derived column, or drop the row for pair generation) instead
  of failing the whole Arrow batch on one dirty record.
- The BLAS-vs-fold re-check band is magnitude-scaled (4·dim·eps·|m|@|p|),
  not a fixed 1e-9 — large-magnitude vectors must still bit-match the JVM
  fold expressions.
- with_lsh_buckets refuses >= 63 planes (int64 weight overflow vs
  lsh_bucket's arbitrary-precision 2**i).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.similarity import (
    embedding_near_duplicates,
    ivf_assign,
    l2_norm,
    lsh_bucket,
    random_centroids,
    random_hyperplanes,
    with_l2_norm,
    with_lsh_buckets,
)

DIM = 4


@pytest.fixture()
def dirty(spark):
    """5 rows: 3 clean, one NULL embedding, one ragged (wrong dim)."""
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.5, 0.5, 0.5, 0.5]),
            (3, None),
            (4, [1.0, 2.0]),
            (5, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id int, embedding array<double>",
    )


def test_with_l2_norm_nulls_dirty_rows(dirty):
    rows = {
        r.vec_id: r.n
        for r in with_l2_norm(dirty, "embedding", "n").select("vec_id", "n").collect()
    }
    # null -> NULL; ragged lengths are legal (per-length stacking, like the
    # JVM expression); clean rows exact
    assert rows[1] == 1.0 and rows[3] is None
    assert rows[2] == pytest.approx(1.0)
    assert rows[4] == pytest.approx(5.0 ** 0.5)


def test_with_lsh_buckets_nulls_dirty_rows(dirty):
    planes = random_hyperplanes(DIM, 4)
    rows = {
        r["vec_id"]: r["__bucket"]
        for r in with_lsh_buckets(dirty, planes).select("vec_id", "__bucket").collect()
    }
    assert rows[3] is None and rows[4] is None
    # clean rows still bit-match the JVM expression
    for vid in (1, 2, 5):
        assert rows[vid] is not None


def test_ivf_assign_nulls_dirty_rows(dirty):
    cents = random_centroids(DIM, 3)
    rows = {
        r["vec_id"]: r["__ivf_cell"]
        for r in ivf_assign(dirty, cents).select("vec_id", "__ivf_cell").collect()
    }
    assert rows[3] is None and rows[4] is None
    assert all(rows[v] is not None for v in (1, 2, 5))


def test_embedding_neardup_drops_dirty_rows(spark):
    df = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0]),
            (2, "a", [1.0, 1e-9]),
            (3, "a", None),
            (4, "a", [1.0, 0.0, 0.0]),
        ],
        "vec_id int, blk string, embedding array<double>",
    )
    pairs = embedding_near_duplicates(df, "blk", threshold=0.9).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_embedding_neardup_dirty_row_first(spark):
    """r7 VERDICT item 6: the off-dim row sorts FIRST in the block (lowest
    id). The old first-non-null-row dim inference would have adopted its
    length and masked out every clean row; modal-length inference must keep
    the clean pair."""
    df = spark.createDataFrame(
        [
            (0, "a", [9.0, 9.0, 9.0]),  # ragged, sorts first
            (1, "a", [1.0, 0.0]),
            (2, "a", [1.0, 1e-9]),
            (3, "a", None),
        ],
        "vec_id int, blk string, embedding array<double>",
    )
    pairs = embedding_near_duplicates(df, "blk", threshold=0.9).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_lsh_buckets_large_magnitude_bit_match(spark):
    """1e9-magnitude vectors: BLAS-vs-fold drift exceeds the old fixed 1e-9
    band; the magnitude-scaled band must still re-fold near-zero
    projections so buckets bit-match lsh_bucket."""
    import random

    rng = random.Random(13)
    rows = [
        (i, [rng.gauss(0.0, 1e9) for _ in range(64)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    planes = random_hyperplanes(64, 8)
    jvm = df.select("vec_id", lsh_bucket(F.col("embedding"), planes).alias("b"))
    ker = with_lsh_buckets(df, planes).select("vec_id", F.col("__bucket").alias("b"))
    assert jvm.exceptAll(ker).count() == 0
    assert ker.exceptAll(jvm).count() == 0


def test_with_lsh_buckets_rejects_63_planes(spark):
    df = spark.createDataFrame([(1, [0.0] * 4)], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError, match="63"):
        with_lsh_buckets(df, random_hyperplanes(4, 63))


def test_l2_norm_large_magnitude_bit_match(spark):
    import random

    rng = random.Random(29)
    rows = [(i, [rng.gauss(0.0, 1e9) for _ in range(64)]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    jvm = df.select("vec_id", l2_norm(F.col("embedding")).alias("n"))
    ker = with_l2_norm(df, "embedding", "n").select("vec_id", "n")
    assert jvm.exceptAll(ker).count() == 0


def test_ivf_topk_int8_tolerates_dirty_corpus(spark):
    """Null/ragged corpus rows get a NULL cell from ivf_assign and drop out
    of the probe join — the quantized path never crashes on dirty data and
    never surfaces an unscorable row."""
    from metadata_ingestion_framework_spark.operators.similarity import ivf_topk_int8

    rows = [(i, [float(i + j) for j in range(4)]) for i in range(20)]
    rows += [(20, None), (21, [1.0, 2.0])]
    corpus = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    qs = corpus.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk_int8(corpus, qs, dim=4, k=5, n_cells=2, n_probe=2).collect()
    assert len(out) == 10  # 5 per query
    assert not any(r["vec_id"] in (20, 21) for r in out)
