"""Product-quantization ANN (operators/pq.py): encode determinism, the
full-rerank exactness theorem, trained codebooks, ADC fold conventions,
and the dirty-vector contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.pq import (
    pq_codebooks,
    pq_encode,
    pq_topk,
    pq_train,
)
from metadata_ingestion_framework_spark.operators.similarity import (
    _fold_dot,
    _topk,
    cosine,
)

DIM = 8
M = 2
KC = 4


def _corpus(spark, n=24):
    """Deterministic spread of directions (plus exact duplicates of row 0
    so the top-k has unambiguous heads)."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(n):
        v = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
        rows.append((i, v))
    rows.append((100, list(rows[0][1])))  # exact dup of 0
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _queries(spark, corpus, ids=(0, 5)):
    return corpus.filter(F.col("vec_id").isin(list(ids))).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _exact_topk(corpus, queries, k):
    """The exact baseline with the IDENTICAL scoring expression pq_topk's
    rerank uses (round(cosine(), 6)) — not brute_force_topk's Arrow-norm
    kernel, whose summation order can differ at the last ulp (the
    ivf_recall lesson)."""
    q = queries.select("query_id", F.col("embedding").alias("__qvec"))
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("__qvec")), 6).alias("score"),
    )
    return _topk(scored, k, "query_id", "vec_id")


def test_full_rerank_factor_is_exact(spark):
    """With k * rerank_factor >= corpus size the ADC stage keeps every
    row, so the rerank IS the exact top-k — bit-for-bit."""
    corpus = _corpus(spark)
    queries = _queries(spark, corpus)
    n = corpus.count()
    got = pq_topk(
        corpus, queries, dim=DIM, m=M, k_codes=KC, k=5,
        rerank_factor=(n // 5) + 1,
    )
    want = _exact_topk(corpus, queries, 5)
    g = {(r.query_id, r.rank): (r.vec_id, r.score) for r in got.collect()}
    w = {(r.query_id, r.rank): (r.vec_id, r.score) for r in want.collect()}
    assert g == w


def test_self_retrieval_at_modest_factor(spark):
    """An exact duplicate shares the query's codes, so it tops the ADC
    ranking and survives any rerank_factor: self + dup are ranks 1-2."""
    corpus = _corpus(spark)
    queries = _queries(spark, corpus, ids=(0,))
    out = pq_topk(corpus, queries, dim=DIM, m=M, k_codes=KC, k=3, rerank_factor=2)
    got = [r.vec_id for r in out.orderBy("rank").collect()]
    assert got[0] == 0 and got[1] == 100  # self then its exact dup (id asc)


def test_trained_codebooks_keep_the_theorem(spark):
    """pq_train's per-subspace k-means codebooks plug into the same
    serving shape and the full-rerank theorem still holds."""
    corpus = _corpus(spark)
    queries = _queries(spark, corpus)
    books = pq_train(corpus, dim=DIM, m=M, k=KC, n_iters=2)
    assert len(books) == M and all(len(b) == KC for b in books)
    n = corpus.count()
    got = pq_topk(
        corpus, queries, dim=DIM, m=M, k_codes=KC, k=5,
        rerank_factor=(n // 5) + 1, codebooks=books,
    )
    want = _exact_topk(corpus, queries, 5)
    g = {(r.query_id, r.rank): (r.vec_id, r.score) for r in got.collect()}
    w = {(r.query_id, r.rank): (r.vec_id, r.score) for r in want.collect()}
    assert g == w


def test_encode_matches_fold_argmax(spark):
    """Codes equal the strict sequential-fold first-max argmax per
    subspace (the cross-engine convention the oracle replays)."""
    corpus = _corpus(spark, n=12)
    books = pq_codebooks(DIM, M, KC, seed=7)
    sub = DIM // M
    got = {
        r.vec_id: list(r.pq_codes)
        for r in pq_encode(corpus, books).collect()
    }
    for row in corpus.collect():
        v = row.embedding
        want = []
        for j in range(M):
            sl = v[j * sub : (j + 1) * sub]
            scores = [_fold_dot(sl, e) for e in books[j]]
            want.append(scores.index(max(scores)))
        assert got[row.vec_id] == want, row.vec_id


def test_dirty_vectors_null_codes_and_rank_last(spark):
    """NULL / off-dim / NaN corpus rows encode to NULL codes, score NULL
    in the ADC stage, and never displace real matches; a NULL-vector
    query returns only NULL-scored rows (ranked by id)."""
    rows = [
        (0, [1.0] + [0.0] * (DIM - 1)),
        (1, [0.9, 0.1] + [0.0] * (DIM - 2)),
        (10, None),
        (11, [1.0, 2.0]),                      # off-dim
        (12, [float("nan")] + [1.0] * (DIM - 1)),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_codebooks(DIM, M, KC, seed=7)
    codes = {r.vec_id: r.pq_codes for r in pq_encode(corpus, books).collect()}
    assert codes[10] is None and codes[11] is None and codes[12] is None
    assert codes[0] is not None and codes[1] is not None
    queries = spark.createDataFrame(
        [(50, [1.0] + [0.0] * (DIM - 1)), (51, None)],
        "query_id long, embedding array<double>",
    )
    out = pq_topk(
        corpus, queries, dim=DIM, m=M, k_codes=KC, k=2, rerank_factor=1,
        codebooks=books,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    clean = sorted(by_q[50], key=lambda r: r.rank)
    assert [r.vec_id for r in clean] == [0, 1]  # dirty rows never surface
    assert all(r.score is None for r in by_q.get(51, []))  # NULL query


def test_dim_not_divisible_rejected(spark):
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(DIM, 3, KC)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(_corpus(spark, n=4), dim=DIM, m=3, k=KC)


def test_unknown_output_cols_rejected(spark):
    """ADVICE r12: a typo in output_cols must raise at the call site, not
    silently narrow the output schema."""
    corpus = _corpus(spark, n=4)
    books = pq_codebooks(DIM, M, KC)
    with pytest.raises(ValueError, match="output_cols"):
        pq_encode(corpus, books, output_cols=["vec_id", "vec_idd"])
    # valid restriction still works
    out = pq_encode(corpus, books, output_cols=["vec_id"])
    assert set(out.columns) == {"vec_id", "pq_codes"}


def test_ivfpq_full_probe_full_rerank_is_exact(spark):
    """IVF-PQ composition anchor: probing EVERY cell with a rerank factor
    covering the corpus makes the composed index exactly the brute-force
    answer (candidates = corpus, rerank = exact scoring)."""
    from metadata_ingestion_framework_spark.operators.pq import ivfpq_topk

    corpus = _corpus(spark)
    queries = _queries(spark, corpus)
    n = corpus.count()
    got = ivfpq_topk(
        corpus, queries, dim=DIM, n_cells=4, n_probe=4, m=M, k_codes=KC,
        k=5, rerank_factor=(n // 5) + 1,
    )
    want = _exact_topk(corpus, queries, 5)
    g = {(r.query_id, r.rank): (r.vec_id, r.score) for r in got.collect()}
    w = {(r.query_id, r.rank): (r.vec_id, r.score) for r in want.collect()}
    assert g == w


def test_ivfpq_prunes_and_drops_dirty_queries(spark):
    """At n_probe=1 only the query's own cell joins (the self row always
    survives — it shares the query's cell and codes); a NULL-vector query
    has a NULL probe order and returns no rows at all."""
    from metadata_ingestion_framework_spark.operators.pq import ivfpq_topk

    corpus = _corpus(spark)
    queries = spark.createDataFrame(
        [(0, corpus.filter("vec_id = 0").collect()[0].embedding), (99, None)],
        "query_id long, embedding array<double>",
    )
    out = ivfpq_topk(
        corpus, queries, dim=DIM, n_cells=4, n_probe=1, m=M, k_codes=KC,
        k=3, rerank_factor=2,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert 99 not in by_q  # NULL probe order: dropped, not bucket-0
    ranked = sorted(by_q[0], key=lambda r: r.rank)
    assert ranked[0].vec_id == 0 and ranked[0].score == 1.0


def test_codebook_save_load_roundtrip(spark, tmp_path):
    """Codebooks persist bit-identically (parquet float64 round-trip):
    re-encoding under the reloaded books yields the exact same codes;
    retrain = new version with time travel; foreign roots refused."""
    import pytest as _pytest

    from metadata_ingestion_framework_spark.operators.pq import (
        load_pq_model,
        pq_train,
        save_pq_model,
    )

    corpus = _corpus(spark)
    books = pq_train(corpus, dim=DIM, m=M, k=KC, n_iters=2)
    root = str(tmp_path / "pq")
    assert save_pq_model(spark, root, books) == 1
    reloaded = load_pq_model(spark, root)
    assert reloaded == books  # float64-exact
    a = {r.vec_id: list(r.pq_codes) for r in pq_encode(corpus, books).collect()}
    b = {r.vec_id: list(r.pq_codes) for r in pq_encode(corpus, reloaded).collect()}
    assert a == b
    books2 = pq_codebooks(DIM, M, KC, seed=99)
    assert save_pq_model(spark, root, books2) == 2
    assert load_pq_model(spark, root) == books2
    assert load_pq_model(spark, root, version=1) == books
    # geometry guard: a different (m, k) refuses the same root
    with _pytest.raises(ValueError, match="layout"):
        save_pq_model(spark, root, pq_codebooks(DIM, M, KC + 4))
    with _pytest.raises(FileNotFoundError, match="no PQ model"):
        load_pq_model(spark, str(tmp_path / "missing"))


def test_pq_recall_theorems(spark):
    """The two recall-contract theorems for the PQ face: monotone in the
    rerank factor (nested ADC-rank candidate sets) and recall_full ==
    1.0 exactly (the unbounded scan reranks with the identical
    round(cosine,6) expression the exact baseline uses)."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.pq import pq_recall

    corpus = _corpus(spark)
    queries = _queries(spark, corpus, ids=(0, 5, 12))
    out = pq_recall(
        corpus, queries, dim=DIM, k=5, m=M, k_codes=KC, factors=(1, 2)
    )
    rows = out.collect()
    unpersist_deps(out)
    assert len(rows) == 3
    for r in rows:
        assert r["recall_full"] == 1.0, r
        assert r["recall_rf1"] <= r["recall_rf2"] <= r["recall_full"]
        assert r["n_exact"] == 5
