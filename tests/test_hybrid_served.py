"""Index-served hybrid retrieval (operators/retrieval.py::hybrid_served,
r15 — VERDICT r14 item 1): full-probe served == per-call hybrid_topk
row-for-row (the composed candidate-superset contract), the lexical leg
exact at ANY probe setting, a recall floor at production n_probe, and the
grow-then-serve lifecycle (append to both indexes, equality holds over
the merged corpus)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps
from metadata_ingestion_framework_spark.operators.ivf_index import IvfIndex
from metadata_ingestion_framework_spark.operators.retrieval import (
    Bm25Index,
    hybrid_served,
    hybrid_topk,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"
N_CELLS = 8


def _corpus(spark):
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    emb = spark.read.parquet(EMB)
    return docs, emb


def _queries(spark, docs, emb):
    return (
        docs.filter(F.col("doc_id") < 3)
        .join(emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id")
        .select(F.col("doc_id").alias("query_id"), "text", "embedding")
    )


def _indexes(spark, tmp_path, docs, emb, name="h"):
    bidx = Bm25Index(
        spark, str(tmp_path / f"{name}_bm25"),
        doc_bucket_width=128, n_buckets=16, n_term_buckets=16,
    )
    bidx.build(docs)
    vidx = IvfIndex(spark, str(tmp_path / f"{name}_ivf"), dim=64, n_cells=N_CELLS)
    vidx.build(emb)
    return bidx, vidx


def _rows(df):
    out = sorted(map(tuple, df.collect()))
    unpersist_deps(df)
    return out


def test_full_probe_equals_per_call(spark, tmp_path):
    """n_probe = n_cells: the semantic leg scores the whole corpus with
    the same round(cosine, 6) expression, the lexical leg is
    serve==rebuild, and rank-only fusion composes both — served hybrid
    == per-call hybrid_topk row-for-row."""
    docs, emb = _corpus(spark)
    bidx, vidx = _indexes(spark, tmp_path, docs, emb)
    q = _queries(spark, docs, emb)
    got = _rows(hybrid_served(bidx, vidx, q, k=10, k_each=20, n_probe=N_CELLS))
    want = _rows(hybrid_topk(docs, emb, q, k=10, k_each=20))
    assert got == want and len(got) > 0


def test_lex_leg_exact_at_any_probe(spark, tmp_path):
    """The lexical ranks are exact regardless of n_probe (only the
    semantic candidate set narrows): any (query, doc) surfacing with a
    non-NULL lex_rank in BOTH results must carry the identical lex_rank
    (the fused top-10 CUT can differ at n_probe=1 — the narrowed
    semantic leg redistributes rrf mass — but the lexical inputs to the
    fusion cannot)."""
    docs, emb = _corpus(spark)
    bidx, vidx = _indexes(spark, tmp_path, docs, emb)
    q = _queries(spark, docs, emb)
    served = hybrid_served(bidx, vidx, q, k=10, k_each=20, n_probe=1)
    got = {
        (r.query_id, r.doc_id): r.lex_rank
        for r in served.collect() if r.lex_rank is not None
    }
    unpersist_deps(served)
    percall = hybrid_topk(docs, emb, q, k=10, k_each=20)
    want = {
        (r.query_id, r.doc_id): r.lex_rank
        for r in percall.collect() if r.lex_rank is not None
    }
    unpersist_deps(percall)
    shared = set(got) & set(want)
    assert len(shared) > 0
    for key in shared:
        assert got[key] == want[key]


def test_recall_floor_at_production_probe(spark, tmp_path):
    """n_probe = 2 of 8: the served fused top-10 must recover a sane
    fraction of the exact fused top-10 (the ann_recall-style contract;
    the lexical leg alone guarantees a nonzero floor)."""
    docs, emb = _corpus(spark)
    bidx, vidx = _indexes(spark, tmp_path, docs, emb)
    q = _queries(spark, docs, emb)
    served = hybrid_served(bidx, vidx, q, k=10, k_each=20, n_probe=2)
    got = {}
    for r in served.collect():
        got.setdefault(r.query_id, set()).add(r.doc_id)
    unpersist_deps(served)
    percall = hybrid_topk(docs, emb, q, k=10, k_each=20)
    want = {}
    for r in percall.collect():
        want.setdefault(r.query_id, set()).add(r.doc_id)
    unpersist_deps(percall)
    recalls = [
        len(got[qid] & want[qid]) / len(want[qid]) for qid in want
    ]
    assert len(recalls) == 3
    assert sum(recalls) / len(recalls) >= 0.5


def test_grow_then_serve_equals_per_call(spark, tmp_path):
    """The recurring-batch story: build both indexes on part of the
    corpus, append the rest (re-ingesting an overlap with REPLACED
    content on the lexical side), then full-probe served hybrid ==
    per-call hybrid_topk over the merged corpus."""
    docs, emb = _corpus(spark)
    old_docs = docs.filter(F.col("doc_id") % 4 < 3)
    new_docs = docs.filter(F.col("doc_id") % 4 == 3).unionByName(
        docs.filter(F.col("doc_id") % 16 == 0).withColumn(
            "text", F.lit("zz refreshed replacement document text")
        )
    )
    merged_docs = docs.filter(
        (F.col("doc_id") % 4 < 3) & (F.col("doc_id") % 16 != 0)
    ).unionByName(new_docs)
    old_emb = emb.filter(F.col("vec_id") % 4 < 3)
    new_emb = emb.filter(F.col("vec_id") % 4 == 3)

    bidx = Bm25Index(
        spark, str(tmp_path / "g_bm25"),
        doc_bucket_width=128, n_buckets=16, n_term_buckets=16,
    )
    bidx.build(old_docs)
    bidx.append(new_docs)
    vidx = IvfIndex(spark, str(tmp_path / "g_ivf"), dim=64, n_cells=N_CELLS)
    vidx.build(old_emb)
    vidx.append(new_emb)

    q = _queries(spark, docs, emb)
    got = _rows(hybrid_served(bidx, vidx, q, k=10, k_each=20, n_probe=N_CELLS))
    want = _rows(hybrid_topk(merged_docs, emb, q, k=10, k_each=20))
    assert got == want and len(got) > 0


def test_deps_carried_from_both_legs(spark, tmp_path):
    """hybrid_served must hand out BOTH legs' persisted intermediates
    (the persist-hygiene contract: qterms + posts_q from the lexical
    serve, the probed-cell query frame from the semantic serve)."""
    docs, emb = _corpus(spark)
    bidx, vidx = _indexes(spark, tmp_path, docs, emb, name="d")
    q = _queries(spark, docs, emb)
    out = hybrid_served(bidx, vidx, q, k=10, k_each=20, n_probe=2)
    deps = getattr(out, "_persisted_deps", [])
    assert len(deps) >= 3
    out.collect()
    unpersist_deps(out)
    assert all(not d.is_cached for d in deps)
