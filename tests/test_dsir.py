"""DSIR importance resampling (functions/dsir.py, r16; Xie et al. 2023):
distribution matching pulls target-like docs up, Gumbel keys are
deterministic, and the sharded rank path is bit-equal to the window
path."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.functions.dsir import (
    dsir_select,
    dsir_weights,
)
from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps

TARGETY = "the quick brown fox jumps over the lazy dog near the river bank"
OTHERY = "zzz qqq xxx www vvv uuu ttt sss rrr ppp ooo nnn mmm lll kkk"


def _corpus(spark):
    rows = []
    for i in range(40):
        # even ids speak the target's language, odd ids don't
        rows.append((i, TARGETY if i % 2 == 0 else OTHERY, "src"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _target(spark):
    return spark.createDataFrame(
        [(1000 + i, TARGETY, "tgt") for i in range(5)],
        "doc_id long, text string, source string",
    )


def test_weights_rank_target_like_docs_higher(spark):
    w = dsir_weights(_corpus(spark), _target(spark), "text", "doc_id")
    rows = {r.doc_id: r.dsir_logw for r in w.collect()}
    evens = [v for k, v in rows.items() if k % 2 == 0]
    odds = [v for k, v in rows.items() if k % 2 == 1]
    assert min(evens) > max(odds)
    # identical text -> identical weight (pure function of content)
    assert len(set(evens)) == 1 and len(set(odds)) == 1


def test_plain_topk_selects_target_like(spark):
    out = dsir_select(
        _corpus(spark), _target(spark), "text", "doc_id", k=20,
        gumbel=False,
    )
    picked = sorted(r.doc_id for r in out.collect())
    unpersist_deps(out)
    assert picked == [i for i in range(40) if i % 2 == 0]


def test_gumbel_deterministic_and_sharded_path_bit_equal(spark):
    a = dsir_select(_corpus(spark), _target(spark), "text", "doc_id", k=15)
    ra = sorted(map(tuple, a.collect()))
    unpersist_deps(a)
    b = dsir_select(_corpus(spark), _target(spark), "text", "doc_id", k=15)
    rb = sorted(map(tuple, b.collect()))
    unpersist_deps(b)
    assert ra == rb  # rerun-deterministic
    c = dsir_select(
        _corpus(spark), _target(spark), "text", "doc_id", k=15, shards=4,
    )
    rc = sorted(map(tuple, c.collect()))
    unpersist_deps(c)
    assert rc == ra  # forced two-stage rank == single-window values
    # a different salt is a fresh permutation of the Gumbel noise
    d = dsir_select(
        _corpus(spark), _target(spark), "text", "doc_id", k=15, salt="x",
    )
    rd = sorted(map(tuple, d.collect()))
    unpersist_deps(d)
    assert {t[0] for t in rd} != set() and rd != ra


def test_empty_and_null_text_docs_score_zero(spark):
    docs = spark.createDataFrame(
        [(0, TARGETY, "s"), (1, None, "s"), (2, "", "s"), (3, "123 456", "s")],
        "doc_id long, text string, source string",
    )
    w = dsir_weights(docs, _target(spark), "text", "doc_id")
    rows = {r.doc_id: (r.n_feats, r.dsir_logw) for r in w.collect()}
    assert rows[1] == (0, 0.0) and rows[2] == (0, 0.0) and rows[3] == (0, 0.0)
    assert rows[0][0] > 0
