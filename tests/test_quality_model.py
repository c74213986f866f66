"""Model-based quality scorer (functions/quality_model.py, VERDICT r10
item 4): hashed bag-of-ngrams x broadcast linear weights, one Arrow
mapInPandas matmul. Covers: exact agreement with a pure-Python
reference, a tiny in-test trained logistic model that actually separates
good/junk text (the no-download fastText shape), determinism, the
quantization guard, and null/empty handling."""

from __future__ import annotations

import numpy as np
import pytest

from metadata_ingestion_framework_spark.functions.quality_model import (
    _doc_grams,
    _md5_64,
    hashed_seed_weights,
    quality_model_score,
    quantize_weights,
)


def _ref_logit(text, w, bias):
    logit = bias
    for g in _doc_grams(text):
        logit += int(w[_md5_64(g) % len(w)])
    return logit


def test_matches_pure_python_reference(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    w = hashed_seed_weights("qw", 4096)
    out = quality_model_score(docs, w, bias=7).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(out) == len(texts)
    for r in out:
        grams = _doc_grams(texts[r.doc_id])
        assert r.n_grams == len(grams)
        assert r.logit_q == _ref_logit(texts[r.doc_id], w, 7), r.doc_id
        assert 0.0 < r.score < 1.0


def test_trained_tiny_model_separates_quality(spark):
    """Train a real (tiny) logistic model on hashed features in-test —
    no downloads — quantize, and check it ranks clean prose above junk:
    the operator must accept arbitrary trained weights, not just the
    seed-hash test vector."""
    n = 512
    good = [
        "the quick brown fox jumps over the lazy dog",
        "a clear sentence with common english words and structure",
        "reading and writing are skills that improve with practice",
        "the weather today is mild with a gentle breeze from the west",
    ]
    junk = [
        "zxq qqq zzz xxx qzx zqx",
        "xz zx qq zz xq qx xzq",
        "qqq xxx zzz qxz zxq",
        "zq xq qz zx qx xz",
    ]

    def feats(text):
        v = np.zeros(n)
        for g in _doc_grams(text):
            v[_md5_64(g) % n] += 1.0
        s = v.sum()
        return v / s if s else v

    X = np.array([feats(t) for t in good + junk])
    y = np.array([1.0] * len(good) + [0.0] * len(junk))
    w, b = np.zeros(n), 0.0
    for _ in range(400):  # plain gradient descent on logistic loss
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        w -= 0.5 * X.T @ (p - y)
        b -= 0.5 * float(np.sum(p - y))
    qw = quantize_weights(w, bits=20)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(good + junk)], "doc_id int, text string"
    )
    rows = {
        r.doc_id: r.score
        for r in quality_model_score(
            df, qw, bias=int(b * (1 << 20)), n_features=n
        ).collect()
    }
    worst_good = min(rows[i] for i in range(len(good)))
    best_junk = max(rows[i] for i in range(len(good), len(good) + len(junk)))
    assert worst_good > best_junk


def test_deterministic_across_runs(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(50)
    w = hashed_seed_weights("qw", 4096)
    a = sorted(
        (r.doc_id, r.logit_q, r.score)
        for r in quality_model_score(docs, w).collect()
    )
    b = sorted(
        (r.doc_id, r.logit_q, r.score)
        for r in quality_model_score(docs, w).collect()
    )
    assert a == b


def test_rejects_float_weights(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id int, text string")
    with pytest.raises(TypeError, match="integer-quantized"):
        quality_model_score(df, np.ones(16, dtype=np.float64))


def test_langid_model_matches_reference_and_tie_rule(spark):
    """r11 multiclass face: per-lang integer scores equal the pure-Python
    reference, and the winner follows the total first-max rule (score
    desc, lang asc) — including the all-zero (no-gram) tie, which must
    resolve to the first lang alphabetically on both engines."""
    from metadata_ingestion_framework_spark.functions.quality_model import (
        langid_model_score,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(60)
    langs = ["de", "en", "es", "fr"]
    weights = {
        lang: hashed_seed_weights(f"lw:{lang}:", 512) for lang in langs
    }
    rows = {r.doc_id: r for r in langid_model_score(
        docs, weights, n_features=512
    ).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    for d, r in rows.items():
        scores = {
            lang: _ref_logit(texts[d], weights[lang], 0) for lang in langs
        }
        for lang in langs:
            assert r[f"score_{lang}"] == scores[lang], (d, lang)
        # first-max: max score, ties to alphabetically-first lang
        mx = max(scores.values())
        expected = next(g for g in langs if scores[g] == mx)
        assert r.pred_lang == expected, d
    # no-gram doc: all scores zero -> 'de' (first lang)
    empty = spark.createDataFrame([(99, "123 !!")], "doc_id int, text string")
    er = langid_model_score(empty, weights, n_features=512).collect()[0]
    assert er.pred_lang == "de"
    assert all(er[f"score_{lang}"] == 0 for lang in langs)


def test_langid_trained_multiclass_separates(spark):
    """A tiny in-test softmax-trained weight set must classify held-in
    marker sentences — the operator accepts arbitrary trained matrices,
    not just the seed-hash vectors."""
    from metadata_ingestion_framework_spark.functions.quality_model import (
        _doc_grams,
        langid_model_score,
    )

    n = 256
    samples = {
        "en": ["the house and the water", "and with the for that"],
        "fr": ["le la les et pour avec", "dans le jardin et la maison"],
    }

    def feats(text):
        v = np.zeros(n)
        for g in _doc_grams(text):
            v[_md5_64(g) % n] += 1.0
        s = v.sum()
        return v / s if s else v

    langs = sorted(samples)
    X = np.array([feats(t) for lang in langs for t in samples[lang]])
    y = np.array([i for i, lang in enumerate(langs) for _ in samples[lang]])
    W = np.zeros((len(langs), n))
    for _ in range(300):
        z = X @ W.T
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        for i in range(len(langs)):
            W[i] -= 0.5 * ((p[:, i] - (y == i)) @ X)
    qw = {lang: quantize_weights(W[i], 20) for i, lang in enumerate(langs)}
    df = spark.createDataFrame(
        [(0, "the water and the house"), (1, "le jardin et la maison")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.pred_lang for r in langid_model_score(
        df, qw, n_features=n
    ).collect()}
    assert got == {0: "en", 1: "fr"}


def test_combined_gate_pass_equals_single_model_ops(spark):
    """r11: model_gate_scores (one shared bincount) must be value-
    identical to chaining quality_model_score + langid_model_score."""
    from metadata_ingestion_framework_spark.functions.quality_model import (
        langid_model_score,
        model_gate_scores,
        quality_model_score,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(80)
    qw = hashed_seed_weights("qw", 1024)
    lw = {lang: hashed_seed_weights(f"lw:{lang}:", 1024)
          for lang in ("de", "en", "es", "fr")}
    combined = {
        r.doc_id: (r.logit_q, r.n_grams, r.score_de, r.score_en,
                   r.score_es, r.score_fr, r.pred_lang)
        for r in model_gate_scores(
            docs, qw, lw, bias=7, n_features=1024
        ).collect()
    }
    q = {r.doc_id: (r.logit_q, r.n_grams)
         for r in quality_model_score(
             docs, qw, bias=7, n_features=1024
         ).collect()}
    l = {r.doc_id: (r.score_de, r.score_en, r.score_es, r.score_fr,
                    r.pred_lang)
         for r in langid_model_score(docs, lw, n_features=1024).collect()}
    assert set(combined) == set(q) == set(l)
    for d, row in combined.items():
        assert row[:2] == q[d], d
        assert row[2:] == l[d], d


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "123 !!")], "doc_id int, text string"
    )
    w = hashed_seed_weights("qw", 64)
    rows = {r.doc_id: r for r in quality_model_score(df, w, bias=3).collect()}
    for i in range(3):
        assert rows[i].n_grams == 0 and rows[i].logit_q == 3
