"""Dirty-data fixture + family sweep (VERDICT r11 item 2).

The synthetic testdata is clean, which is exactly why the five r11
similarity findings shipped latent: nothing ever exercised NULL / zero /
off-dim / non-finite vectors, NULL / empty / whitespace text, or NULL
group keys. This module is the standing fixture: every dedup /
similarity / sampling / text family runs over deliberately dirty rows,
with DuckDB oracle twins wherever the semantics are SQL-expressible
(same cross-engine conventions as catalog_queries: guarded cosine
denominators, DESC NULLS LAST + id ASC tiebreaks, ROUND(6)).

Contracts pinned here:
- ids are non-null keys; DIRTY means payload columns (vectors, text,
  group keys), not identity.
- NULL / off-dim / non-finite vectors: NULL bucket (LSH), NULL cell
  (IVF), never pair (near-dup kernels), NULL score (brute force) — and
  the two LSH bucketing paths agree row-for-row.
- a NULL-vector QUERY returns no candidates from bucketed indexes and
  all-NULL scores from the exact scan (ranked, deterministically, by id).
- recall_full == 1.0 holds on dirty corpora (the 1<<30 sentinel).
- NULL text: tokenizes to nothing, drops out of signature-based dedup,
  scores NULL through codegen text metrics; NULL content is its own
  exact-dedup group (SQL GROUP BY semantics).
- NULL group keys survive the sampling family's two-stage windows
  (eqNullSafe offset join) and block together in applyInPandas groups
  (Spark groupBy semantics; oracle twin = IS NOT DISTINCT FROM).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.functions.quality_model import (
    hashed_seed_weights,
    model_gate_scores,
)
from metadata_ingestion_framework_spark.functions.sampling import quota_sample
from metadata_ingestion_framework_spark.functions.text import (
    fingerprint,
    heuristic_filters,
    quality_score,
    token_count,
)
from metadata_ingestion_framework_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_duplicates,
    simhash_duplicates,
    unpersist_deps,
)
from metadata_ingestion_framework_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    ivf_recall,
    ivf_topk,
    lsh_bucket,
    lsh_topk,
    random_hyperplanes,
    semantic_dedup,
    with_lsh_buckets,
)

DIM = 8
NAN = float("nan")
INF = float("inf")


def _e(*head):
    """Dense DIM-vector from a prefix."""
    v = list(head) + [0.0] * (DIM - len(head))
    return [float(x) for x in v]


EMB_ROWS = [
    # clean: 0/1/2 aligned cluster (label a), 3/4 orthogonal (label b)
    (0, _e(1.0), "a"),
    (1, _e(0.9, 0.1), "a"),
    (2, _e(0.8, 0.2), "a"),
    (3, [0.0] * (DIM - 1) + [1.0], "b"),
    (4, [0.0] * (DIM - 2) + [1.0, 0.0], "b"),
    # clean, NULL label, same direction (block-key NULL grouping contract)
    (5, [0.5] * DIM, None),
    (6, [1.0] * DIM, None),
    # dirty payloads
    (10, None, "a"),                    # NULL vector
    (11, [0.0] * DIM, "a"),             # zero vector
    (12, [1.0, 0.0, 0.0, 0.0], "a"),    # off-dim short
    (13, [0.1] * (DIM + 4), "a"),       # off-dim long
    (14, _e(NAN, 1.0), "a"),            # NaN element
    (15, _e(INF, 1.0), "a"),            # Inf element
]

QUERY_ROWS = [
    (100, _e(1.0)),       # clean
    (101, [0.0] * DIM),   # zero vector
    (102, None),          # NULL vector
]

DOC_ROWS = [
    (0, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (1, "the quick brown fox jumps over the lazy dog", "en", "web"),  # exact dup
    (2, "the quick brown fox jumps over the lazy cat", "en", "web"),  # near dup
    (3, "completely different content about spark engines and data quality", "en", "books"),
    (4, None, "en", "web"),          # NULL text
    (5, "", "en", "web"),            # empty text
    (6, "   \n\t  ", "en", "web"),   # whitespace-only
    (7, "a", "en", "web"),           # single short token
    (8, "naïve café résumé — unicode text für tests und prüfungen", None, "web"),
    (9, "some other text entirely different words here now", "en", None),
    (10, None, None, None),          # all-NULL payload
]


@pytest.fixture(scope="module")
def dirty(spark, tmp_path_factory):
    """Parquet-backed dirty tables (Spark scans files; DuckDB replays the
    same bytes — the driver-gate shape, not createDataFrame RDD plans)."""
    root = tmp_path_factory.mktemp("dirty")
    emb = spark.createDataFrame(
        EMB_ROWS, "vec_id long, embedding array<double>, label string"
    )
    q = spark.createDataFrame(QUERY_ROWS, "query_id long, embedding array<double>")
    docs = spark.createDataFrame(
        DOC_ROWS, "doc_id long, text string, lang string, source string"
    )
    paths = {
        "emb": str(root / "embeddings.parquet"),
        "queries": str(root / "queries.parquet"),
        "docs": str(root / "documents.parquet"),
    }
    emb.coalesce(1).write.parquet(paths["emb"])
    q.coalesce(1).write.parquet(paths["queries"])
    docs.coalesce(1).write.parquet(paths["docs"])
    return paths


def _duck(paths, sql):
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW emb AS SELECT * FROM '{paths['emb']}/*.parquet'")
        con.execute(
            f"CREATE VIEW queries AS SELECT * FROM '{paths['queries']}/*.parquet'"
        )
        con.execute(f"CREATE VIEW docs AS SELECT * FROM '{paths['docs']}/*.parquet'")
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _norm(rows):
    """Sorted row tuples with NaN made comparable (NaN == NaN here:
    cross-engine agreement on WHICH rows are NaN is part of the check)."""
    def fix(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        return v

    return sorted(tuple(fix(v) for v in r) for r in rows)


# ---------------------------------------------------------------------------
# similarity family
# ---------------------------------------------------------------------------

def test_lsh_bucket_paths_agree_on_dirty(spark, dirty):
    """r11 finding 2: the JVM-expression and Arrow bucketing paths must
    agree row-for-row on dirty vectors (NULL bucket), not file a dirty row
    into bucket 0 on one path only."""
    emb = spark.read.parquet(dirty["emb"])
    planes = random_hyperplanes(DIM, 4, seed=42)
    bulk = {
        r["vec_id"]: r["__bucket"]
        for r in with_lsh_buckets(emb, planes).collect()
    }
    expr = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", lsh_bucket(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    assert bulk == expr
    for dirty_id in (10, 12, 13, 14, 15):
        assert bulk[dirty_id] is None
    assert bulk[11] == 0  # zero vector: all projections 0 -> real bucket 0
    assert all(bulk[i] is not None for i in (0, 1, 2, 3, 4, 5, 6))


def test_brute_force_topk_dirty_oracle(spark, dirty):
    """Exact scan vs DuckDB on dirty corpus AND dirty queries: NULL /
    off-dim / non-finite vectors score NULL (ranked LAST — a corrupt
    vector must never outrank a real match, which a raw NaN score would,
    since both engines sort NaN above every value under DESC), and
    zero-denominator pairs are 0.0 (the engine guard, checked FIRST, so
    an off-dim row against a zero-norm query is 0.0 not NULL)."""
    emb = spark.read.parquet(dirty["emb"])
    q = spark.read.parquet(dirty["queries"])
    got = brute_force_topk(emb, q, k=5).select(
        "query_id", "vec_id", "score", "rank"
    ).collect()
    # DuckDB's vectorized list_dot_product REFUSES batches containing NULL
    # list rows (unlike the constant-fold path), so the twin materializes
    # non-null same-length pairs before any dot and left-joins the pieces
    # back — NULL norms/dots then flow through the engine's CASE order
    # (zero-denominator guard FIRST, so an off-dim row against a zero-norm
    # query is 0.0, exactly like brute_force_topk's denom==0 branch).
    want = _duck(dirty, """
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM emb),
q AS MATERIALIZED (SELECT query_id, CAST(embedding AS DOUBLE[]) AS qv FROM queries),
en AS MATERIALIZED (
  SELECT vec_id, nrm FROM (
    SELECT vec_id, sqrt(list_dot_product(ev, ev)) AS nrm FROM e WHERE ev IS NOT NULL
  ) WHERE isfinite(nrm)
),
qn AS MATERIALIZED (
  SELECT query_id, nrm FROM (
    SELECT query_id, sqrt(list_dot_product(qv, qv)) AS nrm FROM q WHERE qv IS NOT NULL
  ) WHERE isfinite(nrm)
),
dots AS MATERIALIZED (
  SELECT qq.query_id, ee.vec_id, list_dot_product(ee.ev, qq.qv) AS d
  FROM (SELECT * FROM e WHERE ev IS NOT NULL) ee
  JOIN (SELECT * FROM q WHERE qv IS NOT NULL) qq ON len(ee.ev) = len(qq.qv)
),
scored AS (
  SELECT q.query_id, e.vec_id,
    ROUND(CASE
      WHEN en.nrm * qn.nrm = 0 THEN 0.0
      ELSE d.d / (en.nrm * qn.nrm)
    END, 6) AS score
  FROM e CROSS JOIN q
  LEFT JOIN en ON en.vec_id = e.vec_id
  LEFT JOIN qn ON qn.query_id = q.query_id
  LEFT JOIN dots d ON d.query_id = q.query_id AND d.vec_id = e.vec_id
)
SELECT query_id, vec_id, score,
  ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY score DESC NULLS LAST, vec_id ASC) AS rank
FROM scored QUALIFY rank <= 5
""")
    assert _norm((r[0], r[1], r[2], r[3]) for r in got) == _norm(want)


def test_bucketed_indexes_drop_null_queries(spark, dirty):
    """A NULL-vector query hashes to a NULL bucket / NULL probe list and
    must return NO candidates (not join an arbitrary bucket); clean
    queries are unaffected."""
    emb = spark.read.parquet(dirty["emb"])
    q = spark.read.parquet(dirty["queries"])
    lsh = lsh_topk(emb, q, dim=DIM, k=3, n_planes=2)
    by_query = {
        qid: n
        for qid, n in lsh.groupBy("query_id").count().collect()
    }
    assert 102 not in by_query  # NULL query: no bucket, no candidates
    assert by_query.get(100, 0) > 0
    ivf = ivf_topk(emb, q, dim=DIM, k=3, n_cells=4, n_probe=2)
    ivf_by_query = {
        qid: n for qid, n in ivf.groupBy("query_id").count().collect()
    }
    assert 102 not in ivf_by_query
    assert ivf_by_query.get(100, 0) > 0


def test_ivf_recall_full_is_one_on_dirty(spark, dirty):
    """r11 finding 4: NULL-cell corpus rows (and NULL-order queries) carry
    the 1<<30 sentinel, so recall_full == 1.0 exactly even on dirty data,
    and recall stays monotone in n_probe."""
    emb = spark.read.parquet(dirty["emb"])
    q = spark.read.parquet(dirty["queries"])
    out = ivf_recall(emb, q, dim=DIM, k=5, n_cells=4, probes=(1, 2))
    rows = out.collect()
    unpersist_deps(out)
    assert len(rows) == 3  # every query answers, including the NULL one
    for r in rows:
        assert r["recall_full"] == 1.0, r
        assert r["recall_p1"] <= r["recall_p2"] <= r["recall_full"]


def test_embedding_near_duplicates_dirty_oracle(spark, dirty):
    """Pair kernel vs DuckDB on dirty blocks: dirty vectors never pair,
    zero vectors score the guarded 0.0 (excluded by threshold), and NULL
    block keys group together (Spark groupBy semantics — the twin says
    IS NOT DISTINCT FROM)."""
    emb = spark.read.parquet(dirty["emb"])
    got = embedding_near_duplicates(emb, "label", threshold=0.9).collect()
    want = _duck(dirty, f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM emb
),
valid AS MATERIALIZED (
  SELECT * FROM e
  WHERE v IS NOT NULL AND len(v) = {DIM}
    AND len(list_filter(v, x -> isnan(x) OR isinf(x))) = 0
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND(CASE
      WHEN (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) = 0
        THEN 0.0
      ELSE list_dot_product(a.v, b.v) /
           (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
    END, 6) AS cos_sim
  FROM valid a JOIN valid b
    ON a.label IS NOT DISTINCT FROM b.label AND a.vec_id < b.vec_id
)
SELECT * FROM pairs WHERE cos_sim >= 0.9
""")
    assert _norm((r["id_a"], r["id_b"], r["cos_sim"]) for r in got) == _norm(want)
    pair_ids = {r["id_a"] for r in got} | {r["id_b"] for r in got}
    assert (5 in pair_ids) and (6 in pair_ids)  # NULL-label block paired
    assert pair_ids.isdisjoint({10, 11, 12, 13, 14, 15})


def test_semantic_dedup_dirty(spark, dirty):
    """Dirty vectors: NULL cell, kept singletons; identical directions
    still collapse to the min-id representative."""
    emb = spark.read.parquet(dirty["emb"])
    out = semantic_dedup(emb, dim=DIM, n_cells=4, threshold=0.9)
    rows = {r["vec_id"]: r for r in out.collect()}
    unpersist_deps(out)
    assert set(rows) == {r[0] for r in EMB_ROWS}
    for dirty_id in (10, 12, 13, 14, 15):
        r = rows[dirty_id]
        assert r["cell"] is None and r["kept"] and r["component"] == dirty_id
    assert rows[11]["cell"] is not None  # zero vector gets a real cell…
    assert rows[11]["kept"]              # …but never pairs
    # 5 and 6 are positive multiples of each other: same argmax cell,
    # cosine exactly 1.0 -> one cluster, min id kept
    assert rows[5]["component"] == 5 and rows[5]["kept"]
    assert rows[6]["component"] == 5 and not rows[6]["kept"]
    # every component representative is itself kept
    for r in rows.values():
        assert rows[r["component"]]["kept"]


# ---------------------------------------------------------------------------
# dedup family (documents)
# ---------------------------------------------------------------------------

def test_dedup_exact_dirty_oracle(spark, dirty):
    """NULL content is its own group (both NULL-text docs collapse to the
    min id), '' and whitespace stay distinct groups — matching SQL
    GROUP BY over the same parquet."""
    docs = spark.read.parquet(dirty["docs"])
    got = sorted(
        r["doc_id"] for r in dedup_exact(docs, ["text"], "doc_id").collect()
    )
    want = sorted(
        r[0]
        for r in _duck(dirty, """
SELECT doc_id FROM docs
QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
""")
    )
    assert got == want
    assert 1 not in got   # exact dup of 0
    assert 10 not in got  # NULL text groups with doc 4
    assert {4, 5, 6}.issubset(set(got))  # NULL, '', whitespace all distinct


def test_minhash_dirty(spark, dirty):
    """NULL/empty/whitespace/short docs have no shingles: they drop out of
    the signature table and can never pair; the clean exact dup still
    pairs at jaccard 1.0."""
    docs = spark.read.parquet(dirty["docs"])
    out = minhash_lsh_duplicates(
        docs, "text", "doc_id", num_hashes=32, bands=8, jaccard_threshold=0.8
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard_est"] for r in out.collect()}
    unpersist_deps(out)
    assert pairs[(0, 1)] == 1.0
    flat = {i for p in pairs for i in p}
    assert flat.isdisjoint({4, 5, 6, 7, 10})


def test_simhash_dirty(spark, dirty):
    """Token-less docs have no fingerprint (an all-zero fp would pair
    every empty doc with every other); identical docs pair at hamming 0."""
    docs = spark.read.parquet(dirty["docs"])
    out = simhash_duplicates(docs, "text", "doc_id", max_hamming=3)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    unpersist_deps(out)
    assert (0, 1) in pairs
    flat = {i for p in pairs for i in p}
    assert flat.isdisjoint({4, 5, 6, 10})


# ---------------------------------------------------------------------------
# sampling family (NULL group keys)
# ---------------------------------------------------------------------------

def test_quota_sample_keeps_null_group(spark, dirty):
    """The two-stage de-skewed rank joins its per-shard offsets with
    eqNullSafe — a NULL source is a real group and must keep its quota
    (a plain = join silently drops the whole group)."""
    docs = spark.read.parquet(dirty["docs"])
    scored = docs.select(
        "doc_id", "source", quality_score(F.col("text")).alias("q")
    )
    out = quota_sample(scored, "q", "doc_id", cap=2, by=["source"])
    rows = out.collect()
    unpersist_deps(out)
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r["doc_id"])
    # groups: web (8 docs -> 2), books (1 -> 1), NULL (2 -> 2)
    assert len(by_source.get("web", [])) == 2
    assert len(by_source.get("books", [])) == 1
    assert sorted(by_source.get(None, [])) == [9, 10]


# ---------------------------------------------------------------------------
# text + model family
# ---------------------------------------------------------------------------

def test_text_metrics_dirty(spark, dirty):
    """Codegen text metrics NULL-propagate (never throw) over dirty docs;
    empty text gets real zeros, not NULLs."""
    docs = spark.read.parquet(dirty["docs"])
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tok"),
            quality_score(F.col("text")).alias("q"),
            fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    assert rows[4]["n_tok"] is None and rows[4]["q"] is None and rows[4]["fp"] is None
    assert rows[5]["n_tok"] == 0 and rows[5]["q"] is not None
    assert rows[6]["n_tok"] == 0
    # whitespace-insensitive fingerprint: '' and whitespace-only agree
    assert rows[5]["fp"] == rows[6]["fp"]
    assert rows[0]["n_tok"] == 9


def test_heuristic_filters_dirty(spark, dirty):
    """The gate runs per doc at scan speed — dirty docs keep their row
    (NULL signals) instead of erroring or vanishing."""
    docs = spark.read.parquet(dirty["docs"])
    out = {r["doc_id"]: r for r in heuristic_filters(docs, "text", "doc_id").collect()}
    assert set(out) == {r[0] for r in DOC_ROWS}
    assert out[0]["n_words"] == 9
    assert out[5]["n_words"] == 0 and out[5]["gate"] is False
    assert out[4]["gate"] is None or out[4]["gate"] is False  # NULL text never passes


def test_model_gate_dirty(spark, dirty):
    """Arrow model scorers treat NULL text as the empty doc (the
    _doc_grams contract): same bias-only logit, no crash, one row out per
    row in."""
    docs = spark.read.parquet(dirty["docs"])
    wq = hashed_seed_weights("q", n_features=256)
    wl = {
        "en": hashed_seed_weights("en", n_features=256),
        "fr": hashed_seed_weights("fr", n_features=256),
    }
    out = model_gate_scores(docs, wq, wl, text_col="text", n_features=256)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {r[0] for r in DOC_ROWS}
    # NULL text == empty text == whitespace-only ([a-z]+ extracts nothing)
    assert (
        rows[4]["logit_q"] == rows[5]["logit_q"] == rows[6]["logit_q"]
    )
    assert rows[4]["n_grams"] == 0
    assert rows[4]["pred_lang"] == rows[5]["pred_lang"]


# ---------------------------------------------------------------------------
# tokenizer / chunking / span / decontamination / join families (r12 round-2)
# ---------------------------------------------------------------------------

def test_bpe_dirty(spark, dirty):
    """The tokenizer surfaces treat NULL / empty / whitespace text as the
    empty document: training never crashes on them, both encode faces
    emit [] (0 tokens, 0 ids), and clean docs are unaffected."""
    from metadata_ingestion_framework_spark.functions.bpe import (
        bpe_encode_ids,
        bpe_tokenize_fast,
        bpe_train,
    )

    docs = spark.read.parquet(dirty["docs"])
    merges = bpe_train(docs, "text", k_merges=3)
    assert merges  # trained from the clean rows despite the dirty ones
    toks = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_tokenize_fast(docs, merges).collect()
    }
    ids = {
        r.doc_id: list(r.token_ids)
        for r in bpe_encode_ids(docs, merges).collect()
    }
    for d in (4, 5, 6):  # NULL, '', whitespace-only
        assert toks[d] == [] and ids[d] == []
    assert toks[0] and len(ids[0]) == len(toks[0])


def test_chunk_and_span_dirty(spark, dirty):
    """chunk_passages emits no chunk for token-less docs (NULL/empty/
    whitespace) instead of empty-string chunks; remove_duplicate_spans
    keeps every row — NULL text passes through as NULL, whitespace
    normalizes to '', and the clean exact-dup pair still rewrites."""
    from metadata_ingestion_framework_spark.functions.text import chunk_passages
    from metadata_ingestion_framework_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    docs = spark.read.parquet(dirty["docs"])
    chunk_ids = {r.doc_id for r in chunk_passages(docs, "text", "doc_id").collect()}
    assert chunk_ids.isdisjoint({4, 5, 6, 10})
    assert 0 in chunk_ids
    out = {r.doc_id: r for r in remove_duplicate_spans(docs, "text", "doc_id", span_w=3).collect()}
    assert set(out) == {r[0] for r in DOC_ROWS}  # every row survives
    assert out[4].clean_text is None and out[4].n_removed == 0
    assert out[6].clean_text == ""  # whitespace-only normalizes
    # doc 1 is an exact dup of doc 0: its 3-token spans all occurred
    # earlier (in doc 0), so the rewrite empties it
    assert out[0].n_removed == 0 and out[1].n_removed > 0


def test_decontamination_dirty(spark, dirty):
    """NULL/short texts have no 3-grams on either side: they contaminate
    nothing and nothing contaminates them; the real overlap still fires."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        ngram_contamination,
    )

    docs = spark.read.parquet(dirty["docs"])
    train = docs.filter(F.col("doc_id") < 5)       # includes NULL-text 4
    evals = docs.filter(F.col("doc_id") >= 5)      # '', ws, 'a', NULLs...
    evals = evals.unionByName(
        spark.createDataFrame(
            [(200, "quick brown fox jumps over", "en", "web")],
            "doc_id long, text string, lang string, source string",
        )
    )
    pairs = ngram_contamination(train, evals, "text", "doc_id", shingle_n=3).collect()
    flat = {(r[0], r[1]) for r in pairs}
    eval_hits = {e for _, e in flat}
    assert eval_hits == {200}  # only the genuinely overlapping eval doc
    train_hits = {t for t, _ in flat}
    assert 4 not in train_hits  # NULL-text train doc shares nothing


def test_asof_join_dirty_keys_and_ts(spark):
    """as_of_join: NULL join keys never match (plain equi-join semantics
    on the key), a NULL left timestamp matches nothing, and a NULL right
    timestamp is never 'most recent' — left rows always survive with
    NULL payload."""
    from metadata_ingestion_framework_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, "u1", 100.0), (2, None, 100.0), (3, "u1", None)],
        "event_id long, user_id string, ts double",
    )
    right = spark.createDataFrame(
        [(10, "u1", 50.0, 5.0), (11, None, 60.0, 6.0), (12, "u1", None, 7.0)],
        "event_id long, user_id string, ts double, value double",
    )
    out = {
        r.event_id: r
        for r in as_of_join(
            left, right, ["user_id"], "ts", "ts",
            right_cols=["event_id", "value"],
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].event_id_r == 10 and out[1].value_r == 5.0
    assert out[2].event_id_r is None  # NULL key: no match
    assert out[3].event_id_r is None  # NULL left ts: no match


def test_range_join_dirty_bounds(spark):
    """range_join_pairs: NULL or inverted interval bounds produce no
    pairs (F.sequence would DESCEND on inverted ranges — the guard drops
    them); clean overlaps still join."""
    from metadata_ingestion_framework_spark.operators.joins import (
        range_join_pairs,
    )

    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, None, 10.0), (3, 5.0, None), (4, 8.0, 2.0)],
        "l_id long, ls double, le double",
    )
    right = spark.createDataFrame(
        [(10, 1.0, 3.0)], "r_id long, rs double, re double"
    )
    out = range_join_pairs(
        left, right, "l_id", "r_id", "ls", "le", "rs", "re", bucket_width=5.0
    ).collect()
    assert {(r.l_id, r.r_id) for r in out} == {(1, 10)}
