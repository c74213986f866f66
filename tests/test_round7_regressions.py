"""Round-7 regression locks (r6 VERDICT items 1-2 + r6 ADVICE items 1, 4):

- ``pack_manifest`` shards by a 60-bit md5 of the id: works for STRING
  doc-ids (the ``id % shards`` formulation raised AnalysisException) and
  matches the DuckDB md5 twin exactly.
- ``tfidf_top_terms`` keeps N inside the DAG — building the query must not
  fire a Spark job (the old ``.distinct().count()`` scanned the corpus at
  plan-build time).
- Spark-side tokenize/count regexes use the explicit RE2 whitespace class
  ``[ \\t\\n\\r\\f]``: a corpus containing vertical tabs (\\x0B — Java \\s
  whitespace, NOT RE2 whitespace) must produce identical token counts and
  term sets in both engines.
- ``_vec_matrix`` infers the embedding dim from the MODAL row length, so a
  leading off-dim dirty row no longer masks out every clean row in its
  Arrow batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.functions.text import (
    pack_manifest,
    repetition_stats,
    tfidf_top_terms,
    token_count,
)
from metadata_ingestion_framework_spark.operators.similarity import (
    _vec_matrix,
    embedding_near_duplicates,
)


def _md5_shard(key: str, shards: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % shards


def test_pack_manifest_string_ids(spark):
    """String doc-ids shard via md5 — no AnalysisException, assignment
    matches the portable md5 formula, and the per-shard cumsum packs in
    id order."""
    rows = [(f"doc-{i:03d}", "w " * (i + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = pack_manifest(df, "text", "doc_id", budget_tokens=16, shards=4)
    got = {r.doc_id: (r.shard, r.n_tokens) for r in out.collect()}
    assert len(got) == 40
    for i in range(40):
        did = f"doc-{i:03d}"
        assert got[did] == (_md5_shard(did, 4), i + 1)


def test_pack_manifest_int_ids_match_md5(spark):
    """Integer ids use the SAME md5-of-string assignment (cast to string
    first) so the DuckDB CAST(doc_id AS VARCHAR) twin agrees."""
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(30)], "doc_id int, text string"
    )
    out = pack_manifest(df, "text", "doc_id", budget_tokens=8, shards=8)
    for r in out.collect():
        assert r.shard == _md5_shard(str(r.doc_id), 8)


def test_tfidf_build_fires_no_job(spark):
    """Constructing the tfidf plan must be lazy: the text column below
    raises on execution, so any plan-build-time action (the old
    ``.distinct().count()`` N scan) would blow up here."""

    @F.pandas_udf("string")
    def boom(s):
        raise RuntimeError("plan-build must not execute the scan")

    df = spark.range(5).select(
        F.col("id").alias("doc_id"), boom(F.col("id").cast("string")).alias("text")
    )
    out = tfidf_top_terms(df, "text", "doc_id", k=3)  # build only
    assert {"doc_id", "term", "tfidf", "rank"} <= set(out.columns)


def test_tfidf_values_unchanged_by_dag_n(spark):
    """The broadcast scalar N gives the same scores as the literal-N
    formula it replaced."""
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b b d")], "doc_id int, text string"
    )
    rows = {
        (r.doc_id, r.term): r.tfidf
        for r in tfidf_top_terms(df, "text", "doc_id", k=5).collect()
    }
    # n=3 docs; term 'a': df=2 -> idf = ln(4/3)+1
    assert rows[(1, "a")] == pytest.approx(round(2 * (math.log(4 / 3) + 1), 6))
    assert rows[(3, "b")] == pytest.approx(round(2 * (math.log(4 / 3) + 1), 6))
    assert rows[(2, "c")] == pytest.approx(round(1 * (math.log(4 / 2) + 1), 6))


def test_vertical_tab_tokens_match_duckdb(spark):
    """\\x0B is NOT whitespace under RE2 (DuckDB) — with the explicit
    class, Spark agrees: 'a\\x0bb' is ONE token in both engines (Java \\s
    would have split it into two)."""
    import duckdb

    text = "a\x0bb c"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    n_spark = df.select(token_count(F.col("text")).alias("n")).collect()[0].n
    n_duck = duckdb.sql(
        r"SELECT len(regexp_extract_all('a' || chr(11) || 'b c', '\S+')) AS n"
    ).fetchone()[0]
    assert n_spark == n_duck == 2


def test_vertical_tab_repetition_stats(spark):
    """Token-level repetition metrics treat 'x\\x0by' as one word — the
    term set (and therefore top_word_frac) matches the RE2 tokenization."""
    text = "x\x0by x\x0by z"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = repetition_stats(df, "text", "doc_id").collect()[0]
    # tokens = ['x\x0by', 'x\x0by', 'z'] -> top 2/3, distinct 2/3
    assert r.top_word_frac == pytest.approx(round(2 / 3, 6))
    assert r.dup_word_frac == pytest.approx(round(1 - 2 / 3, 6))


def test_vec_matrix_modal_dim_leading_dirty_row():
    """A leading off-dim row must not define the batch dim: the modal
    length wins and only the dirty row is masked."""
    vals = np.array([[1.0, 2.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], None], dtype=object)
    valid, m = _vec_matrix(vals)
    assert valid.tolist() == [False, True, True, False]
    assert m.shape == (2, 3)


def test_vec_matrix_modal_tie_prefers_smallest():
    vals = np.array([[1.0, 2.0], [1.0, 0.0, 0.0]], dtype=object)
    valid, m = _vec_matrix(vals)
    assert valid.tolist() == [True, False] and m.shape == (1, 2)


def test_neardup_survives_leading_dirty_row(spark):
    """End-to-end: the dirty 3-dim row arrives FIRST in its block; the two
    clean 2-dim near-duplicates must still pair (r6 ADVICE item 4)."""
    df = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0, 0.0]),  # off-dim, smallest id -> leads batch
            (2, "a", [1.0, 0.0]),
            (3, "a", [1.0, 1e-9]),
        ],
        "vec_id int, blk string, embedding array<double>",
    ).coalesce(1).sortWithinPartitions("vec_id")
    pairs = embedding_near_duplicates(df, "blk", threshold=0.9).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(2, 3)}


# --- C4/Gopher heuristic quality filters (functions/text.py, r7) ----------

GOOD_DOC = (
    "This is a good paragraph that ends with punctuation and has the "
    "usual stopwords of normal prose in it.\n"
) * 8  # 8 identical well-formed lines, ~136 words


def _filters(spark, text):
    from metadata_ingestion_framework_spark.functions.text import heuristic_filters

    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    return heuristic_filters(df, "text", "doc_id").collect()[0]


def test_heuristic_filters_good_doc_passes(spark):
    r = _filters(spark, GOOD_DOC)
    assert r.gate and r.terminal_punct_ratio == 1.0
    assert r.n_lines == 8 and r.bullet_frac == 0.0 and r.stopword_hits >= 2


def test_heuristic_filters_bullet_doc_gated(spark):
    bullets = "\n".join(f"- item {i} of the and that listing" for i in range(20))
    r = _filters(spark, bullets)
    assert r.bullet_frac == 1.0 and not r.gate


def test_heuristic_filters_ellipsis_lines(spark):
    text = "first thought trails off...\nsecond one too…\nbut this ends."
    r = _filters(spark, text)
    assert r.n_lines == 3
    assert r.ellipsis_frac == pytest.approx(round(2 / 3, 6))
    # '...' ends in '.' so the ellipsis line ALSO counts as terminal —
    # the two signals are deliberately independent
    assert r.terminal_punct_ratio == pytest.approx(round(2 / 3, 6))


def test_heuristic_filters_empty_doc(spark):
    r = _filters(spark, "")
    assert r.n_lines == 0 and r.n_words == 0 and not r.gate
    assert r.terminal_punct_ratio == 0.0


def test_heuristic_filters_short_doc_gated(spark):
    # well-formed but < 50 words -> Gopher word-count gate
    r = _filters(spark, "The cat sat on the mat and that was that.")
    assert not r.gate and r.stopword_hits >= 2


def test_gopher_gate_column_matches_filters(spark):
    from pyspark.sql import functions as F

    from metadata_ingestion_framework_spark.functions.text import (
        gopher_gate,
        heuristic_filters,
    )

    rows = [
        (1, GOOD_DOC),
        (2, "- a\n- b\n- c"),
        (3, "short text."),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    via_filter = {
        r.doc_id for r in df.filter(gopher_gate(F.col("text"))).collect()
    }
    via_signals = {
        r.doc_id
        for r in heuristic_filters(df, "text", "doc_id").filter("gate").collect()
    }
    assert via_filter == via_signals == {1}


def test_asof_string_tiebreak_orders_natively(spark):
    """r7 review: the tiebreak column must order by its NATIVE type — the
    earlier double cast nulled out string tiebreaks, silently surrendering
    dup-ts determinism."""
    import datetime as dt

    from metadata_ingestion_framework_spark.operators.joins import as_of_join

    T = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, 10, T)], "id long, user long, ts timestamp")
    right = spark.createDataFrame(
        [("aa", 10, T, 1.0), ("zz", 10, T, 2.0), ("mm", 10, T, 3.0)],
        "tag string, user long, ts timestamp, amt double",
    )
    out = as_of_join(
        left, right, ["user"], "ts", "ts",
        right_cols=["tag", "amt"], tiebreak="tag",
    ).collect()[0]
    assert out["tag_r"] == "zz"  # largest string tiebreak wins


def test_range_join_inverted_interval_dropped(spark):
    """r7 review: F.sequence DESCENDS for start > end — inverted intervals
    must be dropped, not exploded into phantom buckets."""
    from metadata_ingestion_framework_spark.operators.joins import range_join_pairs

    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 30.0, 20.0)], "lid long, s double, e double"
    )
    right = spark.createDataFrame([(1, 5.0, 25.0)], "rid long, s double, e double")
    got = {(r["lid"], r["rid"]) for r in range_join_pairs(
        left, right, "lid", "rid", "s", "e", "s", "e", bucket_width=8.0
    ).collect()}
    assert got == {(1, 1)}  # the inverted [30,20] never matches


def test_token_budget_null_scores_fill_last(spark):
    """r7 review: null scores rank LAST on both engines (explicit
    desc_nulls_last / NULLS LAST — the engines' bare-DESC defaults
    disagree)."""
    from metadata_ingestion_framework_spark.functions.sampling import (
        token_budget_select,
    )

    df = spark.createDataFrame(
        [(1, None, "a a a"), (2, 0.1, "b b b")],
        "doc_id int, score double, text string",
    )
    kept = [
        r["doc_id"]
        for r in token_budget_select(
            df, "text", "doc_id", "score", budget_tokens=3
        ).collect()
    ]
    assert kept == [2]  # the scored doc fills the budget; the null doc is cut


def test_asof_join_matches_bruteforce_random(spark):
    """Union+window as-of == per-row brute-force argmax over 300 random
    left rows x 200 right rows, multiple keys, duplicate timestamps."""
    import random

    from metadata_ingestion_framework_spark.operators.joins import as_of_join

    rng = random.Random(13)
    lrows = [(i, rng.randrange(5), float(rng.randrange(100))) for i in range(300)]
    rrows = [(i, rng.randrange(5), float(rng.randrange(100)), rng.random())
             for i in range(200)]
    left = spark.createDataFrame(lrows, "lid long, k int, t double")
    right = spark.createDataFrame(rrows, "rid long, k int, t double, v double")
    got = {
        r["lid"]: r["rid_r"]
        for r in as_of_join(
            left, right, ["k"], "t", "t",
            right_cols=["rid", "v"], tiebreak="rid",
        ).collect()
    }

    def brute(lk, lt):
        cand = [(rt, rid) for rid, rk, rt, _ in rrows if rk == lk and rt <= lt]
        if not cand:
            return None
        best_t = max(t for t, _ in cand)
        return max(rid for t, rid in cand if t == best_t)

    for lid, lk, lt in lrows:
        assert got[lid] == brute(lk, lt), (lid, lk, lt)


def test_span_dedup_conservation_invariants(spark):
    """Over a random dirty corpus: clean tokens are a subsequence of the
    original tokens, n_removed + len(clean) == len(original), and the
    surviving corpus contains each distinct W-window's FIRST occurrence
    intact when it is not covered by another duplicate span."""
    import random

    from metadata_ingestion_framework_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, "text", "doc_id", span_w=4).collect()}
    assert set(out) == {i for i, _ in rows}
    removed_total = 0
    for i, text in rows:
        orig = text.split()
        clean = out[i]["clean_text"].split()
        assert len(clean) + out[i]["n_removed"] == len(orig), i
        removed_total += out[i]["n_removed"]
        # subsequence check
        it = iter(orig)
        assert all(tok in it for tok in clean), i
    assert removed_total > 0  # the random corpus must actually be dirty
