"""Property-based tests (hypothesis): pure condition-builder logic at full
example counts; Spark-bound merge/dedup invariants at a small example cap
(each example is a Spark job)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from metadata_ingestion_framework_spark.functions.pii import identify_columns
from metadata_ingestion_framework_spark.operators.joins import _parse_key
from metadata_ingestion_framework_spark.operators.merge import scd1_merge
from metadata_ingestion_framework_spark.operators.dedup import dedup_window

names = st.text(alphabet="abcdefgh_", min_size=1, max_size=8)


@given(left=names, right=names, op=st.sampled_from(["<", "<=", "=", ">=", ">", "!="]))
def test_parse_key_theta(left, right, op):
    l, sym, r = _parse_key(f"{left} {op} {right}")
    assert (l, sym, r) == (left, op, right)


@given(key=names)
def test_parse_key_bare_is_equi(key):
    assert _parse_key(key) == (key, "=", key)


@given(cols=st.lists(names, max_size=6, unique=True), probe=names,
       common=st.booleans())
def test_identify_columns_subset_and_monotone(cols, probe, common):
    out = identify_columns(cols, [(probe, common)])
    assert set(out) <= set(cols)
    assert len(out) == len(set(out))  # deduped
    # exact-match results are always a subset of substring-match results
    exact = identify_columns(cols, [(probe, True)])
    sub = identify_columns(cols, [(probe, False)])
    assert set(exact) <= set(sub)


rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(0, 9)),
    min_size=1, max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(target_rows=rows, update_rows=rows)
def test_scd1_key_invariants(spark, target_rows, update_rows):
    """Post-merge: exactly the union of key sets, one row per key, updated
    keys carry update values (first-by-order dedup winner)."""
    target = spark.createDataFrame(
        [(k, v, 0) for k, v, _ in {r[0]: r for r in target_rows}.values()],
        "k int, v int, ts int",
    )
    # unique ts per update row: the reference dedups by updated_at alone, so
    # equal timestamps would make the winner nondeterministic
    uniq_ts = [(k, v, i) for i, (k, v, _) in enumerate(update_rows)]
    updates = spark.createDataFrame(uniq_ts, "k int, v int, ts int")
    out = scd1_merge(target, updates, ["k"], updated_at_col="ts").collect()
    tkeys = {r[0] for r in target_rows}
    ukeys = {r[0] for r in update_rows}
    assert {r["k"] for r in out} == tkeys | ukeys
    assert len(out) == len(tkeys | ukeys)
    # winner per updated key = earliest ts row — ascending dedup, parity A5
    expect = {}
    for k, v, ts in uniq_ts:
        expect.setdefault(k, v)
    for r in out:
        if r["k"] in ukeys:
            assert r["v"] == expect[r["k"]]


@settings(max_examples=8, deadline=None)
@given(data=rows)
def test_dedup_window_one_row_per_key_min_wins(spark, data):
    df = spark.createDataFrame(data, "k int, v int, ts int")
    out = dedup_window(df, ["k"], ["ts", "v"]).collect()
    keys = {r[0] for r in data}
    assert len(out) == len(keys)
    best = {}
    for k, v, ts in sorted(data, key=lambda r: (r[2], r[1])):
        best.setdefault(k, (ts, v))
    for r in out:
        assert (r["ts"], r["v"]) == best[r["k"]]


def test_pack_manifest_invariants(spark):
    """Property: within every shard, sequence spans are contiguous and
    non-overlapping in id order, and token mass is conserved."""
    from metadata_ingestion_framework_spark.functions.text import pack_manifest
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 256
    m = pack_manifest(docs, "text", "doc_id", budget, 8).collect()
    by_shard: dict[int, list] = {}
    for r in m:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(len(v) for v in by_shard.values()), "non-empty shards"
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["n_tokens"] > 0
            assert r["seq_first"] == cum // budget
            assert r["seq_last"] == (cum + r["n_tokens"] - 1) // budget
            assert r["seq_first"] <= r["seq_last"]
            cum += r["n_tokens"]


def test_repetition_stats_bounds(spark):
    """Property: all three fractions live in [0, 1]; top_word_frac >= 1/n
    for any non-empty doc; dup fraction is 0 iff all words distinct."""
    from metadata_ingestion_framework_spark.functions.text import repetition_stats
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = repetition_stats(docs, "text", "doc_id")
    bad = out.filter(
        (F.col("top_word_frac") < 0) | (F.col("top_word_frac") > 1)
        | (F.col("dup_word_frac") < 0) | (F.col("dup_word_frac") > 1)
        | (F.col("top_bigram_frac") < 0) | (F.col("top_bigram_frac") > 1)
    ).count()
    assert bad == 0
    assert out.count() == docs.count()
