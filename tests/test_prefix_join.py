"""Prefix-filtered exact set-similarity join vs the blocked O(m^2) kernel."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    unpersist_deps,
)

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "a completely different document about spark query engines and shuffles",
    "deterministic sampling keeps corpus membership stable across engine reruns",
    "short doc",
    "",
]


def _corpus(spark):
    rows, did = [], 0
    for b, base in enumerate(BASE):
        words = base.split()
        rows.append((did, f"g{b % 2}", base)); did += 1
        # near-dups: swap/drop one word
        if len(words) > 4:
            v1 = " ".join(words[:-1])                      # drop last
            v2 = " ".join(["extra"] + words)               # prepend
            v3 = " ".join(words[:3] + ["changed"] + words[4:])  # mutate
            for v in (v1, v2, v3):
                rows.append((did, f"g{b % 2}", v)); did += 1
    return spark.createDataFrame(rows, "doc_id long, blk string, text string")


def _pairs(df):
    return {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    }


def test_prefix_join_equals_blocked_kernel(spark):
    # 0.2/0.3/0.7 are float-hostile (0.2*15 = 3.0000000000000004): without
    # epsilon slack before ceil, the prefix shortens and true pairs vanish
    docs = _corpus(spark)
    for thresh in (0.2, 0.3, 0.5, 0.7, 0.8):
        blocked = _pairs(ngram_jaccard_pairs(docs, "text", "doc_id", ["blk"], thresh))
        pfx_df = ngram_jaccard_pairs_prefix(docs, "text", "doc_id", ["blk"], thresh)
        pfx = _pairs(pfx_df)
        unpersist_deps(pfx_df)
        assert pfx == blocked, f"threshold {thresh}: {pfx ^ blocked}"
        assert blocked, f"threshold {thresh} produced no pairs — fixture too weak"


def test_prefix_join_no_blocks_is_global(spark):
    docs = _corpus(spark)
    # without block cols the join is corpus-global: pairs across blk values
    # can appear (identical-ish docs exist only within a block here, so
    # compare against the blocked kernel with a constant block)
    glob_df = ngram_jaccard_pairs_prefix(docs, "text", "doc_id", None, 0.5)
    glob = _pairs(glob_df)
    unpersist_deps(glob_df)
    one_block = ngram_jaccard_pairs(
        docs.withColumn("c", F.lit(1)), "text", "doc_id", ["c"], 0.5
    )
    assert glob == _pairs(one_block)


def test_prefix_join_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, None), (4, "one two")],
        "doc_id long, text string",
    )
    # no doc reaches 3-gram length -> no pairs, no crash
    out = ngram_jaccard_pairs_prefix(docs, "text", "doc_id", None, 0.5)
    assert out.count() == 0
    unpersist_deps(out)
