"""Round-5 regression locks (VERDICT r4 item 5, closing r3 latents 4a/4c):

- _persisted_deps must survive wrapping transformations (carry_deps), so
  long-lived sessions can release operator caches from the RESULT DataFrame.
- Python tokenizer kernels must split on ASCII whitespace exactly like the
  DuckDB oracles' RE2 '\\s+' — Unicode whitespace (NBSP...) must NOT split.
"""

from __future__ import annotations

import duckdb
import pytest

from metadata_ingestion_framework_spark.operators.dedup import (
    _tokenize,
    carry_deps,
)


@pytest.mark.parametrize(
    "text",
    [
        "Hello  World\tfoo\nbar",
        "nbsp\xa0stays one token",          # U+00A0: Python str.split splits, RE2 \s does not
        "a\x0bb",                           # U+000B: Python/Java \s split, RE2 \s does NOT (r5 ADVICE)
        "line sep and thin space",  # U+2028 / U+2009 likewise
        "  leading and trailing  ",
        "",
        "MiXeD CaSe ÉTÉ Straße",
    ],
)
def test_tokenize_matches_duckdb_re2(text):
    oracle = duckdb.sql(
        r"SELECT list_filter(string_split_regex(lower(?::VARCHAR), '\s+'), w -> w <> '')",
        params=[text],
    ).fetchone()[0]
    assert _tokenize(text) == oracle


def test_tokenize_none_is_empty():
    assert _tokenize(None) == []


def test_carry_deps_propagates_through_select(spark):
    a = spark.range(3)
    b = spark.range(4)
    src = spark.range(5)
    src._persisted_deps = [a]
    out = carry_deps(src.select("id"), src)
    assert getattr(out, "_persisted_deps", None) == [a]
    # merges with deps already on the wrapped frame, preserving both
    out2 = src.select("id")
    out2._persisted_deps = [b]
    merged = carry_deps(out2, src)
    assert merged._persisted_deps == [b, a]
    # no-op when no parent carries deps
    plain = carry_deps(spark.range(2).select("id"), spark.range(2))
    assert not hasattr(plain, "_persisted_deps")


def test_prefix_query_result_carries_deps(spark):
    """q_ngram_jaccard_prefix wraps the operator output with a select();
    the persisted gram table must still be releasable from the result
    (the r3 bench tail's 'already cached' warnings came from this leak)."""
    from metadata_ingestion_framework_spark.catalog_queries import (
        QUERIES,
    )
    from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps

    out = QUERIES["ngram_jaccard_prefix"](spark, "/root/testdata/sf0.001")
    deps = getattr(out, "_persisted_deps", ())
    assert len(deps) >= 1
    unpersist_deps(out)
    assert all(not d.is_cached for d in deps)


def test_curation_pipeline_carries_all_deps(spark):
    from metadata_ingestion_framework_spark.catalog_queries import QUERIES
    from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps

    out = QUERIES["curation_pipeline"](spark, "/root/testdata/sf0.001")
    deps = getattr(out, "_persisted_deps", ())
    # exact-dedup barrier + the prefix join's persisted gram table
    assert len(deps) >= 2
    unpersist_deps(out)
    assert all(not d.is_cached for d in deps)


def test_arrow_kernels_bit_match_jvm_expressions(spark):
    """The r5 Arrow kernels (matmul bucketing / argmax assignment / cumsum
    norms) claim BIT-identical outputs to the JVM HOF expressions they
    replaced — subtract() uses exact equality, so any ulp drift fails."""
    from pyspark.sql import functions as F

    from metadata_ingestion_framework_spark.operators.similarity import (
        dot,
        ivf_assign,
        l2_norm,
        lsh_bucket,
        random_centroids,
        random_hyperplanes,
        with_l2_norm,
        with_lsh_buckets,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planes = random_hyperplanes(64, 8)
    jvm_b = emb.select("vec_id", lsh_bucket(F.col("embedding"), planes).alias("b"))
    ker_b = with_lsh_buckets(emb.select("vec_id", "embedding"), planes).select(
        "vec_id", F.col("__bucket").alias("b")
    )
    assert jvm_b.exceptAll(ker_b).count() == 0
    assert ker_b.exceptAll(jvm_b).count() == 0

    cents = random_centroids(64, 8)
    v = F.col("embedding")
    scores = F.array(*[dot(v, F.array(*[F.lit(float(x)) for x in c])) for c in cents])
    jvm_c = emb.select(
        "vec_id",
        (F.array_position(scores, F.array_max(scores)) - 1).cast("int").alias("c"),
    )
    ker_c = ivf_assign(emb.select("vec_id", "embedding"), cents).select(
        "vec_id", F.col("__ivf_cell").alias("c")
    )
    assert jvm_c.exceptAll(ker_c).count() == 0

    jvm_n = emb.select("vec_id", l2_norm(F.col("embedding")).alias("n"))
    ker_n = with_l2_norm(emb.select("vec_id", "embedding"), "embedding", "n").select(
        "vec_id", "n"
    )
    assert jvm_n.exceptAll(ker_n).count() == 0
