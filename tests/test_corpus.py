"""Deterministic sharded corpus writer (operators/corpus.py, r16 —
VERDICT r15 item 5): md5-rank + running-token-budget shard assignment,
one ordered file per shard, loader manifest, rerun stability."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.corpus import (
    corpus_shard_assignments,
    corpus_shard_manifest,
    write_corpus_shards,
)
from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps
from metadata_ingestion_framework_spark.plans.tablestore import (
    VersionedParquetStore,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _docs(spark):
    return spark.read.parquet(DOCS).select("doc_id", "text")


def test_assignment_rule_and_size_bound(spark):
    docs = _docs(spark)
    out = corpus_shard_assignments(docs, "text", "doc_id", shard_tokens=5000)
    rows = out.select("doc_id", "n_tokens", "cum_before", "shard").collect()
    unpersist_deps(out)
    # shard is exactly cum_before div budget, shards are contiguous 0..K
    assert all(r.shard == r.cum_before // 5000 for r in rows)
    shards = sorted({r.shard for r in rows})
    assert shards == list(range(len(shards))) and len(shards) > 3
    # size bound: every shard holds < budget + its one straddling doc
    per = {}
    for r in rows:
        per[r.shard] = per.get(r.shard, 0) + r.n_tokens
    max_doc = max(r.n_tokens for r in rows)
    assert all(v <= 5000 + max_doc for v in per.values())


def test_writer_one_ordered_file_per_shard_and_manifest(spark, tmp_path):
    docs = _docs(spark)
    man = write_corpus_shards(
        spark, docs, str(tmp_path / "corpus"), "text", "doc_id",
        shard_tokens=5000,
    )
    store = VersionedParquetStore(spark, str(tmp_path / "corpus"))
    v = store.current_version("corpus")
    vdir = store._version_path("corpus", v)
    shard_dirs = [d for d in os.listdir(vdir) if d.startswith("shard=")]
    assert len(shard_dirs) == man.count()
    for d in shard_dirs:
        files = [
            f for f in os.listdir(os.path.join(vdir, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1  # one file per shard
    # manifest checksum matches an independent recompute from the corpus
    corpus = store.read("corpus")
    want = {
        (r.shard, r.n_docs, r.n_tokens, r.checksum)
        for r in corpus_shard_manifest(corpus, "doc_id").collect()
    }
    got = {
        (r.shard, r.n_docs, r.n_tokens, r.checksum) for r in man.collect()
    }
    assert got == want
    # manifest totals cover the corpus exactly
    assert man.agg(F.sum("n_docs")).collect()[0][0] == docs.count()


def test_rerun_is_byte_stable(spark, tmp_path):
    """Same input written twice (independent roots) -> identical shard
    assignment, identical in-shard row ORDER, identical manifests."""
    docs = _docs(spark)

    def snap(root):
        write_corpus_shards(
            spark, docs, root, "text", "doc_id", shard_tokens=5000
        )
        store = VersionedParquetStore(spark, root)
        corpus = store.read("corpus")
        # in-file order is the read order of the single per-shard file
        order = [
            (r.shard, r.doc_id)
            for r in corpus.select(
                "shard", "doc_id", F.monotonically_increasing_id().alias("i")
            ).orderBy("shard", "i").collect()
        ]
        man = sorted(map(tuple, store.read("manifest").collect()))
        return order, man

    o1, m1 = snap(str(tmp_path / "a"))
    o2, m2 = snap(str(tmp_path / "b"))
    assert o1 == o2 and m1 == m2


def test_precomputed_token_counts_and_string_ids(spark):
    """n_tokens_col skips the text pass (skinny-persist rule) and the
    md5 assignment works for string ids."""
    docs = _docs(spark).select(
        F.concat(F.lit("d-"), F.col("doc_id")).alias("doc_id"),
        "text",
    ).withColumn(
        "nt",
        F.regexp_count(F.col("text"), F.lit(r"[^ \t\n\r\f]+")).cast("long"),
    )
    a = corpus_shard_assignments(
        docs, "text", "doc_id", shard_tokens=5000
    )
    b = corpus_shard_assignments(
        docs.drop("text"), None, "doc_id", shard_tokens=5000,
        n_tokens_col="nt",
    )
    ra = sorted((r.doc_id, r.shard) for r in a.collect())
    rb = sorted((r.doc_id, r.shard) for r in b.collect())
    unpersist_deps(a)
    unpersist_deps(b)
    assert ra == rb and len(ra) == 500
