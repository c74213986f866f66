"""Deterministic sharded corpus writer — the pipeline's LAST MILE.

Every public training-data pipeline ends by materializing the curated
corpus as N size-bounded shards with a manifest (shard id, doc/token
counts, content checksum) so downstream loaders can verify and stream
it. The reference has no analogue (it ends at table writes —
Utility.scala's writers; BASELINE.json): this is a north-star
training-data extension (VERDICT r15 item 5).

Design:

- **Assignment** is the :func:`functions.sampling.deterministic_shuffle`
  md5-rank order (60-bit md5 of the doc id + id tiebreak — engine-exact,
  rerun-stable) cut into shards by a running token budget:
  ``shard = cum_before div shard_tokens``. Shards are size-bounded by
  ``shard_tokens`` plus at most one straddling document (the loader's
  concat-then-chunk convention), and the whole rule is plain SQL — the
  DuckDB oracle replays hash, order, running sum and cut exactly.
- **Scale**: the running sum reuses :func:`token_budget_select`'s
  two-stage de-skewed cumsum machinery VERBATIM (range-sharded local
  windows + broadcast offsets — never a single global sort task).
- **Write** is one file per shard in deterministic in-file order
  (``repartition(shard)`` + ``sortWithinPartitions`` — the tablestore
  clustering precedent), into a :class:`VersionedParquetStore` so the
  corpus version swap is atomic and the manifest rides the same root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.dedup import carry_deps

#: salt for the default corpus epoch — callers pass their own per epoch.
DEFAULT_SALT = "corpus0"


def corpus_shard_assignments(
    df: DataFrame,
    text_col: str | None,
    id_col: str,
    shard_tokens: int = 100_000_000,
    salt: str = DEFAULT_SALT,
    n_tokens_col: str | None = None,
    shards: int | None = None,
) -> DataFrame:
    """Assign every document to its output shard: all input columns plus
    ``n_tokens``, ``cum_before`` (tokens strictly before this doc in the
    md5-rank order) and ``shard = cum_before div shard_tokens``.

    Deterministic for any id type and stable across reruns/partitionings
    (the md5 order key); insertions shift LATER shards — this is a
    corpus SNAPSHOT writer, not an incremental store. Pass
    ``n_tokens_col`` when token counts are precomputed (the skinny-
    persist rule — composites should drop text before the cumsum).
    Release ``_persisted_deps`` when done."""
    from metadata_ingestion_framework_spark.functions.sampling import (
        hash_key60,
        token_budget_select,
    )

    # hk ASC == (-hk) DESC: ride token_budget_select's ranked two-stage
    # cumsum verbatim with an unreachable budget (keep everything, keep
    # cum_before). hash_key60 never yields NULL, so the nulls rule in
    # the shared order is inert.
    base = df.withColumn("__nhk", -hash_key60([id_col], salt))
    out = token_budget_select(
        base,
        text_col,
        id_col,
        "__nhk",
        budget_tokens=1 << 62,
        shards=shards,
        n_tokens_col=n_tokens_col,
    )
    assigned = out.select(
        *[c for c in out.columns if c not in ("__nhk",)],
        F.expr(f"cum_before div {int(shard_tokens)}")
        .cast("int")
        .alias("shard"),
    )
    return carry_deps(assigned, out)


def corpus_shard_manifest(assigned: DataFrame, id_col: str) -> DataFrame:
    """``(shard, n_docs, n_tokens, checksum)`` — the loader-facing
    manifest. ``checksum`` is the md5 of the shard's comma-joined doc
    ids sorted LEXICOGRAPHICALLY as strings (``sort_array(collect_list(
    cast))`` == DuckDB ``string_agg(... ORDER BY CAST AS VARCHAR)`` —
    engine-exact, shard-bounded state: a shard holds at most
    ``shard_tokens`` worth of documents)."""
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(F.col(id_col).cast("string"))
                ),
            )
        ).alias("checksum"),
    )


def write_corpus_shards(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    text_col: str | None,
    id_col: str,
    shard_tokens: int = 100_000_000,
    salt: str = DEFAULT_SALT,
    n_tokens_col: str | None = None,
    shards: int | None = None,
) -> DataFrame:
    """Materialize the corpus: table ``corpus`` partitioned by ``shard``
    (ONE file per shard, rows in the deterministic (cum_before, id)
    stream order — byte-stable content across reruns) and table
    ``manifest`` in the same :class:`VersionedParquetStore` root. Each
    table's version swap is individually atomic; the MANIFEST is
    written LAST and is the commit marker — a crash between the two
    writes leaves a new corpus version with no matching manifest, so a
    loader that resolves shards through the manifest (the intended
    read path) never observes the half-written export, and rerunning
    the writer repairs it (both tables re-version). Returns the
    manifest DataFrame as written (read back from the store — no
    persisted deps to release).

    Scale: ``repartition(shard)`` is one shuffle whose partitions are
    shard_tokens-bounded by construction; distinct shards write in
    parallel, and the single writer task per shard is the intended unit
    (the tablestore one-file-per-leaf rule)."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.plans.tablestore import (
        VersionedParquetStore,
    )

    assigned = corpus_shard_assignments(
        df, text_col, id_col, shard_tokens=shard_tokens, salt=salt,
        n_tokens_col=n_tokens_col, shards=shards,
    )
    # the assignment feeds BOTH the corpus write and the manifest —
    # persist the (skinny-ish) assignment or the two-stage cumsum runs
    # twice over the corpus (CLAUDE.md self-join rule)
    assigned = assigned.persist()
    store = VersionedParquetStore(spark, root)
    ordered = assigned.repartition(F.col("shard")).sortWithinPartitions(
        "shard", "cum_before", id_col
    )
    # cluster=False: we already clustered AND ordered — the store's own
    # repartition would destroy the deterministic in-file order
    store.write(ordered, "corpus", partition_by=["shard"], cluster=False)
    store.write(corpus_shard_manifest(assigned, id_col), "manifest")
    unpersist_deps(assigned)
    assigned.unpersist()
    return store.read("manifest")
