"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public methodology): select raw-corpus documents whose hashed-n-gram
distribution matches a small TARGET corpus, by importance weights under
two bag-of-hashed-ngrams models plus Gumbel top-k resampling.

This is the distribution-MATCHING member of the selection family — the
trained classifier (``quality_model``) learns a decision boundary, DSIR
reweights toward a reference distribution with no training loop. No
reference analogue (north-star training-data extension; BASELINE.json).

Cross-engine design (every value oracle-checkable):

- Features are unigrams + bigrams of the ``[a-z]+`` token convention
  (the bm25 ``_terms`` twin), hashed into ``m`` buckets with the shared
  60-bit md5 primitive (CLAUDE.md) — DuckDB reproduces every bucket.
- Per-bucket log ratios ``ln(((ct+1)*(Ns+m)) / ((cs+1)*(Nt+m)))``
  (add-1 smoothing) are computed from EXACT integer counts with the
  arithmetic written identically on both engines.
- Per-doc log-weights accumulate ``ROUND(cnt * lr, 6)`` as
  DECIMAL(18,6) — the order-free exact-sum convention of the BM25
  scorer — so the weight is bit-stable under any partitioning.
- Gumbel keys use the md5-uniform ``(h + 0.5) / 2^60`` (never 0/1) —
  deterministic, engine-exact; first-max selection == ROW_NUMBER with
  the id tiebreak.

Scale shape: the target fit is one pass over the (small) target corpus
collapsing to <= m rows; the source fit is ONE partial-aggregated pass
over the raw corpus collapsing to <= m rows; scoring is a map-side
broadcast join of the m-row ratio table into the corpus's exploded
feature counts + one partial-aggregable decimal sum; selection rides
the two-stage de-skewed rank (``_grouped_rank`` — no single global
window task). Nothing driver-side exceeds the m-row ratio table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: feature-hash salt — part of the model identity.
DSIR_SALT = "dsir0"


def _feature_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, feat) — one row per unigram/bigram OCCURRENCE. Tokens are
    the ``[a-z]+`` lowercase convention; bigrams join adjacent tokens
    with a space via zip_with over shifted slices (no per-element
    outer-array re-evaluation — CLAUDE.md HOF rule)."""
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit("[a-z]+"),
        0,
    )
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    feats = F.concat(toks, bigrams)
    return df.select(
        F.col(id_col), F.explode(feats).alias("feat")
    )


def _bucket(col) -> "F.Column":
    """Shared md5 feature bucket (UNMODDED 60-bit key; callers pmod by
    m): DuckDB twin ``('0x' || substr(md5(concat_ws(chr(31), 'dsir0',
    feat)), 1, 15))::BIGINT``."""
    key = F.concat_ws("\x1f", F.lit(DSIR_SALT), col)
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def _bucket_counts(
    df: DataFrame, text_col: str, id_col: str, m: int
) -> DataFrame:
    """(bucket, cnt) hashed-feature occurrence counts for a corpus —
    one partial-aggregated pass collapsing to <= m rows."""
    return (
        _feature_rows(df, text_col, id_col)
        .select(F.pmod(_bucket(F.col("feat")), F.lit(int(m))).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratios(
    source: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    m: int = 4096,
) -> DataFrame:
    """``(bucket, lr)`` — the per-bucket importance log ratio
    ``ln(((ct+1)*(Ns+m)) / ((cs+1)*(Nt+m)))`` under add-1-smoothed
    bag-of-hashed-ngrams models of the target (ct, Nt) and source
    (cs, Ns) corpora. <= m rows — broadcastable by construction."""
    mt = int(m)
    tc = _bucket_counts(target, text_col, id_col, mt).withColumnRenamed(
        "cnt", "ct"
    )
    sc = _bucket_counts(source, text_col, id_col, mt).withColumnRenamed(
        "cnt", "cs"
    )
    return _ratios_from_counts(tc, sc, mt)


def _ratios_from_counts(
    tc: DataFrame, sc: DataFrame, mt: int
) -> DataFrame:
    """The ratio arithmetic over precomputed (bucket, ct) / (bucket, cs)
    count tables — split out so :func:`dsir_weights` can derive the
    source counts from its single per-doc pass instead of re-tokenizing
    the corpus (r16 review)."""
    totals = (
        tc.agg(F.sum("ct").cast("double").alias("__nt"))
        .crossJoin(sc.agg(F.sum("cs").cast("double").alias("__ns")))
    )
    # union-aggregate instead of a full-outer join: both sides are
    # <= m rows but Spark can only SortMergeJoin a full outer — one
    # groupBy over the tagged union yields the same coalesced counts
    # (integer-valued doubles, exact sums) with no join at all
    both = (
        tc.select(
            "bucket",
            F.col("ct").cast("double").alias("ct"),
            F.lit(0.0).alias("cs"),
        )
        .unionByName(
            sc.select(
                "bucket",
                F.lit(0.0).alias("ct"),
                F.col("cs").cast("double").alias("cs"),
            )
        )
        .groupBy("bucket")
        .agg(F.sum("ct").alias("ct"), F.sum("cs").alias("cs"))
        .crossJoin(F.broadcast(totals))
    )
    # arithmetic written EXACTLY as the oracle writes it — identical
    # IEEE ops in identical order -> identical bits before the ROUND
    lr = F.log(
        ((F.col("ct") + F.lit(1.0)) * (F.col("__ns") + F.lit(float(mt))))
        / ((F.col("cs") + F.lit(1.0)) * (F.col("__nt") + F.lit(float(mt))))
    )
    return both.select("bucket", lr.alias("lr"))


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    m: int = 4096,
) -> DataFrame:
    """Per-document DSIR log importance weight: all of ``df``'s columns
    plus ``n_feats`` (long) and ``dsir_logw`` (double — the exact
    DECIMAL(18,6) sum of ``ROUND(cnt * lr, 6)`` over the doc's hashed
    feature occurrences; 0.0 for feature-less docs). The corpus is
    tokenized ONCE into a persisted skinny (id, bucket, cnt) table (r16
    review — the source bucket counts, their Ns total, and the per-doc
    weights all derive from it; unpersisted, the tokenize+explode pass
    would run three times); the <= m-row ratio table broadcasts, so the
    only corpus-wide shuffles are the per-doc partial aggregation and
    the skinny weight attach. Release ``_persisted_deps`` when done."""
    mt = int(m)
    doc_buckets = (
        _feature_rows(df, text_col, id_col)
        .select(
            id_col,
            F.pmod(_bucket(F.col("feat")), F.lit(mt)).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    tc = _bucket_counts(target, text_col, id_col, mt).withColumnRenamed(
        "cnt", "ct"
    )
    sc = doc_buckets.groupBy("bucket").agg(F.sum("cnt").alias("cs"))
    ratios = F.broadcast(_ratios_from_counts(tc, sc, mt))
    per_doc = (
        doc_buckets.join(ratios, "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            F.sum(
                F.round(F.col("cnt") * F.col("lr"), 6).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("dsir_logw"),
        )
    )
    out = df.join(per_doc, id_col, "left").select(
        *df.columns,
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(F.col("dsir_logw"), F.lit(0.0)).alias("dsir_logw"),
    )
    out._persisted_deps = [doc_buckets]
    return out


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    m: int = 4096,
    salt: str = "",
    gumbel: bool = True,
    shards: int | None = None,
) -> DataFrame:
    """Select ``k`` documents from ``df`` by DSIR: Gumbel top-k on the
    importance log-weights (the paper's sampling-without-replacement
    trick — ``key = logw + Gumbel(md5-uniform)``), deterministic on any
    engine; ``gumbel=False`` degrades to plain top-k by weight. Output:
    ``(id, n_feats, dsir_logw, dsir_key, rank)`` with ``dsir_logw`` /
    ``dsir_key`` rounded to 6 for the value contract (ordering uses the
    unrounded keys, identical bit-for-bit across engines). The rank is
    the two-stage de-skewed global rank — no single window task.
    Release ``_persisted_deps`` when done."""
    from metadata_ingestion_framework_spark.functions.sampling import (
        _attach_deps,
        _grouped_rank,
        hash_key60,
    )
    from metadata_ingestion_framework_spark.operators.dedup import (
        carry_deps,
    )

    w = dsir_weights(
        df.select(id_col, text_col), target, text_col, id_col, m
    )
    # rank only the SKINNY columns: _grouped_rank's sharded path
    # range-partitions and PERSISTS its input — carrying the corpus
    # text there would cache the whole corpus per rank (r16 review;
    # the curation_v2 skinny-persist rule)
    w = carry_deps(w.select(id_col, "n_feats", "dsir_logw"), w)
    if gumbel:
        # md5-uniform in (0, 1): (h + 0.5) / 2^60 — h is the shared
        # 60-bit key, so u is exactly representable and never 0/1
        u = (hash_key60([id_col], "dsirg" + salt).cast("double")
             + F.lit(0.5)) / F.lit(float(1 << 60))
        key = F.col("dsir_logw") + (-F.log(-F.log(u)))
    else:
        key = F.col("dsir_logw")
    base = w.withColumn("__key", key)
    order = [F.col("__key").desc_nulls_last(), F.col(id_col).asc()]
    ranked, sharded = _grouped_rank(base, [], order, shards)
    out = (
        ranked.filter(F.col("__rank") <= int(k))
        .select(
            id_col,
            "n_feats",
            F.round(F.col("dsir_logw"), 6).alias("dsir_logw"),
            F.round(F.col("__key"), 6).alias("dsir_key"),
            F.col("__rank").cast("long").alias("rank"),
        )
    )
    return _attach_deps(
        out, [sharded] if sharded is not None else [], w
    )
