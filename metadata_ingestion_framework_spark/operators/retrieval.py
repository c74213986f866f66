"""Lexical (BM25) retrieval over a documents table — the text-side twin
of the embedding ANN family (Robertson & Zaragoza 2009, public
methodology). A training-data pipeline uses this for dedup triage,
eval-set contamination review, and quality-by-retrieval audits where no
embeddings exist.

North-star extension (no reference analogue; BASELINE.json).

Spark shape — the inverted-index query plan, not a scan-per-query:

- ONE corpus pass builds the (doc, term, tf, dl) postings and the
  per-term document frequencies — both groupBys shuffle on bounded
  uniform keys (term, (doc, term)); corpus stats (N, avgdl) ride the
  plan as a broadcast 1-row agg, never a driver collect;
- the query side explodes to DISTINCT query terms (tiny) and broadcasts
  into the postings — each query touches only its terms' posting rows,
  the n_probe/n_cells analogue for text;
- the per-(query, doc) accumulation sums per-term contributions ROUNDED
  to 6 decimals as DECIMAL(18,6) — an ORDER-FREE exact sum (the
  CLAUDE.md decimal convention), so the score is reproducible across
  partitionings and engines; the only trans-cendental is ``ln`` in the
  idf, mirrored expression-for-expression in the DuckDB twin.

Dirty contract: NULL/empty text tokenizes to nothing — such a corpus doc
can never match, and such a query returns no rows. Tokens are the
engine's cleaned-token convention (``[a-z]+`` on the lowercased text,
the model-gate/BPE tokenizer), so postings, gates, and tokenizers all
agree on what a "word" is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.similarity import _topk


def _terms(text_col: str):
    # Spark's regexp_extract_all defaults to capture-group 1; a plain
    # pattern needs the explicit 0 (DuckDB's defaults to the full match).
    # Column arguments throughout (ADVICE r12): interpolating the raw
    # name into an F.expr SQL string broke (or silently mis-resolved)
    # column names needing backticks — spaces, dots, keywords.
    return F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit("[a-z]+"),
        F.lit(0),
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-query BM25 top-k: ``(query_id, doc_id, score, rank)`` with the
    family tiebreak (score desc NULLS LAST, doc id asc).

    idf is the standard robust form ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (never negative); the term weight is
    ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``. Each term's
    contribution is rounded to 6 decimals BEFORE the per-(query, doc)
    sum so the aggregate is exact-decimal and order-free."""
    docs = corpus.select(
        F.col(id_col), _terms(text_col).alias("__toks")
    ).withColumn("__dl", F.size("__toks"))

    tf = (
        docs.select(id_col, "__dl", F.explode("__toks").alias("term"))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # corpus stats as a broadcast 1-row agg (in-DAG, no driver collect).
    # Total tokens come from the tf AGGREGATE (sum of tf == sum of dl —
    # its exchange is already built for dfreq/postings, so this adds NO
    # second tokenize pass; r12 review: an agg over `docs` re-ran the
    # per-row regex for the whole corpus) and n_docs from an id-only
    # column scan (token-less docs count in the denominator). avgdl =
    # exact LONG sum / exact count -> ONE double division, order-free
    # and bit-identical cross-engine (built-in AVG on integral inputs
    # accumulates DOUBLE partials — order-dependent).
    n_docs_df = corpus.select(id_col).agg(
        F.count(F.lit(1)).alias("__n_docs")
    )
    stats = (
        tf.agg(F.sum("tf").alias("__total"))
        .crossJoin(n_docs_df)
        .select(
            "__n_docs",
            (F.col("__total").cast("double") / F.col("__n_docs")).alias(
                "__avgdl"
            ),
        )
    )
    postings = tf.join(dfreq, "term").crossJoin(F.broadcast(stats))

    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(_terms(text_col))).alias("term"),
    )

    tf_d = F.col("tf").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    term_score = idf * (tf_d * F.lit(k1 + 1.0)) / norm

    scored = (
        postings.join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, id_col)
        .agg(
            F.sum(
                F.round(term_score, 6).cast("decimal(18,6)")
            ).cast("double").alias("score")
        )
    )
    return _topk(scored, k, query_id_col, id_col)
