"""Model-based document quality scoring — the fastText/CCNet shape
(Joulin et al. 2016 "Bag of Tricks"; Wenzek et al. 2019 CCNet), VERDICT
r10 item 4. North-star extension (no reference analogue; the reference's
quality surface is heuristic — functions/text.py).

The public production recipe for corpus quality filtering is a LINEAR
model over hashed bag-of-ngrams features: tokenize, hash each word
unigram/bigram into a fixed-width feature bucket, and score with one
weight-vector dot product. No embedding lookups, no deep model — which
is exactly why it runs at 100 TB: the model is a broadcast array (KBs to
a few MB), scoring is map-only (zero shuffle), and each Arrow batch is
one ``np.bincount`` + matmul.

Cross-engine contract (the CLAUDE.md iterative-exactness rules):

  - feature index = first-8-md5-bytes-big-endian(gram) mod n_features —
    the shared md5 primitive, so DuckDB computes the identical bucket
    with ``('0x'||substr(md5(g),1,16))::UBIGINT % n``;
  - weights are QUANTIZED integers (``quantize_weights`` truncates to
    2^bits), so the logit is an exact order-free BIGINT sum — the value
    the oracle checks bit-for-bit;
  - the float ``score`` (sigmoid of the length-normalized logit) is
    derived from exact integers by a fixed IEEE expression; it is NOT
    oracle-hashed (libm ``exp`` is engine-specific) — the catalog query
    emits the exact-integer columns, per the engine-specific-value
    convention.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

N_FEATURES_DEFAULT = 4096


def _md5_64(s: str) -> int:
    """Shared cross-engine 64-bit token hash (operators/dedup.py:126):
    first 8 md5 digest bytes big-endian == DuckDB
    ``('0x'||substr(md5(s),1,16))::UBIGINT``."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def hashed_seed_weights(seed: str, n_features: int = N_FEATURES_DEFAULT,
                        scale: int = 4096):
    """Deterministic public test weights, no model download: w[i] =
    md5_64(seed || i) % scale - scale/2 — a pure hash function of the
    feature index, so an oracle can recompute every weight inline. Real
    deployments pass their own trained (then quantized) vector instead."""
    import numpy as np

    return np.array(
        [_md5_64(f"{seed}{i}") % scale - scale // 2 for i in range(n_features)],
        dtype=np.int64,
    )


def quantize_weights(weights, bits: int = 20):
    """Float weights -> exact-integer weights: trunc(w * 2^bits), the
    power-of-two quantization that makes the logit an order-free BIGINT
    sum (CLAUDE.md iterative-exactness rule)."""
    import numpy as np

    return np.trunc(np.asarray(weights, dtype=np.float64) * (1 << bits)).astype(
        np.int64
    )


def _doc_grams(text) -> list[str]:
    """Word unigrams + space-joined bigrams over the engine's cleaned-token
    convention ([a-z]+ on the lowercased text) — mirrors
    regexp_extract_all(lower(coalesce(text,'')), '[a-z]+')."""
    import re

    toks = re.findall("[a-z]+", text.lower() if isinstance(text, str) else "")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def langid_model_score(
    df: DataFrame,
    weights_by_lang: dict[str, "object"],
    text_col: str = "text",
    n_features: int | None = None,
    out_col: str = "pred_lang",
) -> DataFrame:
    """Multiclass hashed-ngram LINEAR language identifier — the
    fastText/CCNet lang-id shape (the production replacement for marker-
    word heuristics): one shared bincount per doc, one (n_langs x
    n_features) broadcast integer weight matrix, argmax with the
    engine's total winner rule (score desc, lang asc — first-max ==
    ROW_NUMBER, the CLAUDE.md iterative-algorithm convention).

    Adds ``score_<lang>`` bigint per language (exact order-free integer
    sums — cross-engine value-checkable) and ``{out_col}`` string.
    Map-only, zero shuffle; the matrix rides the closure (n_langs x 4k x
    8 B — broadcast scale)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    langs = sorted(weights_by_lang)
    mats = []
    for lang in langs:
        w = np.asarray(weights_by_lang[lang])
        if not np.issubdtype(w.dtype, np.integer):
            raise TypeError(
                f"weights for {lang!r} must be integer-quantized "
                "(use quantize_weights)"
            )
        mats.append(w.astype(np.int64))
    W = np.stack(mats)  # n_langs x n_features
    n = int(n_features) if n_features is not None else W.shape[1]
    if W.shape[1] != n:
        raise ValueError(f"weights have {W.shape[1]} features, n_features={n}")
    schema = StructType(
        list(df.schema.fields)
        + [StructField(f"score_{lang}", LongType(), False) for lang in langs]
        + [StructField(out_col, StringType(), False)]
    )
    in_cols = df.columns

    def run(batches):
        for pdf in batches:
            scores = [[] for _ in langs]
            preds = []
            for text in pdf[text_col]:
                grams = _doc_grams(text)
                if grams:
                    idxs = np.fromiter(
                        (_md5_64(g) % n for g in grams),
                        dtype=np.int64,
                        count=len(grams),
                    )
                    s = W @ np.bincount(idxs, minlength=n)
                else:
                    s = np.zeros(len(langs), dtype=np.int64)
                # first-max: score desc, lang asc (langs sorted) — argmax
                # returns the FIRST maximal index, which is that rule
                preds.append(langs[int(np.argmax(s))])
                for i in range(len(langs)):
                    scores[i].append(int(s[i]))
            out = pdf[in_cols].copy()
            for i, lang in enumerate(langs):
                out[f"score_{lang}"] = pd.Series(
                    scores[i], dtype="int64", index=pdf.index
                )
            out[out_col] = pd.Series(preds, dtype=object, index=pdf.index)
            yield out

    return _widen_narrow_input(df).mapInPandas(run, schema=schema)


def model_gate_scores(
    df: DataFrame,
    quality_weights,
    langid_weights: dict[str, "object"],
    bias: int = 0,
    text_col: str = "text",
    n_features: int | None = None,
) -> DataFrame:
    """Quality logit + multiclass lang-id in ONE Arrow pass (r11): both
    models share the hashed-ngram feature space, so a curation pipeline
    that gates on both should pay ONE tokenize+hash+bincount per doc,
    not two chained Python stages each re-serializing the text — at
    100 TB the second pass is a second full corpus read through Arrow.

    Adds ``logit_q`` / ``n_grams`` (exact BIGINT, see
    :func:`quality_model_score`) plus ``score_<lang>`` / ``pred_lang``
    (see :func:`langid_model_score`); value-identical to running the two
    single-model operators (pytest-proven)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    qw = np.asarray(quality_weights)
    if not np.issubdtype(qw.dtype, np.integer):
        raise TypeError(
            "quality weights must be integer-quantized (quantize_weights)"
        )
    qw = qw.astype(np.int64)
    langs = sorted(langid_weights)
    mats = []
    for lang in langs:
        w = np.asarray(langid_weights[lang])
        if not np.issubdtype(w.dtype, np.integer):
            raise TypeError(
                f"weights for {lang!r} must be integer-quantized"
            )
        mats.append(w.astype(np.int64))
    W = np.stack(mats)
    n = int(n_features) if n_features is not None else len(qw)
    if len(qw) != n or W.shape[1] != n:
        raise ValueError("quality/langid weights disagree on n_features")
    bias = int(bias)
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("logit_q", LongType(), False),
            StructField("n_grams", LongType(), False),
        ]
        + [StructField(f"score_{lang}", LongType(), False) for lang in langs]
        + [StructField("pred_lang", StringType(), False)]
    )
    in_cols = df.columns

    def run(batches):
        for pdf in batches:
            logits, counts, preds = [], [], []
            lscores = [[] for _ in langs]
            for text in pdf[text_col]:
                grams = _doc_grams(text)
                if grams:
                    idxs = np.fromiter(
                        (_md5_64(g) % n for g in grams),
                        dtype=np.int64,
                        count=len(grams),
                    )
                    x = np.bincount(idxs, minlength=n)  # ONE shared pass
                    logit = bias + int(x @ qw)
                    s = W @ x
                else:
                    logit = bias
                    s = np.zeros(len(langs), dtype=np.int64)
                logits.append(logit)
                counts.append(len(grams))
                preds.append(langs[int(np.argmax(s))])
                for i in range(len(langs)):
                    lscores[i].append(int(s[i]))
            out = pdf[in_cols].copy()
            out["logit_q"] = pd.Series(logits, dtype="int64", index=pdf.index)
            out["n_grams"] = pd.Series(counts, dtype="int64", index=pdf.index)
            for i, lang in enumerate(langs):
                out[f"score_{lang}"] = pd.Series(
                    lscores[i], dtype="int64", index=pdf.index
                )
            out["pred_lang"] = pd.Series(preds, dtype=object, index=pdf.index)
            yield out

    return _widen_narrow_input(df).mapInPandas(run, schema=schema)


def quality_model_score(
    df: DataFrame,
    weights,
    bias: int = 0,
    text_col: str = "text",
    n_features: int | None = None,
    norm_bits: int = 20,
) -> DataFrame:
    """Score every document with a hashed-bag-of-ngrams linear model in
    one Arrow ``mapInPandas`` pass. Adds:

      - ``logit_q`` bigint — bias + sum(count_g * weights[idx(g)]), an
        EXACT integer (cross-engine value-checkable);
      - ``n_grams`` bigint — feature occurrences (unigrams + bigrams);
      - ``score`` double — sigmoid(logit_q / 2^norm_bits / max(n_grams,1)),
        the length-normalized probability-like quality score (fastText's
        mean-of-feature-vectors normalization). Derived, not oracle-hashed.

    ``weights`` must be an integer vector (``quantize_weights`` for
    trained floats); it rides the task closure — broadcast-variable scale
    (4k..2M features × 8 B). Map-only: no shuffle, no collect; the plan
    is scan -> ArrowEvalPython, and parallelism follows the input scan
    (callers on narrow inputs wrap with ``_widen_narrow_input``, which
    :func:`~.catalog_queries.wide_t` already does for the catalog)."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    w = np.asarray(weights)
    if not np.issubdtype(w.dtype, np.integer):
        raise TypeError(
            "weights must be integer-quantized (use quantize_weights) — "
            "float weights break the exact-BIGINT logit contract"
        )
    w = w.astype(np.int64)
    n = int(n_features) if n_features is not None else len(w)
    if len(w) != n:
        raise ValueError(f"weights has {len(w)} entries, n_features={n}")
    bias = int(bias)
    denom = float(1 << norm_bits)
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("logit_q", LongType(), False),
            StructField("n_grams", LongType(), False),
            StructField("score", DoubleType(), False),
        ]
    )
    in_cols = df.columns

    def run(batches):
        for pdf in batches:
            logits, counts, scores = [], [], []
            for text in pdf[text_col]:
                grams = _doc_grams(text)
                if grams:
                    idxs = np.fromiter(
                        (_md5_64(g) % n for g in grams),
                        dtype=np.int64,
                        count=len(grams),
                    )
                    # hashed bag-of-ngrams x weights: one bincount + dot
                    logit = bias + int(np.bincount(idxs, minlength=n) @ w)
                else:
                    logit = bias
                ng = len(grams)
                x = logit / denom / max(ng, 1)
                logits.append(logit)
                counts.append(ng)
                scores.append(1.0 / (1.0 + math.exp(-x)))
            out = pdf[in_cols].copy()
            out["logit_q"] = pd.Series(logits, dtype="int64", index=pdf.index)
            out["n_grams"] = pd.Series(counts, dtype="int64", index=pdf.index)
            out["score"] = pd.Series(scores, dtype="float64", index=pdf.index)
            yield out

    return _widen_narrow_input(df).mapInPandas(run, schema=schema)
