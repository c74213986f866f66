"""Text analysis for corpus curation (BASELINE.json north-star extensions).

Language-ID, quality scoring, token counting, fingerprinting — each a pure
Catalyst expression pipeline (regexp/split/aggregate), no Python in the hot
path, so a 100 TB documents table processes at scan speed with zero
shuffles (all are per-row map operations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java regex \s includes \x0B (vertical tab); DuckDB's RE2 \s is exactly
# [ \t\n\r\f]. Every oracle-compared tokenize/count regex spells the RE2
# class out so both engines split identically on corpora containing
# vertical tabs (r6 ADVICE item 1 — the \s shorthand would silently desync
# token counts / term sets cross-engine). Mirrors dedup._ASCII_WS, which
# fixed the same gap for the Python tokenizer kernels in r5.
WS_CLASS = r"[ \t\n\r\f]"
WS_RUN = WS_CLASS + "+"
NONWS_RUN = r"[^ \t\n\r\f]+"

# Tiny per-language stopword marker sets (public common-words lists). The
# detector scores each language by marker-word hits over whitespace tokens —
# an n-gram-free heuristic that is deterministic and SQL-expressible, which
# is what makes it oracle-checkable. Swap in fasttext/cld3 via pandas_udf for
# production quality; the plumbing (one map stage) is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "von"],
}


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), WS_RUN), lambda w: w != "")


def token_count(col: Column) -> Column:
    """Whitespace token count.

    ``regexp_count`` is one codegen'd regex pass — the earlier
    ``size(filter(split(...)))`` formulation allocated a token array AND ran
    an interpreted lambda per element (measured 10x slower on long docs).
    """
    return F.regexp_count(col, F.lit(NONWS_RUN))


def word_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count word chunks + digits + punctuation runs.

    A deterministic regex tokenizer in the GPT-2 pre-tokenizer spirit:
    letter runs, digit runs, and single punctuation marks each count as one
    token. Real BPE drops in as a pandas_udf over the same column.
    Single regex pass (regexp_count), no array materialization.
    """
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]"))


def detect_language(col: Column, languages: list[str] | None = None) -> Column:
    """Heuristic language ID: argmax of per-language marker-word hit counts.

    Ties and zero-hit rows resolve to 'und'. Deterministic: greater-than
    comparison in a fixed language order.
    """
    langs = languages or list(LANG_MARKERS)
    toks = _tokens(col)
    scores = {
        lang: F.size(F.filter(toks, lambda w: w.isin(*LANG_MARKERS[lang])))  # noqa: B023
        for lang in langs
    }
    best_lang: Column = F.lit("und")
    best_score: Column = F.lit(0)
    for lang in langs:
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score from cheap surface statistics.

    mean of three ratios: (1) alpha-char ratio, (2) 1 - punctuation ratio,
    (3) mean-word-length band score (1 inside [3,12], decaying outside).
    All length/regexp arithmetic — codegen'd, oracle-expressible.
    """
    n_chars = F.length(col)
    safe_chars = F.when(n_chars == 0, F.lit(1)).otherwise(n_chars).cast("double")
    alpha_ratio = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")) / safe_chars
    punct_ratio = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}]", "")) / safe_chars
    n_toks = token_count(col)
    safe_toks = F.when(n_toks == 0, F.lit(1)).otherwise(n_toks).cast("double")
    mean_word_len = F.length(F.regexp_replace(col, WS_CLASS, "")) / safe_toks
    band = (
        F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(1.0))
        .when(mean_word_len < 3, mean_word_len / 3.0)
        .otherwise(12.0 / mean_word_len)
    )
    return F.round((alpha_ratio + (1 - punct_ratio) + band) / 3.0, 6)


def fingerprint(col: Column) -> Column:
    """Normalized content fingerprint: md5 of lowercased alnum-only text.

    Whitespace/punct/case-insensitive exact-dup key (the 'fingerprint
    method' of locale-insensitive dedup). 128-bit -> collision-safe as a
    shuffle key at corpus scale.
    """
    return F.md5(F.regexp_replace(F.lower(col), r"[^a-z0-9]", ""))


# Gopher-rule stopword set (Rae et al. 2021, public methodology): a doc
# must contain >= 2 of these to pass the gate.
GATE_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def heuristic_filters(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """C4/RefinedWeb/Gopher-style document-quality signals + gate, as pure
    codegen expressions (public methodology: Raffel et al. 2020 'C4',
    Penedo et al. 2023 'RefinedWeb', Rae et al. 2021 'Gopher' filters).

    Per doc:
    - ``n_lines``: non-empty lines;
    - ``terminal_punct_ratio``: lines ending in terminal punctuation
      (C4's line heuristic, lifted to a doc-level signal);
    - ``bullet_frac`` / ``ellipsis_frac``: lines starting with a bullet /
      ending with an ellipsis (Gopher: drop docs > 90% bullets or > 30%
      ellipsis endings);
    - ``stopword_hits``: how many of the 8 Gopher stopwords appear;
    - ``n_words``, ``mean_word_len``: Gopher word-count/word-length gates;
    - ``gate``: true iff the doc passes the Gopher-rule set
      (bullet_frac <= 0.9, ellipsis_frac <= 0.3, stopword_hits >= 2,
      50 <= n_words <= 100000, 3 <= mean_word_len <= 10).

    Line structure is detected WITHOUT multiline regex anchors: Java's
    (?m)$ treats \\r\\n as a unit while RE2's matches between \\r and \\n —
    a cross-engine desync on CRLF corpora. Instead every pattern is
    anchored to a literal \\n with a sentinel appended/prepended, which
    both engines read identically. One map stage, no shuffle, no Python —
    the gate runs at scan speed on a 100 TB documents table.
    """
    s = _gate_signals(F.col(text_col))
    return df.select(
        id_col,
        s["n_lines"].alias("n_lines"),
        s["terminal_punct_ratio"].alias("terminal_punct_ratio"),
        s["bullet_frac"].alias("bullet_frac"),
        s["ellipsis_frac"].alias("ellipsis_frac"),
        s["stopword_hits"].alias("stopword_hits"),
        s["n_words"].alias("n_words"),
        F.round(s["mean_word_len"], 6).alias("mean_word_len"),
        s["gate"].alias("gate"),
    )


def gopher_gate(col: Column) -> Column:
    """The :func:`heuristic_filters` gate as one boolean Column — the
    optional curation-stage form: ``df.filter(gopher_gate(F.col("text")))``
    composes into any pipeline as a map-only stage (one scan, no join)."""
    return _gate_signals(col)["gate"]


def _gate_signals(col: Column) -> dict[str, Column]:
    """Shared expression tree for :func:`heuristic_filters` /
    :func:`gopher_gate` — one source of truth for the rule set."""
    c = F.coalesce(col, F.lit(""))
    nl = F.concat(c, F.lit("\n"))  # sentinel: last line ends like the rest
    n_lines = F.regexp_count(nl, F.lit(r"[^\n]\n"))
    term_lines = F.regexp_count(nl, F.lit("[.!?][\"')\\]]?\n"))
    bullet_lines = F.regexp_count(
        F.concat(F.lit("\n"), c), F.lit("\n[ \t]*[-*•]")
    )
    ellipsis_lines = F.regexp_count(nl, F.lit("(\\.\\.\\.|…)\n"))
    safe_lines = F.when(n_lines == 0, F.lit(1)).otherwise(n_lines).cast("double")
    n_words = token_count(c)
    safe_words = F.when(n_words == 0, F.lit(1)).otherwise(n_words).cast("double")
    mean_word_len = F.length(F.regexp_replace(c, WS_CLASS, "")) / safe_words
    low = F.lower(c)
    stopword_hits = sum(
        (
            F.regexp_like(
                low, F.lit(rf"(^|[ \t\n\r\f]){w}([ \t\n\r\f]|$)")
            ).cast("int")
            for w in GATE_STOPWORDS
        ),
        F.lit(0),
    )
    bullet_frac = F.round(bullet_lines / safe_lines, 6)
    ellipsis_frac = F.round(ellipsis_lines / safe_lines, 6)
    gate = (
        (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (stopword_hits >= 2)
        & (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3)
        & (mean_word_len <= 10)
    )
    return {
        "n_lines": n_lines,
        "terminal_punct_ratio": F.round(term_lines / safe_lines, 6),
        "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac,
        "stopword_hits": stopword_hits,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "gate": gate,
    }


def rolling_hash_fingerprint(col: Column, window: int = 16, keep_every: int = 8) -> Column:
    """Winnowing-style selective fingerprint: min xxhash64 of char n-grams
    sampled every ``keep_every`` positions — robust to small edits.

    Pure higher-order functions (sequence/transform/array_min).
    """
    s = F.lower(F.regexp_replace(col, WS_RUN, " "))
    n = F.greatest(F.length(s) - (window - 1), F.lit(0))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(keep_every))
    # Grams are taken over the FULL normalized string — an earlier truncation
    # to window*100 chars made every gram past the cutoff the empty string,
    # so all long documents shared one constant min candidate and edits
    # beyond the cutoff were invisible (ADVICE r1). For very long documents
    # precompute the normalized string into its own column before calling
    # this (HOF lambdas re-evaluate captured expressions per element).
    grams = F.transform(starts, lambda i: F.xxhash64(s.substr(i, F.lit(window))))
    return F.array_min(grams)


def chunk_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into fixed-size token passages with overlap — the
    context-window prep stage of a training pipeline (north-star; no
    reference analogue).

    Whitespace tokens; windows start every ``chunk_tokens - overlap``
    positions. Emits (id, chunk_id, passage, n_tokens); empty documents
    produce no rows. Pure codegen: tokenize once, posexplode the start
    sequence, slice per chunk row — the token array rides through the
    explode (never re-split per chunk, the HOF capture trap), duplicating
    ~1/(chunk-overlap) of the text per emitted row.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), WS_RUN), lambda w: w != "")
    # drop empty AND null texts here: size(NULL) is NULL under ANSI, and
    # downstream least()/greatest() silently ignore NULL operands, which
    # would let a NULL document emit one bogus chunk
    base = df.select(F.col(id_col), toks.alias("__toks")).filter(
        F.size("__toks") > 0
    )
    chunks = base.select(
        id_col,
        "__toks",
        F.posexplode(
            F.sequence(F.lit(1), F.greatest(F.size("__toks"), F.lit(1)), F.lit(step))
        ).alias("chunk_id", "__start"),
    )
    n_tokens = F.least(F.lit(chunk_tokens), F.size("__toks") - F.col("__start") + 1)
    return (
        chunks.select(
            id_col,
            "chunk_id",
            F.array_join(
                F.slice("__toks", F.col("__start"), chunk_tokens), " "
            ).alias("passage"),
            n_tokens.alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set in one map stage."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("n_word_tokens", word_token_count(c))
        .withColumn("pred_lang", detect_language(c))
        .withColumn("quality", quality_score(c))
        .withColumn("fingerprint", fingerprint(c))
    )


def repetition_stats(
    df: "DataFrame", text_col: str, id_col: str
) -> "DataFrame":
    """Per-document token-repetition quality metrics (Gopher-rule family —
    Rae et al. 2021's repetition filters, public methodology; token-level
    variants since this corpus has no line structure):

    - ``top_word_frac``: occurrences of the most frequent word / words;
    - ``dup_word_frac``: 1 - distinct words / words;
    - ``top_bigram_frac``: occurrences of the most frequent word bigram /
      bigrams (0.0 for docs with < 2 words).

    No reference analogue (north-star extension). Shape: explode ->
    codegen'd two-level hash agg on (id, token) — bounded keys, partial
    aggregation; the bigram build is the slice+zip_with trick (CLAUDE.md:
    element_at-in-lambda re-evaluates the outer array per element). Counts
    are exact integers, so the ROUND(6) ratios are engine-exact.
    """
    from pyspark.sql import functions as F

    toks = F.filter(F.split(F.lower(F.col(text_col)), WS_RUN), lambda w: w != "")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, n1), F.slice(toks, 2, n1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    base = df.select(id_col, toks.alias("__toks"), grams.alias("__grams"))

    wstats = (
        base.select(id_col, F.explode("__toks").alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.max("c").alias("__top_w"),
            F.sum("c").alias("__n_w"),
            F.count(F.lit(1)).alias("__distinct_w"),
        )
    )
    gstats = (
        base.select(id_col, F.explode("__grams").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("__top_g"), F.sum("c").alias("__n_g"))
    )
    out = (
        base.select(id_col)
        .join(wstats, id_col, "left")
        .join(gstats, id_col, "left")
        .select(
            id_col,
            F.round(
                F.when(F.col("__n_w") > 0, F.col("__top_w") / F.col("__n_w"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("top_word_frac"),
            F.round(
                F.when(
                    F.col("__n_w") > 0,
                    1.0 - F.col("__distinct_w") / F.col("__n_w"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_word_frac"),
            F.round(
                F.when(F.col("__n_g") > 0, F.col("__top_g") / F.col("__n_g"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("top_bigram_frac"),
        )
    )
    return out


def pack_manifest(
    df: "DataFrame",
    text_col: str,
    id_col: str,
    budget_tokens: int = 2048,
    shards: int = 32,
    order_col: str | None = None,
) -> "DataFrame":
    """Sequence-packing manifest: map every document's token span onto
    fixed-size training sequences, concat-then-chunk style (the packing
    strategy most LLM data loaders use; public methodology).

    Documents are assigned to ``shards`` by a 60-bit md5 hash of the id
    (``pmod``) — deterministic for ANY id type (``id % shards`` raised an
    AnalysisException on string doc-ids, r6 VERDICT item 2) and free of
    hot spots when ids are clustered. md5 rather than ``xxhash64`` so the
    DuckDB oracle computes the identical assignment (the shared md5
    primitive — CLAUDE.md cross-engine hashing rule). Docs pack WITHIN a
    shard in id order: each doc occupies global token offsets
    ``[cum_before, cum_before + n_tokens)`` of its shard's stream, so it
    lands in sequences ``floor(offset / budget) .. floor((offset + n - 1) /
    budget)`` — ``seq_first``/``seq_last`` straddle a boundary when a doc
    crosses it, exactly like the loader's chunker. Empty docs are dropped
    (they occupy no tokens).

    No reference analogue (north-star extension). Scale shape: the running
    token count is a window over the SHARD key — never a global single-
    partition sort; shards bound each window's state and parallelize the
    pack. Output is a skinny manifest (ids + 4 ints) the actual pack step
    consumes.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n_toks = token_count(F.col(text_col))
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(shards),
    )
    base = (
        df.select(
            id_col,
            *( [order_col] if order_col else [] ),
            shard.cast("int").alias("shard"),
            n_toks.cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    # order_col (r8): pack in a caller-supplied epoch order (e.g. the
    # deterministic_shuffle rank) instead of raw id order — the
    # shuffled-epoch -> packed-sequences composition every loader wants;
    # id stays the tiebreak so the manifest is engine-exact either way
    order = [F.col(order_col).asc(), F.col(id_col).asc()] if order_col else [F.col(id_col).asc()]
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget_tokens).alias("seq_first"),
        F.floor((cum - 1) / budget_tokens).alias("seq_last"),
    )


def pack_bfd(
    df: "DataFrame",
    text_col: str | None,
    id_col: str,
    budget_tokens: int = 2048,
    shards: int = 32,
    n_tokens_col: str | None = None,
) -> "DataFrame":
    """Best-fit-decreasing sequence packing (r17, VERDICT r16 item 3;
    Krell et al. 2021's packed-sequence methodology, public): pack WHOLE
    documents into fixed-capacity training sequences with bounded
    padding, instead of :func:`pack_manifest`'s concat-then-chunk (which
    splits documents across sequence boundaries — attention-damaging
    truncation the packed formulation avoids).

    Rule, deterministic and engine-exact: documents shard by the 60-bit
    md5 of the id (``pack_manifest``'s assignment verbatim); within a
    shard they are taken in (n_tokens DESC, id ASC) order and each goes
    to the open bin with the SMALLEST remaining capacity that still fits
    (ties -> lowest bin index) or opens a new bin — classic BFD. A doc
    longer than the budget occupies one whole bin truncated to capacity
    (``least(n_tokens, budget)`` on both engines). Empty docs drop. The
    greedy loop is sequential BY DESIGN (bin state), so the DuckDB
    oracle replays it step-for-step as a WITH-RECURSIVE over the ranked
    docs — every (first-min == list_position-of-min) tiebreak identical.

    Scale shape: ``shards`` bounds the per-task state exactly like
    ``pack_manifest`` — one groupBy shuffle, then an Arrow-batched numpy
    kernel per shard (state = one int64 array of open-bin remainders;
    the O(n_bins) first-min scan per doc is a vectorized masked argmin).
    At 100 TB you raise ``shards`` so each group stays loader-sized;
    cross-shard packing quality is unaffected because BFD quality
    depends only on the in-shard length mix. Output manifest: (id,
    shard, n_tokens, bin) — the pack step consumes it; ``bin`` ids are
    dense per shard.
    """
    import pandas as pd

    n_toks = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else token_count(F.col(text_col)).cast("long")
    )
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(shards),
    )
    base = df.select(
        id_col,
        shard.cast("int").alias("shard"),
        n_toks.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    id_field = base.schema[id_col]
    out_schema = (
        f"`{id_field.name}` {id_field.dataType.simpleString()}, "
        "shard int, n_tokens bigint, bin int"
    )
    cap = int(budget_tokens)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        lens = np.minimum(pdf["n_tokens"].to_numpy(np.int64), cap)
        rems = np.empty(len(lens), dtype=np.int64)  # preallocated bins
        n_bins = 0
        bins = np.empty(len(lens), dtype=np.int32)
        big = np.int64(1 << 62)
        for i, length in enumerate(lens):
            open_rems = rems[:n_bins]
            # first-min among bins that fit == the oracle's
            # list_position(rems, list_min(filter(rems, >= L)))
            masked = np.where(open_rems >= length, open_rems, big)
            j = int(masked.argmin()) if n_bins else 0
            if n_bins == 0 or masked[j] == big:
                bins[i] = n_bins
                rems[n_bins] = cap - length
                n_bins += 1
            else:
                bins[i] = j
                open_rems[j] -= length
        pdf["bin"] = bins
        return pdf[[id_col, "shard", "n_tokens", "bin"]]

    return base.groupBy("shard").applyInPandas(_pack, out_schema)


def tfidf_top_terms(
    df: "DataFrame",
    text_col: str,
    id_col: str,
    k: int = 5,
) -> "DataFrame":
    """Per-document top-k terms by smoothed TF-IDF (keyword extraction for
    corpus curation/labeling; standard IR formula, public methodology).

    tf = term count in doc; idf = ln((N + 1) / (df + 1)) + 1 (the smoothed
    scikit-learn variant); score = tf * idf, ROUND(6), ties broken by term
    asc so the top-k is engine-deterministic.

    No reference analogue (north-star extension). Shape: one explode ->
    (doc, term) count agg, a term document-frequency agg joined back (both
    partial-aggregated, bounded keys), and a per-doc top-k window — the
    same two-shuffle skeleton as a 100 TB vocabulary build. N rides INSIDE
    the DAG as a broadcast 1-row scalar cross-join: the earlier
    ``.distinct().count()`` fired a separate full corpus scan at
    plan-BUILD time (r6 VERDICT item 1) — an extra pass nothing downstream
    could pipeline with at 100 TB.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = F.filter(F.split(F.lower(F.col(text_col)), WS_RUN), lambda w: w != "")
    words = df.select(id_col, F.explode(toks).alias("term"))
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count_distinct(F.col(id_col)).alias("__n_docs"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n)).select(
        id_col,
        "term",
        F.round(
            F.col("tf")
            * (F.log((F.col("__n_docs").cast("double") + 1.0) / (F.col("df") + 1.0)) + 1.0),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ngram_perplexity(df: "DataFrame", text_col: str, id_col: str) -> "DataFrame":
    """Count-based bigram pseudo-perplexity: score every document by the
    average negative log-likelihood of its word bigrams under the
    corpus's own bigram model, ``P(w2|w1) = C(w1 w2) / C(w1 ·)`` —
    the SQL-expressible stand-in for the LM-perplexity quality filter
    (CCNet/RefinedWeb-style; a real LM drops in as a pandas_udf scoring
    stage over the same per-doc shape). Boilerplate/repetitive docs score
    LOW (their bigrams dominate the corpus), rare-garbage docs score HIGH
    — both tails are standard curation cut points.

    Returns (id, avg_nll ROUND(6), n_bigrams); docs with < 2 tokens get
    (0.0, 0). No reference analogue (north-star extension).

    Shape: ONE gram build (the zip_with-slice bigram trick — no
    per-element outer-array re-evaluation) exploded to skinny
    (id, w1, bigram) rows, persisted because three consumers read it
    (the two count aggs + the per-doc score join); both count tables are
    vocabulary-bounded partial aggs; the score join is a bounded-key
    equi-join. Release via ``operators.dedup.unpersist_deps``.
    """
    from pyspark.sql import functions as F

    toks = _tokens(F.col(text_col))
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda x, y: F.struct(x.alias("w1"), F.concat_ws(" ", x, y).alias("bg")),
    )
    rows = (
        df.select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, "p.w1", "p.bg")
        .persist()
    )
    c1 = rows.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c12 = rows.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    nll = (
        rows.join(c12, "bg")
        .join(c1, "w1")
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log(F.col("c12") / F.col("c1"))), 6).alias("avg_nll"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    out = df.select(id_col).join(nll, id_col, "left").select(
        id_col,
        F.coalesce("avg_nll", F.lit(0.0)).alias("avg_nll"),
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
    )
    out._persisted_deps = [rows]
    return out
