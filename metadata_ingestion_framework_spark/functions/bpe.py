"""BPE vocabulary training (Sennrich et al. 2016, public methodology) —
the vocab-prep step above the bigram-count surface (``top_ngrams``), r10
VERDICT r9 item 4.

North-star extension (no reference analogue; BASELINE.json).

Algorithm (classic): train on the DISTINCT-WORD frequency table, not the
corpus — each word is a symbol sequence (characters + an ``</w>``
end-of-word marker); K rounds of: count adjacent symbol pairs weighted by
word frequency, merge the winning pair (count desc, then pair asc)
greedily left-to-right in every word.

Spark shape — the canonical iterative-aggregation pattern:
  - ONE corpus shuffle total (the word-frequency groupBy); every round
    after that runs on the bounded vocab table (distinct words — ~10M rows
    at 100 TB, a toy next to the corpus);
  - per round: adjacent pairs via the zip_with(slice, slice) idiom (NO
    per-element element_at — CLAUDE.md HOF rule), an exact BIGINT
    groupBy-sum, and a 1-row driver collect of the winner (the bounded
    iterative-collect pattern, like k-means' centroid table);
  - the merge itself is a single ``replace`` per round over a DELIMITED
    string form ``(h)(i)(</w>)``: adjacent matches share no characters,
    so SQL's non-overlapping left-to-right ``replace`` IS the greedy BPE
    merge — and DuckDB replays it verbatim (the winner each round is a
    scalar subquery there, a collected literal here), which makes the
    whole training value-checkable cross-engine.

Determinism: pair counts are exact integer sums (order-independent), the
tie-break is total (count desc, left asc, right asc — binary string order
in both engines), and the merge rewrite is positionally deterministic, so
training is bitwise reproducible run-to-run and engine-to-engine.

Precondition: symbols must not contain ``(`` / ``)`` — ``bpe_word_table``
trains on lowercase ``[a-z]+`` words, the cleaned-token convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _char_repr(word: Column) -> Column:
    """word -> delimited symbol form '(c)(c)...(</w>)'."""
    return F.concat(
        F.regexp_replace(word, "(.)", r"($1)"), F.lit(f"({EOW})")
    )


def _split_repr(repr_col: Column) -> Column:
    """Delimited form -> array<string> of symbols."""
    return F.split(
        repr_col.substr(F.lit(2), F.length(repr_col) - 2), r"\)\("
    )


def _apply_merge(repr_col: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of (left, right): plain non-overlapping
    replace — adjacent matches share no characters in the delimited form."""
    return F.replace(
        repr_col, F.lit(f"({left})({right})"), F.lit(f"({left}{right})")
    )


def bpe_word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count, repr) — the distinct-word frequency table BPE trains
    on; the ONE corpus-sized shuffle of the whole training run."""
    words = df.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("repr", _char_repr(F.col("word")))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the vocab's current symbol sequences —
    zip the sequence with its own tail (one lambda call per pair)."""
    syms = _split_repr(F.col("repr"))
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        vocab.select("count", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("count").alias("pair_count"))
    )


def _bpe_merge_loop(
    word_counts: list[tuple[str, int]], k_merges: int
) -> list[tuple[str, str, int]]:
    """Classic list-based greedy BPE over an in-memory word-count table —
    the same algorithm, tie-break (count desc, pair asc) and greedy
    left-to-right merge as the distributed rounds, in pure Python."""
    counts = dict(word_counts)
    vocab = {w: list(w) + [EOW] for w in counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(k_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def bpe_train(
    df: DataFrame, text_col: str = "text", k_merges: int = 8,
    driver_vocab_limit: int | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``k_merges`` BPE merges from the corpus. Returns the ordered
    merge table ``[(left, right, pair_count), ...]``.

    Stops early if the vocab runs out of adjacent pairs (degenerate
    corpora only — every real corpus has far more pairs than merges).

    ``driver_vocab_limit``: the LARGE-K path (real vocabularies need
    ~30k merges — one Spark round per merge does not scale in job count).
    Pays the ONE corpus shuffle (word counts), collects the top-N words
    by (count desc, word asc) — the bounded head that carries ~all the
    corpus mass — and runs the merge loop driver-side with identical
    tie-breaks. With N >= the distinct word count the result is exactly
    the distributed rounds' (pytest-proven); a smaller N is the standard
    truncated-vocab approximation (Sennrich trains on a word-count dict
    that fits memory — public practice). None keeps the per-round
    distributed path (bitwise oracle-replayable, used by the catalog)."""
    if driver_vocab_limit is not None:
        rows = (
            bpe_word_table(df, text_col)
            .orderBy(F.col("count").desc(), F.col("word").asc())
            .limit(driver_vocab_limit)
            .collect()
        )
        # r["count"], not r.count — Row.count is the tuple METHOD
        return _bpe_merge_loop(
            [(r["word"], r["count"]) for r in rows], k_merges
        )
    vocab = bpe_word_table(df, text_col).persist()
    current = vocab
    try:
        merges: list[tuple[str, str, int]] = []
        for _ in range(k_merges):
            top = (
                _pair_counts(current)
                .orderBy(
                    F.col("pair_count").desc(),
                    F.col("l").asc(),
                    F.col("r").asc(),
                )
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r = top[0].l, top[0].r
            merges.append((l, r, int(top[0].pair_count)))
            # r18 OPT (guide §1.2): chain the merge LAZILY on the persisted
            # vocab instead of persist()+count() per round. Round i's
            # collect then re-evaluates i nested codegen replace()s over
            # the cached word table — trivial next to the two extra jobs
            # (materialize + release bookkeeping) every round used to
            # pay. The expression chain stays small because the
            # per-round-distributed path is only used at oracle-scale K
            # (<= ~8); real ~30k-merge vocabularies take the
            # driver_vocab_limit path above. Halves the training job
            # count (16 -> 8 at K=8) with bit-identical merges (same
            # winner collect per round).
            current = current.select(
                "word", "count",
                _apply_merge(F.col("repr"), l, r).alias("repr"),
            )
    finally:
        vocab.unpersist()
    return merges


def bpe_merge_table(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merges as a DataFrame: (merge_rank, lhs, rhs,
    pair_count) — rank 1-based in learning order (lhs/rhs, not
    left/right: those are SQL keywords on the oracle side)."""
    return spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string, pair_count bigint",
    )


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table to a text column: per word, start from
    characters + ``</w>`` and apply the K merges IN LEARNING ORDER (the
    published inference rule) — K nested codegen ``replace`` calls inside
    one transform lambda, no Python. Adds ``{out_col} array<string>``
    (all words' symbols in word order) and ``n_{out_col} int`` — the BPE
    face of the token-count surface (functions/text.py)."""

    def per_word(w: Column) -> Column:
        c = _char_repr(w)
        for l, r, _ in merges:
            c = _apply_merge(c, l, r)
        return _split_repr(c)

    # coalesce: NULL text must yield [] / 0, not NULL (size(NULL) is NULL
    # under the sizeOfNull=false default, and the oracle emits 0 there)
    words = F.expr(
        f"regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z]+', 0)"
    )
    out = df.withColumn(out_col, F.flatten(F.transform(words, per_word)))
    return out.withColumn(f"n_{out_col}", F.size(F.col(out_col)))


def bpe_vocab(merges: list[tuple[str, str, int]]) -> dict[str, int]:
    """Deterministic token -> integer id table (the published build-vocab
    convention: base alphabet first, then one id per merge in learning
    order). Ids: ``</w>`` = 0, ``a``..``z`` = 1..26, merge k (1-based
    rank) -> 26 + k. Trivially SQL-replayable, so id-level outputs stay
    oracle-checkable.

    Ids identify token STRINGS, not merges: two distinct merges can
    produce the same string (e.g. (a,bc) and (ab,c) both yield 'abc')
    and must share ONE id — the FIRST (lowest-rank) producer wins, the
    MIN(tid) dedup the oracle vocab CTE applies (r11 review)."""
    vocab = {EOW: 0}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = i + 1
    for k, (l, r, _) in enumerate(merges, start=1):
        vocab.setdefault(l + r, 26 + k)
    return vocab


def bpe_vocab_table(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The :func:`bpe_vocab` mapping as a DataFrame (token, token_id) —
    the artifact a serving stack ships next to the merge table."""
    return spark.createDataFrame(
        sorted(bpe_vocab(merges).items(), key=lambda kv: kv[1]),
        "token string, token_id int",
    )


# --- tokenizer persistence (r12, VERDICT r11 item 6) ----------------------
# A 100 TB pipeline trains the tokenizer ONCE and reuses it across runs and
# streams; the merge table + vocab are versioned artifacts, not per-session
# state. Persisted through VersionedParquetStore (immutable versions,
# atomic _CURRENT repoint, time travel back to the vocab any past run
# encoded with) and config-guarded like the r11 dedup stores: the stored
# convention (EOW marker, base alphabet, id rule) is part of the artifact's
# identity — token ids from a different convention silently mis-decode.

BPE_MERGES_TABLE = "bpe_merges"
BPE_VOCAB_TABLE = "bpe_vocab"
_BPE_STORE_CONFIG = {
    "format": "bpe",
    "format_version": 1,
    "eow": EOW,
    "alphabet": "abcdefghijklmnopqrstuvwxyz",
    "id_rule": "eow=0,alpha=1..26,merge_k=26+k,first-producer-wins",
}


def save_bpe_model(spark, root: str, merges: list[tuple[str, str, int]]) -> int:
    """Persist the trained tokenizer (ordered merge table + derived vocab
    table) as one new store version; returns the version number. A retrain
    is a new immutable version — readers mid-encode keep their snapshot,
    and ``load_bpe_model(version=...)`` time-travels to the vocab any
    earlier corpus was encoded with."""
    import os

    from metadata_ingestion_framework_spark.operators.incremental import (
        _check_store_config,
    )
    from metadata_ingestion_framework_spark.plans.tablestore import (
        VersionedParquetStore,
    )

    os.makedirs(root, exist_ok=True)
    _check_store_config(root, _BPE_STORE_CONFIG)
    store = VersionedParquetStore(spark, root)
    v = store.write(bpe_merge_table(spark, merges), BPE_MERGES_TABLE)
    store.write(bpe_vocab_table(spark, merges), BPE_VOCAB_TABLE)
    return v


def load_bpe_model(
    spark, root: str, version: int | None = None
) -> list[tuple[str, str, int]]:
    """The ordered merge list back from a :func:`save_bpe_model` store —
    feeds :func:`bpe_tokenize_fast` / :func:`bpe_encode_ids` exactly like
    the in-session training output (save/load round-trip is pytest-proven
    token-identical). The collect is vocab-scale (k_merges rows), the
    bounded-driver-table pattern. Refuses a root written under a
    different tokenizer convention."""
    import json
    import os

    path = os.path.join(root, "_config.json")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no BPE model at {root}")
    with open(path) as f:
        stored = json.load(f)
    if stored != _BPE_STORE_CONFIG:
        from metadata_ingestion_framework_spark.operators.incremental import (
            _config_diff,
        )

        raise ValueError(
            f"store at {root} holds a different tokenizer convention "
            f"(mismatched keys: {_config_diff(stored, _BPE_STORE_CONFIG)})"
        )
    from metadata_ingestion_framework_spark.plans.tablestore import (
        VersionedParquetStore,
    )

    rows = (
        VersionedParquetStore(spark, root)
        .read(BPE_MERGES_TABLE, version)
        .orderBy("merge_rank")
        .collect()
    )
    return [(r.lhs, r.rhs, int(r.pair_count)) for r in rows]


def bpe_encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """Text -> integer token ids (r11): the full tokenizer surface a
    training pipeline feeds to a model — :func:`bpe_tokenize_fast`'s
    linear-time greedy-merge kernel composed with the broadcast
    :func:`bpe_vocab` lookup, one Arrow pass, map-only. Adds
    ``{out_col} array<int>`` and ``n_{out_col} int``.

    Every symbol the encoder can emit is in the vocab by construction
    (base chars + merge outputs — merges only ever merge existing
    symbols), so the lookup is total; non-``[a-z]`` text contributes no
    tokens, same as the tokenize faces."""
    import re as _re

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    vocab = bpe_vocab(merges)
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField(out_col, ArrayType(IntegerType()), False),
            StructField(f"n_{out_col}", IntegerType(), False),
        ]
    )
    word_re = _re.compile("[a-z]+")
    in_cols = df.columns

    def run(batches):
        memo: dict[str, list[int]] = {}

        def encode(word: str) -> list[int]:
            ids = memo.get(word)
            if ids is None:
                ids = [vocab[s] for s in _encode_word_inorder(word, ranks)]
                memo[word] = ids
            return ids

        for pdf in batches:
            ids_col, n_col = [], []
            for text in pdf[text_col]:
                s = text.lower() if isinstance(text, str) else ""
                ids: list[int] = []
                for w in word_re.findall(s):
                    ids.extend(encode(w))
                ids_col.append(ids)
                n_col.append(len(ids))
            out = pdf[in_cols].copy()
            out[out_col] = pd.Series(ids_col, dtype=object, index=pdf.index)
            out[f"n_{out_col}"] = pd.Series(
                n_col, dtype="int32", index=pdf.index
            )
            yield out

    return _widen_narrow_input(df).mapInPandas(run, schema=schema)


def _encode_word_inorder(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Apply a merge table to ONE word with in-learning-order semantics in
    time independent of the vocabulary size K.

    Equivalent to the K nested ``replace`` calls of :func:`bpe_tokenize`
    (and therefore to the DuckDB training/inference replay): processing
    ranks in a NON-DECREASING floor order is exactly "for each merge in
    learning order, greedy left-to-right merge pass" with the no-op merges
    skipped — a pair the current merge CREATES whose rank is below the
    floor stays unmerged, just as the already-finished earlier pass would
    have left it. (The widely-published min-rank-loop encoder — Sennrich's
    ``apply_bpe``/GPT-2 ``bpe()`` — drops the floor and so can re-merge
    such resurrected earlier pairs; the two differ only on merge tables
    where a later merge recreates an earlier pair. We keep training's
    in-order semantics so inference == the training segmentation and the
    cross-engine oracle stays bit-exact at any K.)

    Cost: each applied merge removes >= 1 symbol, so <= len(word)
    iterations of an O(len) min-rank scan — O(len^2) worst-case per word,
    ~linear in practice, with NO dependence on K (the 30k-merge ceiling
    that the nested-replace expression form cannot compile past)."""
    syms = list(word) + [EOW]
    floor = 0
    while True:
        best = -1
        for a, b in zip(syms, syms[1:]):
            rk = ranks.get((a, b), -1)
            if rk >= floor and (best == -1 or rk < best):
                best = rk
        if best == -1:
            return syms
        # rank is unique per pair, so matching by rank==best during the
        # greedy pass merges exactly the winning pair's occurrences
        i, n, out = 0, len(syms), []
        while i < n:
            if (
                i + 1 < n
                and ranks.get((syms[i], syms[i + 1]), -1) == best
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
        floor = best + 1


def bpe_tokenize_fast(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Linear-time BPE inference for REAL vocabularies (VERDICT r10 item
    1): value-identical to :func:`bpe_tokenize` (pytest-proven), but the
    merge table is a broadcast dict driving an Arrow ``mapInPandas``
    kernel instead of K nested Catalyst ``replace`` calls — a ~30k-merge
    production vocabulary is a dict lookup here, where the expression
    form is a 30k-deep tree that cannot compile.

    Spark shape: map-only (no shuffle, no state); the merge table rides
    the closure (~1 MB at 30k merges — broadcast-variable scale); per-task
    distinct-word memo makes the per-word cost amortize across a corpus's
    Zipfian word distribution. ``_widen_narrow_input`` upstream protects
    parallelism on narrow scans (CLAUDE.md rule); on real multi-file
    inputs the kernel inherits the scan's partitioning.
    """
    import re as _re

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField(out_col, ArrayType(StringType()), False),
            StructField(f"n_{out_col}", IntegerType(), False),
        ]
    )
    word_re = _re.compile("[a-z]+")
    in_cols = df.columns

    def run(batches):
        memo: dict[str, list[str]] = {}

        def encode(word: str) -> list[str]:
            toks = memo.get(word)
            if toks is None:
                toks = _encode_word_inorder(word, ranks)
                memo[word] = toks
            return toks

        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[text_col]:
                # mirror regexp_extract_all(lower(coalesce(text,'')),'[a-z]+')
                s = text.lower() if isinstance(text, str) else ""
                toks: list[str] = []
                for w in word_re.findall(s):
                    toks.extend(encode(w))
                toks_col.append(toks)
                n_col.append(len(toks))
            out = pdf[in_cols].copy()
            out[out_col] = pd.Series(toks_col, dtype=object, index=pdf.index)
            out[f"n_{out_col}"] = pd.Series(
                n_col, dtype="int32", index=pdf.index
            )
            yield out

    return _widen_narrow_input(df).mapInPandas(run, schema=schema)
