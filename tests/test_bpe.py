"""BPE vocabulary training (functions/bpe.py, VERDICT r9 item 4):
hand-checked merges on a toy corpus, greedy left-to-right overlap
semantics, total tie-break, ordered inference, round-trip, early stop."""

from __future__ import annotations

from metadata_ingestion_framework_spark.functions.bpe import (
    bpe_merge_table,
    bpe_tokenize,
    bpe_tokenize_fast,
    bpe_train,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_checked_merges(spark):
    """'low' x3 + 'lower' x2: pair counts round 1 — (l,o)=5, (o,w)=5,
    (w,</w>)=3, (w,e)=2, (e,r)=2, (r,</w>)=2. Tie (l,o) vs (o,w) -> 'l' <
    'o' so (l,o) wins; round 2 merges (lo,w)=5; round 3 (low,</w>)=3."""
    df = _docs(spark, ["low low low", "lower lower"])
    merges = bpe_train(df, "text", k_merges=3)
    assert merges == [("l", "o", 5), ("lo", "w", 5), ("low", "</w>", 3)]


def test_greedy_left_to_right_overlap(spark):
    """'aaaa': round-1 pairs (a,a)=3 (plus (a,</w>)); greedy merge of
    (a,a) left-to-right gives aa|aa, NOT a|aa|a — round 2's pair set is
    therefore {(aa,aa), (aa,</w>)}, tied at 1; '<' sorts before 'a' so
    (aa,</w>) wins the tie-break, and round 3 proves aa|aa existed."""
    df = _docs(spark, ["aaaa"])
    merges = bpe_train(df, "text", k_merges=3)
    assert merges == [("a", "a", 3), ("aa", "</w>", 1), ("aa", "aa</w>", 1)]


def test_tokenize_round_trip_and_order(spark):
    """Applying the learned merges in order re-tokenizes the training
    corpus so that per-word symbols concatenate back to word + </w>."""
    df = _docs(spark, ["the quick brown fox", "the lazy dog", "the the the"])
    merges = bpe_train(df, "text", k_merges=5)
    # 'e</w>' ('the' x5 dominates) must be learned before anything using it
    out = bpe_tokenize(df, merges, "text").collect()
    for row in out:
        joined = "".join(row.bpe_tokens)
        words = "".join(
            w + "</w>" for w in row.text.lower().split()
        )
        assert joined == words
        assert row.n_bpe_tokens == len(row.bpe_tokens)


def test_merge_table_shape(spark):
    df = _docs(spark, ["abc abc"])
    merges = bpe_train(df, "text", k_merges=2)
    mt = bpe_merge_table(spark, merges)
    assert mt.columns == ["merge_rank", "lhs", "rhs", "pair_count"]
    rows = mt.orderBy("merge_rank").collect()
    assert [r.merge_rank for r in rows] == [1, 2]


def test_early_stop_on_exhausted_pairs(spark):
    """Single 1-char word: only (a,</w>) exists; after merging it there
    are no pairs left — training stops early instead of failing."""
    df = _docs(spark, ["a"])
    merges = bpe_train(df, "text", k_merges=5)
    assert merges == [("a", "</w>", 1)]


def _ref_bpe(texts: list[str], k: int) -> list[tuple[str, str, int]]:
    """Independent pure-Python reference: classic list-based greedy BPE
    (no strings-with-delimiters trick, no Spark) — the engine must agree."""
    import re
    from collections import Counter

    words = Counter(
        w for t in texts for w in re.findall(r"[a-z]+", t.lower())
    )
    vocab = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for _ in range(k):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
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


def test_property_matches_pure_python_reference(spark):
    """Randomized corpora (seeded): the Spark delimited-replace training
    must equal the classic list-based greedy BPE exactly, merges AND
    counts — including heavy-tie regimes (2-letter alphabet)."""
    import random

    rng = random.Random(20260814)
    for case in range(6):
        alpha = "ab" if case % 2 == 0 else "abcde"
        texts = [
            " ".join(
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(1, 12))
            )
            for _ in range(rng.randint(1, 8))
        ]
        expected = _ref_bpe(texts, 4)
        got = bpe_train(_docs(spark, texts), "text", k_merges=4)
        assert got == expected, f"case {case}: {texts!r}"


def test_tokenize_null_text_counts_zero(spark):
    """r10 code review: NULL text must tokenize to [] / 0 (the oracle's
    COALESCE(n, 0) convention), not NULL."""
    df = spark.createDataFrame(
        [(0, "ab"), (1, None)], "doc_id long, text string"
    )
    merges = bpe_train(df, "text", k_merges=1)
    rows = {r.doc_id: r for r in bpe_tokenize(df, merges, "text").collect()}
    assert rows[1].bpe_tokens == [] and rows[1].n_bpe_tokens == 0
    assert rows[0].n_bpe_tokens > 0


def _apply_merges_inorder_ref(text: str, merges) -> list[str]:
    """Independent pure-Python reference of the nested-replace semantics:
    for each merge IN LEARNING ORDER, one greedy left-to-right pass over
    each word's symbols. O(K * len) — fine for tests, the thing the fast
    encoder avoids in production."""
    import re

    toks: list[str] = []
    for w in re.findall(r"[a-z]+", (text or "").lower()):
        syms = list(w) + ["</w>"]
        for l, r, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


def test_fast_encoder_equals_replace_path_small_k(spark):
    """VERDICT r10 item 1 gate: the Arrow mapInPandas encoder must be
    value-identical to the K-nested-replace path — tokens AND counts —
    on real documents at the oracle's K."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    merges = bpe_train(docs, "text", k_merges=8)
    slow = {
        r.doc_id: (r.bpe_tokens, r.n_bpe_tokens)
        for r in bpe_tokenize(docs, merges, "text").collect()
    }
    fast = {
        r.doc_id: (r.bpe_tokens, r.n_bpe_tokens)
        for r in bpe_tokenize_fast(docs, merges, "text").collect()
    }
    assert fast == slow


def test_fast_encoder_large_k_matches_inorder_reference(spark):
    """K=1000-scale vocabulary — far past what the nested-replace
    expression form can compile: the fast encoder must match the pure-
    Python in-order reference token-for-token, and its cost is K-free
    (dict lookups, not K passes)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    merges = bpe_train(
        docs, "text", k_merges=1000, driver_vocab_limit=10_000_000
    )
    assert len(merges) >= 100  # real multi-hundred-merge table
    sample = docs.limit(40).collect()
    got = {
        r.doc_id: r.bpe_tokens
        for r in bpe_tokenize_fast(
            spark.createDataFrame(sample, docs.schema), merges, "text"
        ).collect()
    }
    for row in sample:
        assert got[row.doc_id] == _apply_merges_inorder_ref(
            row.text, merges
        ), f"doc {row.doc_id}"


def test_fast_encoder_keeps_inorder_semantics_on_resurrected_pair(spark):
    """The published min-rank-loop encoder and the in-order semantics
    differ exactly when a LATER merge recreates an EARLIER pair. Merge
    table [(ab,c), (a,b)] on 'abc': in-order leaves [ab, c, </w>] (the
    (ab,c) pass ran before 'ab' existed); a floorless min-rank loop would
    resurrect it to [abc, </w>]. The fast encoder must match the
    nested-replace path — the semantics our training and the DuckDB
    oracle replay produce."""
    df = _docs(spark, ["abc"])
    merges = [("ab", "c", 1), ("a", "b", 1)]
    slow = bpe_tokenize(df, merges, "text").collect()[0]
    fast = bpe_tokenize_fast(df, merges, "text").collect()[0]
    assert slow.bpe_tokens == ["ab", "c", "</w>"]
    assert fast.bpe_tokens == slow.bpe_tokens


def test_fast_encoder_null_and_nonalpha(spark):
    df = spark.createDataFrame(
        [(0, "ab AB!"), (1, None), (2, "123 %")],
        "doc_id long, text string",
    )
    merges = bpe_train(df, "text", k_merges=2)
    slow = {r.doc_id: r.bpe_tokens
            for r in bpe_tokenize(df, merges, "text").collect()}
    fast = {r.doc_id: r.bpe_tokens
            for r in bpe_tokenize_fast(df, merges, "text").collect()}
    assert fast == slow
    assert fast[1] == [] and fast[2] == []


def test_vocab_ids_deterministic_and_total(spark):
    """r11: vocab ids are a pure function of the merge table (</w>=0,
    a..z=1..26, merge k -> 26+k) and cover every symbol the encoder can
    emit — id encoding is tokenize + a total lookup."""
    from metadata_ingestion_framework_spark.functions.bpe import (
        bpe_encode_ids,
        bpe_tokenize_fast,
        bpe_vocab,
        bpe_vocab_table,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(100)
    merges = bpe_train(docs, "text", k_merges=8)
    vocab = bpe_vocab(merges)
    assert vocab["</w>"] == 0 and vocab["a"] == 1 and vocab["z"] == 26
    assert len(vocab) <= 27 + len(merges)  # == unless merge strings collide
    vt = {r.token: r.token_id for r in bpe_vocab_table(spark, merges).collect()}
    assert vt == vocab
    toks = {
        r.doc_id: r.bpe_tokens
        for r in bpe_tokenize_fast(docs, merges, "text").collect()
    }
    ids = {
        r.doc_id: (r.token_ids, r.n_token_ids)
        for r in bpe_encode_ids(docs, merges, "text").collect()
    }
    for d, (tid, n) in ids.items():
        assert tid == [vocab[s] for s in toks[d]]
        assert n == len(toks[d])


def test_vocab_colliding_merge_strings_share_first_id():
    """r11 review: ids identify token STRINGS — (b,c)+(a,bc) vs (ab,c)
    both produce 'abc'; the first (lowest-rank) producer's id wins, and
    the encoder/oracle agree because both dedupe the same way."""
    from metadata_ingestion_framework_spark.functions.bpe import bpe_vocab

    merges = [("b", "c", 5), ("a", "bc", 3), ("ab", "c", 2)]
    vocab = bpe_vocab(merges)
    assert vocab["bc"] == 27          # merge 1
    assert vocab["abc"] == 28         # merge 2 — FIRST producer of 'abc'
    assert len(vocab) == 27 + 2       # merge 3 collided, no new id


def test_driver_vocab_path_equals_distributed(spark):
    """r10: the large-K driver-side path (collect word counts once, merge
    loop in memory) equals the distributed per-round path exactly when
    the vocab limit covers every distinct word; a 3000-merge run on the
    driver path completes in one Spark job instead of 3000."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(100)
    dist = bpe_train(docs, "text", k_merges=6)
    drv = bpe_train(docs, "text", k_merges=6, driver_vocab_limit=10_000_000)
    assert drv == dist
    # large-K: one Spark job, no hang; the toy vocab fully merges and
    # stops early (every word one symbol), merges stay well-formed
    big = bpe_train(docs, "text", k_merges=300, driver_vocab_limit=10_000_000)
    assert 50 < len(big) <= 300
    assert all(isinstance(l, str) and isinstance(r, str) and c > 0
               for l, r, c in big)


def test_save_load_roundtrip_encodes_identically(spark, tmp_path):
    """r12 (VERDICT r11 item 6): train-save-reload-encode must equal the
    in-session encode exactly — the tokenizer is a versioned cross-run
    artifact, not per-session state. Also: retrain writes a NEW version
    (time travel back to v1 works), and a foreign-convention root is
    refused."""
    import pytest

    from metadata_ingestion_framework_spark.functions.bpe import (
        bpe_encode_ids,
        load_bpe_model,
        save_bpe_model,
    )

    docs = _docs(spark, ["low low low", "lower lower", "newest widest"])
    merges = bpe_train(docs, "text", k_merges=5)
    root = str(tmp_path / "tok")
    assert save_bpe_model(spark, root, merges) == 1
    reloaded = load_bpe_model(spark, root)
    assert reloaded == merges
    in_session = {
        r.doc_id: (r.token_ids, r.n_token_ids)
        for r in bpe_encode_ids(docs, merges).collect()
    }
    from_store = {
        r.doc_id: (r.token_ids, r.n_token_ids)
        for r in bpe_encode_ids(docs, reloaded).collect()
    }
    assert from_store == in_session
    # retrain -> new version; v1 still loadable (time travel)
    merges2 = bpe_train(docs, "text", k_merges=2)
    assert save_bpe_model(spark, root, merges2) == 2
    assert load_bpe_model(spark, root) == merges2
    assert load_bpe_model(spark, root, version=1) == merges
    # convention guard: a root with a different _config.json is refused
    import json
    import os

    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "_config.json"), "w") as f:
        json.dump({"format": "something-else"}, f)
    with pytest.raises(ValueError, match="convention"):
        load_bpe_model(spark, bad)
    with pytest.raises(FileNotFoundError, match="no BPE model"):
        load_bpe_model(spark, str(tmp_path / "missing"))
