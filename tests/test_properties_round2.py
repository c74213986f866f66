"""Property-based tests for the round-2 operators: pure-Python pieces at
full example counts, Spark-bound invariants at a small example cap (each
example runs Spark jobs)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from metadata_ingestion_framework_spark.operators.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)

# ---------------------------------------------------------------------------
# Codecs: encode->decode roundtrips are exact for arbitrary content
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12), w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=30, deadline=None)
@given(n=st.integers(0, 500), rate=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(0, 2**31 - 1))
def test_wav_roundtrip_property(n, rate, seed):
    samples = np.random.RandomState(seed).randint(
        -32768, 32768, size=n, dtype=np.int64
    ).astype(np.int16)
    got_rate, got = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate and np.array_equal(got, samples)


# ---------------------------------------------------------------------------
# Chunking: coverage/overlap invariants for arbitrary docs and shapes
# ---------------------------------------------------------------------------

texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=60), min_size=1, max_size=6
)


@settings(max_examples=8, deadline=None)
@given(docs_text=texts, chunk=st.integers(2, 8), overlap=st.integers(0, 3))
def test_chunk_passages_invariants(spark, docs_text, chunk, overlap):
    from metadata_ingestion_framework_spark.functions.text import chunk_passages

    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    docs = spark.createDataFrame(
        list(enumerate(docs_text)), "doc_id long, text string"
    )
    out = chunk_passages(docs, "text", "doc_id", chunk, overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(docs_text):
        toks = text.split()
        got = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if not toks:
            assert got == []
            continue
        # chunk_ids are dense from 0; starts advance by step
        assert [r["chunk_id"] for r in got] == list(range(len(got)))
        # reassembling with overlap removed reproduces the token stream
        rebuilt: list[str] = []
        for j, r in enumerate(got):
            words = r["passage"].split()
            assert len(words) == r["n_tokens"] <= chunk
            rebuilt.extend(words if j == 0 else words[overlap:] if len(words) > overlap else [])
        # every token position is covered (starts run to the end)
        assert rebuilt[: len(toks)] == toks[: len(rebuilt)]
        last_start = 1 + (len(got) - 1) * step
        assert last_start + chunk - 1 >= len(toks)  # tail covered


# ---------------------------------------------------------------------------
# Prefix join == blocked kernel on random corpora (the exactness claim)
# ---------------------------------------------------------------------------

corpus_texts = st.lists(
    st.text(alphabet="xy z", min_size=6, max_size=40), min_size=2, max_size=8
)


@settings(max_examples=6, deadline=None)
@given(docs_text=corpus_texts, thresh=st.sampled_from([0.2, 0.3, 0.5, 0.8]))
def test_prefix_join_equivalence_property(spark, docs_text, thresh):
    from pyspark.sql import functions as F

    from metadata_ingestion_framework_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
        unpersist_deps,
    )

    docs = spark.createDataFrame(
        list(enumerate(docs_text)), "doc_id long, text string"
    )
    blocked = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            docs.withColumn("c", F.lit(1)), "text", "doc_id", ["c"], thresh
        ).collect()
    }
    pfx_df = ngram_jaccard_pairs_prefix(docs, "text", "doc_id", None, thresh)
    pfx = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in pfx_df.collect()
    }
    unpersist_deps(pfx_df)
    assert pfx == blocked
