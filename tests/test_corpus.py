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


# ---------------------------------------------------------------------------
# Epoch-incremental store (r17, VERDICT r16 item 2)
# ---------------------------------------------------------------------------

def _epochs(spark):
    """Epoch 1 = doc_id % 3 != 0; epoch 2 = the rest PLUS a re-ingest of
    doc_id % 7 == 1 (the catalog fixture)."""
    docs = _docs(spark)
    d = F.col("doc_id")
    e1 = docs.filter(d % 3 != 0)
    e2 = docs.filter((d % 3 == 0) | (d % 7 == 1))
    return e1, e2


def test_epoch_store_sequential_equals_oneshot(spark, tmp_path):
    """The headline theorem: two sequential append_epoch calls land every
    doc on the shard corpus_epoch_assignments computes one-shot over the
    (epoch, doc) union with latest-epoch-wins; the manifest and members
    sidecar agree with it row for row."""
    from metadata_ingestion_framework_spark.operators.corpus import (
        CorpusShardStore,
        corpus_epoch_assignments,
    )

    e1, e2 = _epochs(spark)
    st = CorpusShardStore(
        spark, str(tmp_path / "c"), shard_tokens=5000,
        member_bucket_width=64,
    )
    assert st.append_epoch(e1, 1, "r1") is not None
    man = st.append_epoch(e2, 2, "r2")
    assert man is not None

    union = e1.withColumn("epoch", F.lit(1)).unionByName(
        e2.withColumn("epoch", F.lit(2))
    )
    oneshot = corpus_epoch_assignments(
        union, "text", "doc_id", "epoch", shard_tokens=5000
    )
    want = {(r.doc_id, r.shard) for r in oneshot.collect()}
    unpersist_deps(oneshot)

    corpus = st.store.read(st.CORPUS)
    got = {(r.doc_id, r.shard) for r in corpus.collect()}
    assert got == want
    members = {
        (r.doc_id, r.shard) for r in st.store.read(st.MEMBERS).collect()
    }
    assert members == want
    # manifest matches an independent recompute from the final corpus
    want_man = {
        tuple(r) for r in corpus_shard_manifest(corpus, "doc_id").collect()
    }
    assert {tuple(r) for r in man.collect()} == want_man
    # epoch 2 cut into NEW shards only: its docs' shards all >= epoch 1's
    # shard count, and every re-ingested id vacated its old shard
    bases = {r.epoch: (r.base_shard, r.n_shards)
             for r in st.store.read(st.EPOCHS).collect()}
    assert bases[2][0] == bases[1][0] + bases[1][1] and bases[1][0] == 0
    reingested = {r.doc_id for r in e1.join(e2, "doc_id", "left_semi").collect()}
    assert reingested  # the fixture must actually overlap
    for r in corpus.collect():
        if r.doc_id in reingested:
            assert r.shard >= bases[2][0]


def test_epoch_store_ledger_idempotent_and_rerun_stable(spark, tmp_path):
    """Same run_id replays to None with no new versions; the same append
    SEQUENCE into a fresh root reproduces identical assignments, in-file
    order and manifests (byte-stability of the sequential face)."""
    from metadata_ingestion_framework_spark.operators.corpus import (
        CorpusShardStore,
    )

    e1, e2 = _epochs(spark)

    def run(root):
        st = CorpusShardStore(
            spark, root, shard_tokens=5000, member_bucket_width=64
        )
        st.append_epoch(e1, 1, "r1")
        st.append_epoch(e2, 2, "r2")
        return st

    st = run(str(tmp_path / "a"))
    versions = {
        t: st.store.current_version(t)
        for t in (st.CORPUS, st.MEMBERS, st.MANIFEST, st.EPOCHS)
    }
    assert st.append_epoch(e2, 2, "r2") is None
    assert versions == {
        t: st.store.current_version(t)
        for t in (st.CORPUS, st.MEMBERS, st.MANIFEST, st.EPOCHS)
    }

    def snapshot(st):
        corpus = st.store.read(st.CORPUS)
        order = [
            (r.shard, r.doc_id)
            for r in corpus.select(
                "shard", "doc_id", F.monotonically_increasing_id().alias("i")
            ).orderBy("shard", "i").collect()
        ]
        man = sorted(map(tuple, st.store.read(st.MANIFEST).collect()))
        return order, man

    assert snapshot(st) == snapshot(run(str(tmp_path / "b")))


def test_epoch_store_vacate_and_hardlink_carry(spark, tmp_path):
    """A re-ingested id's old shard is rewritten WITHOUT it (vacate);
    every untouched shard directory carries by hard link (same inode as
    the prior version — zero bytes rewritten)."""
    import os

    from metadata_ingestion_framework_spark.operators.corpus import (
        CorpusShardStore,
    )

    docs = _docs(spark)
    d = F.col("doc_id")
    # a SINGLE re-ingested id, so most epoch-1 shards stay untouched
    # (the shared %7 fixture scatters re-ingests across every shard)
    e1 = docs.filter(d % 3 != 0)
    e2 = docs.filter((d % 3 == 0) | (d == 1))
    st = CorpusShardStore(
        spark, str(tmp_path / "c"), shard_tokens=5000, member_bucket_width=64
    )
    st.append_epoch(e1, 1, "r1")
    v1 = st.store.current_version(st.CORPUS)
    old_shard_of = {
        r.doc_id: r.shard for r in st.store.read(st.MEMBERS).collect()
    }
    st.append_epoch(e2, 2, "r2")
    v2 = st.store.current_version(st.CORPUS)

    reingested = {r.doc_id for r in e1.join(e2, "doc_id", "left_semi").collect()}
    vacated = {old_shard_of[d] for d in reingested}
    corpus2 = st.store.read(st.CORPUS)
    for r in corpus2.filter(F.col("shard").isin(list(vacated))).collect():
        assert r.doc_id not in reingested

    def inode_map(version):
        vdir = st.store._version_path(st.CORPUS, version)
        out = {}
        for d in os.listdir(vdir):
            if not d.startswith("shard="):
                continue
            for f in os.listdir(os.path.join(vdir, d)):
                if f.endswith(".parquet"):
                    out[d] = os.stat(os.path.join(vdir, d, f)).st_ino
        return out

    i1, i2 = inode_map(v1), inode_map(v2)
    untouched = [
        d for d in i1
        if int(d.split("=")[1]) not in vacated
    ]
    assert untouched  # some epoch-1 shard must hold no re-ingested id
    for d in untouched:
        assert i2[d] == i1[d]  # hard-link carry, zero bytes rewritten
    for s in vacated:
        d = f"shard={s}"
        # a vacated shard either emptied out entirely or was rewritten
        assert d not in i2 or i2[d] != i1[d]


def test_corpus_stream_sink_matches_batch_sequential(spark, tmp_path):
    """Streaming face (the family convention): a file-source stream of
    two micro-batches through corpus_stream_sink produces byte-for-byte
    the state of two sequential append_epoch calls, and a restart
    replay no-ops via the run ledger."""
    from metadata_ingestion_framework_spark.operators.corpus import (
        CorpusShardStore,
        corpus_stream_sink,
    )

    e1, e2 = _epochs(spark)
    src = tmp_path / "incoming"
    src.mkdir()
    e1.coalesce(1).write.parquet(str(src / "b0"))
    e2.coalesce(1).write.parquet(str(src / "b1"))

    st_s = CorpusShardStore(
        spark, str(tmp_path / "stream"), shard_tokens=5000,
        member_bucket_width=64,
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(corpus_stream_sink(st_s))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert st_s.ingested_runs() == ["stream-0", "stream-1"]

    st_b = CorpusShardStore(
        spark, str(tmp_path / "batch"), shard_tokens=5000,
        member_bucket_width=64,
    )
    st_b.append_epoch(e1, 0, "r0")
    st_b.append_epoch(e2, 1, "r1")

    def state(st):
        corpus = {
            (r.doc_id, r.shard) for r in st.store.read(st.CORPUS).collect()
        }
        man = sorted(map(tuple, st.store.read(st.MANIFEST).collect()))
        eps = sorted(
            (r.epoch, r.base_shard, r.n_shards)
            for r in st.store.read(st.EPOCHS).collect()
        )
        return corpus, man, eps

    assert state(st_s) == state(st_b)
    # restart replay: same batch id -> ledger no-op, state unchanged
    versions = {
        t: st_s.store.current_version(t)
        for t in (st_s.CORPUS, st_s.MANIFEST)
    }
    corpus_stream_sink(st_s)(e2, 1)
    assert versions == {
        t: st_s.store.current_version(t)
        for t in (st_s.CORPUS, st_s.MANIFEST)
    }


def test_verify_corpus_flags_manifest_mismatch(spark, tmp_path):
    """Loader verification: all shards ok on a healthy store; a
    tampered manifest row (or a vanished shard) flips exactly its
    shard's ok to false."""
    from metadata_ingestion_framework_spark.operators.corpus import (
        CorpusShardStore,
        verify_corpus,
    )

    e1, e2 = _epochs(spark)
    st = CorpusShardStore(
        spark, str(tmp_path / "c"), shard_tokens=5000,
        member_bucket_width=64,
    )
    st.append_epoch(e1, 1, "r1")
    st.append_epoch(e2, 2, "r2")
    v = {r.shard: r.ok for r in verify_corpus(st).collect()}
    assert v and all(v.values())

    man = st.store.read(st.MANIFEST)
    st.store.write(
        man.withColumn(
            "n_tokens",
            F.when(F.col("shard") == 0, F.col("n_tokens") + 1).otherwise(
                F.col("n_tokens")
            ),
        ),
        st.MANIFEST,
    )
    v2 = {r.shard: r.ok for r in verify_corpus(st).collect()}
    assert v2[0] is False
    assert all(ok for s, ok in v2.items() if s != 0)


def test_retire_epochs_below_zero_rewrite_and_base_stability(spark, tmp_path):
    """Retention drops retired epochs' shard DIRS (surviving shards
    hard-link — zero corpus bytes rewritten), manifest/members follow,
    EPOCHS rows stay so later appends keep their bases, and
    verify_corpus stays all-ok on the survivors."""
    import os

    from metadata_ingestion_framework_spark.operators.corpus import (
        CorpusShardStore,
        retire_epochs_below,
        verify_corpus,
    )

    docs = _docs(spark)
    d = F.col("doc_id")
    st = CorpusShardStore(
        spark, str(tmp_path / "c"), shard_tokens=5000,
        member_bucket_width=64,
    )
    st.append_epoch(docs.filter(d % 3 == 0), 1, "r1")
    st.append_epoch(docs.filter(d % 3 == 1), 2, "r2")
    st.append_epoch(docs.filter(d % 3 == 2), 3, "r3")
    bases = {
        r.epoch: r.base_shard for r in st.store.read(st.EPOCHS).collect()
    }
    pre = st.store._version_path(
        st.CORPUS, st.store.current_version(st.CORPUS)
    )
    survivors_inode = {
        dname: os.stat(
            os.path.join(pre, dname, f)
        ).st_ino
        for dname in os.listdir(pre)
        if dname.startswith("shard=")
        and int(dname.split("=")[1]) >= bases[2]
        for f in os.listdir(os.path.join(pre, dname))
        if f.endswith(".parquet")
    }

    assert retire_epochs_below(st, 2) is True
    post = st.store._version_path(
        st.CORPUS, st.store.current_version(st.CORPUS)
    )
    live = sorted(
        int(x.split("=")[1])
        for x in os.listdir(post)
        if x.startswith("shard=")
    )
    assert min(live) >= bases[2]  # epoch 1's shards are gone
    for dname, ino in survivors_inode.items():
        files = [
            f for f in os.listdir(os.path.join(post, dname))
            if f.endswith(".parquet")
        ]
        assert os.stat(
            os.path.join(post, dname, files[0])
        ).st_ino == ino  # hard-linked: zero bytes rewritten
    # epoch-1 ids vanished from members; verify stays all-ok
    left = {r.doc_id for r in st.store.read(st.MEMBERS).collect()}
    assert left and all(i % 3 != 0 for i in left)
    v = {r.shard: r.ok for r in verify_corpus(st).collect()}
    assert v and all(v.values())
    # EPOCHS rows survive -> a later append bases correctly
    st.append_epoch(
        docs.filter(d % 3 == 0).withColumn("doc_id", d + F.lit(10_000)),
        4, "r4",
    )
    b4 = {
        r.epoch: r.base_shard for r in st.store.read(st.EPOCHS).collect()
    }[4]
    assert b4 >= bases[3]  # bases never renumber after retention


def test_epoch_store_rejects_repeat_and_out_of_order_epochs(
    spark, tmp_path
):
    """ADVICE r18 guard: an already-recorded epoch under a NEW run_id
    (would silently vanish the prior epoch's non-re-ingested docs) and
    an out-of-order epoch both raise BEFORE any store write; the crash
    replay — same (epoch, run_id) re-presenting after a crash between
    the EPOCHS write and the ledger record — still heals."""
    import json

    import pytest

    from metadata_ingestion_framework_spark.operators.corpus import (
        CorpusShardStore,
    )

    e1, e2 = _epochs(spark)
    st = CorpusShardStore(
        spark, str(tmp_path / "g"), shard_tokens=5000,
        member_bucket_width=64,
    )
    assert st.append_epoch(e1, 1, "r1") is not None
    assert st.append_epoch(e2, 2, "r2") is not None
    versions = {
        t: st.store.current_version(t)
        for t in (st.CORPUS, st.MEMBERS, st.MANIFEST, st.EPOCHS)
    }
    want = {(r.doc_id, r.shard) for r in st.store.read(st.CORPUS).collect()}

    with pytest.raises(ValueError, match="already recorded"):
        st.append_epoch(e1, 2, "r3")  # repeat epoch, new run_id
    with pytest.raises(ValueError, match="ascend"):
        st.append_epoch(e1, 0, "r4")  # below max recorded epoch
    # nothing moved and neither refused run_id entered the ledger
    assert versions == {
        t: st.store.current_version(t)
        for t in (st.CORPUS, st.MEMBERS, st.MANIFEST, st.EPOCHS)
    }
    assert st.ingested_runs() == ["r1", "r2"]

    # crash replay: drop r2 from the ledger (simulating a crash after
    # the EPOCHS write, before _record_run) — the same (2, "r2") pair
    # replays through the guard and converges to the same corpus
    with open(st._ledger_path, "w") as f:
        json.dump(["r1"], f)
    assert st.append_epoch(e2, 2, "r2") is not None
    got = {(r.doc_id, r.shard) for r in st.store.read(st.CORPUS).collect()}
    assert got == want
    assert st.ingested_runs() == ["r1", "r2"]


def _toy_docs(spark):
    # deterministic fake token ids sized exactly n_tokens (whitespace
    # count) so the packed materialization's truncation rule can bite
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    from metadata_ingestion_framework_spark.functions.text import (
        token_count,
    )

    n = token_count(F.col("text")).cast("int")
    ids = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.pmod(F.col("doc_id") * 31 + i.cast("long"), F.lit(97))
            .cast("int"),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return docs.withColumn("tok_ids", ids)


def test_packed_sequence_rows_boundary_arithmetic(spark):
    """packed_sequence_rows (r18, VERDICT r17 item 4): per-bin doc
    order is the packer's insertion order (n_tokens DESC, id ASC),
    offsets are the exclusive cumsum of CAPPED lengths starting at 0,
    n_tokens is their total (<= budget), and the flattened token ids
    are each doc's ids truncated to its capped length."""
    from metadata_ingestion_framework_spark.functions.text import pack_bfd
    from metadata_ingestion_framework_spark.operators.corpus import (
        packed_sequence_rows,
    )

    docs = _toy_docs(spark)
    budget = 256
    packed = packed_sequence_rows(
        docs, "text", "doc_id", budget_tokens=budget, shards=4,
        token_ids_col="tok_ids",
    ).collect()
    man = {
        (r.doc_id): (r.shard, r.n_tokens, r.bin)
        for r in pack_bfd(
            docs, "text", "doc_id", budget_tokens=budget, shards=4
        ).collect()
    }
    toks = {
        r.doc_id: list(r.tok_ids) for r in docs.select(
            "doc_id", "tok_ids"
        ).collect()
    }
    seen_docs = set()
    for row in packed:
        members = [
            (d, man[d][1]) for d in row.doc_ids
        ]
        # insertion order: n_tokens DESC, id ASC — and membership agrees
        # with the manifest
        assert all(man[d][0] == row.shard and man[d][2] == row.bin
                   for d in row.doc_ids)
        assert members == sorted(members, key=lambda x: (-x[1], x[0]))
        capped = [min(n, budget) for _, n in members]
        offs = [sum(capped[:i]) for i in range(len(capped))]
        assert list(row.offsets) == offs
        assert row.n_tokens == sum(capped) <= budget
        assert row.n_docs == len(members)
        flat = []
        for (d, _n), c in zip(members, capped):
            flat.extend(toks[d][:c])
        assert list(row.token_ids) == flat
        seen_docs.update(row.doc_ids)
    assert seen_docs == set(man)  # every packed doc materialized once


def test_write_packed_shards_and_loader_verify(spark, tmp_path):
    """The packed store face: write + manifest commit marker, loader
    verify all-ok on a clean export, and verify flags a tampered
    packed table (re-written corpus with a doc dropped from one bin)."""
    import os

    from metadata_ingestion_framework_spark.operators.corpus import (
        verify_packed_corpus,
        write_packed_shards,
    )
    from metadata_ingestion_framework_spark.plans.tablestore import (
        VersionedParquetStore,
    )

    docs = _toy_docs(spark)
    root = str(tmp_path / "packed")
    man = write_packed_shards(
        spark, docs, root, "text", "doc_id", budget_tokens=256,
        shards=4, token_ids_col="tok_ids",
    )
    assert man.count() == 4
    v = {r.shard: r.ok for r in verify_packed_corpus(
        spark, root, 256
    ).collect()}
    assert v and all(v.values())
    # tamper: drop the first doc of one bin WITHOUT updating offsets'
    # arithmetic consistently -> that shard flags, others stay ok
    store = VersionedParquetStore(spark, root)
    packed = store.read("packed")
    bad = packed.withColumn(
        "n_docs",
        F.when(
            (F.col("shard") == 0) & (F.col("bin") == 0),
            F.col("n_docs") + 1,
        ).otherwise(F.col("n_docs")),
    )
    store.write(bad, "packed", partition_by=["shard"], cluster=False)
    v2 = {r.shard: r.ok for r in verify_packed_corpus(
        spark, root, 256
    ).collect()}
    assert v2[0] is False
    assert all(ok for s, ok in v2.items() if s != 0)
    assert os.path.isdir(root)


def test_verify_packed_flags_null_token_ids(spark, tmp_path):
    """r18 review: a member doc with NULL token ids propagates a NULL
    sequence token_ids (flatten over a NULL element); every invariant
    comparison then evaluates NULL, and bool_and SKIPS NULLs — the
    verify must coalesce to False so the bin FLAGS instead of passing
    silently."""
    from metadata_ingestion_framework_spark.operators.corpus import (
        verify_packed_corpus,
        write_packed_shards,
    )

    docs = _toy_docs(spark).withColumn(
        "tok_ids",
        F.when(F.col("doc_id") == 7, F.lit(None)).otherwise(
            F.col("tok_ids")
        ),
    )
    root = str(tmp_path / "pnull")
    write_packed_shards(
        spark, docs, root, "text", "doc_id", budget_tokens=256,
        shards=4, token_ids_col="tok_ids",
    )
    v = {r.shard: r.ok for r in verify_packed_corpus(
        spark, root, 256
    ).collect()}
    # exactly doc 7's shard flags; every other shard stays ok
    assert sum(1 for ok in v.values() if not ok) == 1
    assert sum(1 for ok in v.values() if ok) == 3


def test_packed_shards_with_real_bpe_encoder(spark, tmp_path):
    """The item-4 loop closed with the REAL tokenizer (r18): bpe_train
    -> bpe_encode_ids -> write_packed_shards on BPE-token counts — so
    capped lengths, offsets and the flattened token_ids are all in
    actual token units — then the loader verify passes and a spot
    replay confirms each bin's token_ids is the in-order concat of its
    members' (capped) encodings."""
    from metadata_ingestion_framework_spark.functions.bpe import (
        bpe_encode_ids,
        bpe_train,
    )
    from metadata_ingestion_framework_spark.operators.corpus import (
        verify_packed_corpus,
        write_packed_shards,
    )
    from metadata_ingestion_framework_spark.plans.tablestore import (
        VersionedParquetStore,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    merges = bpe_train(docs, "text", k_merges=8)
    enc = bpe_encode_ids(docs, merges, "text")
    root = str(tmp_path / "bpe_packed")
    budget = 128
    write_packed_shards(
        spark, enc, root, None, "doc_id", budget_tokens=budget,
        shards=4, n_tokens_col="n_token_ids", token_ids_col="token_ids",
    )
    v = {r.shard: r.ok for r in verify_packed_corpus(
        spark, root, budget
    ).collect()}
    assert v and all(v.values())
    ids = {r.doc_id: list(r.token_ids) for r in enc.select(
        "doc_id", "token_ids"
    ).collect()}
    packed = VersionedParquetStore(spark, root).read("packed").collect()
    checked = 0
    for row in packed:
        flat = []
        for doc in row.doc_ids:
            flat.extend(ids[doc][:budget])
        assert list(row.token_ids) == flat[:row.n_tokens]
        assert len(row.token_ids) == row.n_tokens <= budget
        checked += 1
    assert checked > 4  # multiple real bins exercised
