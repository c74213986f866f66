"""ParagraphHashStore: durable cross-run CCNet paragraph dedup
(operators/incremental.py) — sequential-ingest == one-shot equivalence
over disjoint runs, run-ledger idempotence, replay safety, re-ingest
vacate (current-corpus semantics), id-range delta layout, retention."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.dedup import (
    paragraph_dedup,
    unpersist_deps,
)
from metadata_ingestion_framework_spark.operators.incremental import (
    ParagraphHashStore,
)

P1 = "alpha bravo charlie delta"
P2 = "echo foxtrot golf hotel"
P3 = "india juliet kilo lima"
P4 = "mike november oscar papa"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def store(spark, tmp_path):
    return ParagraphHashStore(spark, str(tmp_path / "parstore"))


@pytest.fixture()
def bstore(spark, tmp_path):
    # bloom sidecar ON (opt-in since the r16 A/B defaulted it off)
    return ParagraphHashStore(
        spark, str(tmp_path / "parstore_bloom"), bloom_bits=1 << 22
    )


def _collect(out):
    rows = {r.doc_id: (r.clean_text, r.n_removed) for r in out.collect()}
    unpersist_deps(out)
    return rows


def test_two_run_flow_equals_one_shot(spark, store):
    """Disjoint sequential ingests == paragraph_dedup on the batch-major
    union (the store's headline contract, oracle-checked in the catalog
    too — this pins it at the pytest granularity with a cross-batch dup,
    an intra-batch dup, and an intra-DOC dup in play)."""
    r1 = _docs(
        spark,
        [(1, f"{P1}\n{P2}"), (2, f"{P2}\n{P3}\n{P3}")],  # 2: cross + self dup
    )
    r2 = _docs(
        spark,
        [(11, f"{P1}\n{P4}"), (12, f"{P4}\nbrand new closing line")],
    )
    got1 = _collect(store.ingest(r1, "run-1"))
    got2 = _collect(store.ingest(r2, "run-2"))

    oneshot = paragraph_dedup(
        r1.unionByName(r2), "text", "doc_id"
    )
    want = {r.doc_id: (r.clean_text, r.n_removed) for r in oneshot.collect()}
    assert {**got1, **got2} == want
    # store holds exactly one surviving owner row per live hash
    paras = store.store.read(store.PARAS)
    assert paras.count() == paras.select("gh").distinct().count()
    # P1..P4 + doc 12's fresh tail line = 5 live hashes
    assert paras.count() == 5


def test_ledger_makes_retry_noop(spark, store):
    r1 = _docs(spark, [(1, P1)])
    _collect(store.ingest(r1, "run-1"))
    v = store.store.current_version(store.PARAS)
    assert store.ingest(r1, "run-1") is None
    assert store.store.current_version(store.PARAS) == v


def test_replay_without_ledger_excludes_own_rows(spark, store):
    """Crash between write and ledger record: the replayed batch must not
    dedup against its own stored copy (store side excludes batch ids)."""
    r1 = _docs(spark, [(1, f"{P1}\n{P2}")])
    _collect(store.ingest(r1, "run-1"))
    store._record_run("__forget__")  # ledger survives; simulate loss of run-1
    runs = [r for r in store.ingested_runs() if r != "run-1"]
    import json

    with open(store._ledger_path, "w") as f:
        json.dump(runs, f)
    got = _collect(store.ingest(r1, "run-1b"))
    assert got[1] == (f"{P1}\n{P2}", 0)  # untouched, not self-deduped
    paras = store.store.read(store.PARAS)
    assert paras.count() == 2  # replaced wholesale, no duplicates


def test_reingest_vacates_old_paragraphs(spark, store):
    """Current-corpus semantics: a re-ingested doc's vanished paragraphs
    stop suppressing future copies; its surviving rows are replaced."""
    _collect(store.ingest(_docs(spark, [(1, f"{P1}\n{P2}")]), "run-1"))
    # doc 1 re-ingested with P2 only -> P1 must vacate. P2 dedups against
    # OTHER docs' rows only (batch ids excluded) so it survives here.
    got = _collect(store.ingest(_docs(spark, [(1, P2)]), "run-2"))
    assert got[1] == (P2, 0)
    ghs = store.store.read(store.PARAS).select("doc_id", "gh").collect()
    assert len(ghs) == 1 and ghs[0].doc_id == 1
    # P1 is free again: a later doc carrying it survives
    got3 = _collect(store.ingest(_docs(spark, [(2, P1)]), "run-3"))
    assert got3[2] == (P1, 0)


def test_doc_deduped_away_entirely_still_vacates(spark, store):
    """A re-ingest whose text fully dedups must still vacate the doc's
    old rows (touched buckets derive from BATCH ids, not survivors)."""
    _collect(store.ingest(_docs(spark, [(1, P1), (2, P2)]), "run-1"))
    # re-ingest doc 2 whose sole paragraph is doc 1's P1 -> dropped, and
    # doc 2's old P2 row must vacate
    got = _collect(store.ingest(_docs(spark, [(2, P1)]), "run-2"))
    assert got[2] == ("", 1)
    owners = {
        (r.doc_id, r.gh)
        for r in store.store.read(store.PARAS).select("doc_id", "gh").collect()
    }
    assert {d for d, _ in owners} == {1}  # only doc 1's P1 row remains
    got3 = _collect(store.ingest(_docs(spark, [(3, P2)]), "run-3"))
    assert got3[3] == (P2, 0)  # P2 vacated with doc 2's rewrite


def test_retire_ids_below_drops_buckets_and_frees_hashes(spark, tmp_path):
    store = ParagraphHashStore(
        spark, str(tmp_path / "ret"), par_bucket_width=4
    )
    _collect(store.ingest(_docs(spark, [(0, P1), (1, P2)]), "run-1"))
    _collect(store.ingest(_docs(spark, [(8, P3)]), "run-2"))
    store.retire_ids_below(8)  # bucket 0 and 1 dropped whole
    left = {r.doc_id for r in store.store.read(store.PARAS).collect()}
    assert left == {8}
    got = _collect(store.ingest(_docs(spark, [(20, P1)]), "run-3"))
    assert got[20] == (P1, 0)  # retired hash no longer suppresses


def test_delta_write_links_untouched_buckets(spark, tmp_path):
    store = ParagraphHashStore(
        spark, str(tmp_path / "delta"), par_bucket_width=4
    )
    _collect(store.ingest(_docs(spark, [(0, P1), (9, P2)]), "run-1"))
    v1 = store.store.current_version(store.PARAS)
    _collect(store.ingest(_docs(spark, [(10, P3)]), "run-2"))
    v2 = store.store.current_version(store.PARAS)
    assert v2 == v1 + 1
    # bucket 0 (doc 0) must carry by hard link: identical inode list
    import os

    def leaf(v, b):
        d = os.path.join(
            store.store._version_path(store.PARAS, v), f"par_bucket={b}"
        )
        return sorted(
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert leaf(v2, 0) == leaf(v1, 0)
    assert leaf(v2, 2) != []  # touched bucket written fresh


def test_config_guard(spark, tmp_path):
    ParagraphHashStore(spark, str(tmp_path / "cfg"), par_bucket_width=16)
    with pytest.raises(ValueError, match="par_bucket_width"):
        ParagraphHashStore(spark, str(tmp_path / "cfg"), par_bucket_width=8)


def test_null_and_empty_text_roundtrip(spark, store):
    got = _collect(
        store.ingest(
            _docs(spark, [(1, None), (2, ""), (3, f"\n\n{P1}\n\n")]),
            "run-1",
        )
    )
    assert got[1] == ("", 0) and got[2] == ("", 0) and got[3] == (P1, 0)
    # only doc 3 owns a row
    assert {
        r.doc_id for r in store.store.read(store.PARAS).collect()
    } == {3}


def test_bloom_false_positive_heavy_output_identity(spark, tmp_path):
    """r16 (VERDICT r15 item 2): a pathologically tiny bloom (64 bits —
    essentially every probe is a false positive) must produce BYTE-
    identical rewrites to a well-sized store over the same ingest
    sequence: FPs only widen the scanned bucket set, the exact semi-join
    is the decider."""
    tiny = ParagraphHashStore(
        spark, str(tmp_path / "tinybloom"), par_bucket_width=4,
        bloom_bits=64, bloom_hashes=3,
    )
    wide = ParagraphHashStore(
        spark, str(tmp_path / "widebloom"), par_bucket_width=4,
        bloom_bits=1 << 22,
    )
    runs = [
        ("r1", [(1, f"{P1}\n{P2}"), (2, f"{P2}\n{P3}\n{P3}")]),
        ("r2", [(11, f"{P1}\n{P4}"), (12, f"{P4}\nfresh tail line")]),
        ("r3", [(21, f"{P3}\nfresh tail line\nanother one")]),
    ]
    for run_id, rows in runs:
        df = _docs(spark, rows)
        got = _collect(tiny.ingest(df, run_id))
        want = _collect(wide.ingest(df, run_id))
        assert got == want
    # both stores converged to the same surviving hash set
    t = {r.gh for r in tiny.store.read(tiny.PARAS).collect()}
    w = {r.gh for r in wide.store.read(wide.PARAS).collect()}
    assert t == w and len(t) == 6


def test_bloom_prunes_disjoint_batch_to_zero_buckets(spark, bstore):
    """A batch whose hashes are all new must probe ZERO store buckets
    (the [] fast path skips the membership semi-join entirely), while a
    batch carrying a stored hash must hit that hash's bucket."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        _paragraph_rows,
    )

    _collect(bstore.ingest(_docs(spark, [(1, f"{P1}\n{P2}")]), "run-1"))
    disjoint = _paragraph_rows(
        _docs(spark, [(50, f"{P3}\n{P4}")]), "text", "doc_id"
    )
    assert bstore._bloom_hit_buckets(disjoint) == []
    dup = _paragraph_rows(
        _docs(spark, [(60, f"{P1}\nsomething else")]), "text", "doc_id"
    )
    assert bstore._bloom_hit_buckets(dup) == [0]  # doc 1's id-range bucket
    # and the [] path still dedups correctly end to end
    got = _collect(bstore.ingest(_docs(spark, [(50, f"{P3}\n{P4}")]), "run-2"))
    assert got[50] == (f"{P3}\n{P4}", 0)
    got = _collect(
        bstore.ingest(_docs(spark, [(60, f"{P1}\nsomething else")]), "run-3")
    )
    assert got[60] == ("something else", 1)


def test_bloom_migration_from_pre_sidecar_store(spark, bstore, tmp_path):
    """A store without the parbloom table (pre-r16 layout) falls back to
    the full-scan membership probe and the next ingest builds the full
    sidecar as a one-time migration."""
    import shutil

    _collect(bstore.ingest(_docs(spark, [(1, f"{P1}\n{P2}")]), "run-1"))
    shutil.rmtree(bstore.store._dir(bstore.BLOOM))
    assert not bstore.store.exists(bstore.BLOOM)
    got = _collect(
        bstore.ingest(_docs(spark, [(11, f"{P2}\nnew line here")]), "run-2")
    )
    assert got[11] == ("new line here", 1)
    assert bstore.store.exists(bstore.BLOOM)
    # migrated sidecar is immediately effective and exact
    probe = bstore._bloom_hit_buckets(
        _paragraph_rows_for_test(spark, f"{P1}")
    )
    assert probe == [0]


def _paragraph_rows_for_test(spark, text):
    from metadata_ingestion_framework_spark.operators.dedup import (
        _paragraph_rows,
    )

    return _paragraph_rows(_docs(spark, [(99, text)]), "text", "doc_id")


def test_pre_r16_config_migrates_bloom_keys(spark, tmp_path):
    """A pre-r16 _config.json (no bloom keys) must open cleanly — the
    keys are stamped in place (the ImageHashStore band-layout migration
    precedent; r16 review caught the exact-equality guard bricking
    every older store) — while any OTHER mismatch still raises."""
    import json
    import os

    root = str(tmp_path / "oldcfg")
    st = ParagraphHashStore(spark, root, par_bucket_width=16)
    _collect(st.ingest(_docs(spark, [(1, P1)]), "r1"))
    cfg_path = os.path.join(root, "_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    old = {k: v for k, v in cfg.items() if not k.startswith("bloom_")}
    with open(cfg_path, "w") as f:
        json.dump(old, f)
    # reopens cleanly, stamps the bloom keys, state intact
    st2 = ParagraphHashStore(spark, root, par_bucket_width=16)
    with open(cfg_path) as f:
        assert "bloom_bits" in json.load(f)
    got = _collect(st2.ingest(_docs(spark, [(9, f"{P1}\n{P2}")]), "r2"))
    assert got[9] == (P2, 1)
    # a real mismatch still fails loudly
    with open(cfg_path, "w") as f:
        json.dump(old, f)
    with pytest.raises(ValueError, match="par_bucket_width"):
        ParagraphHashStore(spark, root, par_bucket_width=8)
