"""MinhashSignatureStore: durable cross-run dedup lifecycle
(operators/incremental.py) — two-run flow over a VersionedParquetStore,
SCD1 signature merge, run-ledger idempotence, replay safety, and
bucket-partitioned band layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.incremental import (
    MinhashSignatureStore,
)

# ~40 tokens per doc so 3-gram shingle sets are stable; B-docs near-dup A
BASE = "the quick brown fox jumps over the lazy dog and then runs far away " * 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def store(spark, tmp_path):
    return MinhashSignatureStore(
        spark, str(tmp_path / "sigstore"), jaccard_threshold=0.5
    )


def test_two_run_flow(spark, store):
    # run 1: docs 1..3; 2 duplicates 1 (exact text), 3 distinct
    r1 = _docs(
        spark,
        [(1, BASE), (2, BASE), (3, "totally different words " * 10)],
    )
    s1 = store.ingest(r1, "run-1")
    assert {r.doc_id for r in s1.collect()} == {1, 3}  # 2 drops (dup of 1)
    assert store.ingested_runs() == ["run-1"]

    # run 2: 11 duplicates stored 1 (temporal precedence), 12 new, and
    # 13 duplicates 12 intra-batch (min-id 12 wins)
    other = "completely unrelated fresh content every time " * 5
    r2 = _docs(spark, [(11, BASE), (12, other), (13, other)])
    s2 = store.ingest(r2, "run-2")
    assert {r.doc_id for r in s2.collect()} == {12}
    # store keeps EVERY seen doc's signature (dropped ones included)
    ids = {r.doc_id for r in store.store.read(store.SIGS).select("doc_id").collect()}
    assert ids == {1, 2, 3, 11, 12, 13}


def test_ledger_makes_retry_noop(spark, store):
    r1 = _docs(spark, [(1, BASE), (2, BASE)])
    store.ingest(r1, "run-1")
    v_before = store.store.current_version(store.SIGS)
    assert store.ingest(r1, "run-1") is None  # ledger hit: no-op
    assert store.store.current_version(store.SIGS) == v_before


def test_replay_without_ledger_is_idempotent(spark, store):
    """Crash-recovery shape: signatures already merged but the ledger entry
    lost. Re-ingesting under a NEW run id must not drop surviving docs
    against their own stored copies — and SCD1 keeps the store row count
    flat."""
    r1 = _docs(spark, [(1, BASE), (2, BASE), (3, "totally different words " * 10)])
    s1 = {r.doc_id for r in store.ingest(r1, "run-1").collect()}
    s_replay = {r.doc_id for r in store.ingest(r1, "run-1-retry").collect()}
    assert s_replay == s1 == {1, 3}
    assert store.store.read(store.SIGS).count() == 3  # upsert, not append


def test_band_layout_bucket_partitioned(spark, store, tmp_path):
    store.ingest(_docs(spark, [(1, BASE), (3, "totally different words " * 10)]), "r1")
    v = store.store.current_version(store.BANDS)
    path = store.store._version_path(store.BANDS, v)
    buckets = [d for d in os.listdir(path) if d.startswith("bucket=")]
    assert buckets, "bands table must be partitioned by bucket"
    bands = store.store.read(store.BANDS)
    assert set(bands.columns) == {"doc_id", "band", "band_hash", "bucket"}
    # bucket is the band_hash partition key, bounded by n_buckets
    mx = bands.agg(F.max("bucket").alias("m")).collect()[0].m
    assert 0 <= mx < store.n_buckets


def test_store_versions_advance_and_vacuum(spark, store):
    store.ingest(_docs(spark, [(1, BASE)]), "r1")
    store.ingest(_docs(spark, [(5, "some new content here " * 8)]), "r2")
    assert store.store.current_version(store.SIGS) == 2
    store.store.vacuum(store.SIGS, keep_last=1)
    assert store.store.read(store.SIGS).count() == 2  # current still readable


# ---- EmbeddingDedupStore (semantic twin) ----------------------------------

def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _unit(i, dim=8, bump=None, eps=0.05):
    v = [0.0] * dim
    v[i] = 1.0
    if bump is not None:
        v[bump] += eps
    return v


def test_embedding_store_two_run_flow(spark, tmp_path):
    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )

    store = EmbeddingDedupStore(
        spark, str(tmp_path / "vecstore"), dim=8, n_cells=2, threshold=0.9
    )
    # run 1: 2 near-dups 1 (cos ~0.999), 3 orthogonal
    r1 = _vecs(spark, [(1, _unit(0)), (2, _unit(0, bump=1)), (3, _unit(7))])
    s1 = store.ingest(r1, "run-1")
    assert {r.vec_id for r in s1.collect()} == {1, 3}
    # run 2: 11 dups STORED 1 (temporal precedence: 11 > 1 but also 11 vs
    # dropped 2's direction — dropped vectors still defend), 12 new
    # direction, 13 dups 12 intra-batch (min-id 12 wins)
    fresh = [0.0] * 8
    fresh[3] = 1.0
    fresh2 = list(fresh)
    fresh2[4] = 0.05
    r2 = _vecs(spark, [(11, _unit(0, bump=1, eps=0.02)), (12, fresh), (13, fresh2)])
    s2 = store.ingest(r2, "run-2")
    assert {r.vec_id for r in s2.collect()} == {12}
    # every seen vector's embedding persisted (dropped ones included)
    ids = {r.vec_id for r in store.store.read(store.VECS).select("vec_id").collect()}
    assert ids == {1, 2, 3, 11, 12, 13}
    assert store.ingested_runs() == ["run-1", "run-2"]
    # ledger no-op on retry
    assert store.ingest(r2, "run-2") is None


def test_embedding_store_replay_without_ledger_is_idempotent(spark, tmp_path):
    """Crash between write and ledger record -> the batch re-runs with its
    own vectors already in the store; the batch-id exclusion must keep the
    replay from dropping every doc against its own stored copy."""
    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )

    store = EmbeddingDedupStore(
        spark, str(tmp_path / "vecstore"), dim=8, n_cells=2, threshold=0.9
    )
    r1 = _vecs(spark, [(1, _unit(0)), (3, _unit(7))])
    s1 = store.ingest(r1, "run-1")
    assert {r.vec_id for r in s1.collect()} == {1, 3}
    os.remove(store._ledger_path)  # simulate the lost-ledger crash window
    s1b = store.ingest(r1, "run-1-replay")
    assert {r.vec_id for r in s1b.collect()} == {1, 3}


def test_embedding_store_cell_layout_partitioned(spark, tmp_path):
    import glob

    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )

    store = EmbeddingDedupStore(
        spark, str(tmp_path / "vecstore"), dim=8, n_cells=2, threshold=0.9
    )
    store.ingest(_vecs(spark, [(i, _unit(i % 8)) for i in range(16)]), "run-1")
    vdir = store.store._version_path(store.VECS, store.store.current_version(store.VECS))
    # r10 layout: id-range bucket on top (retention granularity), IVF cell
    # inside (dedup-scan pruning granularity)
    assert glob.glob(f"{vdir}/vec_bucket=*/cell=*"), \
        "vecs table must be (vec_bucket, cell)-partitioned"


def test_partition_delta_links_untouched_buckets(spark, store):
    """r8: the band write rewrites ONLY the batch's buckets; every other
    bucket directory carries over as hard links of the previous version's
    files (same inode), so ingest IO tracks the batch, not the store."""
    store.ingest(_docs(spark, [(1, BASE), (2, "totally different words " * 10)]), "r1")
    v1 = store.store.current_version(store.BANDS)
    store.ingest(_docs(spark, [(50, "yet another unrelated doc body " * 12)]), "r2")
    v2 = store.store.current_version(store.BANDS)
    assert v2 == v1 + 1
    p1 = store.store._version_path(store.BANDS, v1)
    p2 = store.store._version_path(store.BANDS, v2)
    b2 = {
        r.bucket
        for r in store._band_rows(
            store._signatures(_docs(spark, [(50, "yet another unrelated doc body " * 12)]))
        ).select("bucket").distinct().collect()
    }
    linked = rewritten = 0
    for name in os.listdir(p2):
        if not name.startswith("bucket="):
            continue
        bucket = int(name.split("=")[1])
        old = os.path.join(p1, name)
        if not os.path.isdir(old):
            continue
        old_inodes = {os.stat(os.path.join(old, f)).st_ino
                      for f in os.listdir(old) if f.endswith(".parquet")}
        new_inodes = {os.stat(os.path.join(p2, name, f)).st_ino
                      for f in os.listdir(os.path.join(p2, name)) if f.endswith(".parquet")}
        if bucket not in b2:
            assert new_inodes == old_inodes, f"untouched bucket {bucket} was rewritten"
            linked += 1
        else:
            rewritten += 1
    assert linked > 0  # the store had untouched buckets that were carried


def test_ghost_band_rows_sound_and_reaped(spark, store):
    """r8: re-ingesting a doc with NEW text may leave its old band rows in
    un-rewritten buckets (ghosts). Results must stay exact — verification
    scores against the fresh sigs table — and rebuild_bands reaps them."""
    store.ingest(_docs(spark, [(1, BASE)]), "r1")
    # same id, completely different text -> new band hashes, old rows ghost
    new_text = "completely replaced content body with other words " * 6
    store.ingest(_docs(spark, [(1, new_text)]), "r2")
    sigs = store.store.read(store.SIGS)
    assert sigs.filter(F.col("doc_id") == 1).count() == 1  # SCD1: one sig row
    bands = store.store.read(store.BANDS)
    n_with_ghosts = bands.filter(F.col("doc_id") == 1).count()
    assert n_with_ghosts >= store.bands  # fresh rows present (+ ghosts maybe)
    # a batch near-dup of the NEW text must still be dropped (exactness)
    s3 = store.ingest(_docs(spark, [(9, new_text)]), "r3")
    assert s3.count() == 0
    # and a doc matching the OLD text must NOT be dropped by a ghost
    s4 = store.ingest(_docs(spark, [(10, BASE)]), "r4")
    assert {r.doc_id for r in s4.collect()} == {10}
    store.rebuild_bands()
    reaped = store.store.read(store.BANDS).filter(F.col("doc_id") == 1).count()
    assert reaped == store.bands  # exactly one row per band again


def test_embedding_store_moved_cell_vacates_old_partition(spark, tmp_path):
    """r8 partition-delta exactness: re-ingesting a vec_id with an
    embedding that lands in a DIFFERENT IVF cell must vacate its old cell
    partition (stale vectors are scored directly — a ghost would be a
    correctness bug, unlike the candidates-only minhash bands), and a
    later probe matching the OLD embedding must NOT be dropped by it."""
    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )

    store = EmbeddingDedupStore(
        spark, str(tmp_path / "vecstore"), dim=8, n_cells=4, threshold=0.9
    )
    store.ingest(_vecs(spark, [(1, _unit(0)), (3, _unit(7))]), "r1")
    cells0 = {
        r.vec_id: r.cell for r in store.store.read(store.VECS).select("vec_id", "cell").collect()
    }
    # find a direction that assigns id 1 to a DIFFERENT cell
    new_emb = None
    for i in range(1, 8):
        probe = store._assign(_vecs(spark, [(1, _unit(i))])).collect()[0]
        if probe.cell != cells0[1]:
            new_emb = _unit(i)
            break
    assert new_emb is not None, "fixture needs a cell-moving direction"
    store.ingest(_vecs(spark, [(1, new_emb)]), "r2")
    rows = store.store.read(store.VECS).filter(F.col("vec_id") == 1).collect()
    assert len(rows) == 1 and rows[0].cell != cells0[1]  # vacated, moved
    # probe matching the OLD embedding of id 1: must survive (no ghost)
    s3 = store.ingest(_vecs(spark, [(20, _unit(0))]), "r3")
    assert {r.vec_id for r in s3.collect()} == {20}
    # probe matching the NEW embedding: must drop
    s4 = store.ingest(_vecs(spark, [(21, new_emb)]), "r4")
    assert s4.count() == 0


def test_sigs_layout_bucket_partitioned_and_delta_linked(spark, store):
    """r9 (VERDICT r8 item 1): the sigs table is sig_bucket-partitioned and
    ingests rewrite ONLY the batch ids' buckets — untouched sig buckets
    carry by hard link, so per-ingest write cost tracks the batch, not the
    store."""
    store = MinhashSignatureStore(
        spark, store._ledger_path[: -len("/_runs.json")] + "_rangebucket",
        jaccard_threshold=0.5, sig_bucket_width=16,
    )
    many = _docs(
        spark,
        [(i, f"unique content number {i} with plenty of words " * 4) for i in range(40)],
    )
    store.ingest(many, "seed")
    v1 = store.store.current_version(store.SIGS)
    path1 = store.store._version_path(store.SIGS, v1)
    bucket_dirs = [d for d in os.listdir(path1) if d.startswith("sig_bucket=")]
    assert len(bucket_dirs) > 2, "sigs table must be partitioned by sig_bucket"

    batch = _docs(spark, [(1000, "totally fresh follow-up batch text " * 6)])
    store.ingest(batch, "b2")
    v2 = store.store.current_version(store.SIGS)
    path2 = store.store._version_path(store.SIGS, v2)
    touched = {
        r.sig_bucket
        for r in store._with_sig_bucket(store._signatures(batch))
        .select("sig_bucket").distinct().collect()
    }
    linked = rewritten = 0
    for d in bucket_dirs:
        if not os.path.isdir(os.path.join(path2, d)):
            continue
        old = {os.stat(os.path.join(path1, d, f)).st_ino
               for f in os.listdir(os.path.join(path1, d)) if f.endswith(".parquet")}
        new = {os.stat(os.path.join(path2, d, f)).st_ino
               for f in os.listdir(os.path.join(path2, d)) if f.endswith(".parquet")}
        bucket_val = int(d.split("=")[1])
        if bucket_val in touched:
            rewritten += 1
        else:
            assert new == old, f"untouched {d} must be hard-linked, not rewritten"
            linked += 1
    assert linked > 0 and rewritten <= len(touched)
    # content still equals the union, one row per id
    ids = [r.doc_id for r in store.store.read(store.SIGS).select("doc_id").collect()]
    assert sorted(ids) == sorted(set(range(40)) | {1000})


def test_reingest_leaves_no_duplicate_band_rows(spark, store):
    """ADVICE r9: a re-ingested id whose old band rows (fresh + ghost) both
    sit in touched buckets must not come out duplicated from the SCD1 merge
    — the batch's ids are anti-joined out of the old side first, so each
    (id, band) appears exactly once per band_hash after any ingest."""
    texts = [
        BASE,
        "second revision with completely new shingle content " * 5,
        "third revision again entirely different words here " * 5,
    ]
    for i, txt in enumerate(texts):
        store.ingest(_docs(spark, [(1, txt)]), f"run-{i}")
    bands = store.store.read(store.BANDS).filter(F.col("doc_id") == 1)
    dup = (
        bands.groupBy("doc_id", "band", "band_hash", "bucket")
        .count().filter(F.col("count") > 1)
    )
    assert dup.count() == 0, "identical band rows duplicated by re-ingest"
    # and within every touched bucket the (id, band) key is unique
    per_key = (
        bands.groupBy("doc_id", "band", "bucket").count().filter(F.col("count") > 1)
    )
    assert per_key.count() == 0
    # signatures stayed SCD1 (one row for id 1)
    assert store.store.read(store.SIGS).filter("doc_id = 1").count() == 1


def test_sig_bucket_exact_integer_division_above_2_53(spark, tmp_path):
    """r10 (ADVICE r9): the range bucket must use integral `div`, not
    floor(double division) — for 64-bit ids above 2^53 the double rounds
    and can place a row across the bucket boundary that retire_ids_below
    computes exactly, dropping live rows or retaining retired ones.
    id = 2^57 - 8 with width 16: double rounding yields bucket
    9007199254740992, exact integer division yields 9007199254740991."""
    store = MinhashSignatureStore(
        spark, str(tmp_path / "bigid_store"), sig_bucket_width=16
    )
    big_id = (1 << 57) - 8
    df = spark.createDataFrame([(big_id, "t")], "doc_id long, text string")
    got = store._with_sig_bucket(df).select("sig_bucket").collect()[0][0]
    assert got == big_id // 16 == 9007199254740991


def test_retire_ids_below_zero_rewrite_retention(spark, tmp_path):
    """r9: retention delete on the range-bucketed sigs store — whole
    buckets below the cutoff drop with no data rewritten (survivor buckets
    hard-link), the boundary bucket is rewritten filtered, bands rebuild,
    and a future duplicate of a retired doc now survives (documented
    expiry semantics)."""
    store = MinhashSignatureStore(
        spark, str(tmp_path / "retire_store"), jaccard_threshold=0.5,
        sig_bucket_width=16,
    )
    # per-doc token vocabulary is disjoint so no seed doc near-dups another
    docs = _docs(
        spark,
        [(i, " ".join(f"tok{i}x{j}" for j in range(40))) for i in range(40)]
        + [(100, BASE)],
    )
    store.ingest(docs, "seed")
    v_before = store.store.current_version(store.SIGS)
    p_before = store.store._version_path(store.SIGS, v_before)

    store.retire_ids_below(20)  # buckets 0 (ids 0-15) drop; 1 filtered

    ids = sorted(
        r.doc_id for r in store.store.read(store.SIGS).select("doc_id").collect()
    )
    assert ids == list(range(20, 40)) + [100]
    # survivor bucket (ids 32-39 -> bucket 2) carried by hard link
    v_after = store.store.current_version(store.SIGS)
    p_after = store.store._version_path(store.SIGS, v_after)
    old = {os.stat(os.path.join(p_before, "sig_bucket=2", f)).st_ino
           for f in os.listdir(os.path.join(p_before, "sig_bucket=2"))
           if f.endswith(".parquet")}
    new = {os.stat(os.path.join(p_after, "sig_bucket=2", f)).st_ino
           for f in os.listdir(os.path.join(p_after, "sig_bucket=2"))
           if f.endswith(".parquet")}
    assert new == old, "survivor bucket must be linked, not rewritten"
    assert not os.path.isdir(os.path.join(p_after, "sig_bucket=0"))
    # time travel still sees the retired rows until vacuum
    assert store.store.read(store.SIGS, version=v_before).count() == 41
    # bands rebuilt to the survivors only
    band_ids = {r.doc_id for r in store.store.read(store.BANDS).collect()}
    assert band_ids == set(range(20, 40)) | {100}
    # a duplicate of a RETIRED doc (id 5's text) now survives ingest;
    # a duplicate of a SURVIVOR (id 100's BASE text) still drops
    batch = _docs(spark, [
        (200, " ".join(f"tok5x{j}" for j in range(40))),  # dup of RETIRED 5
        (201, BASE),                                      # dup of survivor 100
    ])
    out = {r.doc_id for r in store.ingest(batch, "after-retire").collect()}
    assert out == {200}


def _inodes(path):
    import glob as g

    return {
        os.stat(f).st_ino
        for f in g.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    }


def test_embedding_store_delta_links_untouched_buckets(spark, tmp_path):
    """r10 (VERDICT r9 item 3): the vecs table's top-level id-range buckets
    decouple ingest IO from store size — a later batch rewrites only ITS
    ids' buckets; every other bucket dir (cell subdirs included) carries by
    hard link."""
    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )

    store = EmbeddingDedupStore(
        spark, str(tmp_path / "vecstore"), dim=8, n_cells=2, threshold=0.9,
        vec_bucket_width=16,
    )
    store.ingest(_vecs(spark, [(i, _unit(i % 8)) for i in range(32)]), "r1")
    v1 = store.store.current_version(store.VECS)
    # ids 40-41 -> bucket 2 only; buckets 0 and 1 must link
    store.ingest(_vecs(spark, [(40, _unit(0, bump=3)), (41, _unit(5, bump=1))]), "r2")
    v2 = store.store.current_version(store.VECS)
    p1 = store.store._version_path(store.VECS, v1)
    p2 = store.store._version_path(store.VECS, v2)
    for b in (0, 1):
        old = _inodes(os.path.join(p1, f"vec_bucket={b}"))
        new = _inodes(os.path.join(p2, f"vec_bucket={b}"))
        assert old and new == old, f"untouched bucket {b} was rewritten"
    assert os.path.isdir(os.path.join(p2, "vec_bucket=2"))


def test_embedding_store_retire_ids_below_zero_rewrite(spark, tmp_path):
    """r10 (VERDICT r9 item 3): retention on the embedding store — whole
    id-range buckets below the cutoff drop with no data rewritten
    (survivors hard-link), the boundary bucket is rewritten filtered, old
    versions stay time-travelable, and expiry is PHYSICAL: a future
    near-dup of a retired vector now survives while a dup of a survivor
    still drops."""
    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )

    store = EmbeddingDedupStore(
        spark, str(tmp_path / "vecstore"), dim=8, n_cells=2, threshold=0.9,
        vec_bucket_width=16,
    )
    # ids 0-19 use directions 0-3, ids 20-39 use directions 4-7 — so a
    # direction-1 probe dups ONLY retired ids and a direction-5 probe dups
    # ONLY survivors (every seen vector persists regardless of dedup)
    rows = [(i, _unit(i % 4 if i < 20 else 4 + i % 4)) for i in range(40)]
    store.ingest(_vecs(spark, rows), "seed")
    v_before = store.store.current_version(store.VECS)
    p_before = store.store._version_path(store.VECS, v_before)

    store.retire_ids_below(20)  # bucket 0 (ids 0-15) drops; 1 filtered

    ids = sorted(r.vec_id for r in store.store.read(store.VECS).select("vec_id").collect())
    assert ids == list(range(20, 40))
    v_after = store.store.current_version(store.VECS)
    p_after = store.store._version_path(store.VECS, v_after)
    # survivor bucket 2 (ids 32-39) carried by hard link, bucket 0 gone
    old = _inodes(os.path.join(p_before, "vec_bucket=2"))
    new = _inodes(os.path.join(p_after, "vec_bucket=2"))
    assert old and new == old, "survivor bucket must be linked, not rewritten"
    assert not os.path.isdir(os.path.join(p_after, "vec_bucket=0"))
    # time travel still sees the retired rows until vacuum
    assert store.store.read(store.VECS, version=v_before).count() == 40
    # physical expiry semantics
    s = store.ingest(
        _vecs(spark, [
            (200, _unit(1)),  # dup of RETIRED direction -> survives now
            (201, _unit(5)),  # dup of surviving direction -> still drops
        ]),
        "after-retire",
    )
    assert {r.vec_id for r in s.collect()} == {200}


def test_embedding_store_retire_string_ids_unsupported(spark, tmp_path):
    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )

    store = EmbeddingDedupStore(
        spark, str(tmp_path / "vecstore"), dim=8, n_cells=2, threshold=0.9,
        id_col="sid",
    )
    df = spark.createDataFrame(
        [("a", _unit(0)), ("b", _unit(7))], "sid string, embedding array<double>"
    )
    store.ingest(df, "r1")
    with pytest.raises(NotImplementedError, match="numeric id"):
        store.retire_ids_below(10)


def test_embedding_store_with_trained_centroids(spark, tmp_path):
    """r10 (VERDICT r9 item 1 thread): the store accepts a trained
    coarse quantizer — the full ingest/dedup/replay flow works on
    kmeans_fit centroids, cells stay in range, and the layout contract
    (centroids fixed for the store's lifetime) is unchanged."""
    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )
    from metadata_ingestion_framework_spark.operators.kmeans import kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    model = kmeans_fit(emb, dim=64, n_cells=4, n_iters=2)
    store = EmbeddingDedupStore(
        spark, str(tmp_path / "trained_store"), dim=64, n_cells=4,
        threshold=0.35, centroids=model.unit_centroids,
    )
    b1 = emb.filter("vec_id < 100")
    s1 = store.ingest(b1, "r1")
    assert s1.count() > 0
    cells = {
        r.cell for r in store.store.read(store.VECS).select("cell").collect()
    }
    assert cells <= set(range(4))
    # re-ingest of the same rows under a new run id: replay guard holds
    s2 = store.ingest(b1, "r1-replay")
    assert {r.vec_id for r in s2.collect()} == {r.vec_id for r in s1.collect()}


def test_retire_edge_aligned_cutoff_is_single_version_zero_rewrite(
    spark, tmp_path
):
    """r10 code review: a cutoff landing exactly on a bucket edge mints
    ONE new version (the partition drop) and rewrites nothing — the
    boundary bucket has no retired rows, so its rewrite is skipped."""
    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )

    store = EmbeddingDedupStore(
        spark, str(tmp_path / "vecstore"), dim=8, n_cells=2, threshold=0.9,
        vec_bucket_width=16,
    )
    store.ingest(_vecs(spark, [(i, _unit(i % 8)) for i in range(32)]), "r1")
    v0 = store.store.current_version(store.VECS)
    store.retire_ids_below(16)  # exactly the bucket-0/1 edge
    v1 = store.store.current_version(store.VECS)
    assert v1 == v0 + 1  # one version: the drop; no boundary rewrite
    ids = sorted(
        r.vec_id for r in store.store.read(store.VECS).select("vec_id").collect()
    )
    assert ids == list(range(16, 32))
    # bucket-1 files carried by hard link (zero bytes rewritten)
    p0 = store.store._version_path(store.VECS, v0)
    p1 = store.store._version_path(store.VECS, v1)
    assert _inodes(os.path.join(p1, "vec_bucket=1")) == _inodes(
        os.path.join(p0, "vec_bucket=1")
    )


def test_partition_values_lists_layout_without_scan(spark, tmp_path):
    """r10: partition_values answers 'which buckets exist' from the
    directory layout — escaped values round-trip and the Hive default dir
    maps to None."""
    from metadata_ingestion_framework_spark.plans.tablestore import (
        VersionedParquetStore,
    )

    store = VersionedParquetStore(spark, str(tmp_path / "pv"))
    df = spark.createDataFrame(
        [(1, "a=b"), (2, "plain"), (3, None)], "id int, k string"
    )
    store.write(df, "t", partition_by=["k"])
    vals = store.partition_values("t", "k")
    assert set(vals) == {"a=b", "plain", None}


def test_curation_incremental_lifecycle(spark, tmp_path):
    """r12 (VERDICT r11 item 4): the REPEATED-ingestion curation shape —
    two successive runs through real filesystem stores
    (MinhashSignatureStore + EmbeddingDedupStore) composed with the
    one-pass model gates, the catalog's q_curation_incremental flow with
    durable state instead of in-plan splits. Checks: per-run survivor
    sets follow temporal-then-min-id precedence across BOTH modalities,
    the gate values on survivors equal a direct model pass (composition
    adds nothing), replayed run_ids are no-ops, and every store keeps
    every seen id so run 3 would still dedup against run 1."""
    from metadata_ingestion_framework_spark.functions.quality_model import (
        hashed_seed_weights,
        model_gate_scores,
    )
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )

    tstore = MinhashSignatureStore(
        spark, str(tmp_path / "sig"), jaccard_threshold=0.5
    )
    estore = EmbeddingDedupStore(
        spark, str(tmp_path / "vec"), dim=8, n_cells=2, threshold=0.9
    )
    wq = hashed_seed_weights("q", 256)
    wl = {"en": hashed_seed_weights("en", 256), "fr": hashed_seed_weights("fr", 256)}
    other = "completely unrelated fresh content every time " * 5
    third = "yet another body of text with its own words entirely " * 4

    def run(doc_rows, run_id):
        """One incremental curation run: both stores, then gates on the
        ids surviving BOTH — returns (decision rows keyed by id)."""
        docs = spark.createDataFrame(
            doc_rows, "doc_id long, text string, lang string, embedding array<double>"
        )
        st = tstore.ingest(docs.select("doc_id", "text"), run_id)
        se = estore.ingest(
            docs.select(F.col("doc_id").alias("vec_id"), "embedding"), run_id
        )
        surv = docs.join(st.select("doc_id"), "doc_id").join(
            se.select(F.col("vec_id").alias("doc_id")), "doc_id"
        )
        gates = model_gate_scores(surv, wq, wl, text_col="text", n_features=256)
        rows = {r.doc_id: r for r in gates.collect()}
        unpersist_deps(st)
        unpersist_deps(se)
        return rows

    # run 1: 2 text-dups 1; 3 embedding-dups 1's vector; 4 clean
    r1 = run(
        [
            (1, BASE, "en", _unit(0)),
            (2, BASE, "en", _unit(0, bump=1)),        # text AND vector dup
            (3, "distinct words here " * 10, "en", _unit(0, bump=1, eps=0.02)),
            (4, other, "fr", _unit(7)),
        ],
        "run-1",
    )
    assert set(r1) == {1, 4}  # 2 drops both ways, 3 drops semantically
    # run 2: 11 text-dups STORED 1 (temporal precedence), 12 vector-dups
    # STORED 4, 13/14 intra-batch dups of each other (min id 13 wins both
    # modalities), 15 clean
    r2 = run(
        [
            (11, BASE, "en", _unit(3)),
            (12, "fresh second-run prose all new tokens " * 6, "fr", _unit(7, bump=2, eps=0.02)),
            (13, third, "en", _unit(5)),
            (14, third, "en", _unit(5, bump=6, eps=0.02)),
            (15, "final clean document with wholly novel vocabulary " * 4, "fr", _unit(1)),
        ],
        "run-2",
    )
    assert set(r2) == {13, 15}
    # gate values on survivors == a direct model pass over the same rows
    direct = {
        r.doc_id: r
        for r in model_gate_scores(
            spark.createDataFrame(
                [(13, third), (15, "final clean document with wholly novel vocabulary " * 4)],
                "doc_id long, text string",
            ),
            wq, wl, text_col="text", n_features=256,
        ).collect()
    }
    for i in (13, 15):
        assert r2[i].logit_q == direct[i].logit_q
        assert r2[i].pred_lang == direct[i].pred_lang
        assert r2[i].n_grams == direct[i].n_grams
    # replayed run ids are no-ops on BOTH stores
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert tstore.ingest(empty, "run-2") is None
    assert (
        estore.ingest(
            spark.createDataFrame([], "vec_id long, embedding array<double>"),
            "run-2",
        )
        is None
    )
    # durable memory: every seen id is defended, dropped ones included
    sig_ids = {r.doc_id for r in tstore.store.read(tstore.SIGS).select("doc_id").collect()}
    assert sig_ids == {1, 2, 3, 4, 11, 12, 13, 14, 15}
    vec_ids = {r.vec_id for r in estore.store.read(estore.VECS).select("vec_id").collect()}
    assert vec_ids == {1, 2, 3, 4, 11, 12, 13, 14, 15}


def test_store_ingest_dirty_text_contract(spark, tmp_path):
    """Token-less docs (NULL/empty/whitespace text) have no signature:
    they always SURVIVE ingest (they cannot duplicate anything), are
    never stored, and therefore never defend — a documented semantic of
    signature-based dedup state, pinned so it cannot silently change."""
    store = MinhashSignatureStore(
        spark, str(tmp_path / "sig"), jaccard_threshold=0.5
    )
    r1 = _docs(spark, [(1, BASE), (2, None), (3, ""), (4, "   \n ")])
    s1 = store.ingest(r1, "run-1")
    assert {r.doc_id for r in s1.collect()} == {1, 2, 3, 4}
    stored = {
        r.doc_id
        for r in store.store.read(store.SIGS).select("doc_id").collect()
    }
    assert stored == {1}  # only the real signature persists
    # run 2: the clean dup drops against the store; a new NULL-text doc
    # still survives (nothing can defend against a doc with no content)
    r2 = _docs(spark, [(11, BASE), (12, None)])
    s2 = store.ingest(r2, "run-2")
    assert {r.doc_id for r in s2.collect()} == {12}
