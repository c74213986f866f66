"""Incremental perceptual image dedup store (operators/incremental.py::
ImageHashStore + image_hash_batch_drops, r13): two-run lifecycle,
temporal-then-min-id precedence, replay safety, run-ledger idempotence,
full-rerun equivalence, and the undecodable-payload contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.codecs import encode_bmp
from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps
from metadata_ingestion_framework_spark.operators.incremental import (
    ImageHashStore,
    image_hash_batch_drops,
)


def _px(seed, h=16, w=16):
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    return ((seed * 7 + y * 13 + x * 17 + c * 29) % 256).astype(np.uint8)


def _near(seed):
    p = _px(seed)
    p[0:2, 0:2, :] = 255
    return p


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def _store(spark, tmp_path, name="imgs"):
    return ImageHashStore(
        spark, str(tmp_path / name), fp_bucket_width=8, n_buckets=8
    )


def test_two_run_lifecycle(spark, tmp_path):
    st = _store(spark, tmp_path)
    run1 = _media(spark, [(i, encode_bmp(_px(i * 100))) for i in range(6)])
    s1 = st.ingest(run1, "r1")
    assert sorted(r.media_id for r in s1.collect()) == list(range(6))
    unpersist_deps(s1)

    run2 = _media(spark, [
        (20, encode_bmp(_px(300))),        # exact dup of stored id 3
        (21, encode_bmp(_near(500))),      # near dup of stored id 5
        (22, encode_bmp(_px(7000))),       # intra-batch: 22 < 23 wins
        (23, encode_bmp(_px(7000))),
        (24, encode_bmp(_px(9000))),       # genuinely new
        (25, b"not an image"),             # undecodable: survives
    ])
    s2 = st.ingest(run2, "r2")
    assert sorted(r.media_id for r in s2.collect()) == [22, 24, 25]
    unpersist_deps(s2)
    stored = {r.media_id for r in st.store.read(ImageHashStore.FPS).collect()}
    # dropped images KEEP their fingerprints; undecodable rows are never
    # stored (no pixels to hash)
    assert stored == set(range(6)) | {20, 21, 22, 23, 24}


def test_run_ledger_idempotent(spark, tmp_path):
    st = _store(spark, tmp_path)
    batch = _media(spark, [(0, encode_bmp(_px(1)))])
    s = st.ingest(batch, "r1")
    unpersist_deps(s)
    v = st.store.current_version(ImageHashStore.FPS)
    assert st.ingest(batch, "r1") is None
    assert st.store.current_version(ImageHashStore.FPS) == v


def test_replay_batch_does_not_self_collide(spark, tmp_path):
    """Re-delivering yesterday's batch under a new run id must not drop
    every row against its own stored copy (the store-side anti-join)."""
    st = _store(spark, tmp_path)
    batch = _media(spark, [(i, encode_bmp(_px(i * 50))) for i in range(4)])
    s1 = st.ingest(batch, "r1")
    first = sorted(r.media_id for r in s1.collect())
    unpersist_deps(s1)
    s2 = st.ingest(batch, "r2")
    assert sorted(r.media_id for r in s2.collect()) == first
    unpersist_deps(s2)


def test_incremental_equals_full_rerun(spark, tmp_path):
    """The incremental drop set must equal a greedy full-union rerun
    under temporal-then-min-id precedence (the incremental_dedup oracle
    convention, computed here from the all-images pair set)."""
    from metadata_ingestion_framework_spark.operators.multimodal import (
        image_hashes,
    )

    seeds = {i: (i % 5) * 1000 for i in range(14)}  # clusters of near-ids
    rows = [(i, encode_bmp(_px(s))) for i, s in seeds.items()]
    store_rows = [r for r in rows if r[0] % 3 != 0]
    batch_rows = [r for r in rows if r[0] % 3 == 0]

    st = _store(spark, tmp_path)
    s1 = st.ingest(_media(spark, store_rows), "r1")
    unpersist_deps(s1)
    s2 = st.ingest(_media(spark, batch_rows), "r2")
    got = sorted(r.media_id for r in s2.collect())
    unpersist_deps(s2)

    # full rerun: pairs over ALL images, store beats batch, min-id wins
    # within the batch
    fps = {
        r.media_id: r.dhash
        for r in image_hashes(_media(spark, rows)).collect()
    }
    batch_ids = sorted(i for i, _ in batch_rows)
    store_ids = {i for i, _ in store_rows}
    dropped = set()
    for x in batch_ids:
        for y, fy in fps.items():
            if y == x:
                continue
            ham = bin(fps[x] ^ fy).count("1")
            if ham <= 3 and (y in store_ids or (y in batch_ids and y < x)):
                dropped.add(x)
                break
    want = sorted(set(batch_ids) - dropped)
    assert got == want and len(want) < len(batch_ids)


def test_batch_drops_join_matches_operator(spark):
    """image_hash_batch_drops without a store == the intra-batch
    precedence rule alone."""
    fps = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5 ^ (1 << 40)), (4, 0x1111222233334444)],
        "media_id long, dhash long",
    )
    got = sorted(
        r.media_id
        for r in image_hash_batch_drops(None, fps, max_hamming=3).collect()
    )
    # 2 dups 1; 3 within hamming 1 of 1/2; 4 shares no 16-bit block with
    # any of them (never a candidate) and survives
    assert got == [2, 3]


def test_retire_and_config_guard(spark, tmp_path):
    st = _store(spark, tmp_path)
    s = st.ingest(
        _media(spark, [(i, encode_bmp(_px(i * 99))) for i in range(0, 40, 10)]),
        "r1",
    )
    unpersist_deps(s)
    st.retire_ids_below(16)
    left = {r.media_id for r in st.store.read(ImageHashStore.FPS).collect()}
    assert left == {20, 30}
    with pytest.raises(ValueError, match="layout"):
        ImageHashStore(
            spark, str(tmp_path / "imgs"), fp_bucket_width=8, n_buckets=16
        )


def test_store_band_scan_is_bucket_pruned(spark, tmp_path):
    """r13 scale fix: the ingest's store-side candidate scan must read
    only the batch's band buckets — corrupt every band file of buckets
    the batch does NOT touch and the ingest still answers correctly."""
    import glob
    import os

    from metadata_ingestion_framework_spark.operators.incremental import (
        image_fp_bands,
    )

    st = ImageHashStore(
        spark, str(tmp_path / "imgs"), fp_bucket_width=8, n_buckets=8,
        n_band_buckets=16,
    )
    s1 = st.ingest(
        _media(spark, [(i, encode_bmp(_px(i * 97))) for i in range(12)]),
        "r1",
    )
    unpersist_deps(s1)
    # 51 needs a different SHAPE: same-dims _px images share the gradient
    # structure, so their dHashes coincide regardless of seed
    batch = _media(
        spark,
        [(50, encode_bmp(_px(3 * 97))), (51, encode_bmp(_px(777, 12, 10)))],
    )
    fps = {
        r.media_id: r.dhash
        for r in __import__(
            "metadata_ingestion_framework_spark.operators.multimodal",
            fromlist=["image_hashes"],
        ).image_hashes(batch).collect()
    }
    fp_df = spark.createDataFrame(
        [(k, v) for k, v in fps.items()], "media_id long, dhash long"
    )
    probed = {
        r.bucket
        for r in image_fp_bands(fp_df, n_band_buckets=16)
        .select("bucket").distinct().collect()
    }
    unprobed = set(range(16)) - probed
    assert unprobed, "batch should not touch every band bucket"
    p = st.store._version_path(
        ImageHashStore.BANDS, st.store.current_version(ImageHashStore.BANDS)
    )
    n_corrupted = 0
    # r14 layout: bands nest under fp_bucket=*/bucket=* — corrupt ONE
    # unprobed band bucket across all id-range dirs (the highest, so a
    # lexicographically-earlier healthy file still serves the schema
    # footer — the r13 corrupt-only-one trap)
    for bkt in sorted(unprobed, reverse=True):
        files = glob.glob(
            os.path.join(p, "fp_bucket=*", f"bucket={bkt}", "*.parquet")
        )
        if not files:
            continue
        for f in files:
            with open(f, "wb") as fh:
                fh.write(b"corrupt")
        n_corrupted = len(files)
        break
    assert n_corrupted > 0
    s2 = st.ingest(batch, "r2")
    # 50 is a near/exact dup of stored 3*97 image -> dropped; 51 new
    assert sorted(r.media_id for r in s2.collect()) == [51]
    unpersist_deps(s2)


def test_reingest_vacates_band_rows(spark, tmp_path):
    """r14 layout: a re-ingested id's OLD band rows live in its own
    fp_bucket, which the ingest rewrites — so the band table equals a
    fresh derivation from fps IMMEDIATELY after every ingest, no
    rebuild needed (the pre-r14 hash-keyed layout left candidates-only
    ghosts until rebuild_bands). The drop decisions were always
    ghost-safe (verify reads fresh fps); this pins the stronger
    freshness invariant the id-range layout buys."""
    st = ImageHashStore(
        spark, str(tmp_path / "imgs"), fp_bucket_width=8, n_buckets=8,
        n_band_buckets=16,
    )
    s1 = st.ingest(
        _media(spark, [(0, encode_bmp(_px(11))), (1, encode_bmp(_px(500)))]),
        "r1",
    )
    unpersist_deps(s1)
    # re-ingest id 0 with a completely different image
    s2 = st.ingest(_media(spark, [(0, encode_bmp(_px(900)))]), "r2")
    assert [r.media_id for r in s2.collect()] == [0]
    unpersist_deps(s2)
    # a new image matching id 0's OLD pixels must SURVIVE (the old
    # fingerprint vacated from fps AND from bands)
    s3 = st.ingest(_media(spark, [(7, encode_bmp(_px(11)))]), "r3")
    assert [r.media_id for r in s3.collect()] == [7]
    unpersist_deps(s3)
    # bands == fresh derivation WITHOUT any rebuild (column order
    # normalized: a partitioned read appends partition cols last)
    cols = ["media_id", "blk", "blk_val", "fp_bucket", "bucket"]
    got = sorted(
        map(tuple, st.store.read(ImageHashStore.BANDS).select(*cols).collect())
    )
    want = sorted(
        map(
            tuple,
            st._band_rows(st.store.read(ImageHashStore.FPS))
            .select(*cols)
            .collect(),
        )
    )
    assert got == want


def test_null_id_rows_always_survive(spark, tmp_path):
    """NULL is not an identity (r14 ADVICE): a NULL-id batch row never
    joins on id — the band-join precedence predicates are NULL and the
    fingerprint re-attach equi-joins never match — so NULL-id rows
    survive intra-batch AND against an exact stored duplicate (the
    dedup-family NULL-key contract shared with minhash_batch_drops)."""
    st = _store(spark, tmp_path)
    s1 = st.ingest(_media(spark, [(3, encode_bmp(_px(300)))]), "r1")
    unpersist_deps(s1)
    batch = _media(spark, [
        (None, encode_bmp(_px(300))),   # exact dup of stored 3, NULL id
        (None, encode_bmp(_px(300))),   # and of its NULL-id twin
        (30, encode_bmp(_px(300))),     # non-NULL control: drops
    ])
    s2 = st.ingest(batch, "r2")
    out = [r.media_id for r in s2.collect()]
    unpersist_deps(s2)
    assert sorted(out, key=lambda v: (v is not None, v)) == [None, None]


def test_ingest_unpersists_on_store_write_failure(spark, tmp_path):
    """Persist hygiene (r14 ADVICE): a failed store write inside ingest
    must not leak the fps/drops cached blocks in a long-lived session —
    the Bm25Index.append try/finally convention."""
    st = _store(spark, tmp_path)
    before = set(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    boom = RuntimeError("disk full")

    def _fail_write(*a, **k):
        raise boom

    st.store.write = _fail_write
    with pytest.raises(RuntimeError, match="disk full"):
        st.ingest(_media(spark, [(0, encode_bmp(_px(1)))]), "r1")
    after = set(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    assert after == before


# --- r14 FRAMES face (VERDICT r13 item 3) ------------------------------

from metadata_ingestion_framework_spark.operators.codecs import encode_bmv  # noqa: E402
from metadata_ingestion_framework_spark.operators.incremental import (  # noqa: E402
    image_fp_bands,
    media_frame_batch_drops,
)


def _vmedia(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, duration_ms int"
    )


def _vstore(spark, tmp_path, name="vids", f=1):
    return ImageHashStore(
        spark, str(tmp_path / name), fp_bucket_width=8, n_buckets=8,
        frames=True, every_ms=40, min_matching_frames=f,
    )


# distinct frames need different DIMENSIONS (the r13 fixture trap: the
# gradient is dim-driven, so same-dims frames share dHash across seeds)
_FA = encode_bmp(_px(7, 16, 16))
_FB = encode_bmp(_px(1, 12, 12))
_FC = encode_bmp(_px(2, 10, 14))
_FD = encode_bmp(_px(3, 14, 10))
_FE = encode_bmp(_px(4, 9, 9))
_FF = encode_bmp(_px(5, 11, 13))
_FG = encode_bmp(_px(6, 13, 11))
_FX = encode_bmp(_px(8, 15, 9))


def test_frames_two_run_lifecycle(spark, tmp_path):
    """Videos and images dedup in the SAME store: a new video sharing a
    frame with a stored video drops, an image matching a stored video
    frame drops, fresh media survive; re-ingest vacates the whole
    video's frame rows."""
    st = _vstore(spark, tmp_path)
    run1 = _vmedia(spark, [
        (1, "video", encode_bmv([_FA, _FB], 40), 80),
        (2, "video", encode_bmv([_FC, _FD], 40), 80),
    ])
    s1 = st.ingest(run1, "r1")
    assert sorted(r.media_id for r in s1.collect()) == [1, 2]
    unpersist_deps(s1)
    fps = st.store.read(ImageHashStore.FPS)
    assert fps.count() == 4  # one row per (video, frame)

    run2 = _vmedia(spark, [
        (10, "video", encode_bmv([_FE, _FA], 40), 80),  # shares A w/ stored 1
        (11, "video", encode_bmv([_FF, _FG], 40), 80),  # fresh
        (12, "image", _FC, 0),                          # matches stored v2 frame
        (13, "image", _FX, 0),                          # fresh image
        (14, "video", b"not a container", 40),          # undecodable: survives
    ])
    s2 = st.ingest(run2, "r2")
    assert sorted(r.media_id for r in s2.collect()) == [11, 13, 14]
    unpersist_deps(s2)
    stored = {
        (r.media_id, r.frame_ts)
        for r in st.store.read(ImageHashStore.FPS).collect()
    }
    # dropped media keep fingerprints; undecodable never stored
    assert stored == {
        (1, 0), (1, 40), (2, 0), (2, 40),
        (10, 0), (10, 40), (11, 0), (11, 40), (12, 0), (13, 0),
    }


def test_frames_min_matching_threshold(spark, tmp_path):
    """F=2: one shared frame is not enough to drop; two are."""
    st = _vstore(spark, tmp_path, f=2)
    s1 = st.ingest(
        _vmedia(spark, [(1, "video", encode_bmv([_FA, _FB], 40), 80)]), "r1"
    )
    unpersist_deps(s1)
    run2 = _vmedia(spark, [
        (20, "video", encode_bmv([_FA, _FX], 40), 80),  # 1 shared frame
        (21, "video", encode_bmv([_FB, _FA], 40), 80),  # 2 shared frames
    ])
    s2 = st.ingest(run2, "r2")
    assert sorted(r.media_id for r in s2.collect()) == [20]
    unpersist_deps(s2)


def test_frames_reingest_vacates_old_frames(spark, tmp_path):
    """Re-ingesting a video id with a different cut must leave NO stale
    frame rows (anti-join vacate, not SCD1-per-frame)."""
    st = _vstore(spark, tmp_path)
    s1 = st.ingest(
        _vmedia(spark, [(1, "video", encode_bmv([_FA, _FB, _FC], 40), 120)]),
        "r1",
    )
    unpersist_deps(s1)
    s2 = st.ingest(
        _vmedia(spark, [(1, "video", encode_bmv([_FD], 40), 40)]), "r2"
    )
    unpersist_deps(s2)
    stored = {
        (r.media_id, r.frame_ts)
        for r in st.store.read(ImageHashStore.FPS).collect()
    }
    assert stored == {(1, 0)}


def test_frames_config_guard(spark, tmp_path):
    """A frames store reopened as an image store (or with a different
    every_ms) must raise — the fingerprint granularities are
    incomparable."""
    _vstore(spark, tmp_path, "g")
    with pytest.raises(ValueError):
        ImageHashStore(
            spark, str(tmp_path / "g"), fp_bucket_width=8, n_buckets=8
        )
    with pytest.raises(ValueError):
        ImageHashStore(
            spark, str(tmp_path / "g"), fp_bucket_width=8, n_buckets=8,
            frames=True, every_ms=80,
        )


def test_frame_drops_reduce_to_image_rule(spark):
    """With single-frame fingerprints (ts=0) and min_matching_frames=1
    the frame rule is EXACTLY the image rule — same drop set on the
    same fingerprints."""
    from pyspark.sql import functions as F

    from metadata_ingestion_framework_spark.operators.multimodal import (
        image_hashes,
    )

    mk = lambda rows: image_hashes(_media(spark, rows)).withColumn(
        "frame_ts", F.lit(0).cast("int")
    )
    store_fps = mk([(i, encode_bmp(_px(i * 100))) for i in range(4)]).persist()
    batch_fps = mk([
        (10, encode_bmp(_px(300))),   # dup of stored 3
        (11, encode_bmp(_px(9000))),  # fresh
        (12, encode_bmp(_px(9000))),  # intra dup of 11
    ]).persist()
    img = {
        r.media_id
        for r in image_hash_batch_drops(
            store_fps, batch_fps, "media_id", "dhash"
        ).collect()
    }
    frm = {
        r.media_id
        for r in media_frame_batch_drops(
            store_fps, batch_fps, "media_id", "dhash", min_matching_frames=1
        ).collect()
    }
    store_fps.unpersist()
    batch_fps.unpersist()
    assert frm == img == {10, 12}


def test_frames_null_kind_is_a_still(spark, tmp_path):
    """A NULL-kind row payload-sniffs as a still image (plain
    kind != 'video' would NULL out and silently drop it from the
    fingerprint pass entirely)."""
    st = _vstore(spark, tmp_path)
    s1 = st.ingest(_vmedia(spark, [(1, None, _FA, 0)]), "r1")
    assert [r.media_id for r in s1.collect()] == [1]
    unpersist_deps(s1)
    assert {
        (r.media_id, r.frame_ts)
        for r in st.store.read(ImageHashStore.FPS).collect()
    } == {(1, 0)}
    # and it DEDUPS like a still: an exact video-frame match drops
    s2 = st.ingest(
        _vmedia(spark, [(2, "video", encode_bmv([_FA], 40), 40)]), "r2"
    )
    assert [r.media_id for r in s2.collect()] == []
    unpersist_deps(s2)


def test_frames_duplicate_batch_id_collapses(spark, tmp_path):
    """A batch carrying the same media_id twice must store ONE fp row per
    (id, frame_ts) — the frames-face twin of the image face's scd1-merge
    duplicate-id tolerance (r14 ADVICE: duplicate fp rows inflate
    media_frame_batch_drops' match counts multiplicatively through the
    (id, ts) re-attach joins, so min_matching_frames can be met
    spuriously)."""
    st = _vstore(spark, tmp_path, f=2)
    dup = _vmedia(spark, [
        (1, "video", encode_bmv([_FA, _FB], 40), 80),
        (1, "video", encode_bmv([_FA, _FB], 40), 80),  # same id twice
    ])
    s1 = st.ingest(dup, "r1")
    unpersist_deps(s1)
    fps = st.store.read(ImageHashStore.FPS).collect()
    assert sorted((r.media_id, r.frame_ts) for r in fps) == [(1, 0), (1, 40)]
    # F=2 still means two DISTINCT matching frames: a one-shared-frame
    # probe must survive (duplicate fp rows would have double-counted it)
    s2 = st.ingest(
        _vmedia(spark, [(2, "video", encode_bmv([_FA, _FX], 40), 80)]), "r2"
    )
    assert [r.media_id for r in s2.collect()] == [2]
    unpersist_deps(s2)


def test_frames_requires_integral_id(spark, tmp_path):
    """frames=True with a non-integral id must fail with the contract
    error at ingest, not deep inside sample_frames' Arrow stage (its
    mapInPandas schema hardcodes `media_id long`)."""
    st = ImageHashStore(
        spark, str(tmp_path / "sid"), id_col="mid",
        fp_bucket_width=8, n_buckets=8, frames=True, every_ms=40,
    )
    batch = spark.createDataFrame(
        [("a", "video", encode_bmv([_FA], 40), 40)],
        "mid string, kind string, payload binary, duration_ms int",
    )
    with pytest.raises(ValueError, match="integral"):
        st.ingest(batch, "r1")


def test_band_layout_migration(spark, tmp_path):
    """A pre-r14 store (config missing band_layout, bands under the old
    single-level hash layout) migrates in place on reopen: bands are
    rebuilt from fps under (fp_bucket, bucket) and the config is
    stamped — while any OTHER config mismatch still raises."""
    import json as _json
    import os as _os

    st = _store(spark, tmp_path, "mig")
    s1 = st.ingest(
        _media(spark, [(i, encode_bmp(_px(i * 100))) for i in range(4)]),
        "r1",
    )
    unpersist_deps(s1)
    root = str(tmp_path / "mig")
    cfg_path = _os.path.join(root, "_config.json")
    with open(cfg_path) as f:
        cfg = _json.load(f)
    old = {k: v for k, v in cfg.items() if k != "band_layout"}
    with open(cfg_path, "w") as f:
        _json.dump(old, f)
    # emulate the pre-r14 band table: single-level hash layout
    st.store.write(
        st._band_rows(st.store.read(ImageHashStore.FPS)).drop("fp_bucket"),
        ImageHashStore.BANDS, partition_by=["bucket"],
    )

    st2 = _store(spark, tmp_path, "mig")  # must NOT raise: migrates
    with open(cfg_path) as f:
        assert _json.load(f)["band_layout"] == "fp_bucket/bucket"
    bands = st2.store.read(ImageHashStore.BANDS)
    assert "fp_bucket" in bands.columns
    # migrated store keeps working: an exact dup of stored id 3 drops
    s2 = st2.ingest(
        _media(spark, [(20, encode_bmp(_px(300)))]), "r2"
    )
    assert [r.media_id for r in s2.collect()] == []
    unpersist_deps(s2)

    # a REAL mismatch (different blocks) still fails loudly
    with pytest.raises(ValueError, match="different layout"):
        ImageHashStore(
            spark, root, fp_bucket_width=8, n_buckets=8, blocks=8
        )
