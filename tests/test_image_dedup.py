"""Perceptual image dedup (multimodal.py::image_hashes /
image_near_duplicates, r13): hand-checked hash bit patterns, exact
duplicate and near-duplicate pair detection via the shared Hamming
banding, and the undecodable-payload drop rule."""

from __future__ import annotations

import numpy as np
import pytest

from metadata_ingestion_framework_spark.operators.codecs import encode_bmp
from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps
from metadata_ingestion_framework_spark.operators.multimodal import (
    image_hashes,
    image_near_duplicates,
)


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def _px(seed, h=16, w=16):
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    return ((seed * 7 + y * 13 + x * 17 + c * 29) % 256).astype(np.uint8)


def test_hand_checked_bit_patterns(spark):
    """A strict left-to-right gradient sets every dHash bit (int64 -1,
    proving the two's-complement packing includes bit 63); a uniform
    image sets none and aHash's strict 'above mean' is all-zero too."""
    grad = np.tile(
        (np.arange(16, dtype=np.uint8) * 10)[None, :, None], (16, 1, 3)
    )
    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    out = {
        r.media_id: (r.dhash, r.ahash)
        for r in image_hashes(
            _media(spark, [(1, encode_bmp(grad)), (2, encode_bmp(flat))])
        ).collect()
    }
    assert out[1][0] == -1  # all 64 comparison bits set
    assert out[2] == (0, 0)  # uniform: no bit strictly above neighbor/mean


def test_exact_and_near_duplicates_pair(spark):
    """An identical copy pairs at hamming 0; a copy with one grid cell
    perturbed pairs at small hamming; an unrelated image does not pair."""
    base = _px(3)
    near = base.copy()
    near[0:2, 0:2, :] = 255  # flips a couple of grid comparisons
    rows = [
        (10, encode_bmp(base)),
        (11, encode_bmp(base)),          # exact dup
        (12, encode_bmp(near)),          # near dup
        (13, encode_bmp(_px(40, 12, 12))),  # unrelated
    ]
    out = image_near_duplicates(_media(spark, rows), max_hamming=3)
    pairs = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    unpersist_deps(out)
    assert pairs[(10, 11)] == 0
    assert (10, 12) in pairs and 1 <= pairs[(10, 12)] <= 3
    assert all(13 not in p for p in pairs)


def test_undecodable_payloads_drop(spark):
    rows = [
        (1, encode_bmp(_px(5))),
        (2, b"not an image at all"),
        (3, None),
        (4, b"BM"),  # truncated header
    ]
    out = image_hashes(_media(spark, rows)).collect()
    assert {r.media_id for r in out} == {1}


def test_hashes_are_deterministic_across_partitionings(spark):
    rows = [(i, encode_bmp(_px(i, 8 + i % 5, 8 + i % 7))) for i in range(20)]
    a = sorted(map(tuple, image_hashes(_media(spark, rows)).collect()))
    b = sorted(
        map(
            tuple,
            image_hashes(_media(spark, rows).repartition(7)).collect(),
        )
    )
    assert a == b and len(a) == 20


def test_frame_level_video_dedup_composition(spark):
    """Frame-level perceptual video dedup is a two-operator composition:
    sample_frames (real BMV frame extraction) -> image_hashes over the
    frame payloads -> hamming_banded_pairs. Two videos sharing a frame
    pair exactly on that frame; unrelated frames do not pair."""
    from pyspark.sql import functions as F

    from metadata_ingestion_framework_spark.operators.codecs import encode_bmv
    from metadata_ingestion_framework_spark.operators.dedup import (
        hamming_banded_pairs,
    )
    from metadata_ingestion_framework_spark.operators.multimodal import (
        sample_frames,
    )

    shared = encode_bmp(_px(7))
    v1 = encode_bmv([shared, encode_bmp(_px(100))], frame_ms=40)
    v2 = encode_bmv([encode_bmp(_px(200)), shared], frame_ms=40)
    media = spark.createDataFrame(
        [(1, "video", v1, 80), (2, "video", v2, 80)],
        "media_id long, kind string, payload binary, duration_ms int",
    )
    frames = sample_frames(media, every_ms=40).withColumn(
        "frame_id", F.col("media_id") * 1000 + F.col("frame_ts")
    )
    fps = image_hashes(frames, payload_col="frame", id_col="frame_id")
    fps = fps.persist()
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_banded_pairs(fps, "dhash", "frame_id").collect()
    }
    fps.unpersist()
    # video 1 frame 0 (id 1000) == video 2 frame 1 (id 2040), hamming 0;
    # no other cross-video pair
    assert pairs.get((1000, 2040)) == 0
    cross = {p for p in pairs if p[0] // 1000 != p[1] // 1000}
    assert cross == {(1000, 2040)}


def test_pigeonhole_guard_semantics(spark):
    """max_hamming above blocks-1 would lose pairs silently — the banding
    only guarantees recall for hamming <= blocks-1. The operator is used
    at the exact setting; verify a hamming-4 pair with 4 blocks CAN be
    missed only if no block matches (construct: flip one bit in each of
    the 4 blocks — no shared block, not a candidate)."""
    base = _px(9)
    h = {
        r.media_id: r.dhash
        for r in image_hashes(_media(spark, [(1, encode_bmp(base))])).collect()
    }
    flipped = h[1] ^ (1 << 0) ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)
    fps = spark.createDataFrame(
        [(1, h[1]), (2, flipped)], "media_id long, dhash long"
    )
    from metadata_ingestion_framework_spark.operators.dedup import (
        hamming_banded_pairs,
    )

    assert (
        hamming_banded_pairs(fps, "dhash", "media_id", max_hamming=4).count()
        == 0
    )
    # one flip in a single block keeps 3 shared blocks -> found
    one = h[1] ^ (1 << 5)
    fps2 = spark.createDataFrame(
        [(1, h[1]), (2, one)], "media_id long, dhash long"
    )
    got = hamming_banded_pairs(fps2, "dhash", "media_id").collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(1, 2, 1)]


def test_video_near_duplicates_operator(spark):
    """r14 (VERDICT r13 item 3): the composition promoted to an operator.
    Videos sharing one frame pair with n_frame_matches=1; sharing two
    frames -> 2; min_matching_frames=2 keeps only the stronger pair;
    best_hamming carries the closest frame distance."""
    from metadata_ingestion_framework_spark.operators.codecs import encode_bmv
    from metadata_ingestion_framework_spark.operators.multimodal import (
        video_near_duplicates,
    )

    fa, fb, fc = encode_bmp(_px(7)), encode_bmp(_px(100)), encode_bmp(_px(9, 12, 12))
    rows = [
        (1, "video", encode_bmv([fa, fb], 40), 80),
        (2, "video", encode_bmv([encode_bmp(_px(200)), fa], 40), 80),   # shares fa
        (3, "video", encode_bmv([fb, fa], 40), 80),                     # shares both
        (4, "video", encode_bmv([fc, fc], 40), 80),                     # unrelated
        (5, "image", encode_bmp(_px(7)), 0),                            # not a video
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, duration_ms int"
    )
    out = video_near_duplicates(media, every_ms=40, max_hamming=3)
    got = {(r.id_a, r.id_b): (r.n_frame_matches, r.best_hamming) for r in out.collect()}
    unpersist_deps(out)
    assert got[(1, 2)] == (1, 0)
    assert got[(1, 3)] == (2, 0)
    assert got[(2, 3)] == (1, 0)
    assert all(4 not in p and 5 not in p for p in got)

    strong = video_near_duplicates(media, every_ms=40, min_matching_frames=2)
    pairs2 = {(r.id_a, r.id_b) for r in strong.collect()}
    unpersist_deps(strong)
    assert pairs2 == {(1, 3)}
