"""Incremental perceptual audio dedup store (operators/incremental.py::
AudioHashStore, r14): the ImageHashStore machinery with the audio
fingerprint kernel — two-run lifecycle, amplitude-invariant drops,
replay safety, retention, and the cross-face config guard."""

from __future__ import annotations

import numpy as np
import pytest

from metadata_ingestion_framework_spark.operators.codecs import encode_wav
from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps
from metadata_ingestion_framework_spark.operators.incremental import (
    AudioHashStore,
    ImageHashStore,
)


def _wave(seed, n=520):
    i = np.arange(n)
    return (((seed * 31 + i * 37) % 4096) - 2048).astype(np.int16) * 8


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def _store(spark, tmp_path, name="aud"):
    return AudioHashStore(
        spark, str(tmp_path / name), fp_bucket_width=8, n_buckets=8
    )


def test_two_run_lifecycle(spark, tmp_path):
    st = _store(spark, tmp_path)
    # distinct clips need different DURATIONS (the media fixture rule)
    run1 = _media(
        spark, [(i, encode_wav(_wave(i, 256 + 31 * i))) for i in range(4)]
    )
    s1 = st.ingest(run1, "r1")
    assert sorted(r.media_id for r in s1.collect()) == [0, 1, 2, 3]
    unpersist_deps(s1)

    quiet = (_wave(2, 256 + 31 * 2) // 4).astype(np.int16)  # vol-scaled copy of 2
    run2 = _media(spark, [
        (20, encode_wav(_wave(3, 256 + 31 * 3))),  # exact dup of stored 3
        (21, encode_wav(quiet)),                   # amplitude-invariant dup of 2
        (22, encode_wav(_wave(9, 700))),           # intra pair: 22 < 23 wins
        (23, encode_wav(_wave(9, 700))),
        (24, encode_wav(_wave(5, 600))),           # fresh
        (25, b"not audio"),                        # undecodable: survives
    ])
    s2 = st.ingest(run2, "r2")
    assert sorted(r.media_id for r in s2.collect()) == [22, 24, 25]
    unpersist_deps(s2)
    stored = {r.media_id for r in st.store.read(AudioHashStore.FPS).collect()}
    assert stored == {0, 1, 2, 3, 20, 21, 22, 23, 24}


def test_replay_and_retention(spark, tmp_path):
    st = _store(spark, tmp_path)
    batch = _media(
        spark, [(i, encode_wav(_wave(i, 300 + 17 * i))) for i in range(4)]
    )
    s1 = st.ingest(batch, "r1")
    first = sorted(r.media_id for r in s1.collect())
    unpersist_deps(s1)
    s2 = st.ingest(batch, "r2")  # re-delivery must not self-collide
    assert sorted(r.media_id for r in s2.collect()) == first
    unpersist_deps(s2)
    st.retire_ids_below(2)
    stored = {r.media_id for r in st.store.read(AudioHashStore.FPS).collect()}
    assert stored == {2, 3}


def test_cross_face_config_guard(spark, tmp_path):
    _store(spark, tmp_path, "g")
    with pytest.raises(ValueError):
        ImageHashStore(
            spark, str(tmp_path / "g"), fp_bucket_width=8, n_buckets=8
        )
    with pytest.raises(ValueError):
        AudioHashStore(spark, str(tmp_path / "x"), frames=True)
