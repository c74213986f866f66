"""Perceptual audio dedup (multimodal.py::audio_hashes /
audio_near_duplicates, r14, VERDICT r13 item 2): hand-checked energy-delta
bit patterns, amplitude invariance, exact/near duplicate pairing via the
shared Hamming banding, and the undecodable-payload drop rule."""

from __future__ import annotations

import numpy as np

from metadata_ingestion_framework_spark.operators.codecs import encode_wav
from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps
from metadata_ingestion_framework_spark.operators.multimodal import (
    audio_hashes,
    audio_near_duplicates,
)


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def _wave(seed, n=520):
    # the synthesize_real_media audio formula shape; distinct test clips
    # need different DURATIONS, not different seeds (the r13 image-fixture
    # trap: same-length clips of this family share energy envelopes)
    i = np.arange(n)
    return (((seed * 31 + i * 37) % 4096) - 2048).astype(np.int16) * 8


def test_hand_checked_bit_patterns(spark):
    """A linear amplitude ramp has strictly rising cell energies — every
    ehash delta bit sets (int64 -1, proving two's-complement packing
    includes bit 63); a constant-amplitude tone has equal cell energies
    (n divisible by both grids) — no strict delta and no strict
    above-mean bit."""
    ramp = (np.arange(1, 651, dtype=np.int64) * 20).astype(np.int16)
    flat = np.full(65 * 64, 1000, dtype=np.int16)
    out = {
        r.media_id: (r.ehash, r.mhash)
        for r in audio_hashes(
            _media(
                spark,
                [(1, encode_wav(ramp)), (2, encode_wav(flat))],
            )
        ).collect()
    }
    assert out[1][0] == -1  # all 64 energy-delta bits set
    assert out[2] == (0, 0)  # equal cells: nothing strictly above
    # python replay of the documented formula, bit for bit
    x = ramp.astype(np.int64)
    n = len(x)
    e = x**2
    e65 = np.zeros(65, dtype=np.int64)
    np.add.at(e65, np.arange(n) * 65 // n, e)
    want = int(
        (
            (e65[1:] > e65[:-1]).astype(np.uint64)
            << np.arange(64, dtype=np.uint64)
        )
        .sum(dtype=np.uint64)
        .astype(np.int64)
    )
    assert out[1][0] == want


def test_amplitude_invariance(spark):
    """Scaling every sample by a constant scales every cell energy by
    its square — strict comparisons unchanged, so a volume-normalized
    copy fingerprints IDENTICALLY (the robustness property the published
    band-energy-sign fingerprint is built on)."""
    base = _wave(3) // 8  # headroom so x4 stays in int16
    out = {
        r.media_id: (r.ehash, r.mhash)
        for r in audio_hashes(
            _media(
                spark,
                [(1, encode_wav(base)), (2, encode_wav(base * 4))],
            )
        ).collect()
    }
    assert out[1] == out[2]


def test_exact_and_near_duplicates_pair(spark):
    """An identical copy pairs at hamming 0; a copy with a short local
    perturbation pairs at small hamming; a different-duration clip does
    not pair."""
    base = _wave(3)
    near = base.copy()
    n = len(base)
    # silence energy cells 10-11 (assignment form: cell c covers
    # [ceil(c*n/65), ceil((c+1)*n/65))) — flips exactly 2 delta bits on
    # this fixture (replayed below, so the magic number is checked)
    near[-(-10 * n // 65):-(-12 * n // 65)] = 0
    rows = [
        (10, encode_wav(base)),
        (11, encode_wav(base)),          # exact dup
        (12, encode_wav(near)),          # near dup
        (13, encode_wav(_wave(3, 700))),  # different duration
    ]
    out = audio_near_duplicates(_media(spark, rows), max_hamming=3)
    pairs = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    unpersist_deps(out)

    def _ebits(x):
        x = x.astype(np.int64)
        m = len(x)
        e65 = np.zeros(65, dtype=np.int64)
        np.add.at(e65, np.arange(m) * 65 // m, x**2)
        return e65[1:] > e65[:-1]

    want = int((_ebits(base) != _ebits(near)).sum())
    assert 1 <= want <= 3  # fixture sanity: the silencing flips 1-3 bits
    assert pairs[(10, 11)] == 0
    assert pairs[(10, 12)] == want
    assert all(13 not in p for p in pairs)


def test_undecodable_payloads_drop(spark):
    rows = [
        (1, encode_wav(_wave(5))),
        (2, b"not audio at all"),
        (3, None),
        (4, b"RIFF"),  # truncated header
        (5, encode_wav(np.array([], dtype=np.int16))),  # zero samples
    ]
    out = audio_hashes(_media(spark, rows)).collect()
    assert {r.media_id for r in out} == {1}


def test_hashes_are_deterministic_across_partitionings(spark):
    rows = [(i, encode_wav(_wave(i, 256 + 13 * i))) for i in range(20)]
    a = sorted(map(tuple, audio_hashes(_media(spark, rows)).collect()))
    b = sorted(
        map(
            tuple,
            audio_hashes(_media(spark, rows).repartition(7)).collect(),
        )
    )
    assert a == b and len(a) == 20
