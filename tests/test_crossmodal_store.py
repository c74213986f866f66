"""CrossModalPairStore (operators/incremental.py, r16 — VERDICT r15
item 4): LAION-rule (caption, image) pair dedup ACROSS runs, composed
from ImageHashStore + MinhashSignatureStore. Lifecycle: cross-run drops
in each modality, vacate on re-ingest, run-ledger idempotence, replay
safety, and drops==pairs-loser consistency with the sub-stores."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.codecs import encode_bmp
from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps
from metadata_ingestion_framework_spark.operators.incremental import (
    CrossModalPairStore,
)

CAP1 = "a photo of a red fox jumping over the lazy dog"
CAP2 = "completely different words about sunsets on mars tonight"
CAP3 = "yet another unique caption describing a mountain lake"


def _px(seed, h=16, w=16):
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    return ((seed * 7 + y * 13 + x * 17 + c * 29) % 256).astype(np.uint8)


def _near(seed):
    p = _px(seed)
    p[0:2, 0:2, :] = 255
    return p


def _pairs(spark, rows):
    return spark.createDataFrame(
        [(i, cap, encode_bmp(img)) for i, cap, img in rows],
        "doc_id long, text string, payload binary",
    )


def _store(spark, tmp_path, name="xm"):
    return CrossModalPairStore(
        spark, str(tmp_path / name), bucket_width=8, n_buckets=8
    )


def _decisions(out):
    rows = {
        (r.id_a, r.id_b): (r.text_dup, r.image_dup) for r in out.collect()
    }
    unpersist_deps(out)
    return rows


def test_two_run_modality_flags(spark, tmp_path):
    st = _store(spark, tmp_path)
    r1 = _pairs(spark, [
        (0, CAP1, _px(100)),
        (1, CAP2, _px(200)),
    ])
    d1 = _decisions(st.ingest(r1, "r1"))
    assert d1 == {}  # nothing collides in run 1

    r2 = _pairs(spark, [
        (10, CAP1, _px(900)),       # caption dup of stored 0, new image
        (11, CAP3, _near(200)),     # image near-dup of stored 1, new text
        (12, CAP2, _px(100)),       # BOTH: caption of 1, image of 0
        (13, CAP3, _px(990)),       # intra-batch: caption dup of 11
        (14, "totally novel words here now", _px(950)),  # clean
    ])
    d2 = _decisions(st.ingest(r2, "r2"))
    assert d2[(0, 10)] == (True, False)
    assert d2[(1, 11)] == (False, True)
    assert d2[(0, 12)] == (False, True) and d2[(1, 12)] == (True, False)
    assert d2[(11, 13)] == (True, False)
    assert not any(14 in k for k in d2)


def test_reingest_vacates_old_state(spark, tmp_path):
    """Current-corpus semantics through both faces: after doc 0 is
    re-ingested with NEW caption+image, a later copy of its OLD caption
    and OLD image must NOT pair with 0."""
    st = _store(spark, tmp_path)
    _decisions(st.ingest(_pairs(spark, [(0, CAP1, _px(100))]), "r1"))
    _decisions(st.ingest(_pairs(spark, [(0, CAP3, _px(500))]), "r2"))
    d = _decisions(
        st.ingest(_pairs(spark, [(20, CAP1, _px(100))]), "r3")
    )
    assert d == {}
    # and the CURRENT state still matches
    d = _decisions(
        st.ingest(_pairs(spark, [(21, CAP3, _px(500))]), "r4")
    )
    assert d == {(0, 21): (True, True)}


def test_ledger_idempotent_and_replay_safe(spark, tmp_path):
    st = _store(spark, tmp_path)
    batch = _pairs(spark, [(0, CAP1, _px(100)), (1, CAP2, _px(200))])
    d1 = _decisions(st.ingest(batch, "r1"))
    assert st.ingest(batch, "r1") is None  # composite ledger no-op
    # replay under a NEW run id: batch ids excluded from the store side
    # on both faces — must not self-collide
    d2 = _decisions(st.ingest(batch, "r2"))
    assert d1 == d2 == {}


def test_decisions_match_sub_store_drop_rule(spark, tmp_path):
    """The pairs' loser set per modality == what each sub-store would
    drop (the pairs/drops wrapper contract, end to end through real
    store state)."""
    st = _store(spark, tmp_path)
    _decisions(
        st.ingest(
            _pairs(spark, [(0, CAP1, _px(100)), (1, CAP2, _px(200))]),
            "r1",
        )
    )
    r2 = _pairs(spark, [
        (10, CAP1, _px(900)),
        (11, CAP3, _near(200)),
        (12, CAP1, _px(910)),   # caption dup of stored 0 AND batch 10
    ])
    d = _decisions(st.ingest(r2, "r2"))
    text_losers = {
        max(a, b) if (a >= 10 and b >= 10) else (a if a >= 10 else b)
        for (a, b), (t, _i) in d.items() if t
    }
    image_losers = {
        max(a, b) if (a >= 10 and b >= 10) else (a if a >= 10 else b)
        for (a, b), (_t, i) in d.items() if i
    }
    assert text_losers == {10, 12} and image_losers == {11}
    # survivors implied by the sub-stores: fps/sigs stored for ALL batch
    # ids (dropped docs keep fingerprints — the family rule)
    fps_ids = {
        r.doc_id for r in st.img.store.read(st.img.FPS).collect()
    }
    sig_ids = {
        r.doc_id for r in st.txt.store.read(st.txt.SIGS).collect()
    }
    assert {10, 11, 12} <= fps_ids and {10, 11, 12} <= sig_ids


def test_retention_delegates_to_both_faces(spark, tmp_path):
    st = _store(spark, tmp_path)
    _decisions(
        st.ingest(
            _pairs(spark, [(0, CAP1, _px(100)), (40, CAP2, _px(200))]),
            "r1",
        )
    )
    st.retire_ids_below(32)
    fps_ids = {r.doc_id for r in st.img.store.read(st.img.FPS).collect()}
    sig_ids = {r.doc_id for r in st.txt.store.read(st.txt.SIGS).collect()}
    assert fps_ids == {40} and sig_ids == {40}
    # expired state no longer suppresses
    d = _decisions(st.ingest(_pairs(spark, [(50, CAP1, _px(100))]), "r2"))
    assert d == {}


def test_clip_gate_dirty_pair_contract(spark):
    """clip_score_gate (r18, VERDICT r17 item 3) NULL contract: either
    vector NULL, an empty vector, or a dim mismatch carries NULL score
    AND NULL verdict; a zero-norm vector scores 0.0 and gates False;
    identical vectors score 1.0 and gate True; negated vectors -1.0."""
    from metadata_ingestion_framework_spark.operators.multimodal import (
        clip_score_gate,
    )

    v = [1.0, 2.0, 2.0]
    rows = [
        (0, v, v),                      # aligned, cos 1.0
        (1, v, [-1.0, -2.0, -2.0]),     # cos -1.0, rejected
        (2, None, v),                   # caption NULL -> NULL verdict
        (3, v, None),                   # image NULL -> NULL verdict
        (4, v, [1.0, 2.0]),             # dim mismatch -> NULL verdict
        (5, [], []),                    # empty -> NULL verdict
        (6, v, [0.0, 0.0, 0.0]),        # zero norm -> 0.0, False
    ]
    df = spark.createDataFrame(
        rows, "pair_id int, cap array<float>, img array<float>"
    )
    got = {
        r.pair_id: (r.clip_score, r.aligned)
        for r in clip_score_gate(df, "cap", "img", threshold=0.28).collect()
    }
    assert got == {
        0: (1.0, True),
        1: (-1.0, False),
        2: (None, None),
        3: (None, None),
        4: (None, None),
        5: (None, None),
        6: (0.0, False),
    }


def test_clip_gate_composes_ahead_of_pair_store(spark, tmp_path):
    """The DataComp composition: the gate filters MISALIGNED pairs out
    of the batch BEFORE CrossModalPairStore.ingest, so pair dedup only
    ever sees aligned pairs — a duplicate caption on a rejected pair
    must not drop the aligned twin."""
    from metadata_ingestion_framework_spark.operators.multimodal import (
        clip_score_gate,
    )

    # doc 0/1 share a caption; doc 1 is misaligned (negated vector) so
    # the gate removes it and doc 0 survives ingest undropped
    v = [0.5, 1.0, 0.25, 2.0]
    neg = [-x for x in v]
    rows = [
        (0, CAP1, _px(100), v, v),
        (1, CAP1, _px(200), v, neg),
        (2, CAP2, _px(300), v, v),
    ]
    batch = spark.createDataFrame(
        [(i, c, encode_bmp(im), cv, iv) for i, c, im, cv, iv in rows],
        "doc_id long, text string, payload binary, "
        "cap_vec array<float>, img_vec array<float>",
    )
    gated = clip_score_gate(batch, "cap_vec", "img_vec", threshold=0.28)
    aligned = gated.filter(F.col("aligned")).select(
        "doc_id", "text", "payload"
    )
    st = _store(spark, tmp_path, "xm_gated")
    decisions = st.ingest(aligned, "r1")
    pairs = {(r.id_a, r.id_b) for r in decisions.collect()}
    unpersist_deps(decisions)
    assert pairs == set()  # the caption dup left with the gated doc 1
    survivors = {
        r.doc_id for r in st.txt.store.read(st.txt.SIGS)
        .select("doc_id").collect()
    }
    assert survivors == {0, 2}


def test_clip_frac_gate_keep_rule_and_null_exclusion(spark):
    """clip_frac_gate (r18): keep = rank <= floor(frac*n_scored+0.5)
    over SCORABLE pairs only — NULL pairs neither compete nor count and
    keep the NULL verdict; ties break on the id."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.multimodal import (
        clip_frac_gate,
    )

    v = [1.0, 0.0]
    rows = [
        (0, v, [1.0, 0.0]),    # cos 1.0
        (1, v, [1.0, 0.0]),    # cos 1.0 (tie with 0 -> id breaks)
        (2, v, [1.0, 1.0]),    # cos ~0.707107
        (3, v, [0.0, 1.0]),    # cos 0.0
        (4, v, [-1.0, 0.0]),   # cos -1.0
        (5, None, v),          # unscorable -> excluded from n
        (6, v, [1.0]),         # dim mismatch -> excluded
    ]
    df = spark.createDataFrame(
        rows, "pair_id int, cap array<float>, img array<float>"
    )
    out = clip_frac_gate(
        df, "cap", "img", ["pair_id"], keep_frac=0.5
    )
    got = {
        r.pair_id: (r.clip_score, r.aligned) for r in out.collect()
    }
    unpersist_deps(out)
    # n_scored = 5, floor(0.5*5+0.5) = 3 -> ranks 1..3 keep:
    # pair 0 (1.0), pair 1 (1.0, id tiebreak), pair 2 (0.707107)
    assert got[0] == (1.0, True)
    assert got[1] == (1.0, True)
    assert got[2] == (0.707107, True)
    assert got[3] == (0.0, False)
    assert got[4] == (-1.0, False)
    assert got[5] == (None, None)
    assert got[6] == (None, None)
