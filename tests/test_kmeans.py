"""Distributed Lloyd's k-means (operators/kmeans.py) — the trained IVF
coarse quantizer (VERDICT r9 item 1). Covers: determinism, the spherical-
Lloyd monotone-objective theorem, the argmax assignment contract, the
empty-cell carry rule, dirty-row handling, and the payoff — trained
centroids beating random ones on mean recall@k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.kmeans import (
    kmeans_assignments,
    kmeans_fit,
    quantize_vectors,
    unit_vector,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _emb(spark):
    return spark.read.parquet(EMB)


def test_fit_deterministic_and_monotone_objective(spark):
    m1 = kmeans_fit(_emb(spark), dim=64, n_cells=4, n_iters=3,
                    compute_objective=True)
    m2 = kmeans_fit(_emb(spark), dim=64, n_cells=4, n_iters=3)
    # bitwise determinism: exact-integer sums make shuffle order irrelevant
    assert m1.centroids == m2.centroids
    assert m1.unit_centroids == m2.unit_centroids
    # spherical Lloyd: the summed cosine objective never decreases
    # (round(.,9) decimal summation adds <= n*1e-9 slack)
    assert m1.objectives is not None and len(m1.objectives) == 3
    for a, b in zip(m1.objectives, m1.objectives[1:]):
        assert b >= a - 1e-6, f"objective decreased: {m1.objectives}"


def test_assignments_are_argmax_cosine(spark):
    """Every vector's assigned cell maximizes cosine to the unit centroids
    (ties -> first max), verified independently in numpy."""
    import numpy as np

    m = kmeans_fit(_emb(spark), dim=64, n_cells=4, n_iters=2)
    rows = kmeans_assignments(_emb(spark), m).collect()
    vq = {
        r.vec_id: np.array(r.vq, dtype=np.float64)
        for r in quantize_vectors(_emb(spark), dim=64).collect()
    }
    units = np.array(m.unit_centroids, dtype=np.float64)
    for r in rows[:100]:
        scores = vq[r.vec_id] @ units.T
        assert int(np.argmax(scores)) == r.cell
        denom = np.linalg.norm(vq[r.vec_id]) * np.linalg.norm(units[r.cell])
        assert r.cos_sim == pytest.approx(scores[r.cell] / denom, abs=2e-6)


def test_empty_cell_keeps_previous_centroid(spark):
    """Two identical seed vectors: every row lands in the FIRST of the two
    identical cells (first-max tie rule), the other cell goes empty and
    must carry its previous centroid instead of collapsing to NaN."""
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    m = kmeans_fit(df, dim=4, n_cells=2, n_iters=2)
    assert m.centroids[1] == [1.0, 0.0, 0.0, 0.0]  # carried seed, not NaN
    cells = {r.cell for r in kmeans_assignments(df, m).collect()}
    assert cells == {0}


def test_dirty_rows_dropped_from_training(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, None), (3, [1.0, 0.0, 0.5]),
         (4, [0.0, 1.0]), (5, [0.1, 0.9])],
        "vec_id long, embedding array<float>",
    )
    m = kmeans_fit(df, dim=2, n_cells=2, n_iters=2)
    out = kmeans_assignments(df, m)
    assert out.count() == 4  # null + off-dim rows excluded
    assert {r.cell for r in out.collect()} <= {0, 1}


def test_too_few_rows_raises(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="n_cells"):
        kmeans_fit(df, dim=2, n_cells=4, n_iters=1)


def test_sample_limit_bounds_training_set(spark):
    """The 100 TB path: training on an md5-ordered bounded sample is
    deterministic and uses only the sample (different limit -> possibly
    different centroids, same limit -> identical)."""
    emb = _emb(spark)
    a = kmeans_fit(emb, dim=64, n_cells=4, n_iters=2, sample_limit=100)
    b = kmeans_fit(emb, dim=64, n_cells=4, n_iters=2, sample_limit=100)
    assert a.centroids == b.centroids


def test_trained_beats_random_on_mean_recall(spark):
    """The point of training: mean recall@10 at n_probe=2 over the 8-query
    contract set is at least as good as the random-centroid baseline, and
    clears the raised contract floor (mean >= 0.3)."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.similarity import (
        ivf_recall,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    m = kmeans_fit(emb, dim=64, n_cells=8, n_iters=3)
    means = {}
    for tag, cents in (("random", None), ("trained", m.unit_centroids)):
        r = ivf_recall(
            emb, queries, dim=64, k=10, n_cells=8, probes=(2,),
            centroids=cents,
        )
        rows = r.collect()
        means[tag] = sum(x["recall_p2"] for x in rows) / len(rows)
        assert all(x["recall_full"] == 1.0 for x in rows)
        unpersist_deps(r)
    assert means["trained"] >= means["random"]
    assert means["trained"] >= 0.3


def test_unit_vector_zero_passthrough():
    assert unit_vector([0.0, 0.0]) == [0.0, 0.0]
    u = unit_vector([3.0, 4.0])
    assert u == [0.6, 0.8]


def test_property_matches_numpy_replica(spark):
    """Randomized vectors (seeded): the distributed trainer must equal an
    independent numpy replica of the same quantized spherical Lloyd's —
    seeds, per-iteration assignment, exact-integer mean updates, empty-cell
    carry — centroid-for-centroid (third implementation after Spark and
    the DuckDB oracle replay)."""
    import hashlib
    import random

    import numpy as np

    rng = random.Random(20260814)
    for case in range(3):
        n, dim, cells, iters = 40 + case * 30, 6, 3, 2
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = kmeans_fit(df, dim=dim, n_cells=cells, n_iters=iters)

        vq = np.trunc(np.array([r[1] for r in rows]) * (1 << 20))
        order = sorted(
            range(n),
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        cents = vq[order[:cells]] / float(1 << 20)
        for _ in range(iters):
            norms = np.sqrt((cents * cents).sum(axis=1))
            units = cents / np.where(norms == 0.0, 1.0, norms)[:, None]
            assign = (vq @ units.T).argmax(axis=1)
            for j in range(cells):
                mask = assign == j
                if mask.any():
                    sx = vq[mask].sum(axis=0)
                    cents[j] = sx / float(mask.sum() * (1 << 20))
        assert got.centroids == [list(c) for c in cents], f"case {case}"


def test_nonfinite_components_are_dropped_not_fatal(spark):
    """r10 code review: a NaN/Inf component must drop the row (dirty),
    not blow up the ANSI double->long cast."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [float("nan"), 1.0]), (2, [float("inf"), 1.0]),
         (3, [0.0, 1.0]), (4, [0.5, 0.5]), (5, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    m = kmeans_fit(df, dim=2, n_cells=2, n_iters=2)
    out = kmeans_assignments(df, m)
    assert {r.vec_id for r in out.collect()} == {0, 3, 4, 5}


def test_centroid_count_mismatch_raises(spark):
    from metadata_ingestion_framework_spark.operators.similarity import (
        ivf_recall,
    )

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    m = kmeans_fit(emb, dim=64, n_cells=4, n_iters=1)
    with pytest.raises(ValueError, match="expected n_cells"):
        ivf_recall(emb, q, dim=64, n_cells=8, centroids=m.unit_centroids)


def test_cluster_balanced_mix_downweights_dominant(spark):
    """The temperature rule over TRAINED cells, verified exactly: the
    member set equals a pure-Python replay of counts -> sqrt thresholds
    -> md5 buckets, and bigger topics get strictly smaller keep
    thresholds (the down-weighting claim itself)."""
    import hashlib

    from metadata_ingestion_framework_spark.operators.kmeans import (
        cluster_balanced_mix,
        kmeans_assignments,
        kmeans_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id")
    model = kmeans_fit(emb, dim=64, n_cells=8, n_iters=3)
    cells = {
        r.vec_id: r.cell for r in kmeans_assignments(emb, model).collect()
    }
    counts = {}
    for c in cells.values():
        counts[c] = counts.get(c, 0) + 1
    c_min = min(counts.values())
    thr = {
        c: int((c_min / n) ** 0.5 * 1_000_000 + 0.5)
        for c, n in counts.items()
    }
    # strictly monotone: a bigger topic keeps a smaller fraction
    for a, na in counts.items():
        for b, nb in counts.items():
            if na > nb:
                assert thr[a] < thr[b]
    assert max(counts.values()) > min(counts.values())  # test must bite

    def bucket(i):
        key = "\x1f".join(["cmix", str(i)])
        return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 1_000_000

    expect = {
        i for i, c in cells.items() if bucket(i) < thr[c]
    }
    got = {
        r.doc_id
        for r in cluster_balanced_mix(
            docs, emb, model, salt="cmix"
        ).collect()
    }
    assert got == expect and 0 < len(got) < len(cells)


def test_cluster_mix_stacks_with_cluster_safe_split(spark):
    """Leakage guard composition: split by near-dup cluster FIRST, mix
    only the train side — no mixed doc is in val, and no near-dup pair
    straddles mix/val (the component rule carries through the mix)."""
    from pyspark.sql import functions as F

    from metadata_ingestion_framework_spark.operators.cluster import (
        cluster_safe_split,
    )
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.kmeans import (
        cluster_balanced_mix,
        kmeans_fit,
    )
    from metadata_ingestion_framework_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id")
    pairs = embedding_near_duplicates(emb, "label", threshold=0.35)
    split = cluster_safe_split(
        docs, pairs.select(F.col("id_a"), F.col("id_b")),
        "doc_id", val_rate=0.3, salt="s17",
    )
    val = {r.doc_id for r in split.filter(F.col("split") == "val").collect()}
    train = split.filter(F.col("split") == "train").select("doc_id")
    model = kmeans_fit(emb, dim=64, n_cells=8, n_iters=3)
    mixed = {
        r.doc_id
        for r in cluster_balanced_mix(
            train, emb, model, salt="cmix"
        ).collect()
    }
    unpersist_deps(split)
    assert mixed and not (mixed & val)
    for p in pairs.collect():
        if p.id_a in mixed:
            assert p.id_b not in val
        if p.id_b in mixed:
            assert p.id_a not in val


def test_cluster_balanced_mix_same_id_column_name(spark):
    """ADVICE r18: with vec_id_col == doc_id_col (both tables keyed
    'doc_id' — the natural call when docs carry the embedding table's
    ids) the join-key drop must remove only the CELLS side's column;
    the member set equals the distinct-name call's."""
    from metadata_ingestion_framework_spark.operators.kmeans import (
        cluster_balanced_mix,
        kmeans_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id")
    model = kmeans_fit(emb, dim=64, n_cells=8, n_iters=3)
    want = {
        r.doc_id
        for r in cluster_balanced_mix(docs, emb, model, salt="cmix").collect()
    }
    emb_same = emb.withColumnRenamed("vec_id", "doc_id")
    got = {
        r.doc_id
        for r in cluster_balanced_mix(
            docs, emb_same, model, vec_id_col="doc_id", salt="cmix"
        ).collect()
    }
    assert got == want and got
