"""Similarity-search tests: exact top-k, LSH bucketing, embedding near-dup."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    ivf_topk,
    lsh_topk,
)

DIM = 8


def _corpus(spark):
    """Unit-ish vectors: 0/1/2 point the same way, 3/4 orthogonal."""
    rows = [
        (0, [1.0] + [0.0] * (DIM - 1), "a"),
        (1, [0.9, 0.1] + [0.0] * (DIM - 2), "a"),
        (2, [0.8, 0.2] + [0.0] * (DIM - 2), "a"),
        (3, [0.0] * (DIM - 1) + [1.0], "a"),
        (4, [0.0] * (DIM - 2) + [1.0, 0.0], "b"),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")


def test_brute_force_topk_self_first(spark):
    corpus = _corpus(spark)
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(corpus, queries, k=3).collect()
    assert len(out) == 3
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["vec_id"] == 0 and by_rank[1]["score"] == 1.0  # self
    assert by_rank[2]["vec_id"] == 1  # next most aligned
    assert by_rank[3]["vec_id"] == 2


def test_brute_force_score_is_cosine(spark):
    corpus = _corpus(spark)
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = {r["vec_id"]: r["score"] for r in brute_force_topk(corpus, queries, k=5).collect()}
    expected = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert abs(out[1] - round(expected, 6)) < 1e-9
    assert out[3] == 0.0


def test_lsh_topk_recalls_aligned_cluster(spark):
    corpus = _corpus(spark)
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(corpus, queries, dim=DIM, k=3, n_planes=2)
    got = [r["vec_id"] for r in out.orderBy("rank").collect()]
    # bucket must contain the query itself; aligned vectors hash together
    assert got[0] == 0 and set(got) <= {0, 1, 2}


def test_ivf_topk_self_retrieval(spark):
    corpus = _corpus(spark)
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(corpus, queries, dim=DIM, k=3, n_cells=4, n_probe=4)
    got = [r["vec_id"] for r in out.orderBy("rank").collect()]
    # probing every cell == exact: self first, aligned cluster follows
    assert got == [0, 1, 2]


def test_embedding_near_duplicates_blocked(spark):
    out = embedding_near_duplicates(_corpus(spark), "label", threshold=0.9)
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in out.collect()}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert all(3 not in p and 4 not in p for p in got)  # orthogonal / other block
    assert got[(0, 1)] > 0.99


def test_embedding_near_duplicates_zero_vector_safe(spark):
    rows = [(0, [0.0] * DIM, "a"), (1, [1.0] + [0.0] * (DIM - 1), "a")]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    assert embedding_near_duplicates(df, "label", threshold=0.5).count() == 0


def test_ivf_topk_int8_matches_float_when_probing_all(spark):
    """n_probe = n_cells makes both variants exact-over-candidates; the int8
    scan ranks by quantized score but the float rerank of k*rerank_factor
    survivors must land the same top-k as the float path (quantization error
    per element <= scale, far below the synthetic cluster separation)."""
    from metadata_ingestion_framework_spark.operators.similarity import ivf_topk_int8

    corpus = _corpus(spark)
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    f = ivf_topk(corpus, queries, dim=DIM, k=3, n_cells=4, n_probe=4)
    q = ivf_topk_int8(corpus, queries, dim=DIM, k=3, n_cells=4, n_probe=4)
    got_f = [(r["vec_id"], r["rank"]) for r in f.orderBy("rank").collect()]
    got_q = [(r["vec_id"], r["rank"]) for r in q.orderBy("rank").collect()]
    assert got_q == got_f == [(0, 1), (1, 2), (2, 3)]


def test_ivf_topk_int8_k_rows_per_query(spark):
    from metadata_ingestion_framework_spark.operators.similarity import ivf_topk_int8

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk_int8(emb, queries, dim=64, k=5, n_cells=8, n_probe=2)
    counts = {r["query_id"]: r["n"] for r in out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {0, 1, 2} and all(v == 5 for v in counts.values())


def test_semantic_dedup_transitive_chain(spark):
    """A chain a~b~c (each adjacent pair above threshold, a-c below) must
    collapse into ONE component keeping only the min id; an unrelated
    vector stays a kept singleton; a null vector stays kept with a null
    cell."""
    import math

    from metadata_ingestion_framework_spark.operators.similarity import (
        semantic_dedup,
    )
    from metadata_ingestion_framework_spark.operators.dedup import unpersist_deps

    def unit(theta):
        return [math.cos(theta), math.sin(theta)] + [0.0] * 6

    rows = [
        (1, unit(0.0)),       # a
        (2, unit(0.5)),       # b: cos(a,b)=0.878, cos(b,c)=0.878
        (3, unit(1.0)),       # c: cos(a,c)=0.540 < 0.8 — only via b
        (9, [0.0] * 7 + [1.0]),  # orthogonal singleton
        (10, None),           # null vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = semantic_dedup(df, dim=8, n_cells=2, threshold=0.8, seed=7)
    out = {r["vec_id"]: r for r in res.collect()}
    assert len(out) == 5
    # the chain is one component labeled by its min id...
    assert out[1]["component"] == out[2]["component"] == out[3]["component"] == 1
    # ...keeping exactly the representative
    assert out[1]["kept"] and not out[2]["kept"] and not out[3]["kept"]
    assert out[9]["kept"] and out[9]["component"] == 9
    assert out[10]["kept"] and out[10]["component"] == 10 and out[10]["cell"] is None
    # chain members were actually co-located in one cell (else the test
    # exercised nothing)
    assert out[1]["cell"] == out[2]["cell"] == out[3]["cell"]
    unpersist_deps(res)


def test_ivf_recall_contract(spark):
    """r9 (VERDICT r8 item 4): per-query recall@k of the IVF index vs the
    exact baseline — derived-filter top-k's must equal real ivf_topk runs
    at each n_probe, recall is monotone in n_probe, full probe is exactly
    1.0, and the measured floors hold at two settings."""
    import pyspark.sql.functions as F

    from metadata_ingestion_framework_spark.operators.similarity import (
        ivf_recall,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r = ivf_recall(emb, queries, dim=64, k=10, n_cells=8, probes=(2, 4))
    rows = {x.query_id: x for x in r.collect()}
    assert len(rows) == 8
    for x in rows.values():
        assert x.n_exact == 10
        assert x.recall_full == 1.0, "full probe must reproduce the exact top-k"
        assert x.recall_p2 <= x.recall_p4 <= x.recall_full, "monotone in n_probe"
        # measured floors (mins across sf0.001/0.01/0.1: p2 0.2, p4 0.4)
        assert x.recall_p2 >= 0.15 and x.recall_p4 >= 0.3

    # the shared-scan filter formulation must equal REAL ivf_topk runs
    exact_ids = {}  # query -> exact top-10 id set, via the full probe
    full = ivf_topk(emb, queries, 64, 10, 8, 8)
    for q, vid in full.select("query_id", "vec_id").collect():
        exact_ids.setdefault(q, set()).add(vid)
    for p in (2, 4):
        ap = {}
        for q, vid in ivf_topk(emb, queries, 64, 10, 8, p).select(
            "query_id", "vec_id"
        ).collect():
            ap.setdefault(q, set()).add(vid)
        for q in rows:
            got = len(exact_ids[q] & ap.get(q, set())) / 10
            assert got == rows[q][f"recall_p{p}"], (q, p)
    for d in r._persisted_deps:
        d.unpersist()


def test_lsh_recall_contract(spark):
    """r9: the lsh_recall twin — monotone in multi_probe m, full probe is
    exactly 1.0, measured floors hold, and the shared-scan filter equals
    real lsh_topk runs at each multi_probe setting."""
    import pyspark.sql.functions as F

    from metadata_ingestion_framework_spark.operators.similarity import (
        lsh_recall,
        lsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r = lsh_recall(emb, queries, dim=64, k=10, n_planes=4, probes=(0, 2))
    rows = {x.query_id: x for x in r.collect()}
    assert len(rows) == 8
    for x in rows.values():
        assert x.n_exact == 10
        assert x.recall_full == 1.0
        assert x.recall_m0 <= x.recall_m2 <= x.recall_full
        assert x.recall_m0 >= 0.05 and x.recall_m2 >= 0.05

    # filter formulation == real lsh_topk at each multi_probe setting;
    # exact baseline recomputed with the same round(cosine, 6) expression
    from pyspark.sql import Window

    from metadata_ingestion_framework_spark.operators.similarity import cosine

    qdf = queries.select("query_id", F.col("embedding").alias("qv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("vec_id").asc()
    )
    full = {}
    for q, vid in (
        emb.crossJoin(F.broadcast(qdf))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("s"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter("rk <= 10")
        .select("query_id", "vec_id")
        .collect()
    ):
        full.setdefault(q, set()).add(vid)
    for m in (0, 2):
        ap = {}
        for q, vid in lsh_topk(
            emb, queries, 64, 10, n_planes=4, multi_probe=m
        ).select("query_id", "vec_id").collect():
            ap.setdefault(q, set()).add(vid)
        for q in rows:
            got = len(full[q] & ap.get(q, set())) / 10
            assert got == rows[q][f"recall_m{m}"], (q, m)
    for d in r._persisted_deps:
        d.unpersist()


def test_mmr_rerank_demotes_redundant_candidate(spark):
    """MMR semantics on a constructed fixture: the rank-2 candidate is a
    near-clone of rank-1, so at lambda=0.5 it must fall BELOW the
    dissimilar rank-3 candidate; rank order within {1} and {3,2} follows
    the greedy objective. Also pins m > n (all candidates emitted) and
    the first-pick objective (max-sim over empty set = 0)."""
    from pyspark.sql import Window

    from metadata_ingestion_framework_spark.operators.similarity import (
        cosine,
        mmr_rerank,
    )

    vecs = spark.createDataFrame(
        [
            (100, [1.0, 0.0, 0.0, 0.0]),      # query anchor
            (1, [0.99, 0.14, 0.0, 0.0]),      # rank 1
            (2, [0.99, 0.141, 0.001, 0.0]),   # rank 2, clone of 1
            (3, [0.7, 0.0, 0.71, 0.0]),       # rank 3, diverse
        ],
        "vec_id long, embedding array<float>",
    )
    queries = vecs.filter(F.col("vec_id") == 100).select(
        F.lit(7).alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        vecs.filter(F.col("vec_id") != 100)
        .crossJoin(F.broadcast(queries))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6)
            .alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc_nulls_last(), F.col("vec_id").asc()
    )
    topk = scored.withColumn("rank", F.row_number().over(w))
    out = mmr_rerank(topk, vecs, m=10)  # m > n: all 3 come back
    rows = sorted(
        ((r.mmr_rank, r.vec_id, r.mmr_obj) for r in out.collect())
    )
    for d in out._persisted_deps:
        d.unpersist()
    assert [v for _, v, _ in rows] == [1, 3, 2]  # clone demoted to last
    # first pick: obj = 0.5 * 1/(60+1) - 0 exactly
    assert rows[0][2] == round(0.5 * (1.0 / 61.0), 6)


def test_mmr_rerank_lambda_one_is_relevance_order(spark):
    """lambda=1.0 switches diversity off: MMR order == the input rank
    order for every query."""
    from pyspark.sql import Window

    from metadata_ingestion_framework_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = brute_force_topk(emb, queries, k=8)
    out = mmr_rerank(topk, emb, m=8, mmr_lambda=1.0)
    got = {
        (r.query_id, r.mmr_rank): r.vec_id for r in out.collect()
    }
    for d in out._persisted_deps:
        d.unpersist()
    want = {
        (r.query_id, r.rank): r.vec_id for r in topk.collect()
    }
    assert got == want and len(got) == 24


def test_mmr_rerank_dirty_vectors_deterministic(spark):
    """Dirty-data contract (r15): a zero-vector candidate scores sim 0.0
    against everything (the cosine zero-denominator guard) and still
    ranks deterministically; a candidate id missing from the vector
    table drops out of the rerank (inner candidate-vector fetch) without
    affecting the others' objectives."""
    from pyspark.sql import Window

    from metadata_ingestion_framework_spark.operators.similarity import (
        mmr_rerank,
    )

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 0.0]),   # zero vector
            (3, [0.9, 0.1]),
            (4, None),         # NULL vector (r15 ADVICE: must not crash
        ],                     # the numpy simmat fill; sim treated as 0.0)
        "vec_id long, embedding array<float>",
    )
    topk = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2), (7, 3, 3), (7, 99, 4), (7, 4, 5)],
        "query_id long, vec_id long, rank long",  # 99 has no vector row
    )
    out = mmr_rerank(topk, vecs, m=5)
    rows = sorted((r.mmr_rank, r.vec_id) for r in out.collect())
    for d in out._persisted_deps:
        d.unpersist()
    # 99 dropped; first pick = best rel (rank 1); the zero vector's sims
    # are all 0.0 so it beats the similar-to-1 doc 3 at step 2; the NULL
    # vector survives with all-0.0 sims and lands by rel order
    assert [v for _, v in rows] == [1, 2, 4, 3]


def test_semantic_contamination_maxrule_and_zero_norm(spark):
    """semantic_contamination (r18): per-train max over the broadcast
    eval suite with the (score DESC, eval_id ASC) first-max tiebreak;
    zero-norm vectors score 0.0 (the engine-wide rule) and a train doc
    equal to an eval vector flags at threshold."""
    from metadata_ingestion_framework_spark.operators.similarity import (
        semantic_contamination,
    )

    ev = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0]), (102, [1.0, 0.0])],
        "eval_id long, embedding array<float>",
    )
    tr = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),    # cos 1.0 vs evals 100 AND 102 -> 100 wins
            (1, [1.0, 1.0]),    # cos ~0.707107 vs all three axes
            (2, [0.0, 0.0]),    # zero norm -> 0.0 everywhere
            (3, [-1.0, 0.0]),   # best is 0.0 (vs 101)
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: (r.max_cos, r.nearest_eval_id, r.contaminated)
        for r in semantic_contamination(tr, ev, threshold=0.5).collect()
    }
    assert got[0] == (1.0, 100, True)          # smallest eval id on tie
    assert got[1] == (0.707107, 100, True)
    assert got[2] == (0.0, 100, False)
    assert got[3] == (0.0, 101, False)
