"""Similarity search over embedding columns (array<float>).

North-star extension (BASELINE.json): brute-force cosine top-k as the exact
baseline, LSH (random hyperplane) bucketing and IVF (coarse-quantizer
assignment) as the scale paths.

Scale posture: brute force is O(Q*N) — fine when Q (queries) is small and
broadcast; the LSH/IVF variants turn the all-pairs shuffle into bounded
equi-joins on bucket keys, which is the only shape that survives 100 TB.
All dot products run JVM-side via ``F.zip_with``/``F.aggregate`` in double
precision (sequential left-fold -> deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import Column


def dot(a: Column, b: Column) -> Column:
    """Deterministic double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, score every corpus row.

    Returns (query_id, vec_id, score, rank), rank 1..k per query, ties broken
    by corpus id for determinism. The corpus side never shuffles — scoring is
    map-side against the broadcast queries; only the per-query top-k
    aggregation shuffles on query_id (Q keys).
    """
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    scored = corpus.select(id_col, vec_col).crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, driver-side)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = sum(x * x for x in v) ** 0.5 or 1.0
        planes.append([x / norm for x in v])
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection LSH bucket id (random hyperplane / SRP-LSH)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: SRP-LSH bucket equi-join then exact rerank.

    Both sides hash to 2^n_planes buckets; candidates are corpus rows sharing
    the query's bucket. At 100 TB: the corpus is bucketed once (write-time
    partition column), each query probes one bucket — a partition-pruned scan
    instead of a full pass.

    Recall tuning: ``multi_probe=m`` additionally probes the m Hamming-1
    neighbor buckets obtained by flipping each of the first m plane bits —
    the standard multi-probe answer to a near neighbor sitting just across
    one hyperplane. Each (query, corpus) pair still joins at most once (a
    corpus row lives in exactly one bucket and the probe list is distinct),
    so no dedup stage is needed; cost scales the probed fraction from
    1/2^n_planes to (1+m)/2^n_planes of the corpus per query.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    c = corpus.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    q = queries.select(
        query_id_col, F.col(vec_col).alias("__qvec")
    ).withColumn("__bucket", lsh_bucket(F.col("__qvec"), planes))
    if multi_probe:
        q = q.withColumn(
            "__bucket",
            F.explode(F.array(
                F.col("__bucket"),
                *[F.col("__bucket").bitwiseXOR(F.lit(1 << i)) for i in range(multi_probe)],
            )),
        )
    scored = c.join(F.broadcast(q), "__bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    ``centroids`` is a small driver-side list (k-means output; at scale,
    train with Spark ML KMeans and pass ``model.clusterCenters()``). The
    assignment is a map-only argmax over a broadcast-sized constant array.

    Shape note: an iterative ``when(best_score < s, ...)`` fold nests each
    cell's dot-product expression inside every later comparison — the tree
    (and interpreted eval cost) grows exponentially in n_cells. Building the
    score array once and taking ``array_position(scores, array_max(scores))``
    evaluates each dot product at most twice.
    """
    v = F.col(vec_col)
    scores = F.array(
        *[dot(v, F.array(*[F.lit(float(x)) for x in cent])) for cent in centroids]
    )
    cell = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    return corpus.withColumn("__ivf_cell", cell)


def random_centroids(dim: int, n_cells: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit centroids (k-means stand-in).

    At scale, train real centroids with Spark ML KMeans over a sample and
    pass ``model.clusterCenters()`` — the query shape below is unchanged.
    """
    import random

    rng = random.Random(seed)
    cents = []
    for _ in range(n_cells):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = sum(x * x for x in v) ** 0.5 or 1.0
        cents.append([x / norm for x in v])
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via IVF: coarse-quantize the corpus into cells,
    probe each query's ``n_probe`` nearest cells, exact-rerank inside.

    Scale path: the corpus is partitioned by cell once (write-time layout);
    a query touches n_probe/n_cells of the data — a partition-pruned scan.
    Assignment is a map-only argmax against broadcast-constant centroids;
    the only shuffle is the final per-query top-k on Q keys.
    """
    cents = random_centroids(dim, n_cells, seed)
    c = ivf_assign(corpus, cents, vec_col)

    def cell_scores(col: Column) -> list[Column]:
        return [dot(col, F.array(*[F.lit(float(x)) for x in cent])) for cent in cents]

    # per-query probe list: indices of the n_probe highest-scoring cells
    scores = F.array(*cell_scores(F.col("__qvec")))
    probe = F.slice(
        F.transform(
            F.array_sort(
                F.transform(
                    scores,
                    lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
                )
            ),
            lambda st: st.getField("cell"),
        ),
        1,
        n_probe,
    )
    q = (
        queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
        .withColumn("__ivf_cell", F.explode(probe))
    )
    scored = c.join(F.broadcast(q), "__ivf_cell").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_duplicates(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within blocking keys (e.g. LSH bucket
    or label). Returns (id_a, id_b, cos_sim) with id_a < id_b above threshold.

    The within-block pairwise scoring is a blocked numpy matmul under
    ``applyInPandas`` — one shuffle on the block key, then BLAS does the
    O(m^2 d) work vectorized (a JVM expression-per-pair formulation measured
    ~20x slower). The UDF emits raw float64 cosines with a small epsilon
    slack; the authoritative ROUND(6) + threshold happens in Spark so the
    semantics stay engine-exact. Chunked matmul bounds memory at
    chunk x block, so a skewed block cannot OOM an executor.
    """
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    schema = f"id_a {id_type}, id_b {id_type}, cos_sim double"
    eps = 1e-6

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0.0] = 1.0
        m /= norms[:, None]
        out_a, out_b, out_s = [], [], []
        chunk = 1024
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            s = m[lo:hi] @ m.T  # (hi-lo, n)
            for r in range(lo, hi):
                cols = np.nonzero(s[r - lo, r + 1:] >= threshold - eps)[0] + r + 1
                if len(cols):
                    out_a.extend([ids[r]] * len(cols))
                    out_b.extend(ids[cols])
                    out_s.extend(s[r - lo, cols])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos_sim": out_s})

    cand = df.select(block_col, id_col, vec_col).groupBy(block_col).applyInPandas(pairs, schema)
    return (
        cand.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
