"""Distributed Lloyd's k-means (spherical) for IVF coarse-quantizer training.

North-star extension (no reference analogue; BASELINE.json): the IVF family
(`ivf_topk`, `ivf_topk_int8`, `ivf_recall`, `semantic_dedup`,
`EmbeddingDedupStore`) previously ran on `random_centroids` — data-blind
cells whose recall floors were 0.15 at n_probe=2. Training real centroids is
what bends the recall/cost curve a 100 TB user actually tunes (FAISS-style:
train on a bounded sample, serve the whole corpus).

Spark-first shape — the classic iterative-aggregation pattern:
  - assignment is the existing :func:`ivf_assign` map-only Arrow matmul
    argmax against broadcast-constant centroids (no shuffle on the corpus);
  - the update is ONE shuffle per iteration: ``posexplode`` the vectors and
    ``groupBy(cell, pos).sum`` — n_cells x dim groups, exact BIGINT sums;
  - the driver collects only the n_cells x dim sum table per iteration
    (the reference's own bounded-collect DPP pattern), never row data.

Cross-engine determinism (the whole point — the DuckDB oracle replays the
training bit-for-bit, CLAUDE.md md5/decimal conventions):
  - inputs are quantized ONCE to integers: ``vq = trunc(x * 2^20)`` (power
    of two => the scaling multiply is exact; trunc-toward-zero == Spark's
    ANSI double->long CAST == DuckDB ``trunc()``);
  - per-(cell, position) sums are BIGINT — exact and order-independent, so
    shuffle order cannot perturb the centroids;
  - the mean ``sum / (n * 2^20)`` divides two exactly-representable values —
    one IEEE op, identical in Python / Spark / DuckDB;
  - cosine is scale-invariant, so quantized vectors and unnormalized mean
    centroids give the SAME assignments as spherical k-means on normalized
    data — no epsilon reasoning anywhere in the iteration;
  - assignment ties break to the FIRST maximal cell (np.argmax ==
    ``ROW_NUMBER() OVER (ORDER BY score DESC, cell ASC)``), and
    :func:`ivf_assign`'s error-band + exact-fold fallback guarantees the
    Arrow matmul argmax equals the sequential-fold argmax DuckDB computes.

Seeding: the n_cells rows with the smallest ``md5(CAST(id AS VARCHAR))``
(id tiebreak) — the repo's standard cross-engine pseudo-random order.

Scale posture: train on a bounded deterministic sample (md5-order limit) —
IVF training on ~1M sampled vectors is standard practice at any corpus
size; serving (`ivf_assign` with the trained centroids) is the map-only
path that scans the 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_QUANT = 1 << 20  # power of two: x * QUANT is an exact float op


def _fold_sq_norm(vec: list[float]) -> float:
    """Strict sequential sum of squares — bit-identical to the JVM
    ``F.aggregate`` left fold and DuckDB ``list_dot_product(v, v)``."""
    acc = 0.0
    for x in vec:
        acc += x * x
    return acc


def unit_vector(c: list[float]) -> list[float]:
    """c / ||c|| with a fold-order norm; zero vectors pass through (the
    DuckDB twin divides by 1.0 there — x / 1.0 is bitwise x)."""
    n = _fold_sq_norm(c) ** 0.5
    d = 1.0 if n == 0.0 else n
    return [x / d for x in c]


def quantize_vectors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    quant: int = DEFAULT_QUANT,
) -> DataFrame:
    """(id, vq array<bigint>) with ``vq_i = trunc(x_i * quant)``.

    Null / off-dim / non-finite rows are dropped — training ignores dirty
    records (they keep their NULL-cell behavior at serve time via
    ``ivf_assign``). The finite check matters under ANSI mode: a NaN/Inf
    (or absurd-magnitude) component would make the double->long CAST
    throw instead of skip; |x| <= 2^40 keeps the product inside long
    range. The DuckDB replay mirrors the same predicate.
    """
    v = F.col(vec_col)
    finite = F.forall(
        v,
        lambda x: x.isNotNull()
        & ~F.isnan(x.cast("double"))
        & (F.abs(x.cast("double")) <= F.lit(float(1 << 40))),
    )
    return df.filter(v.isNotNull() & (F.size(v) == dim) & finite).select(
        F.col(id_col),
        F.transform(
            v, lambda x: (x.cast("double") * F.lit(float(quant))).cast("long")
        ).alias("vq"),
    )


@dataclass
class KMeansModel:
    """Trained coarse quantizer. ``unit_centroids`` is what
    :func:`ivf_assign` and the probe-order expressions consume (unit norm
    makes argmax-dot == argmax-cosine); ``centroids`` are the raw means in
    original units. ``objectives`` (optional) is the per-iteration summed
    round(cos, 9) — non-decreasing by the spherical-Lloyd theorem."""

    centroids: list[list[float]]
    unit_centroids: list[list[float]]
    n_cells: int
    n_iters: int
    dim: int
    quant: int
    objectives: list[float] | None = None


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = 8,
    n_iters: int = 3,
    quant: int = DEFAULT_QUANT,
    sample_limit: int | None = None,
    compute_objective: bool = False,
) -> KMeansModel:
    """Train spherical k-means centroids over an embedding column.

    ``sample_limit``: train on the first N rows in md5(id) order (the
    bounded-sample path for huge corpora); None trains on every clean row.
    ``compute_objective``: also record the per-iteration objective
    (sum of round(cosine-to-assigned-centroid, 9), summed exactly via
    DECIMAL so shuffle order can't perturb it) — used by tests/contract
    checks; costs one extra scoring pass per iteration.
    """
    from metadata_ingestion_framework_spark.operators.similarity import (
        cosine,
        ivf_assign,
    )

    md5_order = [F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()]
    vq = quantize_vectors(df, id_col, vec_col, dim, quant)
    if sample_limit is not None:
        vq = vq.orderBy(*md5_order).limit(sample_limit)
    vq = vq.persist()
    try:
        seeds = vq.orderBy(*md5_order).limit(n_cells).collect()
        if len(seeds) < n_cells:
            raise ValueError(
                f"kmeans_fit needs >= n_cells={n_cells} clean rows, got {len(seeds)}"
            )
        # r18 OPT (guide §1.2/§4.1): pin training parallelism ONCE from the
        # materialized sample's size instead of letting every Lloyd
        # iteration re-widen to defaultParallelism inside ivf_assign. The
        # per-iteration df.rdd conversion + round-robin shuffle + 32 tiny
        # Python tasks (~62 rows each at sf0.1) were pure boundary
        # overhead; the matmul-argmax itself is milliseconds. Partition
        # count derives from row count (scale-adaptive, not tuned to the
        # local core count): 1 task per 64k sample rows, capped at
        # defaultParallelism. coalesce() reads the persisted blocks
        # without a shuffle; assignment is per-row and the centroid
        # update sums are exact BIGINT (order-free), so partitioning
        # cannot perturb the trained model.
        n_sample = vq.count()  # cheap: persisted by the seeds collect
        target = max(1, min(
            df.sparkSession.sparkContext.defaultParallelism,
            -(-n_sample // 65536),
        ))
        train = vq.coalesce(target) if target < vq.rdd.getNumPartitions() else vq
        # seed centroids in original units (exact: vq / 2^20)
        cents = [[x / float(quant) for x in r.vq] for r in seeds]
        objectives: list[float] | None = [] if compute_objective else None

        for _ in range(n_iters):
            units = [unit_vector(c) for c in cents]
            assigned = ivf_assign(train, units, "vq", widen=False)
            if compute_objective:
                u_df = df.sparkSession.createDataFrame(
                    [(j, u) for j, u in enumerate(units)],
                    "__ivf_cell int, __u array<double>",
                )
                obj = (
                    assigned.join(F.broadcast(u_df), "__ivf_cell")
                    .agg(
                        F.sum(
                            F.round(cosine(F.col("vq"), F.col("__u")), 9).cast(
                                "decimal(28,12)"
                            )
                        )
                        .cast("double")
                        .alias("obj")
                    )
                    .collect()[0]["obj"]
                )
                objectives.append(float(obj))
            stats = (
                assigned.select(
                    F.col("__ivf_cell").alias("cell"),
                    F.posexplode("vq").alias("pos", "x"),
                )
                .groupBy("cell", "pos")
                .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            sums: dict[int, list[int]] = {}
            counts: dict[int, int] = {}
            for r in stats:
                sums.setdefault(r.cell, [0] * dim)[r.pos] = r.sx
                counts[r.cell] = r.n
            for j in range(n_cells):
                if counts.get(j):  # empty cell keeps its previous centroid
                    d = float(counts[j] * quant)  # exact: both factors < 2^53
                    cents[j] = [sx / d for sx in sums[j]]
    finally:
        vq.unpersist()
    return KMeansModel(
        centroids=[list(c) for c in cents],
        unit_centroids=[unit_vector(c) for c in cents],
        n_cells=n_cells,
        n_iters=n_iters,
        dim=dim,
        quant=quant,
        objectives=objectives,
    )


def kmeans_assignments(
    df: DataFrame,
    model: KMeansModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, cos_sim) — every clean vector's trained cell plus its
    round(cosine-to-centroid, 6). The value surface the DuckDB oracle
    replays bit-for-bit (training included).

    Shape: quantize (map-only) -> Arrow-fold L2 norm (one pass, optimizer
    barrier so the norm is per-row, not per-pair) -> ivf_assign (map-only
    argmax vs broadcast centroids) -> broadcast join to the n_cells unit
    rows for the single fold-dot per row. No corpus shuffle at all.
    """
    from metadata_ingestion_framework_spark.operators.similarity import (
        dot,
        ivf_assign,
        with_l2_norm,
    )

    vq = quantize_vectors(df, id_col, vec_col, model.dim, model.quant)
    vqn = with_l2_norm(vq, "vq", "__vnorm")
    assigned = ivf_assign(vqn, model.unit_centroids, "vq")
    u_df = df.sparkSession.createDataFrame(
        [
            (j, u, _fold_sq_norm(u) ** 0.5)
            for j, u in enumerate(model.unit_centroids)
        ],
        "__ivf_cell int, __u array<double>, __unorm double",
    )
    denom = F.col("__vnorm") * F.col("__unorm")
    return assigned.join(F.broadcast(u_df), "__ivf_cell").select(
        F.col(id_col),
        F.col("__ivf_cell").cast("int").alias("cell"),
        F.round(
            F.when(denom == 0, F.lit(0.0)).otherwise(
                dot(F.col("vq"), F.col("__u")) / denom
            ),
            6,
        ).alias("cos_sim"),
    )


def cluster_balanced_mix(
    docs: DataFrame,
    emb: DataFrame,
    model: KMeansModel,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Topic-balanced training mix (r17, VERDICT r16 item 4 — the
    DataComp/Dolma cluster-balance stage, public methodology): label
    every document with its TRAINED k-means topic cell, then temperature-
    resample so cluster sizes reshape from ``c`` toward ``c^alpha`` —
    a dominant topic is down-weighted, the rarest kept whole. Pure
    composition of proven parts: :func:`kmeans_assignments` (map-only
    argmax vs broadcast centroids) feeds ``temperature_mix``'s exact
    sqrt-rate + md5-bucket rule over ``cell`` strata. Returns the doc
    rows that survive, with their ``cell``.

    Leakage: compose AFTER ``cluster_safe_split`` (pass only the train
    side) so a near-dup cluster can never leak eval text into the mix —
    the split is by dup-cluster representative, this balance is by
    topic cell; they stack (tests/test_kmeans.py).

    Scale shape: the only corpus shuffle is the docs<->cells id join
    (co-partitioned SMJ on the shared id; a pipeline whose docs already
    carry their embedding row skips it); the per-cell counts are one
    map-side-combinable agg broadcast back, and membership is a
    map-only md5 compare. No reference analogue (north-star extension).
    """
    from metadata_ingestion_framework_spark.functions.sampling import (
        temperature_mix,
    )

    cells = kmeans_assignments(emb, model, vec_id_col, vec_col).select(
        vec_id_col, "cell"
    )
    # drop the COLUMN OBJECT, not the name (ADVICE r17): with
    # vec_id_col == doc_id_col (both tables keyed 'doc_id', a natural
    # call), a string-name drop removes BOTH columns and temperature_mix
    # fails on the missing key
    labeled = docs.join(
        cells, docs[doc_id_col] == cells[vec_id_col]
    ).drop(cells[vec_id_col])
    return temperature_mix(
        labeled, "cell", [doc_id_col], alpha=alpha, salt=salt
    )
