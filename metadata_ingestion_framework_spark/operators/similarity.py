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

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import Column
from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType


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


def cosine(
    a: Column,
    b: Column,
    norm_a: Column | None = None,
    norm_b: Column | None = None,
) -> Column:
    """round-exact cosine; ``norm_a``/``norm_b`` optionally supply the
    side's L2 norm PRECOMPUTED per row (r18 OPT, guide §2.3/§4.1): inside
    a pair-scoring cross join the inline ``l2_norm`` folds re-run per
    PAIR (~256 interpreted lambda calls), while a hoisted norm — the
    kernels' ``norm_col`` output or a build-side projection — is one
    column read. Values are bit-identical by construction: the hoisted
    norm is the identical sequential fold, and the denom product / zero
    guard / dot fold are unchanged (the kmeans_assignments precedent,
    oracle-proven)."""
    denom = (l2_norm(a) if norm_a is None else norm_a) * (
        l2_norm(b) if norm_b is None else norm_b
    )
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def _fold_norm_array(vals):
    """Raw per-row L2 norm with the strict sequential fold (numpy
    ``cumsum`` — bit-identical to the JVM ``l2_norm`` aggregate) as an
    OBJECT array: None -> None, empty -> 0.0, NaN/Inf propagate AS
    VALUES. Unlike :func:`with_l2_norm` this does NOT null non-finite
    norms — it exists to hoist the untouched ``l2_norm`` expression out
    of per-pair scoring, so a dirty row must keep the exact score (and
    therefore rank) the inline expression gave it."""
    import numpy as np

    n = len(vals)
    out = np.empty(n, dtype=object)
    out[:] = None
    lens = np.fromiter(
        ((-1 if v is None else len(v)) for v in vals), dtype=np.int64, count=n
    )
    for dim in np.unique(lens[lens >= 0]):
        mask = lens == dim
        if dim == 0:
            out[mask] = 0.0
            continue
        m = np.stack(list(vals[mask])).astype(np.float64)
        sq = m * m
        out[mask] = np.sqrt(sq.cumsum(axis=1)[:, -1])
    return out


def _topk(
    scored: DataFrame,
    k: int,
    query_id_col: str,
    id_col: str,
    score_col: str = "score",
    rank_col: str = "rank",
) -> DataFrame:
    """THE per-query top-k window of the similarity family: rank 1..k by
    (score desc NULLS LAST, id asc) — the one tiebreak convention every
    serving face and every DuckDB oracle twin share (`DESC NULLS LAST` +
    `vec_id ASC`). One definition so the five former copies cannot drift
    (r11 deferred review finding 5)."""
    w = Window.partitionBy(query_id_col).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
    )
    return scored.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def _fold_dot(row, plane) -> float:
    """Strict left-fold float64 dot — bit-identical to the JVM
    ``F.aggregate(zip_with(...), 0.0, acc+v)`` evaluation order."""
    acc = 0.0
    for i in range(len(row)):
        acc += float(row[i]) * float(plane[i])
    return acc


def _vec_matrix(vals, expected_dim: int | None = None):
    """``(valid_mask, matrix)`` for an object array of embedding rows.

    ``np.stack`` raises on a null or ragged-length row, failing the whole
    Arrow batch on one dirty record (r5 ADVICE item 3). Instead, rows that
    are null — or whose length differs from ``expected_dim`` (the plane /
    centroid dim when given, else the MODAL length of the batch's non-null
    rows; the earlier first-non-null-row rule let a leading off-dim dirty
    row mask out every well-formed row in its batch — r6 ADVICE item 4) —
    are masked out; callers emit NULL for the derived column on those rows,
    matching the null-propagation of the JVM HOF expressions these kernels
    replaced. Off-dim rows yielding NULL (rather than a shorter fold) is a
    documented fixed-dim precondition, not silent truncation.

    Rows containing a non-finite element (NaN/±Inf) are dirty too (r12):
    numpy comparisons treat NaN as never-greater while the JVM and DuckDB
    rank NaN ABOVE everything, so letting such a row through gives each
    consumer a different answer (``with_lsh_buckets`` used to clear the
    bit where ``lsh_bucket`` now yields NULL). One central mask keeps the
    contract uniform: NaN/Inf vectors get a NULL bucket / NULL cell and
    never pair.
    """
    import numpy as np

    lens = np.fromiter(
        ((-1 if v is None else len(v)) for v in vals), dtype=np.int64, count=len(vals)
    )
    if expected_dim is None:
        pos = lens[lens >= 0]
        if len(pos):
            dims, counts = np.unique(pos, return_counts=True)
            expected_dim = int(dims[counts.argmax()])  # ties -> smallest dim
        else:
            expected_dim = 0
    valid = lens == expected_dim
    m = (
        np.stack(list(vals[valid])).astype(np.float64)
        if valid.any()
        else np.empty((0, expected_dim), dtype=np.float64)
    )
    if m.size:
        finite = np.isfinite(m).all(axis=1)
        if not finite.all():
            valid = valid.copy()
            valid[np.nonzero(valid)[0][~finite]] = False
            m = m[finite]
    return valid, m


# First-order bound on |BLAS pairwise sum - strict sequential fold| for an
# n-term dot: each ordering's error is <= (n-1)*eps*sum|x_i*y_i|, so 4x the
# machine-eps-weighted absolute dot comfortably covers the difference of the
# two (r5 ADVICE item 2 — a fixed 1e-9 band is a heuristic that large-
# magnitude vectors can exceed).
def _fold_vs_blas_err(abs_m, abs_plane_mat):
    """Per-(row, plane) upper bound on BLAS-vs-fold divergence: elementwise
    ``4 * dim * float64_eps * (|m| @ |planes|)``."""
    import numpy as np

    dim = abs_m.shape[1] if abs_m.ndim == 2 else len(abs_m)
    return (4.0 * dim * np.finfo(np.float64).eps) * (abs_m @ abs_plane_mat)


def with_l2_norm(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """Materialized per-row L2 norm via an Arrow kernel (VERDICT r4 item 7).

    Two properties the obvious alternatives lack:

    - A ``withColumn(l2_norm(...))`` projection gets CollapseProject-inlined
      into the consuming join select, so a crossJoin consumer re-evaluates
      the norm PER PAIR instead of per row. A Python stage is a hard
      optimizer barrier — the norm is computed once per corpus row, period.
    - The accumulation uses ``cumsum`` (strict sequential float64), which is
      bit-identical to the JVM ``F.aggregate`` left fold and to the DuckDB
      oracle's sequential list sum — ROUND(6) on downstream scores therefore
      stays hash-exact cross-engine.

    Null rows emit a NULL norm instead of crashing the Arrow batch (r5
    ADVICE item 3); ragged lengths are fine — rows are stacked per length
    group, exactly like the JVM expression handles any array length.

    A NON-FINITE norm (NaN/Inf element, or square-overflow) is emitted as
    NULL too (r12, dirty-data fixture): the NaN case already degraded to
    NULL through the pandas nullable array, but an Inf norm flowed into
    ``inf/inf = NaN`` scores, and Spark ranks NaN ABOVE every real score —
    a corrupt vector must rank LAST (NULL, desc_nulls_last), never first.
    """
    import numpy as np

    from metadata_ingestion_framework_spark.operators.dedup import _widen_narrow_input

    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            res = pd.array([None] * len(pdf), dtype="Float64")
            if len(pdf):
                vals = pdf[vec_col].to_numpy()
                lens = np.fromiter(
                    ((-1 if v is None else len(v)) for v in vals),
                    dtype=np.int64,
                    count=len(vals),
                )
                for dim in np.unique(lens[lens >= 0]):
                    mask = lens == dim
                    if dim == 0:
                        res[mask] = 0.0
                        continue
                    m = np.stack(list(vals[mask])).astype(np.float64)
                    sq = m * m
                    norms = np.sqrt(sq.cumsum(axis=1)[:, -1])
                    norms[~np.isfinite(norms)] = np.nan  # -> pd.NA below
                    res[mask] = norms
            out[out_col] = res
            yield out

    return _widen_narrow_input(df).mapInPandas(run, schema=schema)


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

    Norms are PREcomputed per row on both sides (Arrow kernel barrier, so
    CollapseProject can't inline them into the per-pair select) — the pair
    loop pays one fold-dot instead of dot + two norms (VERDICT r4 item 7).
    """
    q = with_l2_norm(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec")),
        "__qvec",
        "__qnorm",
    )
    c = with_l2_norm(corpus.select(id_col, vec_col), vec_col, "__cnorm")
    denom = F.col("__cnorm") * F.col("__qnorm")
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(
            F.when(denom == 0, F.lit(0.0)).otherwise(
                dot(F.col(vec_col), F.col("__qvec")) / denom
            ),
            6,
        ).alias("score"),
    )
    return _topk(scored, k, query_id_col, id_col)


def _random_unit_rows(dim: int, n: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit vectors (pure python, driver-side)
    — the ONE generator behind both the LSH hyperplanes and the random
    centroids (r11 review: two line-identical copies must stay bit-equal
    for the cross-engine determinism story; one definition cannot drift)."""
    import random

    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = sum(x * x for x in v) ** 0.5 or 1.0
        rows.append([x / norm for x in v])
    return rows


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, driver-side)."""
    return _random_unit_rows(dim, n_planes, seed)


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection LSH bucket id (random hyperplane / SRP-LSH).

    JVM-expression form — one interpreted HOF dot per plane per row, so use
    it only on SMALL sides (the query set) or write-time layout jobs; bulk
    corpus bucketing goes through ``with_lsh_buckets`` (Arrow matmul).

    Dirty rows (NULL vector, off-dim vs the planes, NULL/NaN elements)
    yield a NULL bucket, matching ``with_lsh_buckets`` — the r11 deferred
    finding 2: the old ``otherwise(0)`` swallowed the NULL projection and
    silently filed every dirty row (and every null-embedding QUERY) into
    bucket 0, making such a query equi-join the whole of bucket 0. A NULL
    bucket instead drops out of the equi-join (no candidates), which is
    the correct "no answer for a no-vector query" semantics.
    """
    inf = F.lit(float("inf"))
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        # Explicit NaN/Inf guard first: Spark comparison semantics put NaN
        # ABOVE every value, so a bare `proj > 0` would set the bit on a
        # NaN projection while numpy clears it. A non-finite projection
        # (NaN/Inf element against never-exactly-zero gaussian planes)
        # maps to NULL; NULL proj (null/off-dim vector) matches no branch
        # and stays NULL too; NULL + anything nulls the whole bucket.
        bucket = bucket + (
            F.when(F.isnan(proj) | (F.abs(proj) == inf), F.lit(None))
            .when(proj > 0, F.lit(1 << i))
            .when(proj <= 0, F.lit(0))
            .cast("long")
        )
    return bucket


def with_lsh_buckets(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "__bucket",
    norm_col: str | None = None,
) -> DataFrame:
    """Bulk SRP bucketing: ONE numpy matmul per Arrow batch instead of
    n_planes interpreted HOF dots per row (VERDICT r4 item 7 — each HOF
    lambda call costs ~2µs interpreted; n_planes × dim × 2 of them per row).

    Bucket values match ``lsh_bucket`` under the summation-error bound
    assumption: BLAS pairwise summation and the JVM left fold each deviate
    from the exact dot by at most ``(dim-1)·eps·Σ|xᵢyᵢ|``, so only
    projections within the magnitude-scaled band ``4·dim·eps·(|m|@|plane|)``
    of zero can possibly disagree in sign — those few are re-computed with
    the strict sequential fold, bit-identical to the JVM (r5 ADVICE item 2:
    the old fixed 1e-9 band was a heuristic large vectors could exceed).

    Null / off-dim vector rows emit a NULL bucket instead of crashing the
    Arrow batch (r5 ADVICE item 3).
    """
    import numpy as np

    from metadata_ingestion_framework_spark.operators.dedup import _widen_narrow_input

    if len(planes) >= 63:
        # weights are int64: 1<<63 wraps negative and beyond is zero,
        # diverging from lsh_bucket's arbitrary-precision 2**i (r5 ADVICE
        # item 4). Practical SRP configs are 8-16 planes.
        raise ValueError(f"with_lsh_buckets supports < 63 planes, got {len(planes)}")
    plane_mat = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
    abs_plane_mat = np.abs(plane_mat)
    weights = (np.uint64(1) << np.arange(len(planes), dtype=np.uint64)).astype(np.int64)
    out_fields = list(df.schema.fields) + [StructField(out_col, LongType())]
    if norm_col is not None:
        # raw fold norm alongside the bucket (one numpy pass — the
        # vectors already cross the boundary here); see ivf_assign
        out_fields.append(StructField(norm_col, DoubleType()))
    schema = StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            res = pd.array([None] * len(pdf), dtype="Int64")
            if len(pdf):
                valid, m = _vec_matrix(pdf[vec_col].to_numpy(), plane_mat.shape[0])
                if valid.any():
                    proj = m @ plane_mat  # (n, n_planes)
                    band = _fold_vs_blas_err(np.abs(m), abs_plane_mat)
                    for r, pi in zip(*np.nonzero(np.abs(proj) <= band)):
                        proj[r, pi] = _fold_dot(m[r], plane_mat[:, pi])
                    # FINITE-input vectors can still overflow a projection
                    # to ±Inf (huge magnitudes x gaussian planes) — the
                    # JVM lsh_bucket nulls those, so the Arrow path must
                    # too or the two paths diverge row-for-row (r12
                    # review): mask them back to NULL instead of letting
                    # `inf > 0` set the bit / NaN clear it
                    vals = ((proj > 0).astype(np.int64) * weights).sum(axis=1)
                    buckets = pd.array(vals, dtype="Int64")
                    buckets[~np.isfinite(proj).all(axis=1)] = None
                    res[valid] = buckets
            out[out_col] = res
            if norm_col is not None:
                out[norm_col] = _fold_norm_array(pdf[vec_col].to_numpy())
            yield out

    return _widen_narrow_input(df).mapInPandas(run, schema=schema)


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
    if multi_probe > n_planes:
        # XOR-ing bits beyond the plane count probes buckets >= 2^n_planes
        # that can never hold a corpus row — recall silently plateaus while
        # the caller believes they bought more probes; error loudly (the
        # _resolve_centroids convention, r11 review)
        raise ValueError(
            f"multi_probe={multi_probe} exceeds n_planes={n_planes} — "
            "only n_planes Hamming-1 neighbors exist"
        )
    planes = random_hyperplanes(dim, n_planes, seed)
    c = with_lsh_buckets(corpus.select(id_col, vec_col), planes, vec_col)  # Arrow matmul
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
    return _topk(scored, k, query_id_col, id_col)


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    widen: bool = True,
    norm_col: str | None = None,
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    ``centroids`` is a small driver-side list (k-means output; at scale,
    train with Spark ML KMeans and pass ``model.clusterCenters()``). The
    assignment is a map-only Arrow-batched matmul argmax (one BLAS call per
    batch — the previous JVM score-array expression paid n_cells interpreted
    HOF dots per row; VERDICT r4 item 7).

    Cell values match the JVM ``array_position(scores, array_max(scores))``
    formulation (first index of the max under exact float64 fold scores)
    under the summation-error bound assumption: each matmul score deviates
    from the fold by at most the magnitude-scaled bound
    ``4·dim·eps·(|m|@|cent|)``, so only rows whose top-2 scores sit within
    twice the row's largest bound could be misranked by BLAS rounding —
    those are re-scored with the strict sequential fold, and ``np.argmax``
    takes the first max just like ``array_position`` (r5 ADVICE item 2:
    the old fixed 1e-9 gap was a heuristic large vectors could exceed).

    Null / off-dim vector rows emit a NULL cell instead of crashing the
    Arrow batch (r5 ADVICE item 3).

    ``widen=False`` (r18 OPT) skips the ``_widen_narrow_input`` round-robin
    for callers that already pinned the input's partitioning — the k-means
    trainer calls this once per Lloyd iteration, and the per-iteration
    ``df.rdd`` plan conversion + repartition shuffle + defaultParallelism
    tiny Python tasks were pure overhead on an already-persisted sample
    (guide §1.2/§4: per-task boundary cost dominates tiny batches).
    Assignment is per-row, so partitioning cannot change the values.
    """
    import numpy as np

    from metadata_ingestion_framework_spark.operators.dedup import _widen_narrow_input

    cent_mat = np.asarray(centroids, dtype=np.float64).T  # (dim, n_cells)
    abs_cent_mat = np.abs(cent_mat)
    out_fields = list(corpus.schema.fields) + [
        StructField("__ivf_cell", IntegerType())
    ]
    if norm_col is not None:
        out_fields.append(StructField(norm_col, DoubleType()))
    schema = StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            res = pd.array([None] * len(pdf), dtype="Int32")
            if len(pdf):
                valid, m = _vec_matrix(pdf[vec_col].to_numpy(), cent_mat.shape[0])
                if valid.any():
                    scores = m @ cent_mat  # (n, n_cells)
                    cells = scores.argmax(axis=1)
                    if scores.shape[1] > 1:
                        err = _fold_vs_blas_err(np.abs(m), abs_cent_mat)
                        part = np.partition(scores, -2, axis=1)
                        close = part[:, -1] - part[:, -2] <= 2.0 * err.max(axis=1)
                        for r in np.nonzero(close)[0]:
                            exact = [
                                _fold_dot(m[r], cent_mat[:, j])
                                for j in range(scores.shape[1])
                            ]
                            cells[r] = int(np.argmax(exact))
                    # overflow-to-Inf/NaN scores from FINITE inputs get a
                    # NULL cell — the corpus-side twin of
                    # probe_cell_order's dirty-query rule (r12 review:
                    # argmax over a row containing NaN/Inf is garbage and
                    # diverges from the JVM first-max convention)
                    out_cells = pd.array(cells.astype(np.int32), dtype="Int32")
                    out_cells[~np.isfinite(scores).all(axis=1)] = None
                    res[valid] = out_cells
            out["__ivf_cell"] = res
            if norm_col is not None:
                out[norm_col] = _fold_norm_array(pdf[vec_col].to_numpy())
            yield out

    src = _widen_narrow_input(corpus) if widen else corpus
    return src.mapInPandas(run, schema=schema)


def random_centroids(dim: int, n_cells: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit centroids (k-means stand-in).

    At scale, train real centroids with Spark ML KMeans over a sample and
    pass ``model.clusterCenters()`` — the query shape below is unchanged.
    """
    return _random_unit_rows(dim, n_cells, seed)


def _resolve_centroids(
    centroids: list[list[float]] | None, dim: int, n_cells: int, seed: int
) -> list[list[float]]:
    """Trained centroids or the random fallback; a trained list whose size
    disagrees with n_cells would silently break probe-order / recall-full
    semantics (e.g. recall_full probing 8 of 16 real cells) — error loudly
    instead."""
    if centroids is None:
        return random_centroids(dim, n_cells, seed)
    if len(centroids) != n_cells:
        raise ValueError(
            f"centroids has {len(centroids)} cells, expected n_cells={n_cells}"
        )
    return centroids


def probe_cell_order(qvec: Column, cents: list[list[float]]) -> Column:
    """Per-query FULL probe order: cell indices sorted by (dot score desc,
    cell asc) — the expression every IVF consumer slices its n_probe list
    from (ivf_topk / ivf_topk_int8 / ivf_recall / IvfIndex share it).

    A dirty query vector (NULL, off-dim, NaN/Inf element) yields a NULL
    order, so downstream ``explode(slice(...))`` drops the query instead
    of probing an arbitrary NULL-sorted cell list — the IVF face of the
    lsh_bucket NULL contract (r12; surfaced by the dirty-data fixture).
    The double evaluation of ``scores`` is query-side only (Q is the
    small broadcast side by design)."""
    inf = F.lit(float("inf"))
    scores = F.array(
        *[dot(qvec, F.array(*[F.lit(float(x)) for x in cent])) for cent in cents]
    )
    dirty = F.exists(
        scores, lambda s: s.isNull() | F.isnan(s) | (F.abs(s) == inf)
    )
    order = F.transform(
        F.array_sort(
            F.transform(
                scores,
                lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
            )
        ),
        lambda st: st.getField("cell"),
    )
    return F.when(~dirty, order)


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
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: coarse-quantize the corpus into cells,
    probe each query's ``n_probe`` nearest cells, exact-rerank inside.

    Scale path: the corpus is partitioned by cell once (write-time layout);
    a query touches n_probe/n_cells of the data — a partition-pruned scan.
    Assignment is a map-only argmax against broadcast-constant centroids;
    the only shuffle is the final per-query top-k on Q keys.

    ``centroids``: trained coarse quantizer (``kmeans_fit(...).unit_centroids``
    — operators/kmeans.py); None falls back to the data-blind random cells.
    """
    cents = _resolve_centroids(centroids, dim, n_cells, seed)
    c = ivf_assign(corpus.select(id_col, vec_col), cents, vec_col)

    # per-query probe list: indices of the n_probe highest-scoring cells
    probe = F.slice(probe_cell_order(F.col("__qvec"), cents), 1, n_probe)
    q = (
        queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
        .withColumn("__ivf_cell", F.explode(probe))
    )
    scored = c.join(F.broadcast(q), "__ivf_cell").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("score"),
    )
    return _topk(scored, k, query_id_col, id_col)


def ivf_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    rerank_factor: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF top-k over an int8-quantized corpus with exact float rerank
    (VERDICT r4 item 6 / r5 next-round item 6).

    The 100 TB IO story: the candidate scan reads (id, int8 codes, one
    float scale, cell) — ~1 byte/dim instead of 4 — so the probed cells
    stream 4x less data; only the ``k * rerank_factor`` survivors per query
    join back to the full-precision table (a broadcast of Q*k' skinny ids),
    which at scale is a point-lookup-sized read instead of a second scan.

    Cross-engine deterministic, hence oracle-checkable: quantization uses
    CAST-toward-zero truncation with scale = max|x|/127 (exact in both
    engines — operators/quantize.py), the dequantized candidate score and
    the exact rerank score both ROUND(6) with id tiebreaks.
    """
    from metadata_ingestion_framework_spark.operators.quantize import (
        dequantize,
        quantize_embeddings,
    )

    cents = _resolve_centroids(centroids, dim, n_cells, seed)
    base = corpus.select(id_col, vec_col)
    # write-time layout at scale: codes+scale+cell persisted once; the float
    # column lives in a separate (rarely read) table/column chunk
    qz = quantize_embeddings(base, vec_col)
    c = ivf_assign(qz, cents, vec_col).select(
        id_col, f"{vec_col}_q", f"{vec_col}_scale", "__ivf_cell"
    )

    # per-query probe list: identical construction to ivf_topk — the
    # coarse quantizer is shared
    probe = F.slice(probe_cell_order(F.col("__qvec"), cents), 1, n_probe)
    q = (
        queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
        .withColumn("__ivf_cell", F.explode(probe))
    )

    deq = dequantize(F.col(f"{vec_col}_q"), F.col(f"{vec_col}_scale"))
    cand = c.join(F.broadcast(q), "__ivf_cell").select(
        query_id_col,
        id_col,
        "__qvec",
        F.round(cosine(deq, F.col("__qvec")), 6).alias("qscore"),
    )
    survivors = _topk(
        cand, k * rerank_factor, query_id_col, id_col,
        score_col="qscore", rank_col="qrank",
    ).select(query_id_col, id_col, "__qvec")

    # exact rerank: full-precision vectors only for the Q*k' survivors
    rer = base.join(F.broadcast(survivors), id_col)
    scored = rer.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("score"),
    )
    return _topk(scored, k, query_id_col, id_col)


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

    Cross-engine exactness (r11 deferred finding 1): a BLAS cosine sitting
    within summation error of a 6th-decimal ROUND boundary could round
    differently from the sequential-fold convention the DuckDB oracle (and
    the JVM ``cosine()`` expression) evaluates. Emitted pairs whose raw
    cosine lies inside the error band of a half-step boundary are
    re-computed with the strict fold — same op order as ``cosine()``:
    ``fold(a·b) / (sqrt(fold(a·a)) * sqrt(fold(b·b)))``, 0.0 on a zero
    denominator — so the double Spark rounds is bit-identical to the one
    the oracle rounds. Same fix the LSH/IVF kernels got in r5; dirty rows
    (NULL / off-dim / NaN-element vectors) never pair.
    """
    id_type = dict(df.dtypes)[id_col]
    schema = f"id_a {id_type}, id_b {id_type}, cos_sim double"
    eps = 1e-6

    def fold_cosine(a, b) -> float:
        denom = math.sqrt(_fold_dot(a, a)) * math.sqrt(_fold_dot(b, b))
        return _fold_dot(a, b) / denom if denom != 0.0 else 0.0

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        # null / off-dim rows can't pair — drop instead of crashing the
        # whole block on one dirty record (r5 ADVICE item 3)
        valid, m = _vec_matrix(pdf[vec_col].to_numpy())
        ids = pdf[id_col].to_numpy()[valid]
        raw = m.copy()  # fold re-check needs the unnormalized vectors
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0.0] = 1.0
        m /= norms[:, None]
        # normalized rows have magnitude <= 1, so the BLAS-vs-fold cosine
        # divergence is bounded by a dim-scaled machine-eps constant; only
        # values within that band of a ROUND(6) half-step can flip
        band = 32.0 * m.shape[1] * np.finfo(np.float64).eps if m.size else 0.0
        out_a, out_b, out_s = [], [], []
        chunk = 1024
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            s = m[lo:hi] @ m.T  # (hi-lo, n)
            for r in range(lo, hi):
                cols = np.nonzero(s[r - lo, r + 1:] >= threshold - eps)[0] + r + 1
                if len(cols):
                    svals = s[r - lo, cols].copy()
                    t = svals * 1e6  # distance to the nearest x.5 boundary
                    near = np.abs(t - np.floor(t) - 0.5) * 1e-6 <= band
                    for j in np.nonzero(near)[0]:
                        svals[j] = fold_cosine(raw[r], raw[cols[j]])
                    out_a.extend([ids[r]] * len(cols))
                    out_b.extend(ids[cols])
                    out_s.extend(svals)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos_sim": out_s})

    cand = df.select(block_col, id_col, vec_col).groupBy(block_col).applyInPandas(pairs, schema)
    return (
        cand.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = 8,
    threshold: float = 0.95,
    seed: int = 7,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    methodology): cluster the embedding space with an IVF coarse quantizer,
    score cosine pairs only WITHIN each cell, resolve the pair graph into
    transitive duplicate clusters, and keep one deterministic
    representative (min id) per cluster. Returns one row per input vector:
    (id, cell, component, kept) — ``kept`` marks the representative a
    curation pipeline retains; ``component`` labels the duplicate cluster
    (singletons label themselves).

    No reference analogue (north-star training-data extension;
    BASELINE.json).

    Composition of three proven operators: :func:`ivf_assign` (map-only
    Arrow matmul argmax vs broadcast-constant centroids),
    :func:`embedding_near_duplicates` blocked on the cell (BLAS within
    bounded cells — the cell blocking is exactly SemDeDup's "pairwise only
    inside k-means clusters" trick that avoids the O(n^2) corpus scan),
    and ``connected_components`` (union-find / star rounds over the tiny
    pair set). Scale shape: one shuffle on the cell key + the component
    fixpoint on the pair graph; the final label attach is a broadcast-size
    left join (components only exist for paired vectors). Null / off-dim
    vectors keep a NULL cell, never pair, and stay kept singletons.

    The assignment+cell rows feed BOTH the pair stage and the output join;
    persisted so the Arrow assign kernel runs once (CLAUDE.md self-join
    rule) — release via ``unpersist_deps``.
    """
    from metadata_ingestion_framework_spark.operators.cluster import (
        connected_components,
    )
    from metadata_ingestion_framework_spark.operators.dedup import carry_deps

    cents = _resolve_centroids(centroids, dim, n_cells, seed)
    cells = (
        ivf_assign(df.select(id_col, vec_col), cents, vec_col)
        .withColumnRenamed("__ivf_cell", "cell")
        .persist()
    )
    pairs = embedding_near_duplicates(
        cells.filter(F.col("cell").isNotNull()),
        "cell",
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
    )
    comps_raw = connected_components(pairs, "id_a", "id_b")
    comps = comps_raw.withColumnRenamed("id", id_col)
    comp = F.coalesce(F.col("component"), F.col(id_col))
    out = cells.join(F.broadcast(comps), id_col, "left").select(
        id_col,
        "cell",
        comp.alias("component"),
        (comp == F.col(id_col)).alias("kept"),
    )
    out._persisted_deps = [cells]
    return carry_deps(out, pairs, comps_raw)


def _nested_probe_recall(
    scored: DataFrame,
    k: int,
    settings: list[tuple[str, int]],
    query_id_col: str,
    id_col: str,
) -> DataFrame:
    """Shared recall engine for ANN indexes whose probe sets are NESTED:
    ``scored`` holds every (query, corpus) pair once, scored exactly, with
    ``__pos`` = the smallest probe level at which the pair's bucket/cell is
    probed — so the index result at level p is a FILTER (``__pos <= p``) of
    the same rows (identical scores, identical tiebreaks), and each
    setting's top-k is one cheap window over a single persisted skinny
    table instead of one corpus pass per setting. ``settings`` maps output
    column label -> probe level; the exact baseline is the unrestricted
    window.

    Physical shape (r18 OPT, guide §2.4/§3.3 — replaces the r10
    persist + per-setting window/broadcast-join chain, which paid two
    broadcast exchanges and a join PER SETTING plus two persists, and
    grew the plan linearly in settings: the ann_recall profile showed 61
    jobs with ~4 s of pure driver gap for 16k scored rows): ONE window
    pass computes, for every scored row, the exact rank (``row_number``)
    AND each setting's within-subset rank as a cumulative conditional
    count over the IDENTICAL total order — for a row in the subset
    ``__pos <= p``, the number of subset rows at-or-before it in the
    (score desc nulls last, id asc) order IS its ``row_number`` within
    the filtered subset, so membership in the setting's top-k is
    ``in_p AND cum_count <= k`` with bit-identical tiebreaks. One
    ``groupBy`` then emits every recall column at once: zero joins, zero
    persists, a single Exchange (the window's own hash partitioning,
    reused by the aggregation)."""
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc_nulls_last(), F.col(id_col).asc()
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = scored.withColumn("__rkf", F.row_number().over(w))
    for label, p in settings:
        ranked = ranked.withColumn(
            f"__rk_{label}",
            F.sum(F.when(F.col("__pos") <= p, 1).otherwise(0)).over(cum),
        )
    exact = F.col("__rkf") <= k
    aggs = [F.sum(F.when(exact, 1).otherwise(0)).alias("n_exact")]
    for label, p in settings:
        hit = exact & (F.col("__pos") <= p) & (F.col(f"__rk_{label}") <= k)
        aggs.append(F.sum(F.when(hit, 1).otherwise(0)).alias(f"__h_{label}"))
    out = ranked.groupBy(query_id_col).agg(*aggs).select(
        query_id_col,
        "n_exact",
        *[
            F.round(
                F.col(f"__h_{label}").cast("double") / F.col("n_exact"), 6
            ).alias(label)
            for label, _ in settings
        ],
    )
    out._persisted_deps = []
    return out


def ivf_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 8,
    probes: tuple[int, ...] = (1, 2, 4),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Per-query recall@k of the IVF index against the exact cosine top-k —
    the retrieval-quality contract a 100 TB user tunes ``n_probe`` by
    (VERDICT r8 item 4: the ANN family proved value-exactness but could not
    state its recall/cost curve).

    Emits one row per query: ``(query_id, n_exact, recall_p<p>...,
    recall_full)`` where ``recall_p<p>`` is |approx∩exact| / n_exact at
    ``n_probe=p`` and ``recall_full`` probes ALL cells. Two theorems make
    this oracle-checkable beyond a bound:

    - MONOTONE: probing more cells grows the candidate set, and any exact
      top-k member among the candidates survives the rerank (at most k-1
      items can outrank it anywhere), so per-query recall is non-decreasing
      in ``n_probe``.
    - FULL-PROBE EXACTNESS: with every cell probed the candidate set is the
      corpus, so ``recall_full == 1.0`` exactly — the rerank IS the exact
      top-k. The exact baseline here deliberately scores with the same
      ``round(cosine(), 6)`` expression ``ivf_topk`` uses (NOT the
      Arrow-norm ``brute_force_topk`` kernel) so the theorem holds
      bit-for-bit; a last-ulp summation-order difference at a rounding
      boundary would otherwise flip a rank-k tie.

    Scale shape: the cross join is scored ONCE with the corpus row's cell
    and the query's full probe ORDER attached; because the probe sets are
    nested (the first p cells of one sorted order), every setting's
    ``ivf_topk`` result is a filter of the same scored rows (identical
    join-on-cell semantics, identical scores, identical tiebreaks), so the
    per-setting top-k's are k cheap windows over one persisted skinny
    table instead of one corpus pass per setting. The exact baseline is
    still the expensive part at corpus scale — which is the point: run it
    on a sampled query set to calibrate n_probe, then serve with
    ``ivf_topk``/``ivf_topk_int8`` at the chosen setting.
    """
    cents = _resolve_centroids(centroids, dim, n_cells, seed)
    # corpus norm hoisted into the assign kernel; query norm is a
    # build-side projection, materialized once per row when the broadcast
    # relation is built (r18 OPT — see cosine())
    c = ivf_assign(
        corpus.select(id_col, vec_col), cents, vec_col, norm_col="__vn"
    )

    # full probe ORDER per query — same sort ivf_topk slices its probe
    # list from (score desc, cell index asc)
    q = (
        queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
        .withColumn("__order", probe_cell_order(F.col("__qvec"), cents))
        .withColumn("__qn", l2_norm(F.col("__qvec")))
    )

    # one scored pass; __pos = 1-based rank of the corpus row's cell in
    # the query's probe order, so "probed at n_probe=p" == (__pos <= p).
    # Dirty rows (NULL cell from a null/off-dim vector, or a NULL probe
    # order from a null-vector query) get the same 1<<30 "reachable only
    # by the full scan" sentinel lsh_recall uses — a NULL __pos silently
    # excluded them from every filter, including full probe, while the
    # exact baseline window still ranked them, breaking the
    # recall_full==1.0 theorem on dirty data (r11 deferred finding 4).
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.coalesce(
            F.array_position(F.col("__order"), F.col("__ivf_cell")),
            F.lit(1 << 30),
        ).alias("__pos"),
        F.round(
            cosine(
                F.col(vec_col), F.col("__qvec"), F.col("__vn"), F.col("__qn")
            ),
            6,
        ).alias("score"),
    )
    settings = [(f"recall_p{p}", p) for p in probes] + [
        ("recall_full", 1 << 30)
    ]
    return _nested_probe_recall(scored, k, settings, query_id_col, id_col)


def lsh_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    probes: tuple[int, ...] = (0, 2, 4),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Per-query recall@k of the SRP-LSH index vs the exact cosine top-k —
    the :func:`ivf_recall` twin for the ``lsh_topk`` family (VERDICT r8
    item 4). ``probes`` are MULTI-PROBE settings: ``m`` probes the query's
    own bucket plus the Hamming-1 neighbors from flipping the first ``m``
    plane bits — exactly ``lsh_topk(multi_probe=m)``'s probe list, and the
    sets are nested in ``m``, so one scored pass serves every setting
    (``_nested_probe_recall``; per-pair ``__pos`` = 0 for the query's own
    bucket, i+1 for the bucket reached by flipping bit i, else unprobed).

    The same two theorems hold: recall is monotone in ``m`` (candidate
    superset + rerank), and ``recall_full`` (every bucket probed — the
    degenerate full scan, kept as the bit-exactness anchor rather than a
    realistic setting) is exactly 1.0.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    # norms hoisted out of the per-pair scoring (r18 OPT — see cosine())
    c = with_lsh_buckets(
        corpus.select(id_col, vec_col), planes, vec_col, norm_col="__vn"
    )
    q = (
        queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
        .withColumn("__qb", lsh_bucket(F.col("__qvec"), planes))
        .withColumn("__qn", l2_norm(F.col("__qvec")))
    )
    xor = F.col("__bucket").bitwiseXOR(F.col("__qb"))
    pos = (
        F.when(xor == 0, F.lit(0))
        .when(F.bit_count(xor) == 1, (F.log2(xor) + F.lit(1)).cast("int"))
        .otherwise(F.lit(1 << 30))  # reachable only by the full probe
    )
    scored = c.join(F.broadcast(q), F.lit(True)).select(
        query_id_col,
        id_col,
        pos.alias("__pos"),
        F.round(
            cosine(
                F.col(vec_col), F.col("__qvec"), F.col("__vn"), F.col("__qn")
            ),
            6,
        ).alias("score"),
    )
    settings = [(f"recall_m{m}", m) for m in probes] + [
        ("recall_full", 1 << 30)
    ]
    return _nested_probe_recall(scored, k, settings, query_id_col, id_col)


def mmr_rerank(
    topk: DataFrame,
    vectors: DataFrame,
    m: int,
    mmr_lambda: float = 0.5,
    rrf_k: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversification (Carbonell & Goldstein
    1998, public methodology) of any retrieval face's per-query top-k:
    greedily re-rank each candidate list by

        argmax  lambda * rel(d)  -  (1 - lambda) * max_{s in S} sim(d, s)

    where ``rel`` is the RANK-ONLY reciprocal ``1 / (rrf_k + rank)`` (the
    ``rrf_fuse`` convention — one division, bit-equal cross-engine, so
    diversification composes with any upstream scorer without touching
    its score scale) and ``sim`` is the fold ``round(cosine(), 6)``
    between candidate vectors (the engine-wide exact-similarity
    expression). Returns ``(query_id, id, mmr_rank, mmr_obj)`` with
    ``mmr_rank`` 1..m and ``mmr_obj`` the selection-time objective
    rounded to 6 (first pick: max-sim over the empty set is 0).

    No reference analogue (north-star training-data extension —
    diversity-aware sampling of retrieval results for eval/annotation
    sets; BASELINE.json).

    Cross-engine determinism (the kmeans_ivf iterative conventions):
    every float feeding a decision is either exact (the reciprocal rel)
    or round(6)-pinned (pair sims), the objective is two IEEE ops in a
    fixed order on those, the running max-sim is exact, and every argmax
    tiebreak is first-max == ROW_NUMBER(obj DESC, id ASC) — so a DuckDB
    WITH-RECURSIVE replay picks identical winners step for step.

    Scale shape: everything is bounded by the query batch — candidates
    are Q*k rows (broadcast into the vector join), pair sims Q*k^2
    codegen rows, and the greedy runs as ONE Arrow ``applyInPandas``
    pass over per-query groups of k rows (the sequential selection is
    inherently per-query; k and m are config-bounded). The corpus is
    never touched beyond the candidate-vector fetch."""
    qid_t = dict(topk.dtypes)[query_id_col]
    id_t = dict(topk.dtypes)[id_col]
    cand = vectors.select(
        F.col(id_col), F.col(vec_col)
    ).join(
        F.broadcast(topk.select(query_id_col, id_col, rank_col)), id_col
    ).select(
        query_id_col,
        id_col,
        (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double")))
        .alias("__rel"),
        F.col(vec_col).alias("__vec"),
    ).persist()  # both pair-join branches + the rel frame read it
    # Q*k-bounded frames throughout — broadcast every join explicitly
    # (cached/Python-stage outputs carry no stats and would SMJ, CLAUDE.md)
    a = cand.alias("a")
    b = F.broadcast(cand.alias("b"))
    pairs = (
        a.join(
            b,
            (F.col(f"a.{query_id_col}") == F.col(f"b.{query_id_col}"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{query_id_col}").alias(query_id_col),
            F.col(f"a.{id_col}").alias(id_col),
            F.col(f"b.{id_col}").alias("__other"),
            # coalesce: a NULL candidate vector yields round(cosine)=NULL,
            # and a None entering the numpy float64 simmat raises in the
            # executor (r15 ADVICE) — treat unknown similarity as 0.0
            # (contributes no redundancy penalty) on BOTH engines
            F.coalesce(
                F.round(cosine(F.col("a.__vec"), F.col("b.__vec")), 6),
                F.lit(0.0),
            ).alias("__sim"),
        )
    )
    sims = pairs.groupBy(query_id_col, id_col).agg(
        F.collect_list(F.struct(
            F.col("__other").alias("d"), F.col("__sim").alias("s")
        )).alias("__sims")
    )
    kin = cand.select(query_id_col, id_col, "__rel").join(
        F.broadcast(sims), [query_id_col, id_col], "left"
    )
    lam = float(mmr_lambda)
    out_schema = (
        f"{query_id_col} {qid_t}, {id_col} {id_t}, "
        "mmr_rank int, __obj double"
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        n = len(pdf)
        ids = pdf[id_col].to_numpy()
        rel = pdf["__rel"].to_numpy(dtype=np.float64)
        index_of = {v: i for i, v in enumerate(ids)}
        simmat = np.zeros((n, n), dtype=np.float64)
        for i, lst in enumerate(pdf["__sims"]):
            if lst is None:
                continue
            for e in lst:
                simmat[i, index_of[e["d"]]] = e["s"]
        avail = np.ones(n, dtype=bool)
        maxsim = np.zeros(n, dtype=np.float64)
        rows = []
        for step in range(min(m, n)):
            # fixed op order: lam*rel, (1-lam)*maxsim, subtract — the
            # oracle computes the identical three IEEE ops
            obj = lam * rel - (1.0 - lam) * maxsim
            masked = np.where(avail, obj, -np.inf)
            best = int(np.argmax(masked))  # first max == lowest id (sorted)
            rows.append(
                (pdf[query_id_col].iloc[0], ids[best], step + 1, obj[best])
            )
            avail[best] = False
            maxsim = np.maximum(maxsim, simmat[:, best])
        return pd.DataFrame(
            rows, columns=[query_id_col, id_col, "mmr_rank", "__obj"]
        )

    picked = kin.groupBy(query_id_col).applyInPandas(greedy, out_schema)
    out = picked.select(
        query_id_col, id_col, "mmr_rank",
        F.round(F.col("__obj"), 6).alias("mmr_obj"),
    )
    out._persisted_deps = list(getattr(topk, "_persisted_deps", ())) + [cand]
    return out


def semantic_contamination(
    train: DataFrame,
    evals: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "eval_id",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding-space decontamination (r18): flag every TRAIN document
    whose vector is within ``threshold`` cosine of ANY eval-suite
    vector — the semantic face of the decontamination family (the
    n-gram faces miss paraphrased leakage; public methodology: the
    SemDeDup-style benchmark-similarity sweeps in the Llama/DCLM data
    papers). Output one row per train doc: ``(id_col, max_cos,
    nearest_eval_id, contaminated)`` with the family tiebreak (highest
    ROUND(6) score, smallest eval id — first-max == ROW_NUMBER).

    Scale shape: the eval suite is bounded (benchmarks, not corpora),
    so it BROADCASTS; every train row scores map-side against it and
    the per-doc max partial-aggregates BEFORE the one skinny exchange
    (1 row per train doc — the same volume any per-doc verdict ships).
    The train side never broadcasts and never all-pairs. For eval
    suites too big to broadcast, compose :func:`ivf_topk` over a
    trained index instead (the decontam_triage_indexed convention).
    Exactness: per-pair sequential fold-dot + ROUND(6) — the
    oracle-proven cross-engine form."""
    ev = with_l2_norm(
        evals.select(
            F.col(eval_id_col).alias("__eid"),
            F.col(vec_col).alias("__evec"),
        ),
        "__evec",
        "__enorm",
    )
    tr = with_l2_norm(train.select(id_col, vec_col), vec_col, "__tnorm")
    denom = F.col("__tnorm") * F.col("__enorm")
    scored = tr.crossJoin(F.broadcast(ev)).select(
        id_col,
        F.col("__eid"),
        F.round(
            F.when(denom == 0, F.lit(0.0)).otherwise(
                dot(F.col(vec_col), F.col("__evec")) / denom
            ),
            6,
        ).alias("__score"),
    )
    # first-max == ROW_NUMBER (score DESC, eval_id ASC): struct max on
    # (score, -eval_id) — partial-aggregates map-side, no window
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("__score"), (-F.col("__eid")).alias("__neg")))
        .alias("__b")
    )
    return best.select(
        id_col,
        F.col("__b.__score").alias("max_cos"),
        (-F.col("__b.__neg")).alias("nearest_eval_id"),
        (F.col("__b.__score") >= F.lit(float(threshold))).alias(
            "contaminated"
        ),
    )
