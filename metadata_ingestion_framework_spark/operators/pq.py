"""Product quantization (PQ) ANN — Jégou/Douze/Schmid 2011, public
methodology: split each vector into ``m`` subspaces, quantize every
subvector to one of ``k`` sub-codebook entries, and score queries against
the CODES (asymmetric distance computation, ADC) instead of the vectors.

North-star extension (no reference analogue; BASELINE.json). This is the
memory-scale path past ``ivf_topk_int8``: int8 stores 1 byte per DIM
(64 B for dim=64), PQ stores 1 byte per SUBSPACE (m=4 -> 4 B) — a 16x
further compression, which at 100 TB decides whether the scored scan fits
in cluster memory at all.

Spark shape — the part that matters at scale:

- **The corpus-side scoring is pure codegen.** A query carries its ADC
  lookup table (m small arrays of the query-subvector x codebook-entry
  dots, built once per query row on the tiny broadcast side); each
  (query, corpus) pair's score is m ``element_at`` lookups + a fixed
  left-associated add chain over the CODES column — no vector bytes are
  read, no Python touches the corpus side, and whole-stage codegen keeps
  the scan JVM-side end to end.
- **Encoding is the same Arrow argmax kernel family as ``ivf_assign``**
  (one BLAS matmul per subspace per batch, borderline rows re-folded to
  the exact sequential dot), so codes are bit-reproducible cross-engine:
  the DuckDB oracle re-derives every code with the literal-centroid
  GREATEST/first-max CASE pattern and every ADC score with
  ``list_dot_product`` on the same slices — the whole pipeline
  value-checks, not just a recall bound.
- **Exact rerank on the survivors** (the ``ivf_topk_int8`` shape): the
  top ``k * rerank_factor`` by ADC join back to full-precision vectors
  (broadcast Q*k' ids) and the final top-k uses the engine's
  ``round(cosine, 6)`` with the shared (score desc, id asc) tiebreak —
  so ``rerank_factor`` covering the corpus makes PQ EXACTLY the
  brute-force answer (pytest-proven theorem, the recall anchor).

Dirty-vector contract (shared with the whole family via ``_vec_matrix``):
NULL / off-dim / non-finite vectors encode to NULL codes, score NULL
(ranked last), and can never displace a real match; a dirty QUERY vector
yields a NULL LUT and returns only NULL-scored rows.

Conventions: sub-codebooks are UNIT rows from the shared deterministic
generator (``_random_unit_rows``) or trained per-subspace with
``kmeans_fit`` (``pq_train``); assignment is FIRST-max dot argmax
(``array_position``-compatible); slices are 1-based on both engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, StructField, StructType

from metadata_ingestion_framework_spark.operators.similarity import (
    _fold_dot,
    _fold_norm_array,
    _fold_vs_blas_err,
    _random_unit_rows,
    _resolve_centroids,
    _topk,
    _vec_matrix,
    cosine,
    l2_norm,
    dot,
    probe_cell_order,
)


def pq_codebooks(
    dim: int, m: int = 4, k: int = 8, seed: int = 7
) -> list[list[list[float]]]:
    """Deterministic unit sub-codebooks: ``m`` codebooks of ``k`` entries
    over ``dim/m`` dims each (k-means stand-in — train real ones with
    :func:`pq_train`; the query shape is identical either way)."""
    if dim % m:
        raise ValueError(f"dim={dim} is not divisible by m={m} subspaces")
    return [
        _random_unit_rows(dim // m, k, seed + 1000 * j) for j in range(m)
    ]


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 3,
    sample_limit: int | None = None,
) -> list[list[list[float]]]:
    """Train the ``m`` sub-codebooks with per-subspace k-means
    (:func:`kmeans_fit` on the sliced subvectors — m bounded driver
    rounds of the proven trainer, each collecting only a k x dim/m
    centroid table). The returned unit centroids drop straight into
    :func:`pq_encode` / :func:`pq_topk`."""
    from metadata_ingestion_framework_spark.operators.kmeans import kmeans_fit

    if dim % m:
        raise ValueError(f"dim={dim} is not divisible by m={m} subspaces")
    sub = dim // m
    books = []
    for j in range(m):
        sliced = df.select(
            id_col, F.slice(F.col(vec_col), j * sub + 1, sub).alias("__sub")
        )
        model = kmeans_fit(
            sliced, id_col, "__sub", sub, k, n_iters,
            sample_limit=sample_limit,
        )
        books.append(model.unit_centroids)
    return books


def _check_geometry(dim: int, codebooks: list[list[list[float]]]) -> tuple[int, int]:
    """(m, sub) from the codebooks, validated against ``dim`` (r12 second
    review: a geometry mismatch used to fail SILENTLY — every row masked
    off-dim, NULL codes, NULL LUT entries — and the rerank then returned
    plausible rows with arbitrary recall)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if m * sub != dim:
        raise ValueError(
            f"codebooks cover {m} x {sub} = {m * sub} dims, expected dim={dim}"
        )
    return m, sub


def _kept_fields(corpus: DataFrame, output_cols: list[str] | None):
    """Resolve ``output_cols`` against the corpus schema, RAISING on
    unknown names (ADVICE r12: the set-intersection filter silently
    dropped typos, changing the output schema with the failure surfacing
    only at a far-downstream select). None keeps every input column."""
    if output_cols is None:
        return list(corpus.schema.fields)
    names = {f.name for f in corpus.schema.fields}
    unknown = sorted(set(output_cols) - names)
    if unknown:
        raise ValueError(
            f"output_cols {unknown} not in corpus columns {sorted(names)}"
        )
    keep = set(output_cols)
    return [f for f in corpus.schema.fields if f.name in keep]


def _argmax_refold(sl, mat, abs_mat):
    """First-max dot argmax with the borderline sequential re-fold (the
    shared ivf_assign convention): returns (int32 cells, finite row
    mask). ONE definition for the cell kernel, the per-subspace code
    kernel, and the fused assign+encode kernel."""
    import numpy as np

    scores = sl @ mat
    finite = np.isfinite(scores).all(axis=1)
    cells = scores.argmax(axis=1)
    if scores.shape[1] > 1:
        err = _fold_vs_blas_err(np.abs(sl), abs_mat)
        part = np.partition(scores, -2, axis=1)
        close = part[:, -1] - part[:, -2] <= 2.0 * err.max(axis=1)
        for r in np.nonzero(close)[0]:
            exact = [
                _fold_dot(sl[r], mat[:, c]) for c in range(scores.shape[1])
            ]
            cells[r] = int(np.argmax(exact))
    return cells.astype(np.int32), finite


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
    output_cols: list[str] | None = None,
    norm_col: str | None = None,
) -> DataFrame:
    """Append ``out_col`` = the m-entry code array (0-based argmax per
    subspace). One Arrow batch pays m BLAS matmuls; borderline rows
    (top-2 scores within the summation-error band) re-fold to the exact
    sequential dot, so codes match the JVM/DuckDB first-max convention
    bit-for-bit (the ``ivf_assign`` machinery, per subspace). Dirty rows
    (and finite rows whose scores overflow to Inf/NaN) emit NULL.

    ``output_cols``: restrict the OUTPUT to these input columns + the
    codes (r12 review: mapInPandas output is fixed by the declared
    schema, so without this the encode pass would serialize the full
    embedding back out of the Python worker only for the caller to drop
    it — ~100x the bytes the codes need)."""
    import numpy as np

    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    m = len(codebooks)
    sub = len(codebooks[0][0])
    dim = m * sub
    mats = [
        np.asarray(cb, dtype=np.float64).T for cb in codebooks
    ]  # (sub, k) each
    abs_mats = [np.abs(x) for x in mats]
    kept = _kept_fields(corpus, output_cols)
    out_fields = kept + [StructField(out_col, ArrayType(IntegerType()))]
    if norm_col is not None:
        # raw fold L2 norm alongside the codes (one numpy pass — the
        # vectors already cross the boundary here); hoists the norm out
        # of per-pair scoring, see similarity.cosine (r18 OPT)
        out_fields.append(StructField(norm_col, DoubleType()))
    schema = StructType(out_fields)
    kept_names = [f.name for f in kept]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[kept_names].copy()
            res = [None] * len(pdf)
            if len(pdf):
                valid, mtx = _vec_matrix(pdf[vec_col].to_numpy(), dim)
                if valid.any():
                    codes = np.empty((mtx.shape[0], m), dtype=np.int32)
                    finite = np.ones(mtx.shape[0], dtype=bool)
                    for j in range(m):
                        sl = mtx[:, j * sub : (j + 1) * sub]
                        # overflow-to-Inf/NaN scores from FINITE inputs
                        # -> NULL codes (the family's dirty contract;
                        # argmax over NaN/Inf is garbage — r12 review)
                        cells, fin = _argmax_refold(sl, mats[j], abs_mats[j])
                        finite &= fin
                        codes[:, j] = cells
                    rows = [
                        c if f else None
                        for c, f in zip(codes.tolist(), finite)
                    ]
                    it = iter(rows)
                    res = [next(it) if v else None for v in valid]
            out[out_col] = pd.Series(res, dtype=object)
            if norm_col is not None:
                out[norm_col] = pd.Series(
                    _fold_norm_array(pdf[vec_col].to_numpy()), dtype=object
                )
            yield out

    return _widen_narrow_input(corpus).mapInPandas(run, schema=schema)


def _adc_score(
    codes_col: Column, lut_cols: list[Column], round_to: int = 6
) -> Column:
    """ADC score: m ``element_at`` lookups + a FIXED left-associated add
    chain (j = 0..m-1), matching the oracle's ``l0 + l1 + ... + l(m-1)``
    expression term-for-term — pure codegen arithmetic over the codes
    column, the corpus-side hot path."""
    acc = None
    for j, lut in enumerate(lut_cols):
        term = F.element_at(lut, F.element_at(codes_col, j + 1) + F.lit(1))
        acc = term if acc is None else acc + term
    return F.round(acc, round_to)


def _attach_luts(
    q: DataFrame, codebooks: list[list[list[float]]], sub: int
) -> tuple[DataFrame, list[str]]:
    """Attach the per-query ADC lookup tables (``__lut<j>`` = the k dots
    of the query's j-th subvector against codebook j) to the small query
    side — THE one definition the three serving faces share (pq_topk /
    ivfpq_topk / IvfIndex.topk_adc; r12 second review: three verbatim
    copies had already appeared)."""
    lut_names = []
    for j, cb in enumerate(codebooks):
        q_sub = F.slice(F.col("__qvec"), j * sub + 1, sub)
        lut = F.array(
            *[
                dot(q_sub, F.array(*[F.lit(float(x)) for x in entry]))
                for entry in cb
            ]
        )
        name = f"__lut{j}"
        q = q.withColumn(name, lut)
        lut_names.append(name)
    return q, lut_names


def _adc_rerank(
    cand: DataFrame,
    vectors: DataFrame,
    qvecs: DataFrame,
    k: int,
    rerank_factor: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """The shared ADC tail: per-query top ``k * rerank_factor`` of the
    SKINNY (query_id, id, qscore) candidates, then the exact
    ``round(cosine, 6)`` rerank of the broadcast survivors against
    ``vectors`` (full-precision side) and ``qvecs`` (one row per query).
    One definition so the qscore/rerank conventions cannot drift across
    the serving faces."""
    survivors = _topk(
        cand, k * rerank_factor, query_id_col, id_col,
        score_col="qscore", rank_col="qrank",
    ).select(query_id_col, id_col)
    rer = vectors.join(F.broadcast(survivors), id_col).join(
        F.broadcast(qvecs), query_id_col
    )
    scored = rer.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("score"),
    )
    return _topk(scored, k, query_id_col, id_col)


def ivfpq_assign_encode(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    output_cols: list[str] | None = None,
) -> DataFrame:
    """FUSED cell assignment + PQ encoding: ONE Arrow pass computes both
    ``__ivf_cell`` and ``pq_codes`` (r12 second review: chaining
    ``ivf_assign`` then ``pq_encode`` serializes every full-precision
    vector through Python twice — on the build/append/ingest hot path
    that is 2x the corpus Arrow traffic for the same math). Cells and
    codes are bit-identical to the chained kernels (same
    ``_argmax_refold``, same ``_vec_matrix`` dirty mask; pytest-proven
    on clean AND dirty rows): dirty rows emit NULL for both, a
    non-finite CELL score nulls the cell, a non-finite SUBSPACE score
    nulls the codes."""
    import numpy as np

    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    cent_mat = np.asarray(centroids, dtype=np.float64).T  # (dim, n_cells)
    abs_cent = np.abs(cent_mat)
    dim = cent_mat.shape[0]
    m, sub = _check_geometry(dim, codebooks)
    mats = [np.asarray(cb, dtype=np.float64).T for cb in codebooks]
    abs_mats = [np.abs(x) for x in mats]
    kept = _kept_fields(corpus, output_cols)
    schema = StructType(
        kept
        + [
            StructField("__ivf_cell", IntegerType()),
            StructField("pq_codes", ArrayType(IntegerType())),
        ]
    )
    kept_names = [f.name for f in kept]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[kept_names].copy()
            cell_res = pd.array([None] * len(pdf), dtype="Int32")
            code_res = [None] * len(pdf)
            if len(pdf):
                valid, mtx = _vec_matrix(pdf[vec_col].to_numpy(), dim)
                if valid.any():
                    cells, cfin = _argmax_refold(mtx, cent_mat, abs_cent)
                    out_cells = pd.array(cells, dtype="Int32")
                    out_cells[~cfin] = None
                    cell_res[valid] = out_cells
                    codes = np.empty((mtx.shape[0], m), dtype=np.int32)
                    finite = np.ones(mtx.shape[0], dtype=bool)
                    for j in range(m):
                        sl = mtx[:, j * sub : (j + 1) * sub]
                        cj, fin = _argmax_refold(sl, mats[j], abs_mats[j])
                        finite &= fin
                        codes[:, j] = cj
                    rows = [
                        c if f else None
                        for c, f in zip(codes.tolist(), finite)
                    ]
                    it = iter(rows)
                    code_res = [next(it) if v else None for v in valid]
            out["__ivf_cell"] = cell_res
            out["pq_codes"] = pd.Series(code_res, dtype=object)
            yield out

    return _widen_narrow_input(corpus).mapInPandas(run, schema=schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    k_codes: int = 8,
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k via PQ/ADC + exact rerank.

    Scale path: at write time the corpus is encoded ONCE and the scored
    scan reads only (id, m-byte codes); each query broadcasts with its
    LUT (m arrays of k doubles, built from ``dot`` on the small side);
    the candidate stage is a map-side broadcast join + codegen ADC; only
    the Q*k' survivor ids shuffle back for the full-precision rerank.
    ``rerank_factor`` trades recall for rerank cost — covering the
    corpus makes the answer exactly brute force (the pytest theorem).
    """
    if codebooks is None:
        codebooks = pq_codebooks(dim, m, k_codes, seed)
    m, sub = _check_geometry(dim, codebooks)

    base = corpus.select(id_col, vec_col)
    coded = pq_encode(base, codebooks, vec_col, output_cols=[id_col])

    q = queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
    q, lut_names = _attach_luts(q, codebooks, sub)

    # SKINNY candidate payload (CLAUDE.md rule; r12 review): the ADC rows
    # that flow through the per-query top-k shuffle carry only
    # (query_id, id, qscore) — the full-precision __qvec re-attaches to
    # the Q*k' survivors from the tiny broadcast query side afterwards
    cand = coded.join(F.broadcast(q.drop("__qvec")), F.lit(True)).select(
        query_id_col,
        id_col,
        _adc_score(F.col("pq_codes"), [F.col(n) for n in lut_names]).alias(
            "qscore"
        ),
    )
    return _adc_rerank(
        cand, base, q.select(query_id_col, "__qvec"), k, rerank_factor,
        id_col, vec_col, query_id_col,
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_codes: int = 8,
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN index shape (Jégou et al. 2011; the
    FAISS `IVFx,PQy` family) — IVF cell pruning bounds WHICH rows are
    scored, PQ codes bound the BYTES each scored row costs. The two
    single-axis operators compose verbatim:

    - corpus side: ONE fused Arrow pass (:func:`ivfpq_assign_encode`)
      computes cell AND codes — the stored/scanned row is
      (id, cell, m bytes); at 100 TB this is the layout written once
      at ingest, cell-partitioned like ``IvfIndex``, and a query's scan
      touches n_probe/n_cells of the corpus at ~m bytes per row;
    - query side: the probe list (:func:`probe_cell_order`, the exact
      ivf_topk slice) and the ADC LUTs ride the same small broadcast
      row — LUTs are computed BEFORE the probe-cell explode so each
      query pays the m x k dots once, not once per probed cell;
    - candidates: equi-join on the probed cell (the bounded-key shuffle
      shape), codegen ADC, per-query top k*rerank_factor — SKINNY
      (query_id, id, qscore) rows through the window;
    - exact rerank of the broadcast survivors (round(cosine, 6), the
      shared tiebreak).

    Dirty contract composes too: a dirty corpus vector gets a NULL cell
    (never joins); a dirty query gets a NULL probe order (drops out).
    Every stage is oracle-replayable — cells, codes, probe lists, LUT
    scores, rerank — so the catalog checks VALUES, not a recall bound.
    """
    cents = _resolve_centroids(centroids, dim, n_cells, seed)
    if codebooks is None:
        codebooks = pq_codebooks(dim, m, k_codes, seed)
    m, sub = _check_geometry(dim, codebooks)

    base = corpus.select(id_col, vec_col)
    coded = ivfpq_assign_encode(
        base, cents, codebooks, vec_col, output_cols=[id_col]
    )

    q = queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
    q, lut_names = _attach_luts(q, codebooks, sub)
    probe = F.slice(probe_cell_order(F.col("__qvec"), cents), 1, n_probe)
    probed = q.withColumn("__ivf_cell", F.explode(probe))

    cand = coded.join(
        F.broadcast(probed.drop("__qvec")), "__ivf_cell"
    ).select(
        query_id_col,
        id_col,
        _adc_score(F.col("pq_codes"), [F.col(n) for n in lut_names]).alias(
            "qscore"
        ),
    )
    return _adc_rerank(
        cand, base, q.select(query_id_col, "__qvec"), k, rerank_factor,
        id_col, vec_col, query_id_col,
    )


def pq_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 4,
    k_codes: int = 8,
    factors: tuple[int, ...] = (1, 2),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Per-query recall@k of the PQ/ADC index vs the exact cosine top-k —
    the :func:`similarity.ivf_recall` twin for the PQ family, closing the
    recall-contract story for every ANN face (IVF / LSH / PQ).
    ``factors`` are RERANK-FACTOR settings: ``pq_topk(rerank_factor=f)``
    keeps the per-query top ``k*f`` by ADC score, and those survivor sets
    are NESTED in ``f`` (one total qscore ordering), so the shared
    ``_nested_probe_recall`` engine serves every setting from ONE scored
    pass — ``__pos`` = the pair's per-query ADC rank, and the setting's
    candidate set is exactly ``__pos <= k*f``.

    The two family theorems hold: recall is monotone in ``f`` (candidate
    superset + rerank), and ``recall_full`` (unbounded ``__pos`` — the
    degenerate no-compression scan) is EXACTLY 1.0, bit-for-bit, because
    the exact baseline scores with the identical ``round(cosine, 6)``
    expression the rerank uses."""
    from metadata_ingestion_framework_spark.operators.similarity import (
        _nested_probe_recall,
    )

    if codebooks is None:
        codebooks = pq_codebooks(dim, m, k_codes, seed)
    m, sub = _check_geometry(dim, codebooks)
    # norms hoisted out of the per-pair scoring (r18 OPT — see
    # similarity.cosine): corpus norm rides the encode kernel, query norm
    # is a build-side projection materialized at broadcast build
    coded = pq_encode(
        corpus.select(id_col, vec_col), codebooks, vec_col, norm_col="__vn"
    )
    q = queries.select(
        query_id_col, F.col(vec_col).alias("__qvec")
    ).withColumn("__qn", l2_norm(F.col("__qvec")))
    q, lut_names = _attach_luts(q, codebooks, sub)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__qscore").desc_nulls_last(), F.col(id_col).asc()
    )
    scored = (
        coded.crossJoin(F.broadcast(q))
        .select(
            query_id_col,
            id_col,
            _adc_score(
                F.col("pq_codes"), [F.col(n) for n in lut_names]
            ).alias("__qscore"),
            F.round(
                cosine(
                    F.col(vec_col),
                    F.col("__qvec"),
                    F.col("__vn"),
                    F.col("__qn"),
                ),
                6,
            ).alias("score"),
        )
        .withColumn("__pos", F.row_number().over(w))
        .drop("__qscore")
    )
    settings = [(f"recall_rf{f}", k * f) for f in factors] + [
        ("recall_full", 1 << 30)
    ]
    return _nested_probe_recall(scored, k, settings, query_id_col, id_col)


# --- codebook persistence (r12) --------------------------------------------
# Like the BPE tokenizer, PQ codebooks are train-once cross-run artifacts:
# codes written at ingest are only decodable against the EXACT codebooks
# that produced them, so the books version through VersionedParquetStore
# (parquet doubles round-trip float64 exactly) behind a config guard that
# refuses a root trained under a different (dim, m, k) geometry.

PQ_BOOKS_TABLE = "pq_codebooks"


def save_pq_model(
    spark, root: str, codebooks: list[list[list[float]]]
) -> int:
    """Persist the trained sub-codebooks as one new store version;
    returns the version. Retraining writes a NEW version — codes encoded
    under the old books stay decodable via
    ``load_pq_model(version=...)`` time travel."""
    import os

    from metadata_ingestion_framework_spark.operators.incremental import (
        _check_store_config,
    )
    from metadata_ingestion_framework_spark.plans.tablestore import (
        VersionedParquetStore,
    )

    m = len(codebooks)
    k = len(codebooks[0])
    sub = len(codebooks[0][0])
    os.makedirs(root, exist_ok=True)
    _check_store_config(
        root, {"format": "pq", "dim": m * sub, "m": m, "k": k}
    )
    rows = [
        (j, c, [float(x) for x in entry])
        for j, cb in enumerate(codebooks)
        for c, entry in enumerate(cb)
    ]
    df = spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    )
    return VersionedParquetStore(spark, root).write(df, PQ_BOOKS_TABLE)


def load_pq_model(
    spark, root: str, version: int | None = None
) -> list[list[list[float]]]:
    """The sub-codebooks back from a :func:`save_pq_model` store —
    bit-identical float64 (pytest-proven code-identical re-encode).
    Bounded driver collect (m x k rows)."""
    import json
    import os

    from metadata_ingestion_framework_spark.plans.tablestore import (
        VersionedParquetStore,
    )

    path = os.path.join(root, "_config.json")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no PQ model at {root}")
    with open(path) as f:
        stored = json.load(f)
    if stored.get("format") != "pq":
        from metadata_ingestion_framework_spark.operators.incremental import (
            _config_diff,
        )

        raise ValueError(
            f"store at {root} is not a PQ codebook store "
            f"(mismatched keys: {_config_diff(stored, {'format': 'pq'})})"
        )
    rows = (
        VersionedParquetStore(spark, root)
        .read(PQ_BOOKS_TABLE, version)
        .orderBy("subspace", "code")
        .collect()
    )
    books: list[list[list[float]]] = []
    for r in rows:
        while len(books) <= r.subspace:
            books.append([])
        books[r.subspace].append(list(r.centroid))
    return books
