"""Persistent trained-IVF ANN index — the serving capstone of the
similarity family (north-star extension; no reference analogue).

Ties three proven pieces into the shape a 100 TB deployment actually
runs:

  - :func:`~.kmeans.kmeans_fit` trains the coarse quantizer (optionally
    on a bounded md5-ordered sample — FAISS practice);
  - the corpus is written ONCE into a cell-partitioned
    ``VersionedParquetStore`` layout (``cell=<j>/`` directories — the
    layout whose file-level pruning ``tests/test_layout_pruning.py``
    proves with corrupted-unprobed-file evidence);
  - serving reads ONLY the probed cells: the per-query probe list is the
    shared :func:`~.similarity.probe_cell_order` expression, the store
    scan filters ``cell IN (<union of probed cells>)`` (directory
    pruning — an ``n_probe/n_cells`` fraction of the files is opened),
    and the exact rerank joins the broadcast query-cell pairs exactly
    like :func:`~.similarity.ivf_topk` — so results are value-identical
    to running ivf_topk over the full corpus with the same centroids.

Centroids persist beside the table (``_centroids.json``) so a fresh
session serves without retraining; they are fixed for the index's
lifetime (retrain => rebuild — the standard re-cluster contract).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.kmeans import kmeans_fit
from metadata_ingestion_framework_spark.operators.similarity import (
    cosine,
    ivf_assign,
    probe_cell_order,
)
from metadata_ingestion_framework_spark.plans.tablestore import (
    VersionedParquetStore,
)


class IvfIndex:
    VECS = "vectors"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        dim: int,
        n_cells: int = 8,
        n_iters: int = 3,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.root = root
        self.store = VersionedParquetStore(spark, root)
        self.dim = dim
        self.n_cells = n_cells
        self.n_iters = n_iters
        self.id_col = id_col
        self.vec_col = vec_col
        self._cent_path = os.path.join(root, "_centroids.json")
        self.centroids: list[list[float]] | None = None
        if os.path.exists(self._cent_path):
            with open(self._cent_path) as f:
                meta = json.load(f)
            if meta["dim"] != dim or meta["n_cells"] != n_cells:
                raise ValueError(
                    f"index at {root} was built with dim={meta['dim']}, "
                    f"n_cells={meta['n_cells']}"
                )
            self.centroids = meta["unit_centroids"]

    def build(
        self,
        corpus: DataFrame,
        sample_limit: int | None = None,
        centroids: list[list[float]] | None = None,
    ) -> None:
        """Train (unless ``centroids`` given), assign, and write the
        cell-partitioned layout. One Arrow assignment pass over the
        corpus; the write is the one-time layout cost that buys every
        future query its partition-pruned scan."""
        if centroids is None:
            model = kmeans_fit(
                corpus, self.id_col, self.vec_col, self.dim, self.n_cells,
                self.n_iters, sample_limit=sample_limit,
            )
            centroids = model.unit_centroids
        elif len(centroids) != self.n_cells:
            raise ValueError(
                f"centroids has {len(centroids)} cells, expected "
                f"n_cells={self.n_cells}"
            )
        assigned = ivf_assign(
            corpus.select(self.id_col, self.vec_col), centroids, self.vec_col
        ).withColumnRenamed("__ivf_cell", "cell")
        self.store.write(assigned, self.VECS, partition_by=["cell"])
        tmp = self._cent_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "dim": self.dim,
                    "n_cells": self.n_cells,
                    "unit_centroids": centroids,
                },
                f,
            )
        os.replace(tmp, self._cent_path)  # atomic, like _CURRENT
        self.centroids = centroids

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 2,
        query_id_col: str = "query_id",
    ) -> DataFrame:
        """Partition-pruned approximate top-k: identical values to
        ``ivf_topk(corpus, queries, centroids=<index centroids>)`` —
        same probe order, same round(cosine, 6) rerank, same (score desc,
        id asc) tiebreak — but the corpus scan opens only the probed
        cells' files. The probed-cell union is a bounded driver collect
        (<= Q * n_probe values, the manual-DPP pattern)."""
        if self.centroids is None:
            raise FileNotFoundError(f"index at {self.root} is not built")
        q = queries.select(
            query_id_col, F.col(self.vec_col).alias("__qvec")
        ).withColumn(
            "cell",
            F.explode(
                F.slice(
                    probe_cell_order(F.col("__qvec"), self.centroids),
                    1,
                    n_probe,
                )
            ),
        )
        q = q.persist()  # consumed twice: probed-cell collect + the join
        try:
            probed = [r.cell for r in q.select("cell").distinct().collect()]
            c = self.store.read(self.VECS).filter(F.col("cell").isin(probed))
            scored = c.join(F.broadcast(q), "cell").select(
                query_id_col,
                self.id_col,
                F.round(
                    cosine(F.col(self.vec_col), F.col("__qvec")), 6
                ).alias("score"),
            )
            w = Window.partitionBy(query_id_col).orderBy(
                F.col("score").desc(), F.col(self.id_col).asc()
            )
            out = (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
            )
            out._persisted_deps = [q]
            return out
        except Exception:
            q.unpersist()
            raise
