"""Persistent trained-IVF index (operators/ivf_index.py): build/serve
equality with ivf_topk, file-level pruning evidence, reload without
retraining, and config guards."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.ivf_index import IvfIndex

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _queries(spark):
    return (
        spark.read.parquet(EMB)
        .filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def test_build_serve_matches_ivf_topk(spark, tmp_path):
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.read.parquet(EMB)
    idx = IvfIndex(spark, str(tmp_path / "ivf"), dim=64, n_cells=8)
    idx.build(emb)
    got = idx.topk(_queries(spark), k=10, n_probe=2)
    expected = ivf_topk(
        emb, _queries(spark), dim=64, k=10, n_cells=8, n_probe=2,
        centroids=idx.centroids,
    )
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, expected.collect()))
    assert g == e and len(g) > 0
    unpersist_deps(got)


def test_serve_scan_is_file_pruned(spark, tmp_path):
    """Corrupt every file of a cell NO query probes: the pruned serve path
    never opens them and still answers; a full-store read fails."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )

    emb = spark.read.parquet(EMB)
    idx = IvfIndex(spark, str(tmp_path / "ivf"), dim=64, n_cells=8)
    idx.build(emb)
    q = _queries(spark)
    probe = idx.topk(q, k=5, n_probe=2)
    probed = {r.cell for r in getattr(probe, "_persisted_deps")[0]
              .select("cell").distinct().collect()}
    baseline = sorted(map(tuple, probe.collect()))
    unpersist_deps(probe)
    unprobed = sorted(set(range(8)) - probed)
    assert unprobed, "fixture needs at least one unprobed cell"
    vdir = idx.store._version_path(
        IvfIndex.VECS, idx.store.current_version(IvfIndex.VECS)
    )
    files = glob.glob(os.path.join(vdir, f"cell={unprobed[0]}", "*.parquet"))
    assert files
    for f in files:
        with open(f, "wb") as fh:
            fh.write(b"not a parquet file")
    again = idx.topk(q, k=5, n_probe=2)
    assert sorted(map(tuple, again.collect())) == baseline
    unpersist_deps(again)
    with pytest.raises(Exception):
        idx.store.read(IvfIndex.VECS).count()


def test_reload_serves_without_retraining(spark, tmp_path):
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )

    emb = spark.read.parquet(EMB)
    root = str(tmp_path / "ivf")
    IvfIndex(spark, root, dim=64, n_cells=8).build(emb)
    reopened = IvfIndex(spark, root, dim=64, n_cells=8)
    assert reopened.centroids is not None
    out = reopened.topk(_queries(spark), k=5, n_probe=2)
    assert out.count() > 0
    unpersist_deps(out)
    # mismatched config refuses to open
    with pytest.raises(ValueError, match="built with"):
        IvfIndex(spark, root, dim=64, n_cells=16)


def test_unbuilt_index_errors(spark, tmp_path):
    idx = IvfIndex(spark, str(tmp_path / "empty"), dim=64)
    with pytest.raises(FileNotFoundError, match="not built"):
        idx.topk(_queries(spark))
