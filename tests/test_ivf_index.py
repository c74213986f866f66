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
    files = glob.glob(
        os.path.join(vdir, "vec_bucket=*", f"cell={unprobed[0]}", "*.parquet")
    )
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
    # layout-defining knobs are guarded too (r12, ADVICE r11): a
    # different vec_bucket_width would bucket re-ingested ids away from
    # their stored rows, leaving stale duplicates topk scores directly
    with pytest.raises(ValueError, match="layout"):
        IvfIndex(spark, root, dim=64, n_cells=8, vec_bucket_width=1024)
    with pytest.raises(ValueError, match="layout"):
        IvfIndex(spark, root, dim=64, n_cells=8, n_buckets=32)
    with pytest.raises(ValueError, match="layout"):
        IvfIndex(spark, root, dim=64, n_cells=8, id_col="other_id")


def test_unbuilt_index_errors(spark, tmp_path):
    idx = IvfIndex(spark, str(tmp_path / "empty"), dim=64)
    with pytest.raises(FileNotFoundError, match="not built"):
        idx.topk(_queries(spark))


def test_append_grows_index_and_matches_full_rebuild(spark, tmp_path):
    """r10: incremental append — batch buckets partition-delta in
    (untouched buckets hard-link), a re-embedded id vacates its old cell,
    and serving over build+append equals ivf_topk over the union corpus
    with the same centroids."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.read.parquet(EMB)
    seed = emb.filter("vec_id < 400")
    batch = emb.filter("vec_id >= 400").withColumn(
        "vec_id", F.col("vec_id") + F.lit(10000)
    )
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), dim=64, n_cells=8, vec_bucket_width=256
    )
    idx.build(seed)
    v1 = idx.store.current_version(IvfIndex.VECS)
    idx.append(batch)
    v2 = idx.store.current_version(IvfIndex.VECS)
    assert v2 == v1 + 1
    # untouched seed bucket carried by hard link (batch ids live in
    # bucket >= 10400//256; seed buckets are 0 and 1)
    p1 = idx.store._version_path(IvfIndex.VECS, v1)
    p2 = idx.store._version_path(IvfIndex.VECS, v2)

    def inodes(path):
        return {
            os.stat(f).st_ino
            for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                               recursive=True)
        }

    assert inodes(os.path.join(p2, "vec_bucket=0")) == inodes(
        os.path.join(p1, "vec_bucket=0")
    )
    # serving equals ivf_topk over the union with the same centroids
    union = seed.unionByName(batch)
    got = idx.topk(_queries(spark), k=10, n_probe=3)
    exp = ivf_topk(
        union, _queries(spark), dim=64, k=10, n_cells=8, n_probe=3,
        centroids=idx.centroids,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    unpersist_deps(got)
    # re-embed an existing id with a different vector: SCD1 upsert (one
    # row), and its cell follows the new vector
    old_row = idx.store.read(IvfIndex.VECS).filter("vec_id = 3").collect()[0]
    moved = spark.createDataFrame(
        [(3, [float(-x) for x in old_row[idx.vec_col]])],
        f"vec_id long, {idx.vec_col} array<float>",
    )
    idx.append(moved)
    rows = idx.store.read(IvfIndex.VECS).filter("vec_id = 3").collect()
    assert len(rows) == 1
    assert rows[0][idx.vec_col] != old_row[idx.vec_col]


def test_cell_cap_bounds_partitions_and_serve_identical(spark, tmp_path):
    """r11 (VERDICT r10 item 2): cells above cell_cap sub-split into
    md5-bucketed children — partition sizes become bounded (max/mean
    ratio tamed) while serve results stay IDENTICAL to the unsplit index
    with the same centroids (the split balances partitions; it never
    changes the candidate set)."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )

    raw = spark.read.parquet(EMB)
    # genuinely SKEWED corpus: 80% of the vectors share one embedding, so
    # one IVF cell swallows ~400 rows (the real-corpus hot-cell shape)
    hot = raw.filter("vec_id = 0").collect()[0].embedding
    hot_lit = F.array(*[F.lit(float(x)) for x in hot]).cast("array<float>")
    emb = raw.withColumn(
        "embedding",
        F.when(F.col("vec_id") >= 100, hot_lit).otherwise(F.col("embedding")),
    )
    flat = IvfIndex(spark, str(tmp_path / "flat"), dim=64, n_cells=4)
    flat.build(emb)
    cap = 60
    capped = IvfIndex(
        spark, str(tmp_path / "capped"), dim=64, n_cells=4, cell_cap=cap
    )
    capped.build(emb, centroids=flat.centroids)
    assert capped.cell_splits, "the hot cell must exceed cap=60"
    hist = capped.cell_histogram().collect()
    sizes = [r.n_vecs for r in hist]
    assert max(sizes) <= int(1.5 * cap)  # bounded (md5 split slack)
    flat_hist = [r.n_vecs for r in flat.cell_histogram().collect()]
    assert max(flat_hist) > 300  # the skew is real before the split
    assert max(sizes) / (sum(sizes) / len(sizes)) < max(flat_hist) / (
        sum(flat_hist) / len(flat_hist)
    )
    # every split cell's children partition its rows exactly
    by_cell: dict[int, int] = {}
    for r in hist:
        by_cell[r.cell] = by_cell.get(r.cell, 0) + r.n_vecs
    assert sum(by_cell.values()) == 500
    q = _queries(spark)
    a = capped.topk(q, k=10, n_probe=3)
    b = flat.topk(q, k=10, n_probe=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    unpersist_deps(a)
    unpersist_deps(b)
    # reload restores the split map and keeps serving
    reopened = IvfIndex(
        spark, str(tmp_path / "capped"), dim=64, n_cells=4, cell_cap=cap
    )
    assert reopened.cell_splits == capped.cell_splits
    c = reopened.topk(q, k=5, n_probe=2)
    assert c.count() > 0
    unpersist_deps(c)


def test_split_layout_append_upserts_and_vacates(spark, tmp_path):
    """Append on a split layout: sub-cell is a pure function of
    (cell, id), so a re-embedded id's partition-delta rewrite vacates its
    old sub-cell dir and serving equals ivf_topk over the union corpus."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.read.parquet(EMB)
    seed = emb.filter("vec_id < 400")
    batch = emb.filter("vec_id >= 400")
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), dim=64, n_cells=4,
        vec_bucket_width=256, cell_cap=50,
    )
    idx.build(seed)
    assert idx.cell_splits
    idx.append(batch)
    got = idx.topk(_queries(spark), k=10, n_probe=3)
    exp = ivf_topk(
        emb, _queries(spark), dim=64, k=10, n_cells=4, n_probe=3,
        centroids=idx.centroids,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    unpersist_deps(got)
    # re-embed id 3 with the negated vector: exactly one row survives and
    # the store holds it under its NEW cell/sub-cell only
    old_row = idx.store.read(IvfIndex.VECS).filter("vec_id = 3").collect()[0]
    moved = spark.createDataFrame(
        [(3, [float(-x) for x in old_row[idx.vec_col]])],
        f"vec_id long, {idx.vec_col} array<float>",
    )
    idx.append(moved)
    rows = idx.store.read(IvfIndex.VECS).filter("vec_id = 3").collect()
    assert len(rows) == 1
    assert rows[0][idx.vec_col] != old_row[idx.vec_col]


def test_append_before_build_errors(spark, tmp_path):
    idx = IvfIndex(spark, str(tmp_path / "empty"), dim=64)
    with pytest.raises(FileNotFoundError, match="not built"):
        idx.append(_queries(spark).withColumnRenamed("query_id", "vec_id"))


@pytest.mark.slow
def test_streaming_append_matches_batch_sequential(spark, tmp_path):
    """Streaming face: micro-batched vectors through foreachBatch append
    equal batch-sequential appends — same store versions shape, same
    serving results."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )

    emb = spark.read.parquet(EMB)
    seed = emb.filter("vec_id < 300")
    src = tmp_path / "vec_stream"
    src.mkdir()
    for i, (lo, hi) in enumerate(((300, 350), (350, 400), (400, 450))):
        emb.filter(f"vec_id >= {lo} AND vec_id < {hi}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))

    stream_idx = IvfIndex(
        spark, str(tmp_path / "ivf_stream"), dim=64, n_cells=8,
        vec_bucket_width=64,
    )
    stream_idx.build(seed)

    def sink(bdf, batch_id):
        if bdf.count():
            stream_idx.append(bdf)

    q = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch_idx = IvfIndex(
        spark, str(tmp_path / "ivf_batch"), dim=64, n_cells=8,
        vec_bucket_width=64,
    )
    batch_idx.build(seed, centroids=stream_idx.centroids)
    for i in range(3):
        batch_idx.append(spark.read.parquet(str(src / f"b{i}")))

    assert (
        stream_idx.store.read(IvfIndex.VECS).count()
        == batch_idx.store.read(IvfIndex.VECS).count()
        == 450
    )
    a = stream_idx.topk(_queries(spark), k=10, n_probe=2)
    b = batch_idx.topk(_queries(spark), k=10, n_probe=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    unpersist_deps(a)
    unpersist_deps(b)


def test_retire_ids_below_zero_rewrite_and_serve(spark, tmp_path):
    """r12: retention completes the index lifecycle — buckets below the
    cutoff drop by not being carried (surviving buckets hard-link:
    zero-rewrite), the boundary bucket is rewritten filtered, retired ids
    vanish from topk (physical expiry — the ghost-intolerant class), and
    serving equals ivf_topk over the surviving corpus with the same
    centroids."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.read.parquet(EMB)
    idx = IvfIndex(
        spark, str(tmp_path / "ivf"), dim=64, n_cells=8, vec_bucket_width=128
    )
    idx.build(emb)
    v1 = idx.store.current_version(IvfIndex.VECS)
    cutoff = 300  # bucket 0/1 drop whole, bucket 2 (256..383) is boundary
    idx.retire_ids_below(cutoff)
    v2 = idx.store.current_version(IvfIndex.VECS)
    # up to two versions: the whole-bucket drop + the boundary rewrite
    assert v1 < v2 <= v1 + 2
    p1 = idx.store._version_path(IvfIndex.VECS, v1)
    p2 = idx.store._version_path(IvfIndex.VECS, v2)

    def inodes(path):
        return {
            os.stat(f).st_ino
            for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                               recursive=True)
        }

    assert not glob.glob(os.path.join(p2, "vec_bucket=0"))  # dropped
    assert not glob.glob(os.path.join(p2, "vec_bucket=1"))
    # surviving bucket 3 carried by hard link, boundary bucket 2 rewritten
    assert inodes(os.path.join(p2, "vec_bucket=3")) == inodes(
        os.path.join(p1, "vec_bucket=3")
    )
    assert inodes(os.path.join(p2, "vec_bucket=2")).isdisjoint(
        inodes(os.path.join(p1, "vec_bucket=2"))
    )
    ids = {
        r.vec_id
        for r in idx.store.read(IvfIndex.VECS).select("vec_id").collect()
    }
    assert min(ids) >= cutoff
    # serving == ivf_topk over the survivors; no retired id surfaces
    survivors = emb.filter(F.col("vec_id") >= cutoff)
    got = idx.topk(_queries(spark), k=10, n_probe=8)
    exp = ivf_topk(
        survivors, _queries(spark), dim=64, k=10, n_cells=8, n_probe=8,
        centroids=idx.centroids,
    )
    rows = got.collect()
    assert all(r.vec_id >= cutoff for r in rows)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, exp.collect()))
    unpersist_deps(got)
    # old version stays time-travelable until vacuum
    old_ids = {
        r.vec_id
        for r in idx.store.read(IvfIndex.VECS, version=v1)
        .select("vec_id").collect()
    }
    assert min(old_ids) < cutoff


def test_legacy_meta_backfilled_on_open(spark, tmp_path):
    """r12 review: a pre-r12 index (meta without the layout keys) must
    not stay guard-exempt forever — the first open backfills the meta
    with its constructor values, and a later mismatched reopen is then
    refused."""
    import json

    emb = spark.read.parquet(EMB)
    root = str(tmp_path / "ivf")
    IvfIndex(spark, root, dim=64, n_cells=8).build(emb)
    # simulate the legacy format: strip the layout keys from the meta
    meta_path = os.path.join(root, "_centroids.json")
    with open(meta_path) as f:
        meta = json.load(f)
    for k in ("vec_bucket_width", "n_buckets", "id_col", "vec_col"):
        meta.pop(k)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    # legacy open succeeds (nothing to compare) and backfills — LOUDLY
    # (ADVICE r12): the operator must be told the guard is being armed
    # from this open's values, since a wrong assumption is durable
    import warnings as _warnings

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        IvfIndex(spark, root, dim=64, n_cells=8, vec_bucket_width=4096)
    assert any("backfilling" in str(w.message) for w in caught)
    with open(meta_path) as f:
        assert json.load(f)["vec_bucket_width"] == 4096
    # the guard is now armed: the original width no longer opens
    with pytest.raises(ValueError, match="layout"):
        IvfIndex(spark, root, dim=64, n_cells=8, vec_bucket_width=8192)


def test_pq_face_serve_and_reload(spark, tmp_path):
    """r12: the PQ-coded serving face — topk_adc with a rerank factor
    covering the probed candidates equals topk exactly (same probe, same
    rerank scoring); a reopened index adopts the stored codebooks and
    serves identically; geometry mismatches and PQ-less indexes error."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )

    emb = spark.read.parquet(EMB)
    root = str(tmp_path / "ivfpq")
    idx = IvfIndex(spark, root, dim=64, n_cells=8, pq_m=4, pq_k=8)
    idx.build(emb)
    assert idx.codebooks is not None and len(idx.codebooks) == 4
    q = _queries(spark)
    exact = idx.topk(q, k=10, n_probe=2)
    baseline = sorted(map(tuple, exact.collect()))
    unpersist_deps(exact)
    # covering rerank factor: ADC keeps every probed candidate -> exact
    adc = idx.topk_adc(q, k=10, n_probe=2, rerank_factor=100)
    got = sorted(map(tuple, adc.collect()))
    unpersist_deps(adc)
    assert got == baseline
    # modest factor still returns k rows per query with the self row first
    adc2 = idx.topk_adc(q, k=5, n_probe=2, rerank_factor=2)
    rows = adc2.collect()
    unpersist_deps(adc2)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == 5
        assert min(rs, key=lambda r: r.rank).vec_id == qid  # self first
    # reload adopts the stored books and serves identically
    reopened = IvfIndex(spark, root, dim=64, n_cells=8)
    assert reopened.codebooks == idx.codebooks
    again = reopened.topk_adc(q, k=10, n_probe=2, rerank_factor=100)
    assert sorted(map(tuple, again.collect())) == baseline
    unpersist_deps(again)
    # geometry guard + PQ-less guard
    with pytest.raises(ValueError, match="PQ geometry"):
        IvfIndex(spark, root, dim=64, n_cells=8, pq_m=8)
    plain_root = str(tmp_path / "plain")
    plain = IvfIndex(spark, plain_root, dim=64, n_cells=8)
    plain.build(emb)
    with pytest.raises(ValueError, match="no PQ codes"):
        plain.topk_adc(q)
    with pytest.raises(ValueError, match="WITHOUT PQ"):
        IvfIndex(spark, plain_root, dim=64, n_cells=8, pq_m=4)


def test_pq_face_append_keeps_codes(spark, tmp_path):
    """Appended batches are encoded with the FIXED stored codebooks, so
    serve-after-append equals a fresh rebuild's ADC serve over the union
    (same centroids, same books)."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )

    emb = spark.read.parquet(EMB)
    seed = emb.filter("vec_id < 400")
    batch = emb.filter("vec_id >= 400")
    idx = IvfIndex(
        spark, str(tmp_path / "inc"), dim=64, n_cells=8, pq_m=4, pq_k=8
    )
    idx.build(seed)
    idx.append(batch)
    got = idx.topk_adc(_queries(spark), k=10, n_probe=3, rerank_factor=4)
    g = sorted(map(tuple, got.collect()))
    unpersist_deps(got)
    full = IvfIndex(
        spark, str(tmp_path / "full"), dim=64, n_cells=8, pq_m=4, pq_k=8
    )
    full.codebooks = idx.codebooks  # same quantizers -> same index
    full.build(emb, centroids=idx.centroids)
    want = full.topk_adc(_queries(spark), k=10, n_probe=3, rerank_factor=4)
    w = sorted(map(tuple, want.collect()))
    unpersist_deps(want)
    assert g == w
