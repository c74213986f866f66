"""Same-session A/B of the ann_recall contract query (r13, VERDICT r12
item 3): the 2-face r11 form (IVF + LSH) vs the 3-face r12 form
(+ PQ), min-of-2 each, alternating, so the BENCH history gets a clean
anchor for the composition change instead of a phantom "regression".

Run idle: python tools/ann_recall_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def two_face(spark, sf_dir):
    """The r11 shape: q_ann_recall minus the PQ face (same code paths,
    same persists, same mean agg)."""
    from metadata_ingestion_framework_spark.catalog_queries import (
        _kmeans_model,
        t,
    )
    from metadata_ingestion_framework_spark.operators.dedup import carry_deps
    from metadata_ingestion_framework_spark.operators.similarity import (
        ivf_recall,
        lsh_recall,
    )

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    model = _kmeans_model(spark, sf_dir)
    r = ivf_recall(
        emb, queries, dim=64, k=10, n_cells=8, probes=(2, 4),
        centroids=model.unit_centroids,
    ).persist()
    means = r.agg(
        F.avg("recall_p2").alias("__mean_p2"),
        F.avg("recall_p4").alias("__mean_p4"),
    )
    ivf = r.crossJoin(F.broadcast(means)).select(
        "query_id",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        "recall_full",
        (
            (F.col("recall_p2") <= F.col("recall_p4"))
            & (F.col("recall_p4") <= F.col("recall_full"))
        ).alias("mono_ok"),
    )
    s = lsh_recall(emb, queries, dim=64, k=10, n_planes=4, probes=(0, 2))
    lsh = s.select(
        "query_id",
        F.col("recall_full").alias("lsh_recall_full"),
        (
            (F.col("recall_m0") <= F.col("recall_m2"))
            & (F.col("recall_m2") <= F.col("recall_full"))
        ).alias("lsh_mono_ok"),
    )
    out = ivf.join(F.broadcast(lsh), "query_id")
    out = carry_deps(carry_deps(out, r), s)
    out._persisted_deps = list(getattr(out, "_persisted_deps", ())) + [r]
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bench import run_query
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import (
        QUERIES,
    )

    spark = get_spark("ann_recall_ab")
    load1 = os.getloadavg()[0]
    # one untimed warmup of each form, then alternate min-of-2
    for fn in (two_face, QUERIES["ann_recall"]):
        run_query(spark, fn, sf_dir)
    times = {"two_face": [], "three_face": []}
    for _ in range(2):
        t2, _n = run_query(spark, two_face, sf_dir)
        t3, _n = run_query(spark, QUERIES["ann_recall"], sf_dir)
        times["two_face"].append(round(t2, 2))
        times["three_face"].append(round(t3, 2))
    result = {
        "probe": "ann_recall_ab_r13",
        "sf_dir": sf_dir,
        "load_avg_at_start": round(load1, 2),
        "reps": times,
        "min": {k: min(v) for k, v in times.items()},
        "pq_face_cost_sec": round(
            min(times["three_face"]) - min(times["two_face"]), 2
        ),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
