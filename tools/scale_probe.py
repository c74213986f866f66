"""10x scale probe for the similarity/dedup family (VERDICT r1 item 10).

Replicates sf0.1 documents/embeddings 10x (id-offset replicas; document text
lightly perturbed so replicas are near- not exact-dups) and times each
operator's STAGES separately at 1x and 10x, so super-linear growth in any
stage is visible. Appends one JSON line to PROGRESS.jsonl.

Run: python tools/scale_probe.py [sf_dir] [replicas]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def replicate_docs(docs, n: int):
    base = docs.count()
    copies = [docs]
    for i in range(1, n):
        copies.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * base))
            .withColumn("text", F.concat(F.col("text"), F.lit(f" replica {i}")))
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def replicate_embeddings(emb, n: int):
    base = emb.count()
    copies = [emb]
    for i in range(1, n):
        copies.append(emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * base)))
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def timed(label: str, action, sink: dict) -> None:
    t0 = time.perf_counter()
    n = action()
    sink[label] = {"sec": round(time.perf_counter() - t0, 2), "rows": n}
    print(f"  {label}: {sink[label]['sec']}s rows={n}", file=sys.stderr)


def probe(spark, docs, emb, tag: str) -> dict:
    from metadata_ingestion_framework_spark.operators.dedup import (
        minhash_lsh_duplicates,
        minhash_signatures,
        simhash_duplicates,
    )
    from metadata_ingestion_framework_spark.operators.similarity import (
        embedding_near_duplicates,
        lsh_bucket,
        lsh_topk,
        random_hyperplanes,
    )

    r: dict = {}
    print(f"== {tag} ==", file=sys.stderr)

    # --- minhash: stage 1 signatures (Python kernel), stage 2 band join+verify
    docs.persist().count()
    timed("minhash_signatures", lambda: minhash_signatures(docs, "text", "doc_id").count(), r)
    timed(
        "minhash_lsh_total",
        lambda: minhash_lsh_duplicates(docs, "text", "doc_id", jaccard_threshold=0.5).count(),
        r,
    )

    # --- simhash end-to-end
    timed("simhash_pairs", lambda: simhash_duplicates(docs, "text", "doc_id").count(), r)

    # --- prefix-filtered exact jaccard, corpus-global (no blocking)
    from metadata_ingestion_framework_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
        unpersist_deps,
    )

    def _prefix_join():
        out = ngram_jaccard_pairs_prefix(docs, "text", "doc_id", None, threshold=0.5)
        n = out.count()
        unpersist_deps(out)
        return n

    timed("prefix_jaccard_global", _prefix_join, r)

    # --- embedding near-dup: stage 1 block shuffle, stage 2 blocked matmul
    emb.persist().count()
    timed(
        "neardup_block_counts",
        lambda: emb.groupBy("label").count().count(), r,
    )
    timed(
        "embedding_neardup_total",
        lambda: embedding_near_duplicates(emb, "label", threshold=0.35).count(), r,
    )

    # --- lsh_topk: stage 1 corpus bucketing (map-only), stage 2 probe+rerank
    planes = random_hyperplanes(64, 6)
    timed(
        "lsh_bucket_corpus",
        lambda: emb.withColumn("b", lsh_bucket(F.col("embedding"), planes))
        .groupBy("b").count().count(),
        r,
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed(
        "lsh_topk_total",
        lambda: lsh_topk(emb, queries, dim=64, k=10, n_planes=6).count(), r,
    )

    # --- r5 Arrow kernels + r6 int8 path (VERDICT r5 next-round item 2:
    # the rewritten hot kernels shipped without re-probed scale evidence)
    from metadata_ingestion_framework_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        ivf_topk_int8,
        random_centroids,
        with_l2_norm,
        with_lsh_buckets,
    )

    timed(
        "with_lsh_buckets_corpus",  # Arrow matmul twin of lsh_bucket_corpus
        lambda: with_lsh_buckets(emb, planes).groupBy("__bucket").count().count(),
        r,
    )
    cents = random_centroids(64, 8)
    timed(
        "ivf_assign_corpus",
        lambda: ivf_assign(emb, cents).groupBy("__ivf_cell").count().count(),
        r,
    )
    timed(
        "with_l2_norm_corpus",
        lambda: with_l2_norm(emb, "embedding", "n").count(),
        r,
    )
    timed(
        "ivf_topk_total",
        lambda: ivf_topk(emb, queries, dim=64, k=10, n_cells=8, n_probe=2).count(),
        r,
    )
    timed(
        "ivf_topk_int8_total",
        lambda: ivf_topk_int8(emb, queries, dim=64, k=10, n_cells=8, n_probe=2).count(),
        r,
    )

    # --- r6 text/training-data operators (explode + codegen agg paths)
    from metadata_ingestion_framework_spark.functions.text import (
        pack_manifest,
        repetition_stats,
    )
    from metadata_ingestion_framework_spark.operators.dedup import (
        ngram_contamination,
    )

    timed(
        "repetition_stats",
        lambda: repetition_stats(docs, "text", "doc_id").count(),
        r,
    )
    timed(
        "pack_manifest",
        lambda: pack_manifest(docs, "text", "doc_id", 512, 32).count(),
        r,
    )
    evals = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    timed(
        "decontaminate_pairs",
        lambda: ngram_contamination(
            train, evals, "text", "doc_id", shingle_n=5, min_shared=3
        ).count(),
        r,
    )
    docs.unpersist()
    emb.unpersist()
    return r


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import t

    spark = get_spark("scale_probe")
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")

    result = {
        "probe": "similarity_dedup_10x",
        "sf_dir": sf_dir,
        "replicas": replicas,
        "base": probe(spark, docs, emb, "1x"),
        "scaled": probe(
            spark, replicate_docs(docs, replicas), replicate_embeddings(emb, replicas),
            f"{replicas}x",
        ),
    }
    # growth factors per stage (10x data -> want ~10x or less; matmul blocks
    # are quadratic per block by design, flagged not hidden)
    result["growth"] = {
        k: round(result["scaled"][k]["sec"] / max(result["base"][k]["sec"], 0.01), 1)
        for k in result["base"]
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    _write_probe_md(result)
    print(json.dumps(result))
    spark.stop()


def _write_probe_md(result: dict) -> None:
    """Durable record (PROBE.md): PROGRESS.jsonl is driver-truncated between
    rounds (the r1-r4 probe history was lost that way — VERDICT r5)."""
    import datetime

    lines = [
        "# 10x scale probe (latest run)",
        "",
        f"date: {datetime.date.today().isoformat()}  ",
        f"data: {result['sf_dir']} replicated {result['replicas']}x "
        "(near-dup perturbed docs, id-offset embeddings)  ",
        "interpretation: 10x rows -> growth ~<=10x is linear; the blocked "
        "matmul stages are quadratic per block BY DESIGN and bounded by "
        "block size, so their growth reflects block-count x block-cost.",
        "",
        "| stage | 1x sec (rows) | 10x sec (rows) | growth |",
        "|---|---|---|---|",
    ]
    for k in result["base"]:
        b, s = result["base"][k], result["scaled"][k]
        lines.append(
            f"| {k} | {b['sec']} ({b['rows']}) | {s['sec']} ({s['rows']}) "
            f"| {result['growth'][k]}x |"
        )
    lines.append("")
    with open("PROBE.md", "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
