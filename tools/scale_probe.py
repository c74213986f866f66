"""10x scale probe for the similarity/dedup family (VERDICT r1 item 10).

Replicates sf0.1 documents/embeddings 10x (id-offset replicas; document text
lightly perturbed so replicas are near- not exact-dups) and times each
operator's STAGES separately at 1x and 10x, so super-linear growth in any
stage is visible. Appends one JSON line to PROGRESS.jsonl.

Run: python tools/scale_probe.py [sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
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

    # --- r12 PQ family: encode (per-subspace Arrow argmax), codes-only
    # ADC serve, and the IVF-PQ composition (cell equi-join + ADC)
    from metadata_ingestion_framework_spark.operators.pq import (
        ivfpq_topk,
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    books = pq_codebooks(64, 4, 8)
    timed(
        "pq_encode_corpus",
        lambda: pq_encode(emb, books, output_cols=["vec_id"]).count(),
        r,
    )
    timed(
        "pq_topk_total",
        lambda: pq_topk(emb, queries, dim=64, m=4, k_codes=8, k=10,
                        rerank_factor=4).count(),
        r,
    )
    timed(
        "ivfpq_topk_total",
        lambda: ivfpq_topk(emb, queries, dim=64, n_cells=8, n_probe=2,
                           m=4, k_codes=8, k=10, rerank_factor=4).count(),
        r,
    )

    # --- r12 BM25: postings build + broadcast-term query at 10x corpus
    from metadata_ingestion_framework_spark.operators.retrieval import (
        bm25_topk,
    )

    bm25_queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )

    def _bm25_total():
        out = bm25_topk(docs, bm25_queries, k=10)
        n = out.count()
        unpersist_deps(out)  # r14: bm25_topk hands out persisted deps
        return n

    timed("bm25_topk_total", _bm25_total, r)

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
    # --- r7 operators: span removal (kernel + first-occurrence shuffle +
    # map-only rewrite) and semantic dedup (assign + in-cell BLAS + CC)
    from metadata_ingestion_framework_spark.operators.dedup import (
        _span_rows,
        remove_duplicate_spans,
    )
    from metadata_ingestion_framework_spark.operators.similarity import (
        semantic_dedup,
    )

    timed(
        "span_rows_kernel",
        lambda: _span_rows(docs, "text", "doc_id", 6).count(),
        r,
    )
    timed(
        "span_dedup_total",
        lambda: remove_duplicate_spans(docs, "text", "doc_id", span_w=6).count(),
        r,
    )

    def _semantic():
        out = semantic_dedup(emb, "vec_id", "embedding", dim=64, n_cells=8,
                             threshold=0.35)
        n = out.count()
        unpersist_deps(out)
        return n

    timed("semantic_dedup_total", _semantic, r)

    from metadata_ingestion_framework_spark.functions.text import ngram_perplexity
    from metadata_ingestion_framework_spark.operators.incremental import (
        embedding_batch_drops,
    )

    def _perplexity():
        out = ngram_perplexity(docs, "text", "doc_id")
        n = out.count()
        unpersist_deps(out)
        return n

    timed("ngram_perplexity_total", _perplexity, r)

    cents = random_centroids(64, 8)
    cells = ivf_assign(emb.select("vec_id", "embedding"), cents).withColumnRenamed(
        "__ivf_cell", "cell"
    )
    timed(
        "embedding_batch_drops",  # cross-run semantic dedup inner join
        lambda: embedding_batch_drops(
            cells.filter(F.col("vec_id") % 4 < 3),
            cells.filter(F.col("vec_id") % 4 == 3),
            threshold=0.35,
        ).count(),
        r,
    )

    docs.unpersist()
    emb.unpersist()
    return r


def probe_incremental(spark, docs, replicas: int, workdir: str) -> dict:
    """Does incremental-ingest cost track the BATCH or the STORE?

    Seeds a signature store at 1x and at ``replicas``x corpus size, then
    ingests the SAME fixed batch against each and times the phases
    separately:

    - ``sig_kernel``: batch signature build (the Python-kernel cost a full
      rerun would pay for the WHOLE corpus every run);
    - ``inc_query``: band-join + verify + survivor anti-join against the
      store (bucket-pruned columnar scan — the incremental read path);
    - ``inc_ingest_e2e``: the full ingest() including the SCD1 snapshot
      rewrite. The rewrite is the VersionedParquetStore limitation (a new
      immutable version = full columnar copy); Delta MERGE / a bucketed
      sigs table rewrites only touched files — called out, not hidden.
    - ``full_rerun``: minhash_lsh_duplicates over store+batch union — what
      a non-incremental pipeline would run; its cost tracks the corpus.
    """
    import os

    from metadata_ingestion_framework_spark.operators.dedup import (
        minhash_lsh_duplicates,
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.incremental import (
        MinhashSignatureStore,
        minhash_batch_drops,
    )

    base_n = docs.count()
    batch = (
        docs.filter(F.col("doc_id") % 10 == 3)
        .withColumn("doc_id", F.col("doc_id") + F.lit(replicas * base_n * 7))
        .withColumn("text", F.concat(F.col("text"), F.lit(" fresh batch")))
        .persist()
    )
    batch.count()
    out: dict = {}
    for tag, store_docs in [("1x", docs), (f"{replicas}x", replicate_docs(docs, replicas))]:
        r: dict = {}
        print(f"== incremental, store {tag} ==", file=sys.stderr)
        store = MinhashSignatureStore(
            spark, os.path.join(workdir, f"sigstore_{tag}"), jaccard_threshold=0.5
        )
        # seed directly (no dedup): prior runs' accumulated state — through
        # the store's canonical bucket-partitioned layouts (r9: the sigs
        # table is sig_bucket-partitioned so ingests partition-delta it)
        seed_sigs = store._signatures(store_docs).persist()
        timed("seed_store_write", lambda: (
            store.write_sigs_snapshot(seed_sigs),
            store.store.write(store._band_rows(seed_sigs), store.BANDS,
                              partition_by=["bucket"]),
            seed_sigs.count())[-1], r)
        seed_sigs.unpersist()

        batch_sigs = store._signatures(batch).persist()
        timed("sig_kernel_batch", lambda: batch_sigs.count(), r)
        store_sigs = store.store.read(store.SIGS)
        buckets = [x.bucket for x in store._band_rows(batch_sigs)
                   .select("bucket").distinct().collect()]
        store_bands = store.store.read(store.BANDS).filter(F.col("bucket").isin(buckets))
        timed(
            "inc_query",
            lambda: batch.join(
                minhash_batch_drops(store_sigs, batch_sigs, "doc_id",
                                    jaccard_threshold=0.5,
                                    store_bands_df=store_bands),
                "doc_id", "left_anti",
            ).count(),
            r,
        )
        batch_sigs.unpersist()
        def _ingest_e2e():
            out = store.ingest(batch, "probe-run")
            n = out.count()
            for dep in getattr(out, "_persisted_deps", ()):
                dep.unpersist()
            return n

        timed("inc_ingest_e2e", _ingest_e2e, r)

        def _full():
            pairs = minhash_lsh_duplicates(
                store_docs.unionByName(batch), "text", "doc_id", jaccard_threshold=0.5
            )
            n = pairs.count()
            unpersist_deps(pairs)
            return n

        timed("full_rerun_pairs", _full, r)
        out[tag] = r
    batch.unpersist()
    return out


def probe_vecstore(spark, emb, replicas: int, workdir: str) -> dict:
    """Does the EMBEDDING store's ingest AND retention cost track the
    BATCH/SURVIVORS or the STORE? (r10, VERDICT r9 item 3.)

    Seeds a (vec_bucket, cell)-partitioned store at 1x and ``replicas``x,
    then against each:

    - ``vec_ingest_e2e``: ingest a fixed monotone-id batch — the touched
      set is the batch ids' range buckets, so the partition-delta write
      should be ~flat across store sizes;
    - ``vec_retire``: ``retire_ids_below`` just past the first bucket —
      drops whole buckets by NOT carrying them and rewrites only the
      boundary bucket's survivors, so cost should also be ~flat.
    """
    import os

    from metadata_ingestion_framework_spark.operators.incremental import (
        EmbeddingDedupStore,
    )

    base_n = emb.count()
    width = 1024
    out: dict = {}
    for tag, vecs in [
        ("1x", emb), (f"{replicas}x", replicate_embeddings(emb, replicas))
    ]:
        r: dict = {}
        print(f"== vecstore, store {tag} ==", file=sys.stderr)
        store = EmbeddingDedupStore(
            spark, os.path.join(workdir, f"vecstore_{tag}"), dim=64,
            n_cells=8, threshold=0.95, vec_bucket_width=width,
        )
        seeded = store._assign(vecs)
        timed("seed_store_write", lambda: (
            store.store.write(seeded, store.VECS,
                              partition_by=["vec_bucket", "cell"]),
            vecs.count())[-1], r)
        # fresh monotone ids above everything stored (a real ingest mints
        # increasing ids) -> the batch concentrates in its own buckets
        batch = (
            emb.filter(F.col("vec_id") % 10 == 3)
            .withColumn("vec_id", F.col("vec_id") + F.lit(replicas * base_n * 7))
            .persist()
        )
        batch.count()
        def _vec_ingest_e2e():
            out = store.ingest(batch, "probe-run")
            n = out.count()
            for dep in getattr(out, "_persisted_deps", ()):
                dep.unpersist()
            return n

        timed("vec_ingest_e2e", _vec_ingest_e2e, r)
        batch.unpersist()
        timed("vec_retire", lambda: (
            store.retire_ids_below(width + width // 2),
            store.store.read(store.VECS).count())[-1], r)
        out[tag] = r
    return out


def probe_ivfsplit(spark, emb, replicas: int, workdir: str) -> dict:
    """Does the r11 cell-cap sub-split keep the hot-cell partition BOUNDED
    as a skewed corpus grows? (VERDICT r10 item 2.)

    Skew shape: 80% of vectors share one embedding -> one IVF cell holds
    ~80% of the corpus. At 1x and ``replicas``x we build a flat and a
    capped index over identical data and fixed centroids (training cost
    is probed separately) and time:

    - ``build_flat`` / ``build_capped``: assignment + layout write;
    - ``serve_hot`` on each: top-k with queries that probe the hot cell.

    The recorded ``max_part`` is the decision metric: flat's hot
    partition grows with the corpus (the 100 TB straggler); capped stays
    <= ~cell_cap at any scale, so scan/rerank/delta tasks stay uniform.
    """
    import os

    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.ivf_index import (
        IvfIndex,
    )
    from metadata_ingestion_framework_spark.operators.similarity import (
        random_centroids,
    )

    hot = emb.orderBy("vec_id").limit(1).collect()[0].embedding
    hot_lit = F.array(*[F.lit(float(x)) for x in hot]).cast("array<float>")
    cents = random_centroids(64, 8)
    cap = 1500
    out: dict = {}
    for tag, vecs in [
        ("1x", emb), (f"{replicas}x", replicate_embeddings(emb, replicas))
    ]:
        skew = vecs.withColumn(
            "embedding",
            F.when(F.col("vec_id") % 5 != 0, hot_lit).otherwise(
                F.col("embedding")
            ),
        ).persist()
        n = skew.count()
        r: dict = {}
        print(f"== ivfsplit {tag} ({n} vecs) ==", file=sys.stderr)
        queries = skew.limit(8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        for kind, cell_cap in [("flat", None), ("capped", cap)]:
            idx = IvfIndex(
                spark, os.path.join(workdir, f"ivf_{kind}_{tag}"), dim=64,
                n_cells=8, cell_cap=cell_cap,
            )
            timed(f"build_{kind}", lambda: (
                idx.build(skew, centroids=cents), n)[-1], r)
            hist = idx.cell_histogram().collect()
            sizes = sorted((row.n_vecs for row in hist), reverse=True)
            r[f"max_part_{kind}"] = {"sec": 0.0, "rows": sizes[0]}
            def _serve():
                topk = idx.topk(queries, k=10, n_probe=2)
                c = topk.count()
                unpersist_deps(topk)
                return c
            timed(f"serve_hot_{kind}", _serve, r)
        skew.unpersist()
        out[tag] = r
    return out


def probe_training(spark, docs, emb, replicas: int) -> dict:
    """Do the r10 iterative trainers scale linearly in the corpus?

    - ``kmeans_fit``: assignment is a map-only Arrow argmax; the update is
      one posexplode groupBy(cell,pos) sum per iteration (n_cells x dim
      groups regardless of corpus) — growth should track data ~linearly,
      and the bounded ``sample_limit`` path should stay FLAT (that is the
      100 TB answer: train on a sample, serve the corpus).
    - ``bpe_train``: ONE corpus-sized shuffle (word counts); every round
      after runs on the distinct-word vocab, so growth should sit well
      under the replica factor (replicated docs share most words).
    """
    from metadata_ingestion_framework_spark.functions.bpe import bpe_train
    from metadata_ingestion_framework_spark.operators.kmeans import kmeans_fit

    out: dict = {}
    for tag, d, e in [
        ("1x", docs, emb),
        (f"{replicas}x", replicate_docs(docs, replicas),
         replicate_embeddings(emb, replicas)),
    ]:
        r: dict = {}
        print(f"== training {tag} ==", file=sys.stderr)
        timed("kmeans_fit_full", lambda: (
            kmeans_fit(e, dim=64, n_cells=8, n_iters=3), e.count())[-1], r)
        timed("kmeans_fit_sampled", lambda: (
            kmeans_fit(e, dim=64, n_cells=8, n_iters=3, sample_limit=1000),
            1000)[-1], r)
        timed("bpe_train_8", lambda: len(bpe_train(d, "text", k_merges=8)), r)
        # r11 map-only model scorers: growth should track data ~linearly
        # (one Arrow bincount+matmul pass, no shuffle, no training)
        from metadata_ingestion_framework_spark.functions.quality_model import (
            hashed_seed_weights,
            model_gate_scores,
        )

        qw = hashed_seed_weights("qw", 4096)
        lw = {
            lang: hashed_seed_weights(f"lw:{lang}:", 4096)
            for lang in ("de", "en", "es", "fr")
        }
        timed(
            "model_gate_scores",
            lambda: model_gate_scores(d, qw, lw, bias=7).count(),
            r,
        )
        out[tag] = r
    return out


def main_training(args: list[str]) -> None:
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    replicas = int(args[1]) if len(args) > 1 else 10
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import t

    spark = get_spark("scale_probe_training")
    phases = probe_training(
        spark, t(spark, sf_dir, "documents"), t(spark, sf_dir, "embeddings"),
        replicas,
    )
    tags = list(phases)
    result = {
        "probe": "iterative_training_10x",
        "sf_dir": sf_dir,
        "replicas": replicas,
        "base": phases[tags[0]],
        "scaled": phases[tags[1]],
    }
    result["growth"] = {
        k: round(result["scaled"][k]["sec"] / max(result["base"][k]["sec"], 0.01), 1)
        for k in result["base"]
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    lines = [
        "",
        f"## Iterative-trainer probe (kmeans / BPE, {result['replicas']}x data)",
        "",
        "claim under test (r10): kmeans_fit grows ~linearly (map-only "
        "assignment + fixed-group update shuffle) and its sample_limit "
        "path stays FLAT (the 100 TB posture: train on a bounded sample); "
        "bpe_train pays one corpus shuffle then vocab-bounded rounds, so "
        f"growth sits well under {result['replicas']}x.",
        "",
        "| phase | 1x sec | 10x sec | growth |",
        "|---|---|---|---|",
    ] + [
        f"| {k} | {result['base'][k]['sec']} | {result['scaled'][k]['sec']} "
        f"| {result['growth'][k]}x |"
        for k in result["base"]
    ] + [""]
    with open("PROBE.md", "a") as f:
        f.write("\n".join(lines))
    print(json.dumps(result))
    spark.stop()


def probe_skew(spark, docs, tag: str) -> dict:
    """Time the two-stage ordered-window operators on a 90%-single-source
    corpus (r7 VERDICT item 4): with the plain ``Window.partitionBy(source)``
    formulation the dominant source is ONE task, so 10x data means ~10x wall
    on that straggler; the range-sharded two-stage formulation should grow
    ~linearly in total work and stay parallel (growth well under the
    replica factor on an underutilized 32-core box)."""
    from metadata_ingestion_framework_spark.functions.sampling import (
        calibrate_scores,
        token_budget_select,
    )

    r: dict = {}
    print(f"== skew {tag} ==", file=sys.stderr)
    docs.persist().count()

    def _budget():
        out = token_budget_select(
            docs, "text", "doc_id", F.length("text").cast("double"),
            budget_tokens=1 << 40, by=["source"],
            # explicit shards: the probe measures the SHARDED path (r9's
            # small-input bypass would otherwise fire at these toy sizes)
            shards=spark.sparkContext.defaultParallelism,
        )
        n = out.count()
        for dep in getattr(out, "_persisted_deps", ()):
            dep.unpersist()
        return n

    def _calibrate():
        out = calibrate_scores(
            docs, F.length("text").cast("double"), "doc_id", by=["source"],
            shards=spark.sparkContext.defaultParallelism,
        )
        n = out.count()
        for dep in getattr(out, "_persisted_deps", ()):
            dep.unpersist()
        return n

    timed("token_budget_skewed", _budget, r)
    timed("calibrate_scores_skewed", _calibrate, r)
    docs.unpersist()
    return r


def _aqe_skew_evidence(df) -> dict:
    """Executed-plan evidence that AQE's skew-join mitigation fired:
    traverses the ADAPTIVE plan (into query stages) summing the
    AQEShuffleRead `numSkewedPartitions` / `numSkewedSplits` metrics, and
    counts `skew=true` markers on the final SortMergeJoins."""
    je = df._jdf.queryExecution().executedPlan()
    out = {"numSkewedPartitions": 0, "numSkewedSplits": 0, "smj_skew_true": 0}
    stack = [je]
    while stack:
        n = stack.pop()
        name = n.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            final = n.executedPlan()
            out["smj_skew_true"] += final.toString().count("skew=true")
            stack.append(final)
        if name == "AQEShuffleReadExec":
            m = n.metrics()
            for key in ("numSkewedPartitions", "numSkewedSplits"):
                if m.contains(key):
                    v = m.apply(key).value()
                    if v > 0:
                        out[key] += v
        if name.endswith("QueryStageExec"):
            stack.append(n.plan())
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def probe_aqe_skew(spark, replicas: int) -> dict:
    """Does the engine COMPOSE with Spark's native AQE skew-join
    mitigation (r11, VERDICT r10 item 6)? The hand-rolled skew answers
    (salted joins, two-stage windows) cover the engine's own operators;
    this proves a plain 90%-skewed SortMergeJoin through the engine's
    session ALSO gets runtime-split by `spark.sql.adaptive.skewJoin` —
    identical results, straggler partition split into many tasks.

    Fixture: a generated 90%-one-key fact at 200k * replicas rows (the
    sf0.1 documents corpus's dominant partition lands under ~10 MB,
    below the scale where the split pays — measured: detection fires
    reliably from tens of MB; thresholds here are probe-tuned to surface
    the mechanism, production keeps the 256 MB default)."""
    n_fact = 200_000 * replicas
    fact = (
        spark.range(0, n_fact)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("source"),
            F.md5(F.col("id").cast("string")).alias("text"),
            F.col("id").alias("doc_id"),
        )
        .persist()
    )
    fact.count()
    dim = spark.range(0, 100).select(
        F.col("id").alias("source"),
        (F.col("id") % 7).cast("long").alias("source_rank"),
    )
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": None,  # per-run
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        # force the SMJ: a 10-row dim would broadcast and hide the skew
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k in confs:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    r: dict = {}
    try:
        for k, v in confs.items():
            if v is not None:
                spark.conf.set(k, v)
        results = {}
        for mode, on in (("off", "false"), ("on", "true")):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on)
            # aggregate on a DIFFERENT key than the join: a same-key
            # downstream would reuse the join's distribution, and AQE
            # (correctly) refuses a skew split that adds a shuffle —
            # re-keying is the realistic enrich-then-regroup shape
            joined = (
                fact.join(dim, "source")
                .groupBy(F.pmod(F.col("doc_id"), F.lit(16)).alias("g"))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.avg(F.length("text")).alias("avg_len"),
                    F.avg("source_rank").alias("avg_rank"),
                )
            )
            t0 = time.perf_counter()
            rows = joined.collect()
            sec = round(time.perf_counter() - t0, 2)
            results[mode] = sorted(map(tuple, rows))
            ev = _aqe_skew_evidence(joined)
            r[f"join_{mode}"] = {"sec": sec, "rows": len(rows)}
            r[f"evidence_{mode}"] = ev
            print(f"  skewJoin={mode}: {sec}s evidence={ev}", file=sys.stderr)
        r["results_identical"] = results["off"] == results["on"]
        r["n_fact"] = n_fact
    finally:
        fact.unpersist()
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return r


def main_aqeskew(args: list[str]) -> None:
    replicas = int(args[1]) if len(args) > 1 else 10
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark

    spark = get_spark("scale_probe_aqeskew")
    result = {
        "probe": "aqe_skew_join",
        "replicas": replicas,
        "skew": "90pct_single_key",
        **probe_aqe_skew(spark, replicas),
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    ev_on, ev_off = result["evidence_on"], result["evidence_off"]
    lines = [
        "",
        "## AQE skew-join probe (r11, 90%-single-key SMJ, "
        f"{result['replicas']}x docs)",
        "",
        "claim under test (VERDICT r10 item 6): the engine's session "
        "composes with Spark's NATIVE skew mitigation — with "
        "`spark.sql.adaptive.skewJoin` on, the 90%-dominant join "
        "partition is runtime-split (executed-plan AQEShuffleRead "
        "metrics + `skew=true` SMJ markers), with identical results.",
        "",
        "| metric | skewJoin off | skewJoin on |",
        "|---|---|---|",
        f"| join wall sec | {result['join_off']['sec']} | {result['join_on']['sec']} |",
        f"| numSkewedPartitions | {ev_off['numSkewedPartitions']} | {ev_on['numSkewedPartitions']} |",
        f"| numSkewedSplits | {ev_off['numSkewedSplits']} | {ev_on['numSkewedSplits']} |",
        f"| SortMergeJoin skew=true | {ev_off['smj_skew_true']} | {ev_on['smj_skew_true']} |",
        f"| results identical | — | {result['results_identical']} |",
        "",
    ]
    with open("PROBE.md", "a") as f:
        f.write("\n".join(lines))
    print(json.dumps(result))
    spark.stop()


def main_skew(args: list[str]) -> None:
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    replicas = int(args[1]) if len(args) > 1 else 10
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import t

    spark = get_spark("scale_probe_skew")
    # 90% of rows collapse to ONE source (md5-deterministic assignment so
    # both scales share the same skew shape)
    docs = t(spark, sf_dir, "documents").withColumn(
        "source",
        F.when(
            F.pmod(
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
                .cast("long"),
                F.lit(10),
            )
            < 9,
            F.lit("dominant"),
        ).otherwise(F.col("source")),
    )
    result = {
        "probe": "skewed_window_10x",
        "sf_dir": sf_dir,
        "replicas": replicas,
        "skew": "90pct_single_source",
        "base": probe_skew(spark, docs, "1x"),
        "scaled": probe_skew(spark, replicate_docs(docs, replicas), f"{replicas}x"),
    }
    result["growth"] = {
        k: round(result["scaled"][k]["sec"] / max(result["base"][k]["sec"], 0.01), 1)
        for k in result["base"]
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    _append_skew_md(result)
    print(json.dumps(result))
    spark.stop()


def _append_skew_md(result: dict) -> None:
    lines = [
        "",
        f"## Skewed-window probe (90% single source, {result['replicas']}x)",
        "",
        "claim under test: the two-stage range-sharded cumulative windows "
        "(token_budget_select / calibrate_scores) keep a 90%-dominant "
        "source parallel instead of serializing it into one window task; "
        f"growth at {result['replicas']}x data should sit well under "
        f"{result['replicas']}x wall.",
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
    with open("PROBE.md", "a") as f:
        f.write("\n".join(lines))




def replicate_docs_fast(spark, docs, n: int, base: int | None = None):
    """ONE-scan replication for the big tiers: crossJoin with a replica
    range instead of an n-way union (at 100x a 100-branch union is its
    own plan pathology — one scan, ids offset per replica, text lightly
    perturbed so replicas are near- not exact-dups).

    ``base`` is the per-replica id OFFSET and must exceed max(doc_id):
    offsetting by row count (the pre-r14 form) overlaps replica id
    ranges whenever ids are sparse, silently merging distinct rows in
    id-keyed stages and distorting the growth measurements (r14
    ADVICE). Defaults to max(doc_id)+1 — one cheap agg.
    """
    if n == 1:
        return docs
    if base is None:
        base = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    assert base > 0, "replicate_docs_fast: empty docs"
    reps = spark.range(n).toDF("__rep")
    return (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(base))
        .withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.concat(
                    F.col("text"), F.lit(" replica "),
                    F.col("__rep").cast("string"),
                )
            ),
        )
        .drop("__rep")
    )


def probe_buildscale(spark, docs, tiers) -> dict:
    """100x tier (r13, VERDICT r12 item 5): the two cheapest-per-row
    BUILD paths whose 100 TB claims rest on bounded uniform shuffle keys
    — the minhash band build and the bm25 postings build. Per tier:
    stage wall seconds, output rows, and the shuffle-key skew (max and
    mean rows per key) that decides whether the claim survives — a key
    whose max grows super-linearly is a straggler at 1000 executors."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        minhash_bands,
        minhash_signatures,
    )
    from metadata_ingestion_framework_spark.operators.retrieval import (
        build_postings,
    )

    base = None  # replicate_docs_fast derives max(doc_id)+1
    out: dict = {}
    for n in tiers:
        tag = f"{n}x"
        r: dict = {}
        print(f"== buildscale {tag} ==", file=sys.stderr)
        d = replicate_docs_fast(spark, docs, n, base)
        sigs = minhash_signatures(d, "text", "doc_id").persist()
        timed("minhash_sig_kernel", lambda: sigs.count(), r)
        bands = minhash_bands(sigs, "doc_id").persist()
        timed("minhash_band_build", lambda: bands.count(), r)
        sk = bands.groupBy("band", "band_hash").count().agg(
            F.max("count").alias("mx"), F.avg("count").alias("mean")
        ).collect()[0]
        r["band_key_skew"] = {
            "max_rows_per_key": int(sk.mx),
            "mean_rows_per_key": round(float(sk.mean), 2),
        }
        bands.unpersist()
        sigs.unpersist()
        posts = build_postings(d, "doc_id", "text", 8192, 64, 64).persist()
        timed("bm25_postings_build", lambda: posts.count(), r)
        tk = posts.groupBy("term").count().agg(
            F.max("count").alias("mx"), F.avg("count").alias("mean")
        ).collect()[0]
        pk = posts.groupBy("doc_bucket", "term_bucket").count().agg(
            F.max("count").alias("mx"), F.avg("count").alias("mean")
        ).collect()[0]
        r["term_key_skew"] = {
            "max_rows_per_key": int(tk.mx),
            "mean_rows_per_key": round(float(tk.mean), 2),
        }
        r["postings_partition_skew"] = {
            "max_rows_per_partition": int(pk.mx),
            "mean_rows_per_partition": round(float(pk.mean), 2),
        }
        posts.unpersist()
        out[tag] = r
    return out


def main_buildscale(args: list[str]) -> None:
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    tiers = [int(x) for x in args[1].split(",")] if len(args) > 1 else [1, 10, 100]
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import t

    spark = get_spark("scale_probe_buildscale")
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    tiersr = probe_buildscale(spark, docs, tiers)
    stage_names = ["minhash_sig_kernel", "minhash_band_build", "bm25_postings_build"]
    growth = {}
    tags = [f"{n}x" for n in tiers]
    for a, b in zip(tags, tags[1:]):
        growth[f"{a}->{b}"] = {
            k: round(
                tiersr[b][k]["sec"] / max(tiersr[a][k]["sec"], 0.01), 1
            )
            for k in stage_names
        }
    result = {
        "probe": "buildscale_tiered",
        "sf_dir": sf_dir,
        "tiers": tiersr,
        "growth_per_tier": growth,
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    spark.stop()




def probe_bm25index(spark, docs, workdir: str) -> dict:
    """Bm25Index amortization probe (r13): the whole point of the
    persistent index is that bm25_topk pays the postings+df+stats build
    EVERY call while the index pays it once and serves pruned. Measures,
    same session: per-call bm25_topk (min of 2), one-time build, warm
    pruned serve (min of 2), and an incremental append of a ~1% batch —
    the serve and append numbers are what a 100 TB deployment pays per
    query / per ingest."""
    import shutil

    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.retrieval import (
        Bm25Index,
        bm25_topk,
    )

    r: dict = {}
    docs = docs.persist()
    n = docs.count()
    queries = docs.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"), "text"
    )

    def percall():
        out = bm25_topk(docs, queries, k=10)
        c = out.count()
        unpersist_deps(out)
        return c

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        percall()
        times.append(time.perf_counter() - t0)
    r["bm25_topk_per_call"] = {"sec": round(min(times), 2)}

    root = os.path.join(workdir, "bm25idx")
    shutil.rmtree(root, ignore_errors=True)
    idx = Bm25Index(spark, root, doc_bucket_width=8192, n_buckets=64,
                    n_term_buckets=64)
    cut = int(n * 0.99)
    t0 = time.perf_counter()
    idx.build(docs.filter(F.col("doc_id") < cut))
    r["index_build_once"] = {"sec": round(time.perf_counter() - t0, 2)}

    def serve():
        out = idx.topk(queries, k=10)
        c = out.count()
        unpersist_deps(out)
        return c

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        serve()
        times.append(time.perf_counter() - t0)
    r["index_serve_warm"] = {"sec": round(min(times), 2)}

    t0 = time.perf_counter()
    idx.append(docs.filter(F.col("doc_id") >= cut))
    r["append_1pct_batch"] = {"sec": round(time.perf_counter() - t0, 2)}

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        serve()
        times.append(time.perf_counter() - t0)
    r["index_serve_after_append"] = {"sec": round(min(times), 2)}
    r["serve_speedup_vs_per_call"] = round(
        r["bm25_topk_per_call"]["sec"] / max(r["index_serve_warm"]["sec"], 0.01), 1
    )

    # r14 (VERDICT r13 item 1): the recurring-TRIAGE amortization — the
    # composite that motivated routing triage through the index. Eval set
    # is a ~5% slice; both faces run the identical gram-verify stage, so
    # the delta is purely per-call postings rebuild vs pruned serve.
    from metadata_ingestion_framework_spark.operators.retrieval import (
        contamination_triage,
    )

    evals = docs.filter(F.col("doc_id") % 20 == 0)

    def triage_percall():
        out = contamination_triage(docs, evals, k=20)
        c = out.count()
        unpersist_deps(out)
        return c

    def triage_indexed():
        out = idx.triage(docs, evals, k=20)
        c = out.count()
        unpersist_deps(out)
        return c

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        triage_percall()
        times.append(time.perf_counter() - t0)
    r["triage_per_call"] = {"sec": round(min(times), 2)}
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        triage_indexed()
        times.append(time.perf_counter() - t0)
    r["triage_indexed_warm"] = {"sec": round(min(times), 2)}
    r["triage_speedup_vs_per_call"] = round(
        r["triage_per_call"]["sec"] / max(r["triage_indexed_warm"]["sec"], 0.01), 1
    )
    docs.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    return r


def main_bm25index(args: list[str]) -> None:
    import tempfile

    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    replicas = int(args[1]) if len(args) > 1 else 1
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import t

    spark = get_spark("scale_probe_bm25index")
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    if replicas > 1:
        docs = replicate_docs_fast(spark, docs, replicas)
    workdir = tempfile.mkdtemp(prefix="bm25_probe_")
    result = {
        "probe": "bm25index_amortization",
        "sf_dir": sf_dir,
        "replicas": replicas,
        "stages": probe_bm25index(spark, docs, workdir),
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    spark.stop()


def probe_bm25_sizing(spark, docs, workdir: str, corpus_tag: str) -> dict:
    """r15 A/B (VERDICT r14 item 2): fixed n_term_buckets=64 vs the
    corpus-sized rule, on one corpus shape. Measures build, warm
    bounded-vocabulary serve (8 full-doc queries), warm dense serve
    (a 5% eval slice as queries — many distinct terms), and the postings
    leaf-file count (the dense serve's actual cost driver)."""
    import glob
    import shutil

    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.retrieval import (
        Bm25Index,
    )

    docs = docs.persist()
    docs.count()
    bounded_q = docs.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    # dense = broad TERM coverage, not query-count scaling: a fixed-size
    # batch keeps the (query, doc) scoring volume comparable across
    # replica tiers (25k queries x a replicated small-vocab corpus would
    # measure the quadratic pair explosion, not the layout)
    dense_q = (
        docs.filter(F.col("doc_id") % 20 == 0)
        .orderBy("doc_id").limit(500)
        .select(F.col("doc_id").alias("query_id"), "text")
    )
    out: dict = {}
    for tag, ntb in (("fixed64", 64), ("sized", None)):
        root = os.path.join(workdir, f"bm25_{corpus_tag}_{tag}")
        shutil.rmtree(root, ignore_errors=True)
        idx = Bm25Index(
            spark, root, doc_bucket_width=8192, n_buckets=64,
            n_term_buckets=ntb,
        )
        t0 = time.perf_counter()
        idx.build(docs)
        r = {"build_sec": round(time.perf_counter() - t0, 2),
             "n_term_buckets": idx.n_term_buckets}
        r["postings_files"] = len(
            glob.glob(os.path.join(root, "postings", "v*", "**", "*.parquet"),
                      recursive=True)
        )

        def serve(q):
            o = idx.topk(q, k=10)
            c = o.count()
            unpersist_deps(o)
            return c

        for qname, q in (("bounded", bounded_q), ("dense", dense_q)):
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                serve(q)
                times.append(time.perf_counter() - t0)
            r[f"serve_{qname}_warm_sec"] = round(min(times), 2)
        out[tag] = r
        shutil.rmtree(root, ignore_errors=True)
    docs.unpersist()
    return out


def main_bm25sizing(args: list[str]) -> None:
    import tempfile

    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    replicas = int(args[1]) if len(args) > 1 else 1
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import t

    spark = get_spark("scale_probe_bm25sizing")
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    if replicas > 1:
        docs = replicate_docs_fast(spark, docs, replicas)
    # two corpus shapes: the synthetic small-vocab corpus (31 terms — the
    # documented 0.7x dense case) and a widened-vocabulary twin (one
    # unique token per doc, the web shape where term buckets earn pruning)
    # unique token must survive the [a-z]+ tokenizer: digits -> letters
    wide = docs.withColumn(
        "text",
        F.concat_ws(
            " ", "text",
            F.concat(
                F.lit("uniq"),
                F.translate(
                    F.col("doc_id").cast("string"),
                    "0123456789", "abcdefghij",
                ),
            ),
        ),
    )
    workdir = tempfile.mkdtemp(prefix="bm25_sizing_")
    result = {
        "probe": "bm25_term_bucket_sizing_ab",
        "sf_dir": sf_dir,
        "replicas": replicas,
        "smallvocab": probe_bm25_sizing(spark, docs, workdir, "small"),
        "widevocab": probe_bm25_sizing(spark, wide, workdir, "wide"),
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    spark.stop()


def _synth_pardocs(spark, n, id_offset=0):
    """Synthetic paragraph corpora: 5 paragraphs per doc; every 10th
    paragraph slot draws from a 100-paragraph shared pool (cross-doc
    dups fire), the rest are doc-unique. Pool key is ``(slot // 10) %
    100`` so the pool genuinely spans 100 values — ``slot % 100`` under
    ``slot % 10 == 0`` only ever produced 10 (r15 ADVICE)."""
    cols = []
    for i in range(5):
        slot = F.col("id") * 5 + F.lit(i)
        cols.append(
            F.when(
                slot % 10 == 0,
                F.concat(
                    F.lit("shared pool paragraph number "),
                    ((slot / 10).cast("long") % 100).cast("string"),
                ),
            ).otherwise(
                F.concat(
                    F.lit(f"unique body {i} of doc "),
                    F.col("id").cast("string"),
                    F.lit(" lorem ipsum dolor sit amet consectetur"),
                )
            )
        )
    return spark.range(id_offset, id_offset + n).select(
        F.col("id").alias("doc_id"), F.concat_ws("\n", *cols).alias("text")
    )


def main_parstore(args: list[str]) -> None:
    """ParagraphHashStore batch-vs-store probe (r15): does ingest cost
    track the BATCH as the store grows 10x? Expected shape: the one
    store-size term is the column-pruned MAP-ONLY scan of the skinny
    (gh) column feeding the broadcast membership semi-join — no store
    shuffle anywhere; everything else is O(batch)."""
    import os
    import tempfile

    n_base = int(args[0]) if args else 20000
    replicas = int(args[1]) if len(args) > 1 else 10
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.operators.dedup import (
        _paragraph_rows,
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.incremental import (
        ParagraphHashStore,
    )

    spark = get_spark("scale_probe_parstore")
    out: dict = {}
    with tempfile.TemporaryDirectory() as workdir:
        # throwaway warmup arm: the paragraph kernel is so cheap that JVM
        # warmup otherwise dominates the 1x arm and growth reads < 1
        wst = ParagraphHashStore(
            spark, os.path.join(workdir, "parstore_w"), bloom_bits=1 << 22
        )
        w = wst.ingest(_synth_pardocs(spark, 2000), "warmup")
        w.count()
        unpersist_deps(w)
        for tag, n in [("1x", n_base), (f"{replicas}x", n_base * replicas)]:
            r: dict = {}
            print(f"== parstore, store {tag} ==", file=sys.stderr)
            # bloom ON so the membership A/B stays measurable
            # (default is OFF per this probe's own r16 adjudication)
            st = ParagraphHashStore(
                spark, os.path.join(workdir, f"parstore_{tag}"),
                bloom_bits=1 << 22,
            )
            seed = _synth_pardocs(spark, n).persist()
            seed.count()

            def _seed():
                s = st.ingest(seed, "seed")
                c = s.count()
                unpersist_deps(s)
                return c

            timed("seed_ingest_full", _seed, r)
            seed.unpersist()
            batch = _synth_pardocs(spark, 500, id_offset=n * 7 + 11).persist()
            batch.count()
            timed(
                "batch_para_rows",
                lambda: _paragraph_rows(batch, "text", "doc_id").count(),
                r,
            )
            # r16 (VERDICT r15 item 2): the membership stage alone —
            # bloom sidecar probe + the exact semi-join over ONLY the
            # hit buckets. Expected O(hit buckets), not O(store): the
            # batch's shared-pool hashes live in the seed's first few
            # id-range buckets, its unique hashes hit nothing.
            bp = _paragraph_rows(batch, "text", "doc_id").persist()
            bp.count()

            def _membership():
                hit = st._bloom_hit_buckets(bp)
                n_hit = len(hit) if hit is not None else -1
                if not hit:
                    return (n_hit, 0)
                scan = st.store.read(st.PARAS).filter(
                    F.col("par_bucket").isin(
                        [v for v in hit if v is not None]
                    )
                )
                seen = scan.join(
                    F.broadcast(bp.select("gh").distinct()),
                    "gh", "left_semi",
                ).count()
                return [n_hit, seen]  # rows field: [hit_buckets, seen]

            timed("membership_stage", _membership, r)

            def _membership_fullscan():
                # the pre-r16 path: exact semi-join over the WHOLE store
                return st.store.read(st.PARAS).join(
                    F.broadcast(bp.select("gh").distinct()),
                    "gh", "left_semi",
                ).count()

            timed("membership_fullscan", _membership_fullscan, r)
            bp.unpersist()

            def _ingest():
                s = st.ingest(batch, "r2")
                c = s.count()
                unpersist_deps(s)
                return c

            timed("inc_ingest_e2e", _ingest, r)
            batch.unpersist()
            out[tag] = r
    tags = list(out)
    result = {
        "probe": "paragraph_store_10x", "n_base": n_base,
        "replicas": replicas,
        "base": out[tags[0]], "scaled": out[tags[1]],
    }
    result["growth"] = {
        k: round(result["scaled"][k]["sec"] / max(result["base"][k]["sec"], 0.01), 1)
        for k in result["base"]
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    spark.stop()


def main_parskew(args: list[str]) -> None:
    """Viral-boilerplate skew probe (r16, VERDICT r15 item 1): a corpus
    where 5 paragraphs appear in EVERY doc (the cookie-banner shape a
    real crawl is full of). Times the removal-set stage under the OLD
    ``Window.partitionBy(gh)`` formulation (every occurrence of a viral
    hash in ONE task, AQE cannot split) vs the shipped first-owner
    aggregation (partial-aggregable groupBy + AQE-skew-splittable
    join-back), same persisted paragraph rows, plus the e2e rewrite."""
    import time as _t

    from pyspark.sql import Window

    n = int(args[0]) if args else 2_000_000
    n_viral = int(args[1]) if len(args) > 1 else 1
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.operators.dedup import (
        _first_owner_dups,
        _paragraph_rows,
        paragraph_dedup,
    )

    spark = get_spark("parskew-probe")
    viral = [
        F.lit(
            f"viral boilerplate banner number {i % n_viral} accept cookies"
        )
        for i in range(5)
    ]
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n", *viral,
            F.concat(F.lit("unique body of doc "), F.col("id").cast("string")),
        ).alias("text"),
    )
    paras = _paragraph_rows(docs, "text", "doc_id").persist()
    paras.count()

    def timed(fn):
        t0 = _t.perf_counter()
        v = fn()
        return round(_t.perf_counter() - t0, 2), v

    w = Window.partitionBy("gh").orderBy("doc_id", "pos")
    old_dups = (
        paras.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1).select("doc_id", "pos")
    )
    t_old, c_old = timed(old_dups.count)
    t_new, c_new = timed(lambda: _first_owner_dups(paras, "doc_id").count())
    t_e2e, _ = timed(
        lambda: paragraph_dedup(docs, "text", "doc_id")
        .agg(F.sum("n_removed")).collect()
    )
    # only min(n_viral, 5) distinct viral texts exist (5 slots per doc)
    assert c_old == c_new == 5 * n - min(n_viral, 5)
    result = {
        "probe": "paragraph_skew_firstowner", "n_docs": n,
        "n_viral": n_viral,
        "viral_occurrences_per_hash": 5 * n // n_viral,
        "old_window_sec": t_old, "first_owner_sec": t_new,
        "speedup": round(t_old / max(t_new, 0.01), 1),
        "e2e_rewrite_sec": t_e2e,
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--parskew":
        main_parskew(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--incremental":
        main_incremental(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        main_skew(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--vecstore":
        main_vecstore(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--mediastore":
        main_mediastore(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--training":
        main_training(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--ivfsplit":
        main_ivfsplit(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--aqeskew":
        main_aqeskew(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--buildscale":
        main_buildscale(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--bm25index":
        main_bm25index(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--bm25sizing":
        main_bm25sizing(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--hybridserve":
        main_hybridserve(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--audiostore":
        main_audiostore(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--framesstore":
        main_framesstore(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--parstore":
        main_parstore(sys.argv[2:])
        return
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


def main_incremental(args: list[str]) -> None:
    import tempfile

    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    replicas = int(args[1]) if len(args) > 1 else 10
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import t

    spark = get_spark("scale_probe_incremental")
    docs = t(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as workdir:
        phases = probe_incremental(spark, docs, replicas, workdir)
    tags = list(phases)
    result = {
        "probe": "incremental_dedup_store_10x",
        "sf_dir": sf_dir,
        "replicas": replicas,
        "base": phases[tags[0]],
        "scaled": phases[tags[1]],
    }
    result["growth"] = {
        k: round(result["scaled"][k]["sec"] / max(result["base"][k]["sec"], 0.01), 1)
        for k in result["base"]
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    _append_incremental_md(result)
    print(json.dumps(result))
    spark.stop()


def _synth_images(spark, n: int, id_offset: int = 0):
    """n deterministic real-BMP media rows (media_id, payload) built
    arithmetically from the id — dims vary over a 24x24 grid so
    same-dims ids form genuine exact-dup clusters (the r13 fixture
    fact), giving the dedup join realistic candidate pressure."""
    import pandas as pd

    from metadata_ingestion_framework_spark.operators.codecs import (
        encode_bmp,
    )
    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    def gen(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = 4 + mid % 24, 4 + (mid // 7) % 24
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                px = ((mid * 7 + y * 13 + x * 17 + c * 29) % 256).astype(
                    np.uint8
                )
                payloads.append(encode_bmp(px))
            yield pd.DataFrame(
                {"media_id": pdf["id"], "payload": payloads}
            )

    base = _widen_narrow_input(
        spark.range(id_offset, id_offset + n).toDF("id")
    )
    return base.mapInPandas(gen, schema="media_id long, payload binary")


def _synth_wavs(spark, n: int, id_offset: int = 0, dup_every: int = 0):
    """n deterministic real-WAV media rows (media_id, payload). With
    ``dup_every=0`` (default) the fingerprint class is (id%12, id%40) —
    ~480 classes, near-100% duplicate density (every batch clip near-dups
    ~store/480 stored clips: candidate volume tracks the STORE, the
    output-sensitive worst case). With ``dup_every=k`` clips are unique
    except 1-in-k exact-class pairs — realistic web density."""
    import pandas as pd

    from metadata_ingestion_framework_spark.operators.codecs import (
        encode_wav,
    )
    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    def gen(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            for mid in pdf["id"]:
                mid = int(mid)
                if dup_every:
                    # unique content must vary the per-CELL energy
                    # PROFILE: ehash bits are adjacent cell-energy delta
                    # signs, and any global waveform change (phase,
                    # frequency, amplitude) leaves them untouched — the
                    # class otherwise collapses to the duration (40
                    # lengths) and a 10x store saturates into all-pairs
                    # matches, measuring match volume instead of layout
                    # (first r15 runs). An id-hash-driven amplitude
                    # step per cell gives ~2^32 profile classes.
                    eff = mid + 1 if mid % dup_every == 0 else mid
                    nlen = 256 + 31 * (eff % 40)
                    i = np.arange(nlen)
                    h = (eff * 2654435761) & 0xFFFFFFFF
                    cell = (i * 65) // nlen
                    amp = 1 + ((h >> (cell % 32)) & 3)
                    x = (
                        (((i * 37) % 4096) - 2048) * amp * 2
                    ).astype(np.int16)
                else:
                    nlen = 256 + 31 * (mid % 40)
                    i = np.arange(nlen)
                    seed = (mid % 12) * 31
                    x = (((seed + i * 37) % 4096) - 2048).astype(
                        np.int16
                    ) * 8
                payloads.append(encode_wav(x))
            yield pd.DataFrame(
                {"media_id": pdf["id"], "payload": payloads}
            )

    base = _widen_narrow_input(
        spark.range(id_offset, id_offset + n).toDF("id")
    )
    return base.mapInPandas(gen, schema="media_id long, payload binary")


def _synth_videos(spark, n: int, id_offset: int = 0):
    """n deterministic real-BMV video rows (media_id, kind, payload,
    duration_ms): 3 frames each at 40ms, frame pixels from the image
    formula keyed by (id % 16, frame) — ids sharing the key are genuine
    frame-level near-dups."""
    import pandas as pd

    from metadata_ingestion_framework_spark.operators.codecs import (
        encode_bmp,
        encode_bmv,
    )
    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    def gen(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            for mid in pdf["id"]:
                mid = int(mid)
                frames = []
                for f in range(3):
                    k = (mid % 16) * 3 + f
                    w, h = 4 + k % 24, 4 + (k // 7) % 24
                    y, x, c = np.ogrid[0:h, 0:w, 0:3]
                    px = (
                        (k * 7 + y * 13 + x * 17 + c * 29) % 256
                    ).astype(np.uint8)
                    frames.append(encode_bmp(px))
                payloads.append(encode_bmv(frames, 40))
            yield pd.DataFrame({
                "media_id": pdf["id"],
                "kind": "video",
                "payload": payloads,
                "duration_ms": 120,
            })

    base = _widen_narrow_input(
        spark.range(id_offset, id_offset + n).toDF("id")
    )
    return base.mapInPandas(
        gen,
        schema="media_id long, kind string, payload binary, duration_ms int",
    )


def _probe_store_generic(spark, store_of, synth, n_base, replicas) -> dict:
    """Shared batch-vs-store probe body (r15, VERDICT r14 item 4): seed a
    store at 1x and Nx, ingest a FIXED fresh batch against each, record
    kernel + e2e. Flat e2e growth = ingest tracks the batch."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )

    out: dict = {}
    for tag, n in [("1x", n_base), (f"{replicas}x", n_base * replicas)]:
        r: dict = {}
        st = store_of(tag)
        seed = synth(spark, n).persist()
        seed.count()

        def _seed():
            s = st.ingest(seed, "seed")
            c = s.count()
            unpersist_deps(s)
            return c

        timed("seed_ingest_full", _seed, r)
        seed.unpersist()
        batch = synth(spark, 500, id_offset=n * 7 + 11).persist()
        batch.count()
        timed(
            "batch_fp_kernel",
            lambda: st._fingerprints(batch).count(),
            r,
        )

        def _ingest():
            s = st.ingest(batch, "r2")
            c = s.count()
            unpersist_deps(s)
            return c

        timed("inc_ingest_e2e", _ingest, r)
        batch.unpersist()
        out[tag] = r
    return out


def probe_hybridserve(spark, docs, emb, workdir: str) -> dict:
    """Hybrid-retrieval amortization (r15, VERDICT r14 item 1's probe):
    per-call hybrid_topk rebuilds BM25 postings AND brute-force-scans the
    whole vector corpus on every query batch; hybrid_served pays two
    index builds once and serves term-bucket-pruned + cell-pruned.
    Same session, min-of-2 warm; the full-probe serve is also timed (it
    scores every vector — the served upper bound whose row-equality to
    per-call is the pytest contract)."""
    import shutil

    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.ivf_index import (
        IvfIndex,
    )
    from metadata_ingestion_framework_spark.operators.retrieval import (
        Bm25Index,
        hybrid_served,
        hybrid_topk,
    )

    r: dict = {}
    docs = docs.persist()
    emb = emb.persist()
    docs.count(), emb.count()
    queries = (
        docs.filter(F.col("doc_id") < 8)
        .join(emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
              "doc_id")
        .select(F.col("doc_id").alias("query_id"), "text", "embedding")
        .persist()
    )
    queries.count()

    def percall():
        out = hybrid_topk(docs, emb, queries, k=10, k_each=20)
        c = out.count()
        unpersist_deps(out)
        return c

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        n = percall()
        times.append(time.perf_counter() - t0)
    r["hybrid_per_call"] = {"sec": round(min(times), 2), "rows": n}

    broot = os.path.join(workdir, "h_bm25")
    vroot = os.path.join(workdir, "h_ivf")
    shutil.rmtree(broot, ignore_errors=True)
    shutil.rmtree(vroot, ignore_errors=True)
    bidx = Bm25Index(spark, broot, doc_bucket_width=8192, n_buckets=64)
    t0 = time.perf_counter()
    bidx.build(docs)
    r["bm25_build_once"] = {"sec": round(time.perf_counter() - t0, 2)}
    vidx = IvfIndex(spark, vroot, dim=64, n_cells=8, id_col="vec_id")
    t0 = time.perf_counter()
    vidx.build(emb)
    r["ivf_build_once"] = {"sec": round(time.perf_counter() - t0, 2)}

    def served(n_probe):
        out = hybrid_served(
            bidx, vidx, queries, k=10, k_each=20, n_probe=n_probe
        )
        c = out.count()
        unpersist_deps(out)
        return c

    for label, np_ in (("served_warm_probe2", 2), ("served_warm_fullprobe", 8)):
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = served(np_)
            times.append(time.perf_counter() - t0)
        r[label] = {"sec": round(min(times), 2), "rows": n}
    r["served_speedup_vs_per_call"] = round(
        r["hybrid_per_call"]["sec"]
        / max(r["served_warm_probe2"]["sec"], 0.01), 1,
    )
    queries.unpersist()
    docs.unpersist()
    emb.unpersist()
    shutil.rmtree(broot, ignore_errors=True)
    shutil.rmtree(vroot, ignore_errors=True)
    return r


def main_hybridserve(args: list[str]) -> None:
    import tempfile

    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    replicas = int(args[1]) if len(args) > 1 else 1
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import t

    spark = get_spark("scale_probe_hybridserve")
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if replicas > 1:
        docs = replicate_docs_fast(spark, docs, replicas)
        emb = replicate_embeddings(emb, replicas)
    workdir = tempfile.mkdtemp(prefix="hybrid_probe_")
    result = {
        "probe": "hybrid_serve_amortization",
        "sf_dir": sf_dir,
        "replicas": replicas,
        "stages": probe_hybridserve(spark, docs, emb, workdir),
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    spark.stop()


def main_audiostore(args: list[str]) -> None:
    """AudioHashStore batch-vs-store probe (r15, VERDICT r14 item 4):
    the audio face shares the image store's machinery — this pins that
    the sharing holds at 10x (the image band-table surprise shipped on
    shared-machinery reasoning too)."""
    import os
    import tempfile

    n_base = int(args[0]) if args else 5000
    replicas = int(args[1]) if len(args) > 1 else 10
    dup_every = int(args[2]) if len(args) > 2 else 0
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.operators.incremental import (
        AudioHashStore,
    )

    spark = get_spark("scale_probe_audiostore")

    def synth(spark, n, id_offset=0):
        return _synth_wavs(spark, n, id_offset, dup_every=dup_every)

    with tempfile.TemporaryDirectory() as workdir:
        phases = _probe_store_generic(
            spark,
            lambda tag: AudioHashStore(
                spark, os.path.join(workdir, f"audiostore_{tag}"),
                fp_bucket_width=2048, n_buckets=64,
            ),
            synth, n_base, replicas,
        )
    tags = list(phases)
    result = {
        "probe": "audio_store_10x", "n_base": n_base, "replicas": replicas,
        "dup_every": dup_every,
        "base": phases[tags[0]], "scaled": phases[tags[1]],
    }
    result["growth"] = {
        k: round(result["scaled"][k]["sec"] / max(result["base"][k]["sec"], 0.01), 1)
        for k in result["base"]
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    spark.stop()


def main_framesstore(args: list[str]) -> None:
    """ImageHashStore FRAMES-face batch-vs-store probe (r15, VERDICT r14
    item 4): one fp row per (id, frame_ts) — 3x the fp rows per media id
    of the image face, same layout claims."""
    import os
    import tempfile

    n_base = int(args[0]) if args else 2000
    replicas = int(args[1]) if len(args) > 1 else 10
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.operators.incremental import (
        ImageHashStore,
    )

    spark = get_spark("scale_probe_framesstore")
    with tempfile.TemporaryDirectory() as workdir:
        phases = _probe_store_generic(
            spark,
            lambda tag: ImageHashStore(
                spark, os.path.join(workdir, f"framesstore_{tag}"),
                fp_bucket_width=2048, n_buckets=64,
                frames=True, every_ms=40,
            ),
            _synth_videos, n_base, replicas,
        )
    tags = list(phases)
    result = {
        "probe": "frames_store_10x", "n_base": n_base, "replicas": replicas,
        "base": phases[tags[0]], "scaled": phases[tags[1]],
    }
    result["growth"] = {
        k: round(result["scaled"][k]["sec"] / max(result["base"][k]["sec"], 0.01), 1)
        for k in result["base"]
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    spark.stop()


def probe_mediastore(spark, n_base: int, replicas: int, workdir: str) -> dict:
    """Does the IMAGE store's ingest cost track the BATCH or the STORE?
    (r14 — the media twin of the minhash/embedding store probes; the r13
    band-table refactor shipped on plan evidence alone.)

    Seeds an ImageHashStore at 1x and ``replicas``x, then ingests a
    FIXED 500-image batch of fresh monotone ids against each:

    - ``batch_fp_kernel``: decode+hash the batch (Arrow pass — store-
      independent by construction);
    - ``inc_ingest_e2e``: the full ingest — banded candidates against
      the bucket-PRUNED stored band table, fresh-fps verify,
      partition-delta fps/bands writes. Should stay ~flat as the store
      grows 10x (the directory pruning + id-range delta claims).
    """
    import os

    from metadata_ingestion_framework_spark.operators.dedup import (
        unpersist_deps,
    )
    from metadata_ingestion_framework_spark.operators.incremental import (
        ImageHashStore,
    )

    out: dict = {}
    for tag, n in [("1x", n_base), (f"{replicas}x", n_base * replicas)]:
        r: dict = {}
        print(f"== mediastore, store {tag} ==", file=sys.stderr)
        st = ImageHashStore(
            spark, os.path.join(workdir, f"mediastore_{tag}"),
            fp_bucket_width=2048, n_buckets=64,
        )
        seed = _synth_images(spark, n).persist()
        seed.count()

        def _seed():
            s = st.ingest(seed, "seed")
            c = s.count()
            unpersist_deps(s)
            return c

        timed("seed_ingest_full", _seed, r)
        seed.unpersist()
        batch = _synth_images(spark, 500, id_offset=n * 7 + 11).persist()
        batch.count()
        timed(
            "batch_fp_kernel",
            lambda: st._fingerprints(batch).count(),
            r,
        )

        def _ingest():
            s = st.ingest(batch, "r2")
            c = s.count()
            unpersist_deps(s)
            return c

        timed("inc_ingest_e2e", _ingest, r)
        batch.unpersist()
        out[tag] = r
    return out


def main_mediastore(args: list[str]) -> None:
    import tempfile

    n_base = int(args[0]) if args else 5000
    replicas = int(args[1]) if len(args) > 1 else 10
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark

    spark = get_spark("scale_probe_mediastore")
    with tempfile.TemporaryDirectory() as workdir:
        phases = probe_mediastore(spark, n_base, replicas, workdir)
    tags = list(phases)
    result = {
        "probe": "image_store_10x",
        "n_base": n_base,
        "replicas": replicas,
        "base": phases[tags[0]],
        "scaled": phases[tags[1]],
    }
    result["growth"] = {
        k: round(result["scaled"][k]["sec"] / max(result["base"][k]["sec"], 0.01), 1)
        for k in result["base"]
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    spark.stop()


def main_vecstore(args: list[str]) -> None:
    import tempfile

    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    replicas = int(args[1]) if len(args) > 1 else 10
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import t

    spark = get_spark("scale_probe_vecstore")
    emb = t(spark, sf_dir, "embeddings")
    with tempfile.TemporaryDirectory() as workdir:
        phases = probe_vecstore(spark, emb, replicas, workdir)
    tags = list(phases)
    result = {
        "probe": "embedding_store_10x",
        "sf_dir": sf_dir,
        "replicas": replicas,
        "base": phases[tags[0]],
        "scaled": phases[tags[1]],
    }
    result["growth"] = {
        k: round(result["scaled"][k]["sec"] / max(result["base"][k]["sec"], 0.01), 1)
        for k in result["base"]
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    _append_vecstore_md(result)
    print(json.dumps(result))
    spark.stop()


def main_ivfsplit(args: list[str]) -> None:
    import tempfile

    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    replicas = int(args[1]) if len(args) > 1 else 10
    sys.path.insert(0, "/root/repo")
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import t

    spark = get_spark("scale_probe_ivfsplit")
    emb = t(spark, sf_dir, "embeddings")
    with tempfile.TemporaryDirectory() as workdir:
        phases = probe_ivfsplit(spark, emb, replicas, workdir)
    tags = list(phases)
    result = {
        "probe": "ivf_cell_split_10x",
        "sf_dir": sf_dir,
        "replicas": replicas,
        "base": phases[tags[0]],
        "scaled": phases[tags[1]],
    }
    result["growth"] = {
        k: round(result["scaled"][k]["sec"] / max(result["base"][k]["sec"], 0.01), 1)
        if not k.startswith("max_part_")
        else round(result["scaled"][k]["rows"] / max(result["base"][k]["rows"], 1), 1)
        for k in result["base"]
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    _append_ivfsplit_md(result)
    print(json.dumps(result))
    spark.stop()


def _append_ivfsplit_md(result: dict) -> None:
    lines = [
        "",
        "## IVF hot-cell split probe (r11, 80%-skewed corpus grown "
        f"{result['replicas']}x)",
        "",
        "claim under test (VERDICT r10 item 2): with cell_cap, the hot "
        "cell sub-splits into md5-bucketed children, so the LARGEST "
        "physical partition (`max_part_*`, rows) stays ~bounded by the "
        "cap as the skewed corpus grows — flat's hot partition grows "
        "with the corpus and becomes the straggler every probe hits. "
        "Serve results are identical by construction (pytest).",
        "",
        "| phase | 1x sec (rows) | 10x sec (rows) | growth |",
        "|---|---|---|---|",
    ]
    for k in result["base"]:
        b, s = result["base"][k], result["scaled"][k]
        lines.append(
            f"| {k} | {b['sec']} ({b['rows']}) | {s['sec']} ({s['rows']}) "
            f"| {result['growth'][k]}x |"
        )
    lines.append("")
    with open("PROBE.md", "a") as f:
        f.write("\n".join(lines))


def _append_vecstore_md(result: dict) -> None:
    lines = [
        "",
        "## Embedding store probe (fixed batch + retention, store grown "
        f"{result['replicas']}x)",
        "",
        "claim under test (r10, VERDICT r9 item 3): with the "
        "(vec_bucket, cell) layout, ingest's partition-delta touched set "
        "is the batch ids' range buckets and retention drops whole "
        "buckets without rewriting — `vec_ingest_e2e` and `vec_retire` "
        f"should stay ~flat as the store grows {result['replicas']}x "
        "(`seed_store_write` is the full-corpus baseline that DOES grow).",
        "",
        "| phase | store 1x sec (rows) | store 10x sec (rows) | growth |",
        "|---|---|---|---|",
    ]
    for k in result["base"]:
        b, s = result["base"][k], result["scaled"][k]
        lines.append(
            f"| {k} | {b['sec']} ({b['rows']}) | {s['sec']} ({s['rows']}) "
            f"| {result['growth'][k]}x |"
        )
    lines.append("")
    with open("PROBE.md", "a") as f:
        f.write("\n".join(lines))


def _append_incremental_md(result: dict) -> None:
    lines = [
        "",
        "## Incremental-dedup store probe (fixed batch, store grown "
        f"{result['replicas']}x)",
        "",
        "claim under test: ingest cost tracks the BATCH, not the store. "
        "`sig_kernel_batch`/`inc_query` should stay ~flat as the store grows "
        f"{result['replicas']}x; `full_rerun_pairs` (the non-incremental "
        "alternative) grows with the corpus. r9: BOTH store tables now "
        "ingest via write_partition_delta — the band table on band-hash "
        "buckets (r8) and the sigs table on id-RANGE buckets "
        "(floor(id / sig_bucket_width)); only the batch's own buckets are "
        "physically rewritten, the rest hard-link from the previous "
        "version, so `inc_ingest_e2e` no longer carries any "
        "store-size-proportional write. (Range, not hash, buckets for "
        "sigs: a batch >= n_buckets rows hash-touches EVERY bucket — "
        "measured 1.5x e2e growth — while monotone ingest ids "
        "range-concentrate into the batch's own buckets: 1.0x.)",
        "",
        "| phase | store 1x sec (rows) | store 10x sec (rows) | growth |",
        "|---|---|---|---|",
    ]
    for k in result["base"]:
        b, s = result["base"][k], result["scaled"][k]
        lines.append(
            f"| {k} | {b['sec']} ({b['rows']}) | {s['sec']} ({s['rows']}) "
            f"| {result['growth'][k]}x |"
        )
    lines.append("")
    with open("PROBE.md", "a") as f:
        f.write("\n".join(lines))


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
    # preserve the appended probe sections (incremental / skew) — the main
    # table rewrite must not clobber them (they start at the first "## ")
    preserved = ""
    try:
        with open("PROBE.md") as f:
            prior = f.read()
        idx = prior.find("\n## ")
        if idx != -1:
            preserved = prior[idx:]
    except FileNotFoundError:
        pass
    with open("PROBE.md", "w") as f:
        f.write("\n".join(lines) + preserved)


if __name__ == "__main__":
    main()
