"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "total_wall_sec", "value": N, "unit": "sec", "queries": {...},
 "flagship": {...}, "sf": ...}

``value`` is the sum of the HEADLINE timings only (r1/r2-comparable set);
``flagship`` carries the heavy composites (ngram_jaccard_prefix,
curation_pipeline) warm and repeat-measured, tracked every round but kept
out of the headline total (VERDICT r2 item 1).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "window_dedup",
    "topk_per_group",
    "theta_join",
    "scd1_merge",
    "scd2_merge",
    "events_hourly",
    "sessionize",
    "hash_jk",
    "cdc_split",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "text_stats",
    "quality_score",
    "cosine_topk",
    "embedding_neardup",
    "top_ngrams",
    "stratified_sample",
]

# Heavy flagship composites: timed in their own block (2 warm repetitions,
# min reported) so the driver records them every round without making the
# headline total incomparable to rounds 1-2.
FLAGSHIP = [
    "ngram_jaccard_prefix",
    "curation_pipeline",
]
FLAGSHIP_REPEATS = 3

# r6/r7 operator surface (VERDICT r6 item 5): benched every round with the
# same min-of-2 methodology, recorded under "extended" — kept out of the
# headline total so that number stays comparable to rounds 1-6.
EXTENDED = [
    "decontaminate",
    "repetition_stats",
    "pack_manifest",
    "tfidf_top_terms",
    "ivf_topk_int8",
    "ann_recall",
    "incremental_dedup",
    "dup_clusters",
    "heuristic_filters",
    "span_dedup",
    "semantic_dedup",
    "asof_join",
    "range_join",
    "token_budget",
    "cluster_split",
    "ngram_perplexity",
    "zorder_key",
    "incremental_semantic",
    "calibrate_scores",
    "temperature_mix",
    "quota_sample",
    "det_shuffle",
    "curation_v2",
    "curation_v3",
    "kmeans_ivf",   # r10: trained coarse quantizer (training included)
    "bpe_merges",   # r10: BPE vocab training (8 iterative merge rounds)
    "bpe_tokenize",       # r11: nested-replace inference (training incl.)
    "bpe_tokenize_fast",  # r11: Arrow linear-time encoder (training incl.)
    "quality_model",      # r11: hashed-ngram linear scorer (map-only)
    "lang_id_model",      # r11: multiclass linear lang-id (map-only)
    "bpe_encode_ids",     # r11: integer token-id encoding (training incl.)
    "curation_v4",        # r11: model-gated curation composite
    "profile_table",      # r11: one-pass per-column profiler
    "cms_heavy_hitters",  # r11: count-min sketch contract
    "decontaminate_bloom",  # r11: Bloom-prefiltered decontamination
    "pq_topk",              # r12: product-quantization ADC + rerank
    "curation_incremental",  # r12: repeated-ingestion curation composite
    "ivfpq_topk",           # r12: IVF-PQ composed index
    "bm25_topk",            # r12: lexical BM25 retrieval
    "bm25_index_serve",     # r13: persistent BM25 index merge+serve math
    "media_dedup",          # r13: perceptual image dedup (dHash banding)
    "url_dedup",            # r13: URL canonicalization + exact dedup
    "decontam_triage",      # r13: BM25-gated contamination review
    "media_dedup_incremental",  # r13: cross-run perceptual image dedup
    "decontam_triage_indexed",  # r14: triage through the index serve
    # dataflow (in-plan build emulation — the catalog face pays the
    # build; the REAL-store amortization is PROBE.md's triage_* lines)
    "audio_dedup",          # r14: perceptual audio dedup (energy-delta
    # fingerprints + shared Hamming banding)
    "video_dedup",          # r14: frame-level perceptual video dedup
    "html_extract",         # r14: HTML/boilerplate extraction + gate
    "hybrid_topk",          # r14: RRF hybrid lexical+semantic retrieval
    "hybrid_served",        # r15: index-served hybrid retrieval (in-plan
    # build emulation; real-store amortization = PROBE.md hybrid table)
    "paragraph_dedup",      # r15: CCNet paragraph-level exact dedup
    "paragraph_dedup_inc",  # r15: ParagraphHashStore two-ingest replay
    "mmr_rerank",           # r15: MMR diversification of a retrieval top-k
    "web_curation",         # r15: web-ordered curation composite
    "bm25_maxp",            # r15: passage-level BM25 + MaxP aggregation
    "crossmodal_dedup",     # r15: LAION-rule (caption, image) pair dedup
    "corpus_shards",        # r16: snapshot sharded-corpus manifest
    "dsir_select",          # r16: DSIR importance-resampled selection
    "crossmodal_dedup_inc",  # r16: CrossModalPairStore two-ingest replay
    "corpus_shards_inc",    # r17: epoch-incremental corpus sharding
    "pack_bfd",             # r17: best-fit-decreasing sequence packing
    "cluster_mix",          # r17: topic-balanced training mix (k-means
    # training included — the kmeans_ivf cost class)
    "url_gate",             # r17: domain/path blocklist gate (map-only)
    "clip_gate",            # r18: CLIP-score (caption, image) cosine gate
    "store_health",         # r18: two-ingest fact rollup (minhash drops
    # recomputed in-plan — the incremental_dedup cost class)
    "pack_offsets",         # r18: packed-sequence boundary explode
    "pretrain_corpus_e2e",  # r18: full web-to-training-shards composite
    # (extraction + gates + minhash + decontam + k-means mix + epoch
    # shards + BFD packing in one DAG — the heaviest catalog entry)
    "clip_frac_gate",       # r18 tail: DataComp top-fraction CLIP rule
    "hard_negatives",       # r18 tail: DPR-style BM25 negative mining
    "semantic_decontam",    # r18 tail: embedding-space decontamination
]

# Headline queries are ALSO repeat-measured (min of N warm reps): the r3
# single-shot headline recorded topk_per_group at 2.21s where 3 warm reps
# measured 0.94s stable — a fabricated 32% total "regression" (VERDICT r3
# item 2). min-of-2 keeps the total reproducible within ~10%.
HEADLINE_REPEATS = 2

# Methodology tag recorded in the output JSON so cross-round deltas are
# adjudicable (ADVICE r3): r1/r2 timed collect() single-shot; r3 switched to
# an engine-side bit_xor(xxhash64) checksum action (single-shot); r4+ is the
# same checksum action with min-of-2 repeats per headline query; r8 moved
# the flagship block FIRST (before headline/extended) — the r7 flagship
# "regression" (2.8->6.1s) did not reproduce in a fresh session (min-of-3
# 2.54s at HEAD) and was late-session pressure from the ~42-plan warmup +
# 40 timed runs preceding it, so flagships now measure right after their
# own warmup, where the number reflects the operator and not the queue
# position.
ACTION = "checksum_xxhash64_min_of_2_flagship_first_interleaved_memo_cleared_per_rep"


def _scratch_hygiene(initial: bool = False) -> None:
    """Measurement hygiene (r19, VERDICT r18 item 3): the barrier/store
    queries write scratch parquet under SCRATCH during their timed run.
    The dirs themselves are deleted through each query's
    ``_persisted_deps`` release, but (a) an interrupted PRIOR session can
    leave whole app trees behind, and (b) the kernel writeback of the
    just-written-then-deleted pages is asynchronous — CLAUDE.md documents
    D-state I/O from store probes inflating timings for minutes. At
    session start we remove any leftover scratch outright; between timed
    reps we reap empty app dirs and ``os.sync()`` so dirty pages flush
    OUTSIDE the timed region instead of during the next query's stages.
    Timing methodology (action, reps, order) is unchanged."""
    try:
        from metadata_ingestion_framework_spark.session import SCRATCH
    except Exception:  # pragma: no cover - import order safety
        return
    barrier_root = os.path.join(SCRATCH, "barrier")
    if initial:
        shutil.rmtree(barrier_root, ignore_errors=True)
    elif os.path.isdir(barrier_root):
        for app in os.listdir(barrier_root):
            path = os.path.join(barrier_root, app)
            try:
                if not os.listdir(path):
                    os.rmdir(path)
            except OSError:
                pass
    try:
        os.sync()
    except (OSError, AttributeError):  # pragma: no cover
        pass


def run_query(spark, fn, sf_dir) -> tuple[float, int]:
    """Time one query with an engine-side checksum action (VERDICT r2 item 1).

    ``bit_xor(xxhash64(*cols))`` forces evaluation of EVERY output column
    (the xor result depends on every value, so Catalyst can neither prune
    columns nor rewrite the count) while rows never leave the executors —
    a 100 TB job would not collect() its result set, and the r2 bench showed
    row-heavy queries (cdc_split 150k rows) paying ~0.7s of pure driver
    transfer. orderBy+limit tails survive as TakeOrderedAndProject under the
    agg (verified in the executed plan), so top-k queries are not distorted
    into global sorts.
    """
    from pyspark.sql import functions as F

    # Train-once memos (kmeans / BPE) would otherwise make rep1 skip
    # training, so min-of-N would record a no-training time for
    # ann_recall/semantic_dedup/kmeans_ivf/bpe_merges while the first
    # rep paid it — order- and rep-dependent numbers (r10 run A recorded
    # bpe_merges 2.49s pre-cache vs 0.55s post-cache on the same commit).
    # Clearing before EVERY timed rep makes "training included" true and
    # stable; queries without a memo are unaffected.
    from metadata_ingestion_framework_spark import catalog_queries as _cq

    for cache_name in ("_KMEANS_CACHE", "_BPE_CACHE"):
        getattr(_cq, cache_name, {}).clear()

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("ck"),
    ).collect()[0]
    elapsed = time.perf_counter() - t0
    for dep in getattr(df, "_persisted_deps", ()):  # release operator caches
        dep.unpersist()
    # flush the rep's scratch writeback before the next timed rep starts
    _scratch_hygiene()
    return elapsed, int(row["n"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # Environment self-description (VERDICT r8 item 1): a preceding Spark
    # session winding down inflates pure-JVM stages 1.5-3x (CLAUDE.md uptime
    # rule). Recording the 1-min load average at start lets any reader
    # adjudicate a noisy run without forensics — load_avg_at_start > ~2 on
    # this box means the numbers are environment-suspect, not regressions.
    # clear any prior session's leftover scratch BEFORE the settle loop,
    # so the rm's own I/O is absorbed by the settle (VERDICT r18 item 3)
    _scratch_hygiene(initial=True)
    try:
        load_avg_at_start = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - platform without getloadavg
        load_avg_at_start = None
    # Load-aware settle (r12, VERDICT r11 item 3): both the r10 and r11
    # driver runs timed at load > 1.9 and produced flagship readings the
    # idle re-times refuted (3.57s vs 2.37s on identical code). The old
    # 60s/threshold-2.0 wait was not enough for a winding-down Spark JVM,
    # so poll until the 1-min load is < 1.0, bounded at 5 min; both
    # samples and the wait are recorded so any reading is adjudicable.
    # r19 (VERDICT r18 item 3): the r18 driver run crossed the old
    # threshold at load 0.98 after 130 s and still timed flagships 3-6x
    # off the idle envelope — a winding-down session's D-state I/O keeps
    # polluting below load 1.0. Settle deeper (0.7) and longer (600 s);
    # the wait is outside every timed region.
    settle_wait_sec = 0
    load_avg_at_timing = load_avg_at_start
    if load_avg_at_start is not None and load_avg_at_start >= 0.7:
        print(
            f"# WARNING: load_avg_at_start={load_avg_at_start} >= 0.7 — "
            "settling up to 600s before timing",
            file=sys.stderr,
        )
        while settle_wait_sec < 600:
            time.sleep(5)
            settle_wait_sec += 5
            load_avg_at_timing = round(os.getloadavg()[0], 2)
            if load_avg_at_timing < 0.7:
                break
        print(
            f"# settled {settle_wait_sec}s: load {load_avg_at_start} -> "
            f"{load_avg_at_timing}"
            + (" (still hot — numbers are environment-suspect)"
               if load_avg_at_timing >= 0.7 else ""),
            file=sys.stderr,
        )
    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.catalog_queries import QUERIES

    spark = get_spark("bench")
    # warm the JVM/session so the first query doesn't pay session startup,
    # and touch each table's parquet footer (schema only — no data scan),
    # as a metastore-cached production session would have
    spark.range(1).count()
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
        except Exception:
            pass
    # JIT/codegen warmup: run every timed query once at the smallest SF
    # (sf0.001, ~1% of the timed data). Whole-stage codegen compilation and
    # Arrow/Python worker startup are per-plan-shape one-time costs a
    # long-running session has already paid; timing them against the first
    # query that happens to use each path misattributes fixed cost as
    # per-query cost. Data caches stay cold for the timed SF — different dir.
    warm_dir = "/root/testdata/sf0.001"
    have_warm = os.path.isdir(warm_dir) and warm_dir != sf_dir

    # Per-query error isolation (VERDICT r4 item 2): one broken query must
    # never again zero the round's entire perf evidence (BENCH_r04 rc=1,
    # parsed=null). Failures are recorded in "errors" and excluded from the
    # total; the rest keep benchmarking.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    # Flagship composites FIRST (r8 — see ACTION note), and per-flagship
    # warm->time INTERLEAVED (r9): warming flagship B's ~40-stage plan
    # between A's warmup and A's timing leaves JVM/codegen debris that
    # showed up as a consistent-within-session 1.8x on A (5.3s vs 2.9s
    # same commit, both reps elevated) — each flagship now times
    # immediately after its own warmup.
    flagship: dict[str, float] = {}
    for name in FLAGSHIP:
        if have_warm:
            try:
                run_query(spark, QUERIES[name], warm_dir)
            except Exception as exc:  # pragma: no cover - warmup best-effort
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        best = None
        try:
            for rep in range(FLAGSHIP_REPEATS):
                elapsed, n = run_query(spark, QUERIES[name], sf_dir)
                best = elapsed if best is None else min(best, elapsed)
                print(f"# flagship {name} rep{rep}: {elapsed:.3f}s rows={n}", file=sys.stderr)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# flagship {name} FAILED: {errors[name]}", file=sys.stderr)
            continue
        flagship[name] = round(best, 4)

    if have_warm:
        for name in HEADLINE + EXTENDED:
            try:
                run_query(spark, QUERIES[name], warm_dir)
            except Exception as exc:  # pragma: no cover - warmup best-effort
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    for name in HEADLINE:
        best = None
        try:
            for rep in range(HEADLINE_REPEATS):
                elapsed, n = run_query(spark, QUERIES[name], sf_dir)
                best = elapsed if best is None else min(best, elapsed)
                print(f"# {name} rep{rep}: {elapsed:.3f}s rows={n}", file=sys.stderr)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name} FAILED: {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 4)

    extended: dict[str, float] = {}
    for name in EXTENDED:
        best = None
        try:
            for rep in range(HEADLINE_REPEATS):
                elapsed, n = run_query(spark, QUERIES[name], sf_dir)
                best = elapsed if best is None else min(best, elapsed)
                print(f"# extended {name} rep{rep}: {elapsed:.3f}s rows={n}", file=sys.stderr)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# extended {name} FAILED: {errors[name]}", file=sys.stderr)
            continue
        extended[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "flagship": flagship,
        "extended": extended,
        "action": ACTION,
        "load_avg_at_start": load_avg_at_start,
        "load_avg_at_timing": load_avg_at_timing,
        "settle_wait_sec": settle_wait_sec,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
        # a partial total is not comparable across rounds — flag it
        out["partial"] = True
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
