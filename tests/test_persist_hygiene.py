"""Persist-leak guard for the two-stage window queries (r8).

Operators built on ``_ordered_shard`` persist a sharded intermediate and
hand it to callers via ``_persisted_deps``; any catalog query that
post-processes the result with a bare ``.select`` strips the attribute
and leaks the cache in a long-lived session (caught twice in r8:
q_token_budget and q_det_shuffle). This test runs every such query at
sf0.001, releases the advertised deps, and asserts NO cached RDD
survives — so a future query that forgets ``carry_deps`` fails here
instead of accumulating caches across a 96-query harness session.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

TWO_STAGE_QUERIES = [
    "token_budget",
    "calibrate_scores",
    "quota_sample",
    "det_shuffle",
    "curation_v2",
    "curation_v3",
    # connected-components consumers: CC persists its edge set (r8 — was a
    # GC-only localCheckpoint) and every consumer must carry it out
    "dup_clusters",
    "cluster_split",
    "semantic_dedup",
    "curation_pipeline",
    # r11: ann_recall persists the Q-row recall table itself (the means
    # agg adds a second consumer) — the cache must ride _persisted_deps
    "ann_recall",
    # r12: the incremental composite persists two signature tables + the
    # cell assignment and carries both batch-drop sets' deps
    "curation_incremental",
    "incremental_dedup",
    "incremental_semantic",
    # r16: the first-owner de-skew persists the (id, pos, gh) rows in
    # both rewrite-dedup operators; composites must carry them out
    "span_dedup",
    "paragraph_dedup",
    "web_curation",
    # r16 new operators with persisted intermediates
    "dsir_select",
    "corpus_shards",
    "crossmodal_dedup_inc",
]


@pytest.mark.parametrize("name", TWO_STAGE_QUERIES)
def test_query_releases_every_persist(spark, name):
    import os

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} absent")
    from metadata_ingestion_framework_spark.catalog_queries import QUERIES

    spark.catalog.clearCache()
    # DELTA-based: the session is shared across the test run and earlier
    # suites may hold localCheckpoint RDDs the SQL cache clear can't drop
    # — only NEW survivors incriminate this query
    before = set(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    df = QUERIES[name](spark, SF_DIR)
    df.count()
    for dep in getattr(df, "_persisted_deps", ()):
        dep.unpersist(blocking=True)
    after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    leaked = {k: v for k, v in after.items() if k not in before}
    spark.catalog.clearCache()
    assert not leaked, f"{name} leaked {len(leaked)} cached RDD(s)"
