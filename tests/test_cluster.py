"""connected_components: transitive cluster labels over near-dup pair sets
(operators/cluster.py). Both strategies — single-task union-find ('local')
and distributed large-star/small-star rounds ('stars') — must agree with a
brute-force union-find ground truth and with each other."""

from __future__ import annotations

import random

import pytest

from metadata_ingestion_framework_spark.operators.cluster import (
    cluster_representatives,
    connected_components,
)

STRATEGIES = ["local", "stars"]


def _uf_components(pairs):
    """Brute-force union-find ground truth: {node: min id of component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, pairs, strategy):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        r.id: r.component
        for r in connected_components(df, strategy=strategy).collect()
    }


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_chain_collapses_to_min(spark, strategy):
    # A~B~C chain: the greedy per-pair rule is order-dependent here; the
    # component label must be the global min for all three
    assert _run(spark, [(1, 2), (2, 3)], strategy) == {1: 1, 2: 1, 3: 1}


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_local_min_is_not_representative(spark, strategy):
    # node 2 is a LOCAL min (never the larger side of its only pair) but
    # not the component min — exactly the topology where greedy keeps 2
    # and transitive clustering must drop it
    assert _run(spark, [(1, 5), (2, 5)], strategy) == {1: 1, 5: 1, 2: 1}


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_multiple_components(spark, strategy):
    got = _run(spark, [(10, 11), (20, 21), (21, 22), (30, 31), (11, 12)], strategy)
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_reversed_and_duplicate_pairs(spark, strategy):
    # orientation and multiplicity must not matter
    assert _run(spark, [(5, 1), (1, 5), (5, 1), (3, 1)], strategy) == {1: 1, 5: 1, 3: 1}


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_long_chain_converges(spark, strategy):
    n = 40  # diameter >> 1 forces multiple star rounds
    got = _run(spark, [(i, i + 1) for i in range(n)], strategy)
    assert got == {i: 0 for i in range(n + 1)}


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_random_graphs_match_union_find(spark, strategy):
    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(rng.randint(10, 60)))
        pairs = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(rng.randint(5, 80))
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        assert _run(spark, pairs, strategy) == _uf_components(pairs), f"trial {trial}"


def test_auto_picks_stars_above_threshold(spark):
    """auto with a tiny threshold must route through the distributed star
    rounds and still produce the union-find answer."""
    pairs = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r.id: r.component
        for r in connected_components(df, local_threshold=3).collect()
    }
    assert got == {i: 0 for i in range(13)}


def test_cluster_representatives_drop_set(spark):
    df = spark.createDataFrame([(1, 5), (2, 5), (8, 9)], "id_a long, id_b long")
    drops = {r.id for r in cluster_representatives(df).collect()}
    assert drops == {2, 5, 9}


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_string_ids(spark, strategy):
    df = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    got = {
        r.id: r.component
        for r in connected_components(df, strategy=strategy).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_unknown_strategy_raises(spark):
    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="strategy"):
        connected_components(df, strategy="nope")


def test_cluster_safe_split_no_straddle(spark):
    """Every near-dup cluster lands wholly in one split; singletons split
    by their own id; the assignment is deterministic across reruns."""
    from metadata_ingestion_framework_spark.operators.cluster import (
        cluster_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 21)], "doc_id long, text string"
    )
    # clusters: {1,2,3} (chain), {7,8}; rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    out = cluster_safe_split(docs, pairs, "doc_id", val_rate=0.5, salt="t")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 20
    assert {rows[i]["component"] for i in (1, 2, 3)} == {1}
    assert {rows[i]["split"] for i in (1, 2, 3)} == {rows[1]["split"]}
    assert {rows[i]["split"] for i in (7, 8)} == {rows[7]["split"]}
    # deterministic rerun
    again = {r["doc_id"]: r["split"] for r in out.collect()}
    assert again == {i: rows[i]["split"] for i in rows}
    # a 0.5 rate on 17 clusters must actually produce both splits
    assert {r["split"] for r in rows.values()} == {"train", "val"}
