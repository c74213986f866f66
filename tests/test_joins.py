"""Unit tests for §2.4 join/condition builders (J1, J6, J9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.joins import (
    build_inner_join_condition,
    build_merge_key_projections,
    build_partition_pruning_filter,
)


@pytest.fixture()
def sides(spark):
    u = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "a int, b int").alias("updates")
    t = spark.createDataFrame([(1, 10), (2, 25), (4, 30)], "a int, b int").alias("target")
    return u, t


def _ids(u, t, cond):
    return sorted(r[0] for r in u.join(t, cond).select(F.col("updates.a")).collect())


def test_theta_operator_table(spark, sides):
    """All six operators of Utility.scala:264-276 behave like their SQL op."""
    u, t = sides
    assert _ids(u, t, build_inner_join_condition(["a"])) == [1, 2]  # bare key = equi
    assert _ids(u, t, build_inner_join_condition(["a = a", "b = b"])) == [1]
    assert _ids(u, t, build_inner_join_condition(["a != a", "b = b"])) == [3]
    # inequality keys compare update.left vs target.right
    lt = u.join(t, build_inner_join_condition(["a < a"])).count()
    le = u.join(t, build_inner_join_condition(["a <= a"])).count()
    gt = u.join(t, build_inner_join_condition(["a > a"])).count()
    ge = u.join(t, build_inner_join_condition(["a >= a"])).count()
    assert le == lt + 2 and ge == gt + 2  # two equal a-values (1, 2... wait 1 and 2 vs 1,2,4 -> 1=1,2=2)


def test_extra_join_condition_anded(spark, sides):
    u, t = sides
    cond = build_inner_join_condition(["a"], extra_join_condition="target.b > 20")
    assert _ids(u, t, cond) == [2]


def test_empty_keys_raise():
    with pytest.raises(ValueError):
        build_inner_join_condition([])


def test_partition_pruning_filter(spark):
    updates = spark.createDataFrame([(1, "p1"), (2, "p2")], "id int, part string")
    target = spark.createDataFrame(
        [(10, "p1"), (11, "p3"), (12, None)], "id int, part string"
    ).alias("target")
    prune = build_partition_pruning_filter(updates, "part")
    kept = [r["id"] for r in target.filter(prune).collect()]
    assert kept == [10]  # p3 and NULL pruned (Utility.scala:339-348)
    # missing column / oversized list -> None (no pruning, still correct)
    assert build_partition_pruning_filter(updates, "nope") is None
    assert build_partition_pruning_filter(updates, "part", max_values=1) is None


def test_merge_key_projections():
    nulls, reals = build_merge_key_projections(["empid", "deptno = deptno"], ["empid", "deptno", "sal"])
    assert nulls[0] == "CAST(NULL AS STRING) AS mergekey_0"
    assert reals[0] == "CAST(empid AS STRING) AS mergekey_0"
    assert reals[1] == "CAST(deptno AS STRING) AS mergekey_1"
    assert nulls[-3:] == ["empid", "deptno", "sal"]


def test_as_of_join_semantics(spark):
    """Backward inclusive match, duplicate-ts tiebreak (largest wins),
    left-outer nulls, and the tolerance horizon (boundary kept, beyond
    voided)."""
    import datetime as dt

    from metadata_ingestion_framework_spark.operators.joins import as_of_join

    T = dt.datetime
    left = spark.createDataFrame(
        [
            (1, 10, T(2024, 1, 1, 10, 0, 0), "c1"),
            (2, 10, T(2024, 1, 1, 12, 0, 0), "c2"),
            (3, 11, T(2024, 1, 1, 9, 0, 0), "c3"),  # no prior right row
            (4, 10, T(2024, 1, 1, 11, 0, 0), "c4"),  # equal-ts inclusive
        ],
        "id long, user long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (100, 10, T(2024, 1, 1, 9, 30, 0), 5.0),
            (101, 10, T(2024, 1, 1, 11, 0, 0), 7.0),  # dup ts with 102
            (102, 10, T(2024, 1, 1, 11, 0, 0), 9.0),  # larger tiebreak wins
            (103, 11, T(2024, 1, 1, 9, 30, 0), 1.0),  # after left id=3
        ],
        "rid long, user long, ts timestamp, amt double",
    )
    out = {
        r["id"]: r
        for r in as_of_join(
            left, right, ["user"], "ts", "ts",
            right_cols=["rid", "ts", "amt"], tiebreak="rid",
        ).collect()
    }
    assert (out[1]["rid_r"], out[1]["amt_r"]) == (100, 5.0)
    assert out[2]["rid_r"] == 102                    # latest, dup-ts tiebreak
    assert out[3]["rid_r"] is None                   # left-outer
    assert out[4]["rid_r"] == 102                    # inclusive equal ts
    assert sorted(out[1].asDict()) == sorted(
        ["id", "user", "ts", "tag", "rid_r", "ts_r", "amt_r"]
    )

    tol = {
        r["id"]: r
        for r in as_of_join(
            left, right, ["user"], "ts", "ts",
            right_cols=["rid", "ts", "amt"], tiebreak="rid",
            tolerance_sec=1800,
        ).collect()
    }
    assert tol[1]["rid_r"] == 100   # exactly 1800s: boundary kept
    assert tol[2]["rid_r"] is None  # 3600s old: voided
    assert tol[4]["rid_r"] == 102   # 0s old


def test_as_of_join_tolerance_needs_ts(spark):
    import pytest

    from metadata_ingestion_framework_spark.operators.joins import as_of_join

    df = spark.createDataFrame([(1, 1.0, 2.0)], "k long, ts double, v double")
    with pytest.raises(ValueError, match="tolerance_sec"):
        as_of_join(df, df, ["k"], "ts", "ts", right_cols=["v"], tolerance_sec=5)


def test_range_join_pairs_matches_bruteforce(spark):
    """Bucketed canonical-emission output == brute-force inequality join,
    across interval shapes (containment, partial overlap, touching
    endpoints, disjoint, many-bucket spans) and two bucket widths."""
    import random

    from metadata_ingestion_framework_spark.operators.joins import range_join_pairs

    rng = random.Random(11)
    lrows = [(i, rng.randrange(2), rng.uniform(0, 100), rng.uniform(0.1, 25))
             for i in range(60)]
    rrows = [(i, rng.randrange(2), rng.uniform(0, 100), rng.uniform(0.1, 25))
             for i in range(60)]
    left = spark.createDataFrame(
        [(i, k, s, s + d) for i, k, s, d in lrows], "lid long, k int, s double, e double"
    )
    right = spark.createDataFrame(
        [(i, k, s, s + d) for i, k, s, d in rrows], "rid long, k int, s double, e double"
    )
    expect = sorted(
        (lk, li, ri, round(min(le, re) - max(ls, rs), 9))
        for li, lk, ls, ld in [(i, k, s, d) for i, k, s, d in lrows]
        for ri, rk, rs, rd in [(i, k, s, d) for i, k, s, d in rrows]
        if lk == rk and ls <= rs + rd and rs <= ls + ld
        for le, re in [(ls + ld, rs + rd)]
    )
    for width in (5.0, 40.0):
        got = sorted(
            (r["k"], r["lid"], r["rid"], round(r["overlap"], 9))
            for r in range_join_pairs(
                left, right, "lid", "rid", "s", "e", "s", "e",
                bucket_width=width, keys=["k"],
            ).collect()
        )
        assert got == expect, f"width={width}"
    assert len(expect) > 50  # the fixture must exercise real overlap density


def test_range_join_touching_endpoints_inclusive(spark):
    from metadata_ingestion_framework_spark.operators.joins import range_join_pairs

    left = spark.createDataFrame([(1, 0.0, 10.0)], "lid long, s double, e double")
    right = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 20.0, 30.0)], "rid long, s double, e double"
    )
    got = {(r["lid"], r["rid"]): r["overlap"] for r in range_join_pairs(
        left, right, "lid", "rid", "s", "e", "s", "e", bucket_width=7.0
    ).collect()}
    assert got == {(1, 1): 0.0}  # touching counts, disjoint does not


def test_as_of_join_null_keys_never_match(spark):
    """SQL ASOF equality semantics (r7 ADVICE item 2): a NULL join key on
    the right never matches anything; a NULL-key left row still comes out,
    unmatched (left-outer)."""
    from metadata_ingestion_framework_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, None, 10.0), (2, "u", 10.0)], "eid int, k string, ts double"
    )
    right = spark.createDataFrame(
        [(None, 5.0, "nullkey"), ("u", 5.0, "ukey")], "k string, ts double, v string"
    )
    out = {
        r["eid"]: r["v_r"]
        for r in as_of_join(left, right, ["k"], "ts", "ts", right_cols=["v"]).collect()
    }
    assert out == {1: None, 2: "ukey"}
