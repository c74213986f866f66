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
