"""Table profiler (functions/profiling.py, r11): one-pass per-column
stats, NULL handling, approximate path, and batch-over-batch drift
flags."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.functions.profiling import (
    profile_drift,
    profile_table,
)


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.5, None),
            (2, "b", 2.5, None),
            (3, "b", None, None),
            (4, None, 4.5, None),
        ],
        "id int, k string, x double, dead string",
    )


def test_profile_exact_values(spark):
    prof = {r.column: r for r in profile_table(_fixture(spark)).collect()}
    assert set(prof) == {"id", "k", "x", "dead"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert (prof["id"].n_null, prof["id"].n_distinct) == (0, 4)
    assert (prof["id"].min_value, prof["id"].max_value) == ("1", "4")
    assert (prof["k"].n_null, prof["k"].n_distinct) == (1, 2)
    assert (prof["k"].min_value, prof["k"].max_value) == ("a", "b")
    assert (prof["x"].n_null, prof["x"].n_distinct) == (1, 3)
    # NULL-only column: (n, n, 0, NULL, NULL)
    assert (prof["dead"].n_null, prof["dead"].n_distinct) == (4, 0)
    assert prof["dead"].min_value is None and prof["dead"].max_value is None


def test_profile_is_one_pass(spark):
    """The profile must come from ONE aggregation over ONE scan — a
    per-column agg loop is N full scans at 100 TB."""
    plan = profile_table(
        _fixture(spark), ["id", "k", "x"]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1  # single scan of the input


def test_profile_approximate_path(spark):
    prof = {
        r.column: r
        for r in profile_table(
            _fixture(spark), ["id", "k"], approximate=True
        ).collect()
    }
    # HLL is exact at these cardinalities; contract: within the rsd band
    assert abs(prof["id"].n_distinct - 4) <= 1
    assert abs(prof["k"].n_distinct - 2) <= 1
    assert (prof["id"].min_value, prof["id"].max_value) == ("1", "4")


def test_profile_empty_cols_rejected(spark):
    with pytest.raises(ValueError, match="at least one column"):
        profile_table(_fixture(spark), [])


def test_profile_drift_flags(spark):
    prev = profile_table(_fixture(spark), ["id", "k", "x"])
    cur_df = spark.createDataFrame(
        [
            (5, "a", 9.5),
            (6, None, 9.5),
            (7, None, 9.5),
            (8, None, 9.5),
        ],
        "id int, k string, x double",
    )
    cur = profile_table(cur_df, ["id", "k", "x"])
    drift = {r.column: r for r in profile_drift(cur, prev).collect()}
    assert drift["k"].null_rate_increased  # 1/4 -> 3/4
    assert drift["x"].cardinality_collapsed  # 3 distinct -> 1
    assert drift["id"].range_shifted  # 1..4 -> 5..8
    assert not drift["id"].null_rate_increased
    assert not any(r.column_added_or_dropped for r in drift.values())
    # column drop detected via the full-outer join
    cur2 = profile_table(cur_df, ["id", "k"])
    d2 = {r.column: r for r in profile_drift(cur2, prev).collect()}
    assert d2["x"].column_added_or_dropped


def test_profile_drift_typed_ranges(spark):
    """r12 (VERDICT r11 item 5): range comparison is numeric when both
    sides cast — a 9 -> 10 shift is a shift (lexically "9" > "10" and an
    equal value formatted differently is NOT a shift) — and a NULL-only
    column yields real false flags, not NULL."""
    prev = profile_table(
        spark.createDataFrame(
            [(1, 9, None), (2, 3, None)], "id int, v int, dead string"
        )
    )
    cur = profile_table(
        spark.createDataFrame(
            [(1, 10, None), (2, 3, None)], "id int, v int, dead string"
        )
    )
    drift = {r.column: r for r in profile_drift(cur, prev).collect()}
    assert drift["v"].range_shifted  # max 9 -> 10, numeric not lexical
    assert drift["dead"].range_shifted is False  # NULL-only: false, not NULL
    assert drift["dead"].null_rate_increased is False
    assert drift["dead"].cardinality_collapsed is False
    assert drift["id"].range_shifted is False
    # equal numeric values in different representations are NOT a shift:
    # int-profiled 9 vs double-profiled 9.0
    prev_d = profile_table(
        spark.createDataFrame([(9.0,), (3.0,)], "v double")
    )
    cur_i = profile_table(spark.createDataFrame([(9,), (3,)], "v int"))
    d2 = {r.column: r for r in profile_drift(cur_i, prev_d).collect()}
    assert d2["v"].range_shifted is False
    # above 2^53 a double cast collapses adjacent bigints — the DECIMAL
    # comparison must still see the shift (r12 review)
    big_prev = profile_table(
        spark.createDataFrame([(9007199254740992,), (0,)], "v long")
    )
    big_cur = profile_table(
        spark.createDataFrame([(9007199254740993,), (0,)], "v long")
    )
    d3 = {r.column: r for r in profile_drift(big_cur, big_prev).collect()}
    assert d3["v"].range_shifted is True


def test_profile_drift_dtype_gated(spark):
    """ADVICE r12: with include_dtype profiles, the numeric comparison is
    gated on the PROFILED dtype — digit-looking STRING values compare as
    strings ('0123' != '123' IS a shift even though both cast to 123) —
    and an added/dropped column reads range_shifted=false (the signal is
    column_added_or_dropped, not a spurious range flag)."""
    prev = profile_table(
        spark.createDataFrame([("0123",), ("9",)], "v string"),
        include_dtype=True,
    )
    cur = profile_table(
        spark.createDataFrame([("123",), ("9",)], "v string"),
        include_dtype=True,
    )
    d = {r.column: r for r in profile_drift(cur, prev).collect()}
    assert d["v"].range_shifted is True  # string-compared: '0123' != '123'
    # the same values WITHOUT dtype metadata fall back to the try_cast
    # heuristic and read numeric-equal (the documented caveat)
    prev_h = profile_table(spark.createDataFrame([("0123",), ("9",)], "v string"))
    cur_h = profile_table(spark.createDataFrame([("123",), ("9",)], "v string"))
    dh = {r.column: r for r in profile_drift(cur_h, prev_h).collect()}
    assert dh["v"].range_shifted is False
    # typed numeric columns still compare numerically through the gate
    p_i = profile_table(
        spark.createDataFrame([(9,), (3,)], "v int"), include_dtype=True
    )
    c_i = profile_table(
        spark.createDataFrame([(10,), (3,)], "v int"), include_dtype=True
    )
    di = {r.column: r for r in profile_drift(c_i, p_i).collect()}
    assert di["v"].range_shifted is True  # 9 -> 10, not lexical "9" > "10"
    assert di["v"].dtype if hasattr(di["v"], "dtype") else True
    # added/dropped: range_shifted is FALSE, flagged only by added_or_dropped
    wide = profile_table(
        spark.createDataFrame([(1, "a")], "id int, extra string"),
        include_dtype=True,
    )
    narrow = profile_table(
        spark.createDataFrame([(1,)], "id int"), include_dtype=True
    )
    dd = {r.column: r for r in profile_drift(narrow, wide).collect()}
    assert dd["extra"].column_added_or_dropped is True
    assert dd["extra"].range_shifted is False
