"""Join-condition builders (reference parity: Utility.scala:258-348).

The reference builds SQL-string conditions; we build ``Column`` expressions
so Catalyst sees a structured predicate (enables pushdown / DPP) and no
string-injection surgery is needed (SURVEY.md §7.4 records the reference's
`.replaceAll("and","")` bug — building Columns avoids that class of bug).
"""

from __future__ import annotations

import operator as _op
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Theta operators the reference recognizes (Utility.scala:264-276).
# Order matters: match '<=' before '<'.
_THETA_OPS = [
    ("<=", _op.le),
    (">=", _op.ge),
    ("!=", _op.ne),
    ("<", _op.lt),
    (">", _op.gt),
    ("=", _op.eq),
]


def _parse_key(key: str) -> tuple[str, str, str]:
    """'a < b' -> (a, '<', b); bare 'id' -> (id, '=', id)."""
    key = key.strip()
    for sym, _ in _THETA_OPS:
        if sym in key:
            left, right = key.split(sym, 1)
            return left.strip(), sym, right.strip()
    return key, "=", key


def build_inner_join_condition(
    join_keys: Iterable[str],
    update_alias: str = "updates",
    target_alias: str = "target",
    extra_join_condition: str | None = None,
) -> Column:
    """AND-fold theta-join keys into one Column predicate.

    Keys are either bare column names (equi) or ``"a <op> b"`` with
    op in {< <= = >= > !=}; an optional free-form SQL fragment is AND-ed on.
    Parity: Utility.scala:258-281 (`buildInnerJoinCondition`).
    """
    conds: list[Column] = []
    for key in join_keys:
        left, sym, right = _parse_key(key)
        fn = dict(_THETA_OPS)[sym]
        conds.append(fn(F.col(f"{update_alias}.{left}"), F.col(f"{target_alias}.{right}")))
    if extra_join_condition:
        conds.append(F.expr(extra_join_condition))
    if not conds:
        raise ValueError("at least one join key required")
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def build_partition_pruning_filter(
    updates: DataFrame, partition_col: str, target_alias: str = "target", max_values: int = 10000
) -> Column | None:
    """Manual dynamic partition pruning for MERGE (Utility.scala:339-348).

    Collect the distinct partition values present in the update batch and
    return ``target.<col> IN (...)`` so the merge only touches affected
    target partitions. This is the reference's flagship optimization: merge
    conditions without partition literals scan the whole target otherwise.

    Scale posture: the collect is bounded — it is a distinct over the
    *partition* column of the (already deduped) update micro-batch, i.e. at
    most a few thousand values; ``max_values`` guards against a mis-declared
    partition column exploding the IN-list (returns None -> no pruning,
    correct but unpruned, rather than an OOM driver).
    """
    if partition_col not in updates.columns:
        return None
    vals = [
        r[0]
        for r in updates.select(partition_col).distinct().limit(max_values + 1).collect()
    ]
    if not vals or len(vals) > max_values:
        return None
    has_null = any(v is None for v in vals)
    non_null = [v for v in vals if v is not None]
    col = F.col(f"{target_alias}.{partition_col}")
    cond = col.isin(non_null) if non_null else F.lit(False)
    if has_null:
        # NULL-partition updates can only match NULL-partition target rows:
        # isin() never matches NULL, so without this the NULL slice would be
        # wrongly routed to 'untouched' while its update re-inserts — a
        # silent duplicate-key corruption.
        cond = cond | col.isNull()
    return cond


def build_merge_key_projections(
    join_keys: Iterable[str], all_columns: list[str]
) -> tuple[list[str], list[str]]:
    """The SCD2 staged-merge select-lists (Utility.scala:283-323).

    Returns (null_keyed, real_keyed) select-expression lists: rows projected
    with ``NULL as mergekey_i`` deliberately fail the merge match so they are
    inserted as fresh current versions — the classic Delta SCD2 recipe.
    """
    keys = [_parse_key(k)[0] for k in join_keys]
    null_keyed = [f"CAST(NULL AS STRING) AS mergekey_{i}" for i in range(len(keys))]
    real_keyed = [f"CAST({k} AS STRING) AS mergekey_{i}" for i, k in enumerate(keys)]
    rest = [c for c in all_columns]
    return null_keyed + rest, real_keyed + rest


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_sec: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: every left row picks the most recent right row
    with ``right_ts <= left_ts`` within the same ``on`` key (pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics, left-outer: unmatched
    rows keep NULL right fields). Spark has no native as-of join; the
    naive formulation is an inequality join Catalyst can only execute as a
    per-key cartesian. This is the scalable union+window formulation
    instead (the standard distributed as-of trick, e.g. Flint): tag both
    sides, union, ONE window over the key ordered by (ts, side) with a
    running ``last(right_payload, ignorenulls=True)``, keep left rows.
    One shuffle on the key, linear state, no pair explosion.

    At equal timestamps the right row is visible to the left row
    (inclusive). Duplicate right rows per (key, ts) are resolved by
    ``tiebreak`` (largest wins) — pass a unique column to make results
    engine-deterministic. ``tolerance_sec`` voids matches older than the
    given horizon (the window still carries them; a codegen'd conditional
    nulls them out — no second pass).

    No reference analogue (the reference's join surface is equi/theta
    string conditions, Utility.scala:258-348); north-star extension for
    event-stream feature attachment.
    """
    rp_cols = right_cols or [c for c in right.columns if c not in on]
    rp_struct = F.struct(*[F.col(c) for c in rp_cols])
    rp_type = right.select(rp_struct.alias("__rp")).schema[0].dataType
    lp_struct = F.struct(*[F.col(c) for c in left.columns])
    lp_type = left.select(lp_struct.alias("__lp")).schema[0].dataType
    # order by the tiebreak's NATIVE type: a double cast would silently
    # null out string/complex tiebreaks and surrender determinism
    tb_type = (
        dict(zip(right.schema.fieldNames(), [f.dataType for f in right.schema]))[
            tiebreak
        ]
        if tiebreak
        else None
    )
    tb = F.col(tiebreak) if tiebreak else F.lit(None).cast("int")
    tb_null = F.lit(None).cast(tb_type) if tb_type is not None else F.lit(None).cast("int")

    l2 = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_r"),
        tb_null.alias("__tb"),
        F.lit(None).cast(rp_type).alias("__rp"),
        lp_struct.alias("__lp"),
    )
    # SQL ASOF equality-join semantics: a NULL join key never matches.
    # Window.partitionBy groups NULLs together, so without this filter a
    # null-key left row would match a null-key right row (engine skew vs
    # the DuckDB ASOF oracle). Null-key LEFT rows stay and come out
    # unmatched, as a left-outer ASOF requires.
    right_keyed = right.filter(F.col(right_ts).isNotNull())
    for k in on:
        right_keyed = right_keyed.filter(F.col(k).isNotNull())
    r2 = right_keyed.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_r"),
        tb.alias("__tb"),
        rp_struct.alias("__rp"),
        F.lit(None).cast(lp_type).alias("__lp"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__t").asc_nulls_first(),
            F.col("__is_r").desc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2)
    m = F.last("__rp", ignorenulls=True).over(w)
    matched = u.withColumn("__m", m).filter(F.col("__is_r") == 0)
    if tolerance_sec is not None:
        if right_ts not in rp_cols:
            raise ValueError(
                "tolerance_sec needs the matched row's timestamp: include "
                f"{right_ts!r} in right_cols"
            )
        in_horizon = (
            F.col("__t").cast("double") - F.col(f"__m.{right_ts}").cast("double")
        ) <= float(tolerance_sec)
        matched = matched.withColumn("__m", F.when(in_horizon, F.col("__m")))
    out_cols = [F.col(f"__lp.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in rp_cols]
    return matched.select(*out_cols)


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    keys: list[str] | None = None,
) -> DataFrame:
    """Interval-overlap join: (left_id, right_id, overlap) for every pair
    of intervals with ``l_start <= r_end AND r_start <= l_end``
    (inclusive), optionally also matching on equality ``keys``. Spark
    plans a raw inequality join as a (per-key) nested-loop cartesian;
    this is the bucketed formulation instead: each interval explodes to
    the fixed-width buckets it touches, candidates meet in a bucket
    equi-join, and each true pair is emitted from exactly ONE bucket —
    the canonical bucket ``max(floor(l_start/w), floor(r_start/w))``,
    the first bucket both intervals occupy — so no dropDuplicates
    shuffle is needed at all (the dedup-free emission trick from the
    interval-join literature). Candidate rows are SKINNY (id + 2
    endpoints); callers re-attach payloads by id (CLAUDE.md
    candidate-join rule).

    ``bucket_width`` trades explode factor against candidate precision:
    ~ the median interval length is the classic choice. Endpoints may be
    any numeric or timestamp type (cast to double internally; overlap is
    ``least(ends) - greatest(starts)`` in those units).

    No reference analogue (north-star extension; the reference's join
    surface is equi/theta conditions, Utility.scala:258-348).
    """
    keys = keys or []
    w = float(bucket_width)

    def prep(df, idc, s, e, side):
        sd = F.col(s).cast("double")
        ed = F.col(e).cast("double")
        # inverted/null intervals are dropped, not joined: F.sequence
        # DESCENDS for start > end and would emit phantom buckets
        df = df.filter(sd <= ed)
        return df.select(
            *keys,
            F.col(idc),
            sd.alias(f"__{side}s"),
            ed.alias(f"__{side}e"),
            F.floor(sd / w).alias("__bs"),
            F.explode(
                F.sequence(F.floor(sd / w), F.floor(ed / w))
            ).alias("__bucket"),
        ).withColumnRenamed("__bs", f"__{side}bs")

    l2 = prep(left, left_id, left_start, left_end, "l")
    r2 = prep(right, right_id, right_start, right_end, "r")
    joined = l2.join(r2, [*keys, "__bucket"])
    return (
        joined.filter(
            (F.col("__ls") <= F.col("__re"))
            & (F.col("__rs") <= F.col("__le"))
            & (F.col("__bucket") == F.greatest("__lbs", "__rbs"))
        )
        .select(
            *keys,
            left_id,
            right_id,
            (F.least("__le", "__re") - F.greatest("__ls", "__rs")).alias(
                "overlap"
            ),
        )
    )
