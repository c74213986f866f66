"""Skew mitigation: salted joins and two-stage aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these operators are the explicit, plan-time tools for the cases AQE
can't fix:

- a skewed join where the build side is too big to broadcast but small
  enough to replicate ``salt``-fold (``salted_join``);
- a skewed aggregation whose aggregate is NOT partial-aggregatable
  (``collect_list``/``collect_set`` — map-side combine can't shrink them),
  where one hot key funnels into one reducer (``two_stage_agg``).

Both are deterministic (salt = hash of the row's own key material, never
rand()) so retries/speculative tasks produce identical results.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _row_salt(df: DataFrame, n: int) -> Column:
    """Deterministic per-row salt in [0, n): hash of ALL columns.

    Using the full row (not rand()) keeps retried tasks identical; hot-key
    rows spread because their non-key columns differ.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n)).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``salt`` buckets.

    ``skewed`` rows get a deterministic salt; ``other`` is replicated
    salt-fold (explode over 0..salt-1) so every (key, salt) pair finds its
    match. Result set is identical to the plain join; the shuffle key
    becomes (keys..., salt) — a hot key's rows now land on ``salt``
    reducers instead of one. Replication multiplies the other side's
    shuffle volume by ``salt``: use only when it's far smaller than the
    skewed side (but too big / too dynamic to broadcast).

    Only skewed-side-preserving join types are valid: right/full outer
    would emit each unmatched ``other`` replica (up to ``salt`` null-padded
    copies) — rejected explicitly.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports skewed-side-preserving joins only {sorted(allowed)}; "
            f"got {how!r} — replication of the other side breaks right/full outer"
        )
    s = skewed.withColumn(SALT_COL, _row_salt(skewed, salt))
    o = other.withColumn(SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))) \
             .withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    return s.join(o, [*keys, SALT_COL], how).drop(SALT_COL)


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    agg_col: str,
    salt: int = 32,
    collect: str = "collect_list",
    finisher: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Skew-safe collect_list/collect_set: salt -> partial collect -> merge.

    Stage 1 groups by (keys, salt) so a hot key's values spread over
    ``salt`` reducers; stage 2 merges the per-salt arrays with flatten
    (+ array_distinct for set semantics). ``finisher`` post-processes the
    merged array (e.g. F.sort_array for a deterministic result).
    """
    fn = getattr(F, collect)
    partial = (
        df.withColumn(SALT_COL, _row_salt(df, salt))
        .groupBy(*keys, SALT_COL)
        .agg(fn(agg_col).alias("__part"))
    )
    merged = F.flatten(F.collect_list("__part"))
    if collect == "collect_set":
        merged = F.array_distinct(merged)
    if finisher is not None:
        merged = finisher(merged)
    return partial.groupBy(*keys).agg(merged.alias(f"{agg_col}s"))
