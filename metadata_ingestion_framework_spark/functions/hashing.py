"""Hash-based key builders (reference parity: Utility.scala:42-64).

All JVM-side (`F.sha2`, `F.hash`) — no Python in the hot path, so these
stay inside whole-stage codegen and scale linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "n/a"  # nullable keys coalesce to this (Utility.scala:43)


def _string_key(cols: list[str | Column]) -> Column:
    """Concat columns with null -> 'n/a', each cast to string."""
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(NULL_SENTINEL))
        for c in cols
    ]
    return F.concat(*parts)


def hash_it(df: DataFrame, alias: str, num_bits: int, *cols: str | Column) -> DataFrame:
    """Whole-row hash join key: sha2(concat(coalesce(cols)), num_bits).

    Parity: Utility.scala:42-45 (`hashIt`) — builds the ``hashed_jk`` column
    used as a synthetic merge key.
    """
    return df.withColumn(alias, F.sha2(_string_key(list(cols)), num_bits))


def hash_it_complete(df: DataFrame, num_bits: int, *cols: str) -> DataFrame:
    """Per-column SHA-2 into ``{col}_hash`` (full anonymization).

    Parity: Utility.scala:47-52 (`hashItComplete`).
    """
    for c in cols:
        df = df.withColumn(
            f"{c}_hash",
            F.sha2(F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL)), num_bits),
        )
    return df


def hash_numerical_it(
    df: DataFrame, alias: str, *cols: str | Column, buckets: int = 500
) -> DataFrame:
    """Bucketed grouping key: abs(hash(concat(cols))) % buckets.

    Parity: Utility.scala:61-64 (`hashNumericalIt`, fixed 500 buckets) —
    a synthetic grouping/join key that bounds fan-out. At 100 TB this is
    also a skew-control device: a hot natural key spreads over `buckets`
    partitions when the grouping key is included in the shuffle key.
    """
    # cast to long BEFORE abs: abs(Integer.MIN_VALUE) overflows int under
    # ANSI mode (~2^-32 per row — near-certain at 100 TB row counts)
    return df.withColumn(
        alias,
        F.pmod(F.abs(F.hash(_string_key(list(cols))).cast("long")), F.lit(buckets)),
    )
