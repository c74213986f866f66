"""Small structural transforms (SURVEY.md §2.3 T7, T11, T15, T16, T17)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_it(df: DataFrame, *cols: str) -> DataFrame:
    """Drop metadata-driven omitted columns. Parity: Utility.scala:142-149."""
    present = [c for c in cols if c in df.columns]
    return df.drop(*present) if present else df


def has_column(df: DataFrame, col_name: str) -> bool:
    """Column-existence probe. Parity: Utility.scala:159."""
    return col_name in df.columns


def reorder_columns(df: DataFrame, first: list[str]) -> DataFrame:
    """Put key/flag columns first, keep the rest in original order.

    Parity: BaseProcessor.scala:346-350 (selectExpr(firstOrder ++ rest)).
    """
    rest = [c for c in df.columns if c not in set(first)]
    return df.select(*first, *rest)


def add_flag_columns(
    df: DataFrame,
    row_active: bool = True,
    deleted_flag: bool = False,
    current_flag: bool = True,
    with_timestamps: bool = True,
) -> DataFrame:
    """Attach the SCD bookkeeping columns the processors add.

    Parity: BaseProcessor.scala:41-48,185-191 — row_active / deleted_flag /
    current_flag literals, null-typed expiry, insert_at=current_timestamp().
    """
    df = (
        df.withColumn("row_active", F.lit(row_active))
        .withColumn("deleted_flag", F.lit(deleted_flag))
        .withColumn("current_flag", F.lit(current_flag))
        .withColumn("expiry_at", F.lit(None).cast("timestamp"))
    )
    if with_timestamps:
        df = df.withColumn("insert_at", F.current_timestamp())
    return df


def serialize_rows(df: DataFrame, sep: str = "|") -> DataFrame:
    """Serialize every row to one delimited string column ``row_data``.

    Parity: Task.scala:93-95 (concat_ws('|', cols) for error logs).
    """
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    return df.select(F.concat_ws(sep, *cols).alias("row_data"))
