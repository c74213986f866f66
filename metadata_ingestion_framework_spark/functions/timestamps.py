"""Timestamp conversions (reference parity: Utility.scala:350-359, HttpReader.scala:39-47)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def epoch_millis_to_timestamp(df: DataFrame, col_name: str) -> DataFrame:
    """Cast an epoch-milliseconds column to timestamp, if it exists.

    Parity: Utility.scala:350-359 (`castEphocToTimestamp`). The reference's
    SimpleDateFormat pattern is buggy ("...SSS+SSSS"); the intended semantics
    are epoch-millis -> timestamp, which is exactly `timestamp_millis`
    (documented divergence, SURVEY.md §7.3c).
    """
    if col_name not in df.columns:
        return df
    return df.withColumn(col_name, F.timestamp_millis(F.col(col_name).cast("long")))


def clean_iso_timestamp(df: DataFrame, col_name: str, new_name: str | None = None) -> DataFrame:
    """Normalize ISO-8601 strings: 'T' -> space, drop 'Z', optional rename.

    Parity: HttpReader.scala:39-47 (translate 'T'->' ', 'Z'->'').
    """
    cleaned = F.translate(F.translate(F.col(col_name), "T", " "), "Z", "")
    df = df.withColumn(col_name, cleaned)
    if new_name:
        df = df.withColumnRenamed(col_name, new_name)
    return df
