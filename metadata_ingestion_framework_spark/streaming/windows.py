"""Event-time windowed aggregation with watermarks (north-star extension).

The reference has NO late-data handling (SURVEY.md §2.10 — dedup is
per-micro-batch only); at 100 TB of events you need bounded state, which is
exactly what ``withWatermark`` buys: state for windows older than the
watermark is dropped, and late rows beyond it are discarded instead of
growing state forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def watermarked_window_agg(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    watermark_delay: str,
    group_cols: list[str],
    aggs: list[Column],
    slide_duration: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation with a watermark.

    Append-mode-compatible: a window only emits once the watermark passes its
    end, and events later than ``watermark_delay`` are dropped — bounded
    state on an unbounded stream.
    """
    w = (
        F.window(ts_col, window_duration, slide_duration)
        if slide_duration
        else F.window(ts_col, window_duration)
    )
    out = (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
    )
    rest = [c for c in out.columns if c != "w"]
    return out.select(F.col("w.start").alias("window_start"), *rest)


def session_window_agg(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark_delay: str | None = None,
) -> DataFrame:
    """Session windows (gap-based) — state closes ``gap`` after the last
    event, bounded by the watermark in streaming mode."""
    s = stream.withWatermark(ts_col, watermark_delay) if watermark_delay else stream
    out = s.groupBy(F.session_window(ts_col, gap).alias("w"), *group_cols).agg(*aggs)
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *rest,
    )
