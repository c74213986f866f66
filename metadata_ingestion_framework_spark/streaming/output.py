"""Stream output runners (reference parity: ProcessOutputStream.scala:17-76)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from metadata_ingestion_framework_spark.streaming.write_config import WriteStreamConfig


def process_output_stream(
    df: DataFrame,
    config: WriteStreamConfig,
    path: str | None = None,
    table: str | None = None,
    test_mode: bool = False,
) -> StreamingQuery:
    """Start a direct stream append to a path or table.

    Parity: ProcessOutputStream.scala:17-39. ``test_mode`` runs
    ``processAllAvailable()`` (synchronous drain, the reference's test
    switch at :32-35) instead of leaving the query running.
    """
    writer = config.apply(df.writeStream)
    q = writer.toTable(table) if table else writer.start(path)
    if test_mode:
        q.processAllAvailable()
    return q


def process_output_stream_batch(
    df: DataFrame,
    config: WriteStreamConfig,
    batch_fn: Callable[[DataFrame, int], None],
    test_mode: bool = False,
) -> StreamingQuery:
    """Wrap a batch function into ``foreachBatch`` and start the query.

    Parity: ProcessOutputStream.scala:50-76 — this is how every SCD merge
    runs in streaming mode: the batch function calls scd{1,2,4}_merge on each
    micro-batch (DeltaWritter.scala:42-56).
    """
    writer = config.apply(df.writeStream).foreachBatch(batch_fn)
    q = writer.start()
    if test_mode:
        q.processAllAvailable()
    return q
