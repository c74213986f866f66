"""Structured Streaming surface (SURVEY.md §2.10)."""

from metadata_ingestion_framework_spark.streaming.write_config import WriteStreamConfig
from metadata_ingestion_framework_spark.streaming.output import (
    process_output_stream,
    process_output_stream_batch,
)
from metadata_ingestion_framework_spark.streaming.offsets import (
    offset_ranges_for_batch,
    recover_starting_offsets,
)

__all__ = [
    "WriteStreamConfig",
    "process_output_stream",
    "process_output_stream_batch",
    "offset_ranges_for_batch",
    "recover_starting_offsets",
]
