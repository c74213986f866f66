"""Compound operators (SURVEY.md §2.4-2.7 + training-data extensions)."""

from metadata_ingestion_framework_spark.operators.cdc import (
    enrich_with_shard,
    split_cdc_envelope,
)
from metadata_ingestion_framework_spark.operators.dedup import (
    dedup_exact,
    dedup_window,
)
from metadata_ingestion_framework_spark.operators.joins import (
    build_inner_join_condition,
    build_partition_pruning_filter,
)
from metadata_ingestion_framework_spark.operators.merge import (
    MergeClause,
    scd1_merge,
    scd2_merge,
    scd4_merge,
)

__all__ = [
    "build_inner_join_condition",
    "build_partition_pruning_filter",
    "split_cdc_envelope",
    "enrich_with_shard",
    "dedup_window",
    "dedup_exact",
    "MergeClause",
    "scd1_merge",
    "scd2_merge",
    "scd4_merge",
]
