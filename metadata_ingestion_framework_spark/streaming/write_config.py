"""Declarative stream-writer config (reference parity: WriteStreamConfig.scala:18-64)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import DataStreamWriter


@dataclass
class WriteStreamConfig:
    """Mirrors the reference's JSON ``op_config`` (Start.scala:139).

    trigger: ``{"processingTime": "2 minutes"}`` | ``{"once": True}`` |
    ``{"availableNow": True}`` | ``{"continuous": "1 second"}``.
    ``txn_version``/``txn_app_id`` are the idempotent-write options
    (WriteStreamConfig.scala:39-47) — Delta-only; passed through when set.
    """

    checkpoint_location: str | None = None
    output_mode: str = "append"
    partition_by: list[str] = field(default_factory=list)
    fmt: str = "parquet"
    query_name: str | None = None
    trigger: dict | None = None
    txn_version: str | None = None
    txn_app_id: str | None = None
    extra_options: dict[str, str] = field(default_factory=dict)

    def apply(self, writer: DataStreamWriter) -> DataStreamWriter:
        """Chain every configured option onto a ``writeStream`` builder."""
        writer = writer.outputMode(self.output_mode).format(self.fmt)
        if self.query_name:
            writer = writer.queryName(self.query_name)
        if self.checkpoint_location:
            writer = writer.option("checkpointLocation", self.checkpoint_location)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        if self.txn_version is not None:
            writer = writer.option("txnVersion", self.txn_version)
        if self.txn_app_id is not None:
            writer = writer.option("txnAppId", self.txn_app_id)
        for k, v in self.extra_options.items():
            writer = writer.option(k, v)
        if self.trigger:
            writer = writer.trigger(**self.trigger)
        return writer
