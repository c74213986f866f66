"""Batch + streaming readers (reference parity: Readers.scala:15-211).

Each reader is a thin declarative wrapper over ``spark.read`` /
``spark.readStream`` — Catalyst owns pushdown/pruning; we own only the
option plumbing the reference's metadata tables drive.

The reference caps JDBC/parquet reads at ``limit(1000)`` (Readers.scala:26,53)
— a demo-scale safety cap that would be wrong at 100 TB; we expose it as an
optional ``row_cap`` instead of hard-coding it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jdbc(
    spark: SparkSession,
    options: dict[str, str],
    dbtable: str,
    row_cap: int | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Batch JDBC scan of one (sharded) table.

    Parity: Readers.scala:15-41 (`SqlJdbcReader`) — options carry
    driver/url/user/password resolved per shard (PipelineBuilder.scala:107-129).
    Scale addition: predicate-partitioned reads (partitionColumn/bounds) so a
    big table scans in parallel instead of one connection.
    """
    reader = spark.read.format("jdbc").options(**options).option("dbtable", dbtable)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions or 8))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1_000_000))
        )
    df = reader.load()
    return df.limit(row_cap) if row_cap else df


def read_parquet(
    spark: SparkSession, path: str, row_cap: int | None = None, columns: list[str] | None = None
) -> DataFrame:
    """Batch parquet scan. Parity: Readers.scala:43-68 (`ParquetReader`).

    ``columns`` narrows the projection at the source so the scan's ReadSchema
    only carries what downstream needs.
    """
    df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)
    return df.limit(row_cap) if row_cap else df


def read_csv(
    spark: SparkSession,
    path: str,
    ddl_schema: str | StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = "\\",
    multiline: bool = False,
    **extra: str,
) -> DataFrame:
    """CSV scan with an explicit DDL schema (never inferSchema in prod).

    Parity: OrchestrationLocalCreateTable.scala:111-134 + UtilityTest.scala:39-43.
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("quote", quote)
        .option("escape", escape)
        .option("multiLine", str(multiline).lower())
    )
    for k, v in extra.items():
        reader = reader.option(k, v)
    if ddl_schema is not None:
        reader = reader.schema(ddl_schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming scan (our Delta-stream stand-in for this env).

    Parity: Readers.scala:179-211 (`DeltaStreamReader`) — a throttled
    streaming table scan for history backfill; ``maxFilesPerTrigger`` is the
    backpressure knob (Const:76 caps it per table).
    """
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def read_delta_stream(
    spark: SparkSession, table: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming Delta table scan — import-gated (no delta-spark here).

    Parity: Readers.scala:186-190.
    """
    reader = spark.readStream.format("delta")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.table(table)


def read_kafka_cdc_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = 100_000,
    avro_value_schema: str | None = None,
) -> DataFrame:
    """Streaming Kafka scan of a Debezium CDC topic.

    Parity: Readers.scala:108-152 (`KafkaReader`): maxOffsetsPerTrigger cap,
    failOnDataLoss=false, startingOffsets recovered from the status table
    (see streaming/offsets.py). Value decoding: ``from_avro`` when a schema
    is supplied (the reference resolves it from a schema registry per topic,
    Readers.scala:130-133), else the raw key/value pass through for
    ``from_json`` downstream. Needs the kafka + avro connector jars on the
    cluster classpath; import-gated in this container.
    """
    df = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .option("failOnDataLoss", "false")
        .load()
    )
    if avro_value_schema is not None:
        from pyspark.sql.avro.functions import from_avro

        df = df.select(from_avro(df["value"], avro_value_schema).alias("value"),
                       "topic", "partition", "offset", "timestamp")
    return df
