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


def read_orc(
    spark: SparkSession, path: str, row_cap: int | None = None, columns: list[str] | None = None
) -> DataFrame:
    """Batch ORC scan — same declarative shape as :func:`read_parquet`
    (columnar, predicate-pushdown-capable; Spark's native ORC source). No
    reference analogue (its sources are Delta/parquet/CSV/JDBC/Kafka);
    format-breadth extension so a reference user with ORC landing zones
    can switch without a conversion step."""
    df = spark.read.orc(path)
    if columns:
        df = df.select(*columns)
    return df.limit(row_cap) if row_cap else df


def read_json(
    spark: SparkSession,
    path: str,
    ddl_schema: str | StructType | None = None,
    multiline: bool = False,
    row_cap: int | None = None,
    **extra: str,
) -> DataFrame:
    """Batch JSON-lines scan with an EXPLICIT schema (never inferSchema in
    prod — schema inference is a full extra pass over 100 TB and admits
    drift). ``multiline=True`` for whole-file JSON documents. No reference
    analogue; format-breadth extension."""
    reader = spark.read
    if ddl_schema is not None:
        reader = reader.schema(ddl_schema)
    df = reader.options(multiLine=str(multiline).lower(), **extra).json(path)
    return df.limit(row_cap) if row_cap else df


def read_text(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    row_cap: int | None = None,
) -> DataFrame:
    """Raw text scan: one row per line (``value string``), or one row per
    FILE with ``wholetext`` — the raw-corpus entry point for the text
    pipeline (documents often land as flat .txt before any schema
    exists). No reference analogue; format-breadth extension."""
    # NB: must be the text() kwarg — a DataFrameReader .option() is reset
    # by pyspark's text() wrapper (probed: option path splits lines anyway)
    df = spark.read.text(path, wholetext=whole_file)
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


# Per-table history-stream throttle map (parity:
# OrchestrationConstant.scala:76 HISTORYLOADMAXFILEMAP = Map("flexifields"->2)).
# Tables with very large files get a lower files-per-trigger cap; everything
# else uses DEFAULT_HISTORY_MAX_FILES (Readers.scala:189 getOrElse(...,20)).
HISTORY_LOAD_MAX_FILE_MAP: dict[str, int] = {"flexifields": 2}
DEFAULT_HISTORY_MAX_FILES = 20


def history_max_files_for(
    table: str, throttle_map: dict[str, int] | None = None, default: int | None = None
) -> int:
    """Resolve the per-table maxFilesPerTrigger cap (Readers.scala:189)."""
    m = HISTORY_LOAD_MAX_FILE_MAP if throttle_map is None else throttle_map
    return m.get(table, default if default is not None else DEFAULT_HISTORY_MAX_FILES)


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int | None = None,
    table_name: str | None = None,
    throttle_map: dict[str, int] | None = None,
) -> DataFrame:
    """File-based streaming scan (our Delta-stream stand-in for this env).

    Parity: Readers.scala:179-211 (`DeltaStreamReader`) — a throttled
    streaming table scan for history backfill; ``maxFilesPerTrigger`` is the
    backpressure knob. When ``table_name`` is given the cap resolves through
    the per-table throttle map (HISTORYLOADMAXFILEMAP, Const:76), matching
    the reference's ``getOrElse(tableName, 20)``.
    """
    if max_files_per_trigger is None and table_name is not None:
        max_files_per_trigger = history_max_files_for(table_name, throttle_map)
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def read_delta_stream(
    spark: SparkSession,
    table: str,
    max_files_per_trigger: int | None = None,
    throttle_map: dict[str, int] | None = None,
) -> DataFrame:
    """Streaming Delta table scan — import-gated (no delta-spark here).

    Parity: Readers.scala:186-190 (including the per-table throttle map).
    """
    if max_files_per_trigger is None:
        max_files_per_trigger = history_max_files_for(table, throttle_map)
    reader = spark.readStream.format("delta")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.table(table)


def fetch_registry_schema(
    registry_url: str,
    subject: str,
    http_get=None,
) -> str:
    """Fetch the latest Avro schema for ``subject`` from a Confluent-style
    schema registry: GET {url}/subjects/{subject}/versions/latest.

    Parity: Readers.scala:130-133 resolves ``topic-key`` / ``topic-value``
    subjects against AVRO_SCHEMA_REG_URL (OrchestrationConstant.scala:6).
    ``http_get`` is injectable for tests/custom transports.
    """
    import json as _json
    import urllib.request

    url = f"{registry_url.rstrip('/')}/subjects/{subject}/versions/latest"
    if http_get is None:
        def http_get(u: str) -> bytes:
            with urllib.request.urlopen(u, timeout=10) as resp:  # noqa: S310
                return resp.read()

    doc = _json.loads(http_get(url))
    schema = doc.get("schema")
    if not schema:
        raise ValueError(f"registry response for {subject} has no 'schema' field")
    return schema


def avro_decode_cdc(
    df: DataFrame,
    value_schema: str,
    key_schema: str | None = None,
    confluent_wire_format: bool = True,
) -> DataFrame:
    """Decode Kafka key/value binary columns with ``from_avro``.

    Confluent producers prepend a 5-byte header (magic 0x00 + 4-byte schema
    id) that plain ``from_avro`` does not strip — the reference's Databricks
    ``from_avro(col, subject, registryUrl)`` overload handles it internally;
    here we strip it explicitly. Requires the spark-avro jar (import-gated
    in this container).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.avro.functions import from_avro

    def body(col_name: str):
        if confluent_wire_format:
            return F.expr(f"substring({col_name}, 6, 2147483647)")
        return F.col(col_name)

    cols = [
        from_avro(body("value"), value_schema).alias("value"),
        "topic", "partition", "offset", "timestamp",
    ]
    if key_schema is not None:
        cols.insert(0, from_avro(body("key"), key_schema).alias("key"))
    return df.select(*cols)


def json_decode_cdc(
    df: DataFrame,
    value_schema_ddl: str,
    confluent_wire_format: bool = True,
) -> DataFrame:
    """``avro_decode_cdc``'s JSON twin: strip the Confluent wire header and
    parse the envelope with ``from_json`` into the same ``value`` struct
    shape the Avro path produces.

    Exists for two reasons: (1) Debezium is commonly deployed with the JSON
    converter, where the reference's pipeline shape (decode -> envelope
    split -> SCD merge, Readers.scala:108-152 / BaseProcessor.scala:28-115)
    is identical but the deserializer differs; (2) the spark-avro connector
    is an optional package, so this path keeps the full streaming lifecycle
    EXECUTABLE (tests/test_e2e_rate_cdc_stream.py drives it live) in
    environments without it. Wire-header stripping is byte-identical to the
    Avro path (same substring expression).
    """
    from pyspark.sql import functions as F

    if confluent_wire_format:
        body = F.expr("substring(value, 6, 2147483647)")
    else:
        body = F.col("value")
    return df.select(
        F.from_json(F.decode(body, "UTF-8"), value_schema_ddl).alias("value"),
        "topic", "partition", "offset", "timestamp",
    )


def read_kafka_cdc_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = 100_000,
    avro_value_schema: str | None = None,
    schema_registry_url: str | None = None,
    decode_key: bool = False,
    http_get=None,
) -> DataFrame:
    """Streaming Kafka scan of a Debezium CDC topic.

    Parity: Readers.scala:108-152 (`KafkaReader`): maxOffsetsPerTrigger cap,
    failOnDataLoss=false, startingOffsets recovered from the status table
    (see streaming/offsets.py). Value decoding, in precedence order:

    1. ``schema_registry_url`` — fetch the ``{topic}-value`` (and, with
       ``decode_key``, ``{topic}-key``) subject from a Confluent-style
       registry and ``from_avro`` both, mirroring Readers.scala:130-133.
    2. ``avro_value_schema`` — a literal Avro schema string.
    3. neither — raw key/value pass through for ``from_json`` downstream.

    Needs the kafka + avro connector jars on the cluster classpath;
    import-gated in this container.
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
    key_schema = None
    if schema_registry_url is not None:
        avro_value_schema = fetch_registry_schema(
            schema_registry_url, f"{topic}-value", http_get=http_get
        )
        if decode_key:
            key_schema = fetch_registry_schema(
                schema_registry_url, f"{topic}-key", http_get=http_get
            )
    if avro_value_schema is not None:
        df = avro_decode_cdc(df, avro_value_schema, key_schema)
    return df
