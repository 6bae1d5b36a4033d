"""Kafka connector adapter (SURVEY.md S4; reference CONNECTORS.md:98-109).

Maps the Flink Kafka table options onto Spark's Kafka source with payload
formats ``json``, ``csv``, ``raw`` (single-column verbatim bytes), and the
three changelog envelopes the reference's CDC pipelines publish through
Kafka (CONNECTORS.md:124-140): ``debezium-json``, ``canal-json``,
``maxwell-json`` — all decoded map-only against the declared schema.

Transports:

- **real broker** — ``properties.bootstrap.servers = host:port`` uses
  Spark's ``kafka`` format (requires the spark-sql-kafka package and a
  reachable broker; neither exists in the test container).
- **file-backed emulation** — ``properties.bootstrap.servers =
  file:///path`` stores each topic as a directory of parquet files in the
  Kafka *record* shape (key/value bytes, topic, partition, offset,
  timestamp). Everything above the transport — option mapping, JSON
  encode/decode, the Debezium envelope path, batch + streaming reads,
  INSERT INTO writes — is the same code, so integration tests exercise the
  full adapter without a broker. The emulated log is append-only and
  offset-ordered per partition, like the real thing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the wire record shape Spark's kafka source produces (value-relevant subset)
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def _topic(table) -> str:
    return table.options.get("topic", table.name)


def _servers(table) -> str:
    return table.options.get("properties.bootstrap.servers", "localhost:9092")


def _emulation_dir(table) -> str | None:
    """file:///path bootstrap servers → the topic's directory, else None."""
    srv = _servers(table)
    if srv.startswith("file://"):
        return os.path.join(srv[len("file://") :], _topic(table))
    return None


def _common(table) -> dict[str, str]:
    opts = {
        "subscribe": _topic(table),
        "kafka.bootstrap.servers": _servers(table),
    }
    mode = table.options.get("scan.startup.mode", "group-offsets")
    if mode == "earliest-offset":
        opts["startingOffsets"] = "earliest"
    elif mode == "latest-offset":
        opts["startingOffsets"] = "latest"
    return opts


# changelog envelope formats → (op, ts_ms, row.*) parser (cdc.py). All three
# decode map-only; batch reads then materialize the latest-per-key snapshot.
CDC_FORMATS = ("debezium-json", "canal-json", "maxwell-json")
_FORMATS = ("json", "csv", "raw") + CDC_FORMATS


def _fmt(table) -> str:
    return table.options.get("format", table.options.get("value.format", "json"))


def _raw_column(table):
    """Flink's ``raw`` format carries ONE physical column as the record
    value verbatim; only string/binary payloads are byte-exact mappings."""
    schema = table.spark_schema()
    if len(schema.fields) != 1:
        raise ValueError("kafka raw format requires exactly one physical column")
    f = schema.fields[0]
    if not isinstance(f.dataType, (T.StringType, T.BinaryType)):
        raise ValueError("kafka raw format supports STRING or BYTES columns")
    return f


# Flink kafka METADATA keys → columns of the Kafka record (real source and
# the file-backed emulation share the record shape). Read-only.
_META_SOURCES = {
    "timestamp": "timestamp",
    "timestamp-type": "timestampType",
    "topic": "topic",
    "partition": "partition",
    "offset": "offset",
    "key": "key",
}


def _meta_cols(table) -> list:
    """Declared METADATA columns as record-field selections, cast to the
    declared types (e.g. event_time TIMESTAMP(3) METADATA FROM 'timestamp')."""
    out = []
    for c in getattr(table, "columns", []):
        mk = getattr(c, "metadata_key", None)
        if mk is None:
            continue
        src_col = _META_SOURCES.get(mk)
        if src_col is None:
            raise ValueError(
                f"kafka: unsupported metadata key {mk!r} "
                f"(one of {', '.join(sorted(_META_SOURCES))})"
            )
        src = F.col(src_col)
        if mk == "timestamp-type":
            # Spark surfaces the record's timestampType as an int (0/1/2);
            # Flink's metadata value is the enum NAME — translate before the
            # declared-type cast so STRING columns read 'CreateTime', not '1'
            src = (
                F.when(src == 0, F.lit("NoTimestampType"))
                .when(src == 1, F.lit("CreateTime"))
                .when(src == 2, F.lit("LogAppendTime"))
                .otherwise(src.cast("string"))
            )
        out.append(src.cast(c.data_type).alias(c.name))
    return out


def _with_meta(decoded_struct: DataFrame, table) -> DataFrame:
    """Final projection in DECLARED column order: payload fields from the
    decoded struct `v`, metadata columns from the record."""
    cols = []
    for c in table.columns:
        if getattr(c, "computed_expr", None) is not None:
            continue  # computed columns attach in the engine layer
        if getattr(c, "metadata_key", None) is not None:
            cols.append(F.col(c.name))
        else:
            cols.append(F.col(f"v.{c.name}"))
    return decoded_struct.select(*cols)


def _decode(df: DataFrame, table) -> DataFrame:
    fmt = _fmt(table)
    schema = table.spark_schema()
    meta = _meta_cols(table)
    if fmt == "json":
        dec = df.select(
            F.from_json(F.col("value").cast("string"), schema).alias("v"), *meta
        )
        return _with_meta(dec, table)
    if fmt == "csv":
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
        dec = df.select(
            F.from_csv(F.col("value").cast("string"), ddl).alias("v"), *meta
        )
        return _with_meta(dec, table)
    if fmt == "raw":
        f = _raw_column(table)
        return df.select(F.col("value").cast(f.dataType).alias(f.name), *meta)
    if fmt in CDC_FORMATS:
        if meta:
            raise NotImplementedError(
                "kafka: METADATA columns on changelog formats are not "
                "supported (the change envelope, not the record, carries "
                "the row)"
            )
        # changelog rows: op (c/u/d/r), ts_ms, flattened row image. Batch
        # reads materialize the snapshot in build_batch; streaming reads
        # surface the change rows (apply cdc.apply_changelog per micro-batch
        # downstream — Spark append streams cannot retract).
        from . import cdc

        parse = {
            "debezium-json": cdc.parse_debezium,
            "canal-json": cdc.parse_canal,
            "maxwell-json": cdc.parse_maxwell,
        }[fmt]
        return parse(df, "value", schema)
    raise ValueError(f"kafka: unsupported format {fmt!r} (one of {', '.join(_FORMATS)})")


def _materialize_cdc(decoded: DataFrame, table) -> DataFrame:
    """Changelog-format batch read → latest-per-key snapshot (Flink's CDC
    table semantics: querying the table sees the current state)."""
    fmt = _fmt(table)
    if fmt in CDC_FORMATS and not decoded.isStreaming:
        if not table.primary_key:
            raise ValueError(f"kafka {fmt} table requires a PRIMARY KEY")
        from .cdc import apply_changelog

        return apply_changelog(decoded, table.primary_key)
    return decoded


def _is_upsert(table) -> bool:
    return table.connector == "upsert-kafka"


def _upsert_snapshot(raw: DataFrame, table) -> DataFrame:
    """upsert-kafka batch read: the topic is a keyed changelog — materialize
    the latest record per key (by record time, offset tiebreak) and drop
    tombstones (null value = DELETE), exactly Flink's upsert-kafka table
    semantics. One shuffle on the message key; at scale this is the
    standard compacted-topic snapshot plan."""
    from pyspark.sql import Window

    if _meta_cols(table):
        raise NotImplementedError(
            "upsert-kafka: METADATA columns are not supported (the keyed "
            "snapshot materializes latest payloads, not records)"
        )
    if not table.primary_key:
        raise ValueError("upsert-kafka requires a PRIMARY KEY")
    schema = table.spark_schema()
    w = Window.partitionBy("k").orderBy(
        F.desc("timestamp"), F.desc("offset")
    )
    return (
        raw.select(
            F.col("key").cast("string").alias("k"),
            F.col("value"),
            "timestamp",
            "offset",
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & F.col("value").isNotNull())
        .select(F.from_json(F.col("value").cast("string"), schema).alias("v"))
        .select("v.*")
    )


def build_batch(spark: SparkSession, table) -> DataFrame:
    emu = _emulation_dir(table)
    if _is_upsert(table):
        if emu is None:
            reader = spark.read.format("kafka")
            for k, v in _common(table).items():
                reader = reader.option(k, v)
            return _upsert_snapshot(reader.load(), table)
        os.makedirs(emu, exist_ok=True)
        return _upsert_snapshot(
            spark.read.schema(KAFKA_RECORD_SCHEMA).parquet(emu), table
        )
    if emu is not None:
        # create the topic eagerly so the (lazy) scan plan stays valid for a
        # topic that is declared first and produced to later — each query
        # re-lists the directory, like a consumer polling the log
        os.makedirs(emu, exist_ok=True)
        raw = spark.read.schema(KAFKA_RECORD_SCHEMA).parquet(emu)
        return _materialize_cdc(_decode(raw, table), table)
    reader = spark.read.format("kafka")
    for k, v in _common(table).items():
        reader = reader.option(k, v)
    return _materialize_cdc(_decode(reader.load(), table), table)


def build_stream(spark: SparkSession, table) -> DataFrame:
    if _is_upsert(table):
        # Flink's upsert-kafka source is an UPDATING table (retractions per
        # key); Spark append streams cannot retract, so the streaming read
        # is honestly refused — batch reads give the keyed snapshot, and
        # per-micro-batch snapshots are available via foreachBatch.
        raise ValueError(
            "upsert-kafka: streaming reads need changelog semantics Spark "
            "append streams cannot express; use a batch read (latest-per-key "
            "snapshot) or consume the raw topic with connector=kafka"
        )
    emu = _emulation_dir(table)
    if emu is not None:
        os.makedirs(emu, exist_ok=True)
        raw = spark.readStream.schema(KAFKA_RECORD_SCHEMA).parquet(emu)
        return _decode(raw, table)
    reader = spark.readStream.format("kafka")
    for k, v in _common(table).items():
        reader = reader.option(k, v)
    return _decode(reader.load(), table)


def _encode_value(df: DataFrame, table):
    """rows → the record's value bytes per the table's format. INSERT into a
    changelog-format topic encodes each row as an insert-only envelope
    (Flink's sink behavior for append inputs). All encodings are map-only
    JVM expressions."""
    fmt = _fmt(table)
    row = F.struct(*df.columns)
    if fmt == "json":
        enc = F.to_json(row)
    elif fmt == "csv":
        enc = F.to_csv(row)
    elif fmt == "raw":
        f = _raw_column(table)
        if f.name not in df.columns:
            raise ValueError(f"kafka raw write needs column {f.name!r}")
        return F.col(f.name).cast("binary").alias("value")
    elif fmt == "debezium-json":
        enc = F.to_json(
            F.struct(
                F.lit(None).cast(table.spark_schema()).alias("before"),
                row.alias("after"),
                F.lit("c").alias("op"),
                (F.unix_timestamp(F.current_timestamp()) * 1000).alias("ts_ms"),
            )
        )
    elif fmt == "canal-json":
        enc = F.to_json(
            F.struct(
                F.array(row).alias("data"),
                F.lit(None).cast(T.ArrayType(table.spark_schema())).alias("old"),
                F.lit("INSERT").alias("type"),
                (F.unix_timestamp(F.current_timestamp()) * 1000).alias("ts"),
            )
        )
    elif fmt == "maxwell-json":
        enc = F.to_json(
            F.struct(
                row.alias("data"),
                F.lit("insert").alias("type"),
                F.unix_timestamp(F.current_timestamp()).alias("ts"),
            )
        )
    else:
        raise ValueError(f"kafka: unsupported format {fmt!r} (one of {', '.join(_FORMATS)})")
    return enc.cast("binary").alias("value")


def _to_records(df: DataFrame, table) -> DataFrame:
    """rows → Kafka record shape with a format-encoded value payload (same
    encoding for both transports). Keyed tables put the JSON-encoded primary
    key in ``key``, like Flink's upsert-kafka."""
    payload = _encode_value(df, table)
    key = (
        F.to_json(F.struct(*table.primary_key)).cast("binary")
        if getattr(table, "primary_key", None)
        else F.lit(None).cast("binary")
    ).alias("key")
    offset = (
        # not evaluable on streaming plans; the emulated log then orders by
        # file arrival + row order, which is what the JSON/CDC paths use
        F.lit(-1).cast("long")
        if df.isStreaming
        else F.monotonically_increasing_id()
    )
    return df.select(
        key,
        payload,
        F.lit(_topic(table)).alias("topic"),
        F.lit(0).cast("int").alias("partition"),
        offset.alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )


def write_batch(df: DataFrame, table, overwrite: bool) -> None:
    """Batch INSERT INTO a Kafka topic (overwrite is meaningless for a log
    sink and ignored, matching Flink's append-only Kafka sink). upsert-kafka
    writes are keyed upserts: the PRIMARY KEY becomes the message key, so a
    later record for the same key supersedes earlier ones on read."""
    if _is_upsert(table) and not table.primary_key:
        raise ValueError("upsert-kafka requires a PRIMARY KEY")
    emu = _emulation_dir(table)
    if emu is not None:
        _to_records(df, table).write.mode("append").parquet(emu)
        return
    payload = df.select(_encode_value(df, table))
    (
        payload.write.format("kafka")
        .option("kafka.bootstrap.servers", _servers(table))
        .option("topic", _topic(table))
        .save()
    )


def write_stream(df: DataFrame, table, checkpoint: str):
    if _is_upsert(table) and not table.primary_key:
        raise ValueError("upsert-kafka requires a PRIMARY KEY")
    emu = _emulation_dir(table)
    if emu is not None:
        return (
            _to_records(df, table)
            .writeStream.format("parquet")
            .option("path", emu)
            .option("checkpointLocation", checkpoint)
            .start()
        )
    payload = df.select(_encode_value(df, table))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", _servers(table))
        .option("topic", _topic(table))
        .option("checkpointLocation", checkpoint)
        .start()
    )
