"""Kafka connector adapter (SURVEY.md S4; reference CONNECTORS.md:98-109).

Maps the Flink Kafka table options onto Spark's Kafka source with JSON
payload decoding (`from_json` against the declared schema). Requires the
``spark-sql-kafka`` package and a reachable broker — neither exists in the
test container, so this module is exercised only for plan construction with
a mocked format in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _common(table) -> dict[str, str]:
    opts = {
        "subscribe": table.options.get("topic", table.name),
        "kafka.bootstrap.servers": table.options.get(
            "properties.bootstrap.servers", "localhost:9092"
        ),
    }
    mode = table.options.get("scan.startup.mode", "group-offsets")
    if mode == "earliest-offset":
        opts["startingOffsets"] = "earliest"
    elif mode == "latest-offset":
        opts["startingOffsets"] = "latest"
    return opts


def _decode(df: DataFrame, table) -> DataFrame:
    fmt = table.options.get("format", table.options.get("value.format", "json"))
    schema = table.spark_schema()
    if fmt != "json":
        raise ValueError(f"kafka: unsupported format {fmt!r} (json only)")
    return df.select(
        F.from_json(F.col("value").cast("string"), schema).alias("v")
    ).select("v.*")


def build_batch(spark: SparkSession, table) -> DataFrame:
    reader = spark.read.format("kafka")
    for k, v in _common(table).items():
        reader = reader.option(k, v)
    return _decode(reader.load(), table)


def build_stream(spark: SparkSession, table) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for k, v in _common(table).items():
        reader = reader.option(k, v)
    return _decode(reader.load(), table)


def write_batch(df: DataFrame, table, overwrite: bool) -> None:
    """Batch INSERT INTO a Kafka topic (overwrite is meaningless for a log
    sink and ignored, matching Flink's append-only Kafka sink)."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    (
        payload.write.format("kafka")
        .option(
            "kafka.bootstrap.servers",
            table.options.get("properties.bootstrap.servers", "localhost:9092"),
        )
        .option("topic", table.options.get("topic", table.name))
        .save()
    )


def write_stream(df: DataFrame, table, checkpoint: str):
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option(
            "kafka.bootstrap.servers",
            table.options.get("properties.bootstrap.servers", "localhost:9092"),
        )
        .option("topic", table.options.get("topic", table.name))
        .option("checkpointLocation", checkpoint)
        .start()
    )
