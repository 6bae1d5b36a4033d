"""Source/sink registry (SURVEY.md §2.1).

Connector name → (batch builder, stream builder). Kafka/JDBC/Iceberg are
declared thin adapters over Spark's own connectors; they require external
services/packages not present in the test container, so they are
import-guarded and covered by plan-construction only (SURVEY.md S4/S5/S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import datagen, filesystem


def _kafka_batch(spark: SparkSession, table) -> DataFrame:
    from . import kafka

    return kafka.build_batch(spark, table)


def _kafka_stream(spark: SparkSession, table) -> DataFrame:
    from . import kafka

    return kafka.build_stream(spark, table)


def _jdbc_batch(spark: SparkSession, table) -> DataFrame:
    from . import jdbc

    return jdbc.build_batch(spark, table)


def _iceberg_batch(spark: SparkSession, table) -> DataFrame:
    from . import iceberg

    return iceberg.build_batch(spark, table)


def _iceberg_stream(spark: SparkSession, table) -> DataFrame:
    from . import iceberg

    return iceberg.build_stream(spark, table)


def _cdc_batch(spark: SparkSession, table) -> DataFrame:
    from . import cdc

    return cdc.build_batch(spark, table)


_REGISTRY = {
    "datagen": (datagen.build_batch, datagen.build_stream),
    "filesystem": (filesystem.build_batch, filesystem.build_stream),
    "kafka": (_kafka_batch, _kafka_stream),
    "upsert-kafka": (_kafka_batch, _kafka_stream),
    "jdbc": (_jdbc_batch, None),
    "postgres-cdc": (_cdc_batch, None),
    "mysql-cdc": (_cdc_batch, None),
    "iceberg": (_iceberg_batch, _iceberg_stream),
}


def connectors() -> list[str]:
    return sorted(_REGISTRY)


def build_source(spark: SparkSession, table, streaming: bool) -> DataFrame:
    conn = table.connector
    if conn not in _REGISTRY:
        raise ValueError(
            f"unknown connector {conn!r} for table {table.name} "
            f"(available: {', '.join(connectors())})"
        )
    batch_fn, stream_fn = _REGISTRY[conn]
    if streaming:
        if stream_fn is None:
            raise ValueError(f"connector {conn!r} does not support streaming reads")
        return stream_fn(spark, table)
    return batch_fn(spark, table)
