"""CDC: Debezium-envelope decode + changelog materialization (SURVEY.md S6).

The reference declares Postgres/MySQL CDC connectors (reference
flink-runtime/CONNECTORS.md:124-140, build.gradle:64) whose tables carry a
primary key and replay a change stream. Spark has no native CDC source; the
equivalent pipeline consumes the Debezium JSON envelope (typically from
Kafka) and materializes the latest state per key:

    raw value bytes → from_json(envelope schema) → latest-per-key window →
    drop deletes → current snapshot

Both stages are plain DataFrame ops, so they run identically on a batch
backfill or a streaming topic (foreachBatch / update-mode dedup). The
latest-per-key step is ONE shuffle on the primary key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def envelope_schema(row_type: T.StructType) -> T.StructType:
    """Debezium envelope for a row payload: before/after images, op
    (c=create, u=update, d=delete, r=snapshot read), source timestamp."""
    return T.StructType(
        [
            T.StructField("before", row_type),
            T.StructField("after", row_type),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )


def parse_debezium(raw: DataFrame, value_col: str, row_type: T.StructType) -> DataFrame:
    """(… value_col: string/binary JSON …) → flattened change rows:
    op, ts_ms, plus the row image (after for c/u/r, before for d — the key
    must be recoverable from deletes)."""
    env = raw.withColumn(
        "_env", F.from_json(F.col(value_col).cast("string"), envelope_schema(row_type))
    )
    img = F.when(F.col("_env.op") == "d", F.col("_env.before")).otherwise(F.col("_env.after"))
    return env.select(
        F.col("_env.op").alias("op"),
        F.col("_env.ts_ms").alias("ts_ms"),
        img.alias("row"),
    ).select("op", "ts_ms", "row.*")


def apply_changelog(changes: DataFrame, keys: list[str]) -> DataFrame:
    """Materialize the current snapshot: keep each key's latest change
    (by ts_ms; op as a deterministic tiebreak within a transaction batch),
    then drop keys whose latest op is a delete. One shuffle on the key."""
    w = Window.partitionBy(*keys).orderBy(F.desc("ts_ms"), F.desc("op"))
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.filter(F.col("op") != "d").drop("op", "ts_ms")
