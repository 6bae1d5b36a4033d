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


def canal_schema(row_type: T.StructType) -> T.StructType:
    """Canal envelope: batched row images in ``data`` (also for DELETE),
    ``type`` INSERT/UPDATE/DELETE (DDL events carry no data), ``ts`` ms."""
    return T.StructType(
        [
            T.StructField("data", T.ArrayType(row_type)),
            T.StructField("old", T.ArrayType(row_type)),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
        ]
    )


def parse_canal(raw: DataFrame, value_col: str, row_type: T.StructType) -> DataFrame:
    """canal-json → the same (op, ts_ms, row.*) change-row shape as
    ``parse_debezium``: one output row per ``data`` element (a Canal message
    batches rows), DML types mapped onto Debezium ops, DDL events (null
    ``data``) dropped. Map-only — explode + projections, no shuffle."""
    env = raw.withColumn(
        "_env", F.from_json(F.col(value_col).cast("string"), canal_schema(row_type))
    )
    op = (
        F.when(F.col("_env.type") == "INSERT", F.lit("c"))
        .when(F.col("_env.type") == "UPDATE", F.lit("u"))
        .when(F.col("_env.type") == "DELETE", F.lit("d"))
    )
    return (
        env.filter(F.col("_env.data").isNotNull() & op.isNotNull())
        .select(
            op.alias("op"),
            F.col("_env.ts").alias("ts_ms"),
            F.explode(F.col("_env.data")).alias("row"),
        )
        .select("op", "ts_ms", "row.*")
    )


def maxwell_schema(row_type: T.StructType) -> T.StructType:
    """Maxwell envelope: single row image in ``data`` (also for DELETE),
    ``type`` insert/update/delete/bootstrap-insert, ``ts`` SECONDS."""
    return T.StructType(
        [
            T.StructField("data", row_type),
            T.StructField("old", row_type),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
        ]
    )


def parse_maxwell(raw: DataFrame, value_col: str, row_type: T.StructType) -> DataFrame:
    """maxwell-json → (op, ts_ms, row.*); ``bootstrap-insert`` maps to the
    snapshot-read op 'r', seconds scale to ms. Map-only."""
    env = raw.withColumn(
        "_env", F.from_json(F.col(value_col).cast("string"), maxwell_schema(row_type))
    )
    op = (
        F.when(F.col("_env.type") == "insert", F.lit("c"))
        .when(F.col("_env.type") == "update", F.lit("u"))
        .when(F.col("_env.type") == "delete", F.lit("d"))
        .when(F.col("_env.type") == "bootstrap-insert", F.lit("r"))
    )
    return (
        env.filter(F.col("_env.data").isNotNull() & op.isNotNull())
        .select(
            op.alias("op"),
            (F.col("_env.ts") * F.lit(1000)).alias("ts_ms"),
            F.col("_env.data").alias("row"),
        )
        .select("op", "ts_ms", "row.*")
    )


# ---- CDC *connector* tables (postgres-cdc / mysql-cdc DDL shape) ----------
# Flink's CDC connectors (reference CONNECTORS.md:124-140) tail the database
# WAL via Debezium. Spark has no WAL tailer; the Spark-native mapping is:
#   * batch read  = the CURRENT SNAPSHOT over JDBC — semantically what
#     querying a Flink CDC table yields at any instant;
#   * continuous  = route the change stream through a topic with
#     'format'='debezium-json' (kafka.py), which this repo runs end-to-end.
# The connector accepts Flink's hostname/port/database-name/schema-name/
# table-name options; 'url'/'driver' overrides allow any JDBC database
# (integration tests use Spark's embedded Derby).

_CDC_URL = {
    "postgres-cdc": "jdbc:postgresql://{host}:{port}/{db}",
    "mysql-cdc": "jdbc:mysql://{host}:{port}/{db}",
}
_CDC_PORT = {"postgres-cdc": "5432", "mysql-cdc": "3306"}
_CDC_DRIVER = {"postgres-cdc": "org.postgresql.Driver", "mysql-cdc": "com.mysql.cj.jdbc.Driver"}


def build_batch(spark, table) -> DataFrame:
    """Snapshot read of a CDC-declared table (PRIMARY KEY required, matching
    Flink's CDC table factories). At scale the snapshot parallelizes with
    scan.partition.* exactly like the jdbc connector (same reader)."""
    if not table.primary_key:
        raise ValueError(f"{table.connector} requires a PRIMARY KEY ... NOT ENFORCED")
    o = table.options
    url = o.get("url") or _CDC_URL[table.connector].format(
        host=o.get("hostname", "localhost"),
        port=o.get("port", _CDC_PORT[table.connector]),
        db=o.get("database-name", ""),
    )
    name = o.get("table-name", table.name)
    if table.connector == "postgres-cdc":
        name = f"{o.get('schema-name', 'public')}.{name}"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", name)
        .option("driver", o.get("driver", _CDC_DRIVER[table.connector]))
    )
    for src, dst in (("username", "user"), ("password", "password")):
        if src in o:
            reader = reader.option(dst, o[src])
    if "scan.partition.column" in o:
        reader = (
            reader.option("partitionColumn", o["scan.partition.column"])
            .option("numPartitions", o.get("scan.partition.num", "4"))
            .option("lowerBound", o.get("scan.partition.lower-bound", "0"))
            .option("upperBound", o.get("scan.partition.upper-bound", "1000000"))
        )
    return reader.load()


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


def apply_changelog_stream(
    changes: DataFrame,
    keys: list[str],
    state_path: str,
    checkpoint_path: str,
    n_buckets: int = 64,
    processing_time: str | None = None,
):
    """CONTINUOUS changelog apply (reference CONNECTORS.md:124-140): a
    streaming DataFrame of change rows (op, ts_ms, payload — the
    parse_debezium/canal/maxwell shape) keyed-upserted per micro-batch into
    a materialized state table on disk. Returns the started StreamingQuery.

    Spark-first design for scale — per trigger:

    1. the batch's rows hash into ``pmod(xxhash64(keys), n_buckets)``
       buckets (the state table's partition column);
    2. ONLY the touched bucket partitions are read back (partition
       pruning on ``_bucket``), unioned with the batch, reduced to
       latest-change-per-key (ts_ms, then arrival batch id, then op as a
       deterministic in-transaction tiebreak — the same order as the batch
       ``apply_changelog``);
    3. the merged buckets rewrite via DYNAMIC partition overwrite — a
       distributed write of exactly the touched buckets; untouched state
       never moves, and nothing is collected to the driver.

    Deletes persist as TOMBSTONE rows (op='d' with the delete's ts_ms), so
    a late-arriving older image of the key cannot resurrect it — read the
    live snapshot with ``changelog_state_snapshot``. The per-trigger merge
    is IDEMPOTENT under foreachBatch's retry contract: re-running a batch
    (same batch_id after a pre-commit failure) merges rows the state
    already contains and the latest-per-key window resolves to the same
    rows, so the deterministic dynamic overwrite rewrites the same bucket
    contents — recovery from the checkpoint is exactly-once in effect. State size is
    O(distinct keys + tombstones) on disk across executors; this is the
    compacted-changelog layout (what upsert-kafka stores in the broker,
    kept in a table instead). Sizing: at 100 TB raise n_buckets so a
    bucket ≈ one healthy parquet partition; per-trigger cost is then
    |touched buckets| · bucket size, independent of total key cardinality.
    """
    payload = [c for c in changes.columns if c not in ("op", "ts_ms")]

    def upsert(batch_df, batch_id):
        spark = batch_df.sparkSession
        b = batch_df.withColumn("_b", F.lit(batch_id)).withColumn(
            "_bucket", F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")
        )
        touched = [r["_bucket"] for r in b.select("_bucket").distinct().collect()]
        if not touched:
            return
        from .filesystem import _exists

        if _exists(spark, state_path):
            # state exists: a read failure here is a REAL error (corrupt /
            # half-written state) and must propagate — silently treating it
            # as empty would let the dynamic overwrite discard prior rows
            state = spark.read.parquet(state_path).filter(
                F.col("_bucket").isin(touched)
            )
            merged = state.unionByName(b)
        else:  # first trigger: no state yet
            merged = b
        w = Window.partitionBy(*keys).orderBy(
            F.desc("ts_ms"), F.desc("_b"), F.desc("op")
        )
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .select("op", "ts_ms", "_b", *payload, "_bucket")
        )
        (
            latest.write.partitionBy("_bucket")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(state_path)
        )

    writer = (
        changes.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    # processing_time (e.g. "0 seconds") runs the query CONTINUOUSLY —
    # the long-lived deployment mode; foreachBatch triggers never overlap
    # (Structured Streaming serializes micro-batches per query), so the
    # read-merge-overwrite cycle stays race-free. Default stays the
    # bounded availableNow replay used by the oracle queries.
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def changelog_state_snapshot(spark, state_path: str) -> DataFrame:
    """The LIVE rows of a state table maintained by apply_changelog_stream:
    tombstones dropped, bookkeeping columns removed."""
    return (
        spark.read.parquet(state_path)
        .filter(F.col("op") != "d")
        .drop("op", "ts_ms", "_b", "_bucket")
    )
