"""Structured-Streaming correctness queries.

The reference's streaming surface is Flink SQL run in streaming runtime mode
(reference: examples/01-datagen-streaming.flinknb:12,47 — watermarked source,
tumbling-window agg; SURVEY.md §2.8). Here the same semantics run as real
Structured Streaming jobs: ``readStream`` over the events parquet, watermark,
event-time window aggregation / streaming dedup, memory sink (the notebook
result-delivery analog, SURVEY.md T4), ``Trigger.AvailableNow`` so the run is
bounded and deterministic — which also makes the result oracle-checkable
against plain batch SQL.

At production scale the memory sink is only ever the notebook *display* path
(capped rows, like the reference's 10k-row client cap); pipelines write to
files/Kafka via ``writeStream`` with checkpointing (see streaming/runner.py).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import EVENTS_RAW_SCHEMA
from ..session import tune
from ._registry import query, sql_dsum


def _read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a bounded stream with an event-time column.

    ``ts`` arrives as raw nanos (nanosAsLong); we convert to TimestampType
    (µs truncation via integer division — matches the batch/oracle readers).
    maxFilesPerTrigger=1 keeps micro-batches deterministic.
    """
    tune(spark)
    # the file stream source wants a directory; glob-filter to the events file
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ev_time", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(df: DataFrame, mode: str) -> DataFrame:
    """Run a bounded streaming query into a memory sink; return the table.

    Stateful streaming instantiates one state store per shuffle partition;
    for these bounded single-file replays 64 stores are pure overhead, so the
    partition count is scoped down around query start (the conf is captured
    at start, so restoring it immediately after is safe). On a real cluster
    size this to the executor count via spark.sql.shuffle.partitions.
    """
    spark = df.sparkSession
    name = "strm_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    return spark.table(name)


@query(
    "streaming_tumble_window",
    oracle=f"""
    SELECT CAST(FLOOR(EXTRACT(EPOCH FROM ts) / 10) AS BIGINT) * 10 AS w,
           event_type, COUNT(*) AS c, {sql_dsum("value", "sv")}
    FROM events GROUP BY 1, 2 ORDER BY w, event_type
    """,
)
def streaming_tumble_window(spark, sf_dir):
    """10s tumbling event-time window with a 5s watermark — the reference's
    flagship streaming query (examples/01-datagen-streaming.flinknb:47,
    watermark declared at :12) — executed as a real streaming job and
    verified against the batch oracle (same bucketing as q13).

    Complete output mode: every window is emitted at the end of the bounded
    run, so the result equals the batch aggregation.
    """
    stream = _read_events_stream(spark, sf_dir).withWatermark("ev_time", "5 seconds")
    agg = (
        stream.groupBy(F.window("ev_time", "10 seconds").alias("win"), "event_type")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv_dec"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        # window.start is TimestampType (UTC instant) → epoch seconds
        F.unix_timestamp("win.start").alias("w"),
        "event_type",
        "c",
        F.col("sv_dec").cast("double").alias("sv"),
    ).orderBy("w", "event_type")


@query(
    "streaming_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
)
def streaming_dedup_keys(spark, sf_dir):
    """Streaming deduplication (SURVEY.md W8 — Flink's ROW_NUMBER()=1 dedup
    idiom) via ``dropDuplicates`` on a streaming DataFrame. Emits the first
    row per key; projecting the key columns makes the result deterministic
    (= DISTINCT) regardless of arrival order.
    """
    stream = _read_events_stream(spark, sf_dir)
    dedup = stream.dropDuplicates(["user_id", "event_type"]).select("user_id", "event_type")
    out = _run_to_memory(dedup, "append")
    return out.orderBy("user_id", "event_type")


@query(
    "streaming_topn",
    oracle=f"""
    SELECT user_id, {sql_dsum("value", "total")}, COUNT(*) AS n
    FROM events GROUP BY user_id ORDER BY total DESC, user_id LIMIT 10
    """,
)
def streaming_topn(spark, sf_dir):
    """Streaming Top-N (SURVEY.md W7): continuous per-user aggregation with
    the top-10 recomputed per micro-batch — Flink's update-stream Top-N
    rewritten as aggregation + complete-mode sort-limit.
    """
    stream = _read_events_stream(spark, sf_dir)
    agg = stream.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_dec"),
        F.count("*").alias("n"),
    )
    out = _run_to_memory(agg, "complete")
    return (
        out.select(
            "user_id", F.col("total_dec").cast("double").alias("total"), "n"
        )
        .orderBy(F.desc("total"), "user_id")
        .limit(10)
    )
