"""Late-data semantics (SURVEY.md T2): rows older than the watermark are
dropped from append-mode window aggregations.

Spark nuance vs Flink (pinned here, documented in NOTES.md): the late-record
filter uses the watermark as of query START (loaded from the checkpoint);
batches within one run advance the watermark for window EVICTION/emission
but not for input filtering. So the deterministic way to observe the drop is
two checkpointed runs:

  run 1: events at t≈1000s  → checkpointed watermark ≈ 997s
  run 2: a late file (t=100s, below the restored watermark → DROPPED) and a
         flush file (t=2000s) that closes the [1000,1010) window

The sink must contain [1000,1010)=3 only: no late window, and the flush
window stays open (append emits a window exactly once, on close).
"""

from __future__ import annotations

import pytest

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write(path: str, times_s: list[int]) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(times_s)), pa.int64()),
            "ts": pa.array([t * 1_000_000_000 for t in times_s], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.slow
def test_late_rows_dropped_after_restart(spark, tmp_path):
    from flink_notebooks_spark.session import tune

    tune(spark)
    src, ck, out = tmp_path / "src", tmp_path / "ck", tmp_path / "out"
    src.mkdir()

    def run():
        agg = (
            spark.readStream.schema("event_id long, ts long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .withColumn("ev_time", F.timestamp_micros(F.expr("ts div 1000")))
            .withWatermark("ev_time", "5 seconds")
            .groupBy(F.window("ev_time", "10 seconds").alias("win"))
            .agg(F.count("*").alias("c"))
            .select(F.unix_timestamp("win.start").alias("w"), "c")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    _write(str(src / "a_recent.parquet"), [1000, 1001, 1002])
    run()

    _write(str(src / "b_late.parquet"), [100, 101])
    _write(str(src / "c_flush.parquet"), [2000])
    now = time.time()
    os.utime(src / "b_late.parquet", (now - 120,) * 2)
    os.utime(src / "c_flush.parquet", (now - 60,) * 2)
    q2 = run()

    rows = {r["w"]: r["c"] for r in spark.read.parquet(str(out)).collect()}
    assert rows == {1000: 3}  # late window suppressed; flush window still open
    dropped = sum(
        (p.get("stateOperators") or [{}])[0].get("numRowsDroppedByWatermark", 0) or 0
        for p in q2.recentProgress
    )
    assert dropped >= 1  # the drop is observable in the metrics, not inferred
