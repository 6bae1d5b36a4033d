"""State bound of the TTL'd streaming dedup (queries/streaming2.py).

The scale claim under test: ``dropDuplicatesWithinWatermark`` state is
O(keys in the last TTL window), not O(all keys ever). Proof protocol — a
two-wave disjoint-key replay across two checkpointed availableNow runs:

  wave 1: keys 0..N1-1 at t≈1000s       → state holds N1 keys
  wave 2: keys 10000..10000+N2-1 at t≈1000s + TTL + slack
          → at that batch's end the watermark passes every wave-1 key's
            expiry (t1 + TTL), so wave-1 state is evicted and
            numRowsTotal lands at N2 — NOT N1+N2.

The exact form (plain dropDuplicates) run on the same replay holds N1+N2
keys forever — asserted too, so the test pins the *difference*, not just
one number that could drift with Spark internals.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

TTL_S = 3600  # mirrors queries/streaming2.DEDUP_TTL ("1 hour")


def _write_wave(path: str, key_start: int, n_keys: int, t0_s: int) -> None:
    # two rows per key (a duplicate each) so dedup actually has work to do
    keys = [key_start + i for i in range(n_keys) for _ in (0, 1)]
    times = [t0_s + (i % 7) for i in range(len(keys))]
    tbl = pa.table(
        {
            "user_id": pa.array(keys, pa.int64()),
            "event_type": pa.array(["click"] * len(keys), pa.string()),
            "ts": pa.array([t * 1_000_000_000 for t in times], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def _run(spark, src, out, ck, ttl: bool):
    stream = (
        spark.readStream.schema("user_id long, event_type string, ts long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("ev_time", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ev_time", f"{TTL_S} seconds")
    )
    dedup = (
        stream.dropDuplicatesWithinWatermark(["user_id", "event_type"])
        if ttl
        else stream.dropDuplicates(["user_id", "event_type"])
    )
    q = (
        dedup.select("user_id", "event_type")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _final_state_rows(q) -> int:
    rows = [
        (p.get("stateOperators") or [{}])[0].get("numRowsTotal")
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    assert rows, "expected stateOperators progress"
    return rows[-1]


def _two_wave(spark, tmp_path, ttl: bool):
    from flink_notebooks_spark.session import tune

    tune(spark)
    sub = tmp_path / ("ttl" if ttl else "exact")
    src, out, ck = sub / "src", sub / "out", sub / "ck"
    src.mkdir(parents=True)
    n1, n2 = 40, 25
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        _write_wave(str(src / "a_wave1.parquet"), 0, n1, 1000)
        _run(spark, src, out, ck, ttl)
        # wave-2 event times sit past every wave-1 expiry (t1 + TTL) with a
        # 60s margin: wave-1's max expiry is 1006 + TTL, and wave-2's
        # end-of-batch watermark is (1000 + 2*TTL + 60 + 6) - TTL, so the
        # watermark STRICTLY exceeds every expiry — the assert doesn't hinge
        # on whether Spark treats expiry == watermark as evictable
        _write_wave(str(src / "b_wave2.parquet"), 10_000, n2, 1000 + 2 * TTL_S + 60)
        q2 = _run(spark, src, out, ck, ttl)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    emitted = spark.read.parquet(str(out))
    assert emitted.count() == n1 + n2  # disjoint keys → every key emitted once
    return _final_state_rows(q2), n1, n2


def test_ttl_dedup_state_stays_flat(spark, tmp_path):
    state, n1, n2 = _two_wave(spark, tmp_path, ttl=True)
    assert state == n2  # wave-1 keys evicted — state tracks the live window


def test_exact_dedup_state_accumulates(spark, tmp_path):
    state, n1, n2 = _two_wave(spark, tmp_path, ttl=False)
    assert state == n1 + n2  # the documented leak the TTL form exists to fix


def test_ttl_and_exact_forms_agree_on_bounded_replay(spark, sf_dir):
    from flink_notebooks_spark.queries import QUERIES

    a = QUERIES["streaming_dedup_keys"](spark, sf_dir)
    b = QUERIES["streaming_dedup_keys_ttl"](spark, sf_dir)
    assert a.schema == b.schema
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
