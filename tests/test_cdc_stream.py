"""Continuous CDC apply: keyed-upsert state table semantics
(sources/cdc.py apply_changelog_stream; reference CONNECTORS.md:124-140)."""

from __future__ import annotations

import pytest

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_notebooks_spark.sources import cdc

ROW = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def _envelope(before, after, op, ts):
    import json

    return json.dumps({"before": before, "after": after, "op": op, "ts_ms": ts})


def _write_batch(dirpath, name, envs, mtime):
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, name)
    pq.write_table(pa.table({"value": pa.array(envs, pa.string())}), p)
    os.utime(p, (mtime, mtime))


def _run(spark, tmp_path, batches, n_buckets=4):
    src = str(tmp_path / "changes")
    for i, envs in enumerate(batches):
        _write_batch(src, f"b{i}.parquet", envs, 1_600_000_000 + i)
    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    changes = cdc.parse_debezium(raw, "value", ROW)
    q = cdc.apply_changelog_stream(
        changes,
        keys=["id"],
        state_path=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"),
        n_buckets=n_buckets,
    )
    q.awaitTermination()
    snap = cdc.changelog_state_snapshot(spark, str(tmp_path / "state"))
    return {r["id"]: r["v"] for r in snap.collect()}


@pytest.mark.slow
def test_stream_apply_upsert_and_delete(spark, tmp_path):
    """Multi-trigger create → update → delete reaches the same state as the
    batch apply_changelog over the full change set."""
    got = _run(
        spark,
        tmp_path,
        [
            [
                _envelope(None, {"id": 1, "v": "a"}, "c", 1),
                _envelope(None, {"id": 2, "v": "b"}, "c", 1),
                _envelope(None, {"id": 3, "v": "c"}, "c", 1),
            ],
            [_envelope(None, {"id": 1, "v": "a2"}, "u", 2)],
            [_envelope({"id": 2, "v": "b"}, None, "d", 3)],
        ],
    )
    assert got == {1: "a2", 3: "c"}


@pytest.mark.slow
def test_stream_apply_tombstone_blocks_resurrection(spark, tmp_path):
    """A late-arriving OLDER image (smaller ts_ms in a later batch) must not
    resurrect a deleted key — the tombstone persists in state and wins on
    ts_ms. This is why deletes are stored, not just dropped."""
    got = _run(
        spark,
        tmp_path,
        [
            [_envelope(None, {"id": 7, "v": "x"}, "c", 10)],
            [_envelope({"id": 7, "v": "x"}, None, "d", 30)],
            # late replay of an older update (ts 20 < delete's 30)
            [_envelope(None, {"id": 7, "v": "stale"}, "u", 20)],
        ],
    )
    assert got == {}


def test_stream_apply_touches_only_dirty_buckets(spark, tmp_path):
    """The per-trigger upsert rewrites ONLY the bucket partitions the batch
    touches (dynamic partition overwrite): after a single-key second batch,
    the other buckets' files must be untouched on disk."""
    import glob

    first = [
        _envelope(None, {"id": i, "v": f"v{i}"}, "c", 1) for i in range(40)
    ]
    src = str(tmp_path / "changes")
    _write_batch(src, "b0.parquet", first, 1_600_000_000)
    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    changes = cdc.parse_debezium(raw, "value", ROW)
    state = str(tmp_path / "state")
    q = cdc.apply_changelog_stream(
        changes, ["id"], state, str(tmp_path / "ckpt"), n_buckets=8
    )
    q.awaitTermination()
    mtimes0 = {p: os.path.getmtime(p) for p in glob.glob(f"{state}/_bucket=*/*.parquet")}
    assert len({os.path.dirname(p) for p in mtimes0}) > 1  # really partitioned

    # second trigger: one key only
    _write_batch(src, "b1.parquet", [_envelope(None, {"id": 0, "v": "NEW"}, "u", 2)], 1_600_000_001)
    q = cdc.apply_changelog_stream(
        changes, ["id"], state, str(tmp_path / "ckpt"), n_buckets=8
    )
    q.awaitTermination()

    dirty = (
        F.pmod(F.xxhash64(F.lit(0).cast("long")), F.lit(8)).cast("int")
    )
    dirty_bucket = spark.range(1).select(dirty.alias("b")).collect()[0]["b"]
    untouched = [
        p
        for p, t in mtimes0.items()
        if f"_bucket={dirty_bucket}/" not in p and os.path.exists(p)
    ]
    assert untouched, "expected surviving clean-bucket files"
    for p in untouched:
        assert os.path.getmtime(p) == mtimes0[p], f"clean bucket rewritten: {p}"
    snap = cdc.changelog_state_snapshot(spark, state)
    got = {r["id"]: r["v"] for r in snap.collect()}
    assert got[0] == "NEW" and len(got) == 40


def test_stream_apply_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    """Kill-and-restart recovery: a first run applies batch 1, then a NEW
    query with the SAME checkpoint picks up only the unprocessed files —
    already-applied changes are not re-applied (no duplicate effects) and
    the final state equals a single-run apply of the full change set."""
    src = str(tmp_path / "changes")
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _write_batch(src, "b0.parquet", [
        _envelope(None, {"id": 1, "v": "a"}, "c", 1),
        _envelope(None, {"id": 2, "v": "b"}, "c", 1),
    ], 1_600_000_000)

    def start():
        raw = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return cdc.apply_changelog_stream(
            cdc.parse_debezium(raw, "value", ROW), ["id"], state, ckpt, n_buckets=4
        )

    q = start()
    q.awaitTermination()  # first run consumes b0, then stops (availableNow)
    snap1 = {r["id"]: r["v"] for r in cdc.changelog_state_snapshot(spark, state).collect()}
    assert snap1 == {1: "a", 2: "b"}

    # new files arrive while "down"; restart from the same checkpoint
    _write_batch(src, "b1.parquet", [
        _envelope(None, {"id": 1, "v": "a2"}, "u", 2),
        _envelope({"id": 2, "v": "b"}, None, "d", 3),
    ], 1_600_000_001)
    q = start()
    q.awaitTermination()
    snap2 = {r["id"]: r["v"] for r in cdc.changelog_state_snapshot(spark, state).collect()}
    assert snap2 == {1: "a2"}
    # exactly-once: the state table holds ONE row per key/tombstone, not
    # duplicates from a replayed b0
    st = spark.read.parquet(state)
    assert st.count() == 2  # live id=1 + tombstone id=2
    assert st.groupBy("id").count().filter("count > 1").count() == 0


def test_stream_apply_is_format_agnostic_canal(spark, tmp_path):
    """apply_changelog_stream consumes ANY decoder producing the
    (op, ts_ms, payload) change-row shape — here canal-json batched
    messages through parse_canal, reaching the same final state as the
    Debezium path would."""
    import json

    canal = [
        json.dumps({
            "data": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}],
            "old": None, "type": "INSERT", "ts": 1000,
        }),
        json.dumps({
            "data": [{"id": 1, "v": "a2"}],
            "old": [{"id": 1, "v": "a"}], "type": "UPDATE", "ts": 2000,
        }),
        json.dumps({
            "data": [{"id": 2, "v": "b"}],
            "old": None, "type": "DELETE", "ts": 3000,
        }),
    ]
    src = str(tmp_path / "changes")
    _write_batch(src, "b0.parquet", canal[:1], 1_600_000_000)
    _write_batch(src, "b1.parquet", canal[1:], 1_600_000_001)
    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = cdc.apply_changelog_stream(
        cdc.parse_canal(raw, "value", ROW),
        ["id"],
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        n_buckets=4,
    )
    q.awaitTermination()
    snap = cdc.changelog_state_snapshot(spark, str(tmp_path / "state"))
    assert {r["id"]: r["v"] for r in snap.collect()} == {1: "a2"}


@pytest.mark.slow
def test_stream_apply_continuous_trigger_soak(spark, tmp_path):
    """VERDICT r7 ask #6: the oracle queries replay with availableNow; the
    long-lived deployment mode is a processingTime trigger with batches
    ARRIVING WHILE THE QUERY RUNS. Soak: >=20 triggers of interleaved
    creates/updates/deletes over a 30-key space, half the files written
    after the query starts. Pins: (a) the final snapshot equals the batch
    apply_changelog over the full change set, (b) the state table's data-
    file count is BOUNDED (compacted by the per-trigger dynamic overwrite,
    not growing with trigger count), (c) tombstones still hold."""
    import glob
    import time

    n_files = 24
    batches = []
    for i in range(n_files):
        envs = []
        k = i % 30
        if i % 5 == 4:
            envs.append(_envelope({"id": k, "v": "x"}, None, "d", i + 1))
        else:
            envs.append(_envelope(None, {"id": k, "v": f"v{i}"}, "c" if i < 30 else "u", i + 1))
        # second change per batch exercises multi-bucket triggers
        k2 = (i * 7 + 3) % 30
        envs.append(_envelope(None, {"id": k2, "v": f"w{i}"}, "u", i + 1))
        batches.append(envs)

    src = str(tmp_path / "changes")
    for i in range(n_files // 2):  # first half present at start
        _write_batch(src, f"b{i:02d}.parquet", batches[i], 1_600_000_000 + i)
    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    changes = cdc.parse_debezium(raw, "value", ROW)
    q = cdc.apply_changelog_stream(
        changes,
        keys=["id"],
        state_path=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"),
        n_buckets=4,
        processing_time="0 seconds",
    )
    try:
        # drip the second half in while triggers fire
        for i in range(n_files // 2, n_files):
            _write_batch(src, f"b{i:02d}.parquet", batches[i], 1_600_000_000 + i)
            time.sleep(0.05)
        q.processAllAvailable()
        import json

        batch_ids = [json.loads(p.json)["batchId"] for p in q.recentProgress]
        n_triggers = max(batch_ids, default=-1) + 1
    finally:
        q.stop()
        q.awaitTermination()

    assert n_triggers >= 20, f"only {n_triggers} triggers fired"

    # correctness: snapshot == batch apply over the concatenated change set
    all_rows = [e for b in batches for e in b]
    batch_df = cdc.parse_debezium(
        spark.createDataFrame([(e,) for e in all_rows], "value string"),
        "value",
        ROW,
    )
    want = {r["id"]: r["v"] for r in cdc.apply_changelog(batch_df, ["id"]).collect()}
    got = {
        r["id"]: r["v"]
        for r in cdc.changelog_state_snapshot(spark, str(tmp_path / "state")).collect()
    }
    assert got == want

    # bounded small files: every trigger dynamically OVERWRITES its touched
    # buckets, so files/bucket reflect the LAST rewrite, not 24 appends.
    files = [
        f
        for f in glob.glob(str(tmp_path / "state" / "**" / "*.parquet"), recursive=True)
        if "/_" not in f
    ]
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert len(files) <= 4 * shuffle_parts, len(files)
    assert len(files) < n_triggers * 2, len(files)
