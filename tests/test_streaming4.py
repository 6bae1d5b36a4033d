"""Streaming OVER aggregation (queries/streaming4.py): cross-batch frame
correctness against an independent pandas reference, and the state bound —
emitted rows are retained only inside the live frame horizon, idle keys
evict whole on the event-time timer.

The registered replays' oracle parity (DuckDB window SQL at sf0.01) is
covered by the per-commit oracle gate; these tests exercise what the
single-batch replay cannot: frames that REACH ACROSS micro-batch
boundaries, and eviction that fires mid-stream.
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.test_streaming3 import _final_state_rows, _run_stream

HORIZON_S = 86_400  # test idle horizon: 1 day
RANGE_US = 2 * 3600 * 1_000_000  # test RANGE frame: 2 hours
ROWS_K = 3


def _write_events(path, rows):
    """rows: list of (event_id, ts_s, user_id, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [
                    datetime.datetime.fromtimestamp(
                        r[1], datetime.timezone.utc
                    ).replace(tzinfo=None)
                    for r in rows
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, path)


def _staged_stream(spark, tmp_path, files):
    """Stage ``files`` (lists of row tuples) as one-file-per-micro-batch
    parquet replays, mtime-ordered, and return the watermarked stream the
    operator expects."""
    from flink_notebooks_spark.io import events_stream_schema, stream_ts_cols

    d = tmp_path / "stage"
    d.mkdir(parents=True)
    for i, rows in enumerate(files):
        p = str(d / f"{i:02d}_part.parquet")
        _write_events(p, rows)
        os.utime(p, (i, i))
    raw = (
        spark.readStream.schema(events_stream_schema(str(d / "00_part.parquet")))
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    return (
        stream_ts_cols(raw)
        .withWatermark("ev_time", "0 seconds")
        .select("user_id", "event_id", "ev_time", "ts_us", "value")
    )


def _pandas_over(rows, frame):
    """Independent per-user reference: (user_id, event_id, ts_us, w_cnt,
    w_sum_cents, w_max_cents) tuples, frames as SQL defines them."""
    df = pd.DataFrame(rows, columns=["event_id", "ts_s", "user_id", "value"])
    df["ts_us"] = df["ts_s"].astype("int64") * 1_000_000
    df["cents"] = np.rint(df["value"].to_numpy() * 100).astype("int64")
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        ts = g["ts_us"].to_numpy()
        cents = g["cents"].to_numpy()
        for r in range(len(g)):
            if frame == "range":
                sel = (ts >= ts[r] - RANGE_US) & (ts <= ts[r])
            else:
                sel = np.zeros(len(g), dtype=bool)
                sel[max(0, r - ROWS_K) : r + 1] = True
            out.append(
                (
                    uid,
                    int(g["event_id"][r]),
                    int(ts[r]),
                    int(sel.sum()),
                    int(cents[sel].sum()),
                    int(cents[sel].max()),
                )
            )
    return sorted(out)


def _three_batch_fixture():
    """Per-user rows straddling three micro-batches, with frames that reach
    back across both batch boundaries (gaps alternate inside/outside the
    2 h RANGE), duplicate-timestamp peers, and a far-future flush row."""
    t0 = 1_000_000
    rows, eid = [], 0
    for u in (1, 2):
        t = t0 + u * 17
        for k in range(9):
            # gaps 10 min / 3 h alternating: frames break and rebuild
            t += 600 if k % 2 else 10_800
            rows.append((eid, t, u, round(1.0 + 0.37 * eid, 2)))
            eid += 1
        rows.append((eid, t, u, 2.5))  # exact peer (same ts) for RANGE
        eid += 1
    rows.sort(key=lambda r: r[1])
    cut1, cut2 = len(rows) // 3, 2 * len(rows) // 3
    flush = [(9_999, t0 + 40 * 86_400, 777, 0.0)]
    return rows, [rows[:cut1], rows[cut1:cut2], rows[cut2:], flush]


@pytest.mark.parametrize("frame", ["range", "rows"])
@pytest.mark.slow
def test_over_agg_cross_batch_frames_match_pandas(spark, tmp_path, frame):
    from flink_notebooks_spark.queries.streaming4 import _over_state_stream

    rows, files = _three_batch_fixture()
    staged = _staged_stream(spark, tmp_path, files)
    out, _ = _run_stream(
        _over_state_stream(
            spark, None, frame, horizon_s=HORIZON_S, range_us=RANGE_US,
            rows_k=ROWS_K, staged=staged,
        ),
        "append",
        spark,
    )
    got = sorted(
        tuple(r)
        for r in out.filter(F.col("user_id").isin(1, 2))
        .orderBy("user_id", "ts_us", "event_id")
        .collect()
    )
    assert got == _pandas_over(rows, frame)


@pytest.mark.slow
def test_window_join_state_evicts_closed_windows(spark, tmp_path):
    """The windowed stream-stream join's state is bounded by the LIVE
    window: once the watermark passes a tumbling window's end, both sides'
    buffered rows for it are evicted (watermark declared on the raw event
    time BEFORE deriving the window — on the window struct itself Spark
    joins correctly but never cleans state). Wave 1 joins fully, then its
    40 rows leave the join state when wave 2's batch advances the
    watermark past wave 1's window."""
    from flink_notebooks_spark.queries.streaming4 import _window_join_stream

    t0 = 1_000_000
    wave1 = [
        (i, t0 + i, 1 + i % 3, "view" if i % 2 else "purchase", 1.0)
        for i in range(40)
    ]
    wave2 = [
        (100 + i, t0 + 900_000 + i, 50 + i % 3, "view" if i % 2 else "purchase", 1.0)
        for i in range(10)
    ]
    flush = [(999, t0 + 5_000_000, 777, "other", 0.0)]
    d = tmp_path / "stage"
    d.mkdir()
    for i, rows in enumerate([wave1, wave2, flush]):
        p = str(d / f"{i:02d}_part.parquet")
        _write_events_typed(p, rows)
        os.utime(p, (i, i))
    joined = _window_join_stream(spark, None, staging_dir=str(d), window_s=3600)
    out, q = _run_stream(joined, "append", spark)
    states = [
        (p.get("stateOperators") or [{}])[0].get("numRowsTotal")
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    # wave-1 rows (40) evicted once the watermark passed their window; only
    # wave 2's 10 live rows remain
    assert states[-1] == 10, states
    assert max(states) >= 40  # the state really held wave 1 first
    # join results are complete despite eviction
    n_pairs = sum(
        1
        for lrow in wave1 + wave2
        for rrow in wave1 + wave2
        if lrow[3] == "view"
        and rrow[3] == "purchase"
        and lrow[2] == rrow[2]
        and lrow[1] // 3600 == rrow[1] // 3600
    )
    assert out.count() == n_pairs


def _write_events_typed(path, rows):
    """rows: (event_id, ts_s, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [
                    datetime.datetime.fromtimestamp(
                        r[1], datetime.timezone.utc
                    ).replace(tzinfo=None)
                    for r in rows
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.slow
def test_over_agg_state_evicts_to_live_window(spark, tmp_path):
    """Frame-horizon retention + idle-key eviction: after the far-future
    sentinel file, wave-1 users' state rows are GONE (their context aged
    past the frame horizon / the idle timer fired) and only the flush key
    — whose idle timer the stream end never reaches — retains one state
    row. Every wave-1 row was still emitted exactly once (eviction loses
    nothing already mature)."""
    from flink_notebooks_spark.queries.streaming4 import _over_state_stream

    t0 = 1_000_000
    wave1 = [(i, t0 + 60 * i, 100 + (i % 4), 1.0) for i in range(16)]
    # mid row: 3 idle horizons later (its batch evicts wave-1 keys)
    mid = [(100, t0 + 3 * HORIZON_S, 777, 1.0)]
    # far sentinel: 5 more horizons (its batch evicts the mid key too,
    # proving the idle branch; its own key then holds the only state row)
    far = [(101, t0 + 8 * HORIZON_S, 888, 1.0)]
    staged = _staged_stream(spark, tmp_path, [wave1, mid, far])
    out, q = _run_stream(
        _over_state_stream(
            spark, None, "range", horizon_s=HORIZON_S, range_us=RANGE_US,
            staged=staged,
        ),
        "append",
        spark,
    )
    assert _final_state_rows(q) == 1  # the far-sentinel key only
    emitted = out.filter(F.col("user_id") >= 100).filter(F.col("user_id") < 200)
    assert emitted.count() == len(wave1)  # nothing mature was lost
    # and the mid key's row emitted too (idle eviction happened AFTER emit)
    assert out.filter(F.col("user_id") == 777).count() == 1


def test_window_topn_state_frees_on_window_close(spark, sf_dir):
    """Every closed window's ranking state is removed when its timer fires:
    on the sentinel-terminated replay the final state holds exactly the
    sentinel's own window row (whose close time the stream never reaches) —
    not one row per window ever seen."""
    from flink_notebooks_spark.queries.streaming4 import _window_topn_stream

    out, q = _run_stream(_window_topn_stream(spark, sf_dir), "append", spark)
    assert _final_state_rows(q) == 1  # only the sentinel's window remains
    # and every real window emitted (>= 100 windows at sf0.01)
    assert out.select("w_start").distinct().count() >= 100


@pytest.mark.slow
def test_over_agg_quiet_batch_keeps_frame_context(spark, tmp_path):
    """A maturation timer firing on a QUIET batch (another key advanced the
    watermark) must not evict a key whose emitted rows are still inside the
    frame horizon: a later row's frame has to include them. Previously the
    idle-eviction branch conflated the two timers and removed the state."""
    from flink_notebooks_spark.queries.streaming4 import _over_state_stream

    t0 = 1_000_000
    f1 = [(1, t0, 7, 10.0), (2, t0 + 10, 8, 1.0)]          # key 7 + noise
    f2 = [(3, t0 + 3_600, 8, 1.0)]                          # quiet for key 7
    f3 = [(4, t0 + 6_000, 7, 5.0)]                          # within 2 h of t0
    flush = [(9, t0 + 40 * 86_400, 777, 0.0)]
    staged = _staged_stream(spark, tmp_path, [f1, f2, f3, flush])
    out, _ = _run_stream(
        _over_state_stream(
            spark, None, "range", horizon_s=HORIZON_S, range_us=RANGE_US,
            staged=staged,
        ),
        "append",
        spark,
    )
    got = {
        (r.event_id, r.w_cnt, r.w_sum_cents)
        for r in out.filter(F.col("user_id") == 7).collect()
    }
    # the t0+6000 row's frame must still see the t0 row (cnt 2, 10.00+5.00)
    assert got == {(1, 1, 1000), (4, 2, 1500)}


@pytest.mark.slow
def test_over_agg_equal_ts_peer_across_batches(spark, tmp_path):
    """RANGE peers with the same timestamp that arrive in DIFFERENT
    micro-batches get identical peer-inclusive aggregates: a row is
    finalized only once the watermark strictly passes its event time, so a
    boundary peer (ts == watermark, still admitted by Spark's late filter)
    cannot be missed from an already-emitted row's frame."""
    from flink_notebooks_spark.queries.streaming4 import _over_state_stream

    t0 = 1_000_000
    f1 = [(1, t0, 5, 1.0)]
    f2 = [(2, t0, 5, 2.0), (3, t0 + 60, 5, 4.0)]  # peer at ts == watermark
    flush = [(9, t0 + 40 * 86_400, 777, 0.0)]
    staged = _staged_stream(spark, tmp_path, [f1, f2, flush])
    out, _ = _run_stream(
        _over_state_stream(
            spark, None, "range", horizon_s=HORIZON_S, range_us=RANGE_US,
            staged=staged,
        ),
        "append",
        spark,
    )
    got = {
        (r.event_id, r.w_cnt, r.w_sum_cents)
        for r in out.filter(F.col("user_id") == 5).collect()
    }
    # both peers count each other; the later row sees all three
    assert got == {(1, 2, 300), (2, 2, 300), (3, 3, 700)}


@pytest.mark.slow
def test_over_agg_random_multibatch_fuzz(spark, tmp_path):
    """Randomized multi-batch replays vs the pandas reference, all three
    frame kinds: random users, heavy timestamp collisions (ties straddle
    batch boundaries — the exact surface of the boundary bugs the review
    caught), random 2-decimal values, random contiguous batch splits.
    Time-ordered splits keep every row non-late, so the operator must
    reproduce the batch frames EXACTLY."""
    import numpy as np

    from flink_notebooks_spark.queries.streaming4 import _over_state_stream

    t0 = 1_000_000
    for seed in range(8):
        rng = np.random.default_rng(seed)
        rows = []
        for eid in range(40):
            rows.append(
                (
                    eid,
                    t0 + int(rng.integers(0, 20)) * 1800,  # many exact ties
                    int(rng.integers(1, 4)),
                    round(float(rng.integers(0, 2000)) / 100, 2),
                )
            )
        rows.sort(key=lambda r: (r[1], r[0]))
        cuts = sorted(rng.choice(range(1, len(rows)), size=2, replace=False))
        files = [
            rows[: cuts[0]],
            rows[cuts[0] : cuts[1]],
            rows[cuts[1] :],
            [(999, t0 + 40 * 86_400, 777, 0.0)],
        ]
        for frame in ("range", "rows"):
            staged = _staged_stream(
                spark, tmp_path / f"s{seed}_{frame}", files
            )
            out, _ = _run_stream(
                _over_state_stream(
                    spark, None, frame, horizon_s=HORIZON_S,
                    range_us=RANGE_US, rows_k=ROWS_K, staged=staged,
                ),
                "append",
                spark,
            )
            got = sorted(
                tuple(r)
                for r in out.filter(F.col("user_id") < 100).collect()
            )
            assert got == _pandas_over(rows, frame), (seed, frame)
