"""events.ts vintage handling (io._events_ts_cols / events_stream_schema).

The driver has regenerated /root/testdata with different parquet physical
types for events.ts across rounds (TIMESTAMP(NANOS) → timestamp[us]). Round 3
silently broke on the switch; these tests pin the contract that BOTH vintages
normalize to identical (ts TIMESTAMP_NTZ, ts_us bigint) columns, so the next
regen fails loudly here instead of as red oracle rows.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flink_notebooks_spark.io import (
    EVENTS_RAW_SCHEMA,
    EVENTS_RAW_SCHEMA_NANOS,
    events_stream_schema,
    load_table,
    stream_ts_cols,
)

US = [1_704_067_200_000_000, 1_704_067_200_123_456, 1_704_153_599_999_999]


def _write_us(path: str) -> None:
    ts = [datetime.datetime.fromtimestamp(u / 1e6, datetime.timezone.utc).replace(tzinfo=None) for u in US]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([10, 11, 12], pa.int64()),
                "event_type": pa.array(["a", "b", "c"]),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "props": pa.array(["{}", "{}", "{}"]),
            }
        ),
        path,
    )


def _write_nanos(path: str) -> None:
    # int64 nanos under the declared-long schema — the shape Spark sees for a
    # TIMESTAMP(NANOS) file under nanosAsLong (plus sub-µs residue to prove
    # truncation matches DuckDB's integer division)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array([u * 1000 + 789 for u in US], pa.int64()),
                "user_id": pa.array([10, 11, 12], pa.int64()),
                "event_type": pa.array(["a", "b", "c"]),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "props": pa.array(["{}", "{}", "{}"]),
            }
        ),
        path,
    )


@pytest.fixture(scope="module")
def vintage_dirs(tmp_path_factory):
    us_dir = tmp_path_factory.mktemp("vintage_us")
    ns_dir = tmp_path_factory.mktemp("vintage_ns")
    _write_us(str(us_dir / "events.parquet"))
    _write_nanos(str(ns_dir / "events.parquet"))
    return str(us_dir), str(ns_dir)


def test_both_vintages_normalize_identically(spark, vintage_dirs):
    us_dir, ns_dir = vintage_dirs
    a = load_table(spark, us_dir, "events")
    b = load_table(spark, ns_dir, "events")
    want = {"ts": "timestamp_ntz", "ts_us": "bigint"}
    assert {k: v for k, v in a.dtypes if k in want} == want
    assert {k: v for k, v in b.dtypes if k in want} == want
    rows_a = [tuple(r) for r in a.select("event_id", "ts", "ts_us").orderBy("event_id").collect()]
    rows_b = [tuple(r) for r in b.select("event_id", "ts", "ts_us").orderBy("event_id").collect()]
    assert rows_a == rows_b
    assert [r[2] for r in rows_a] == US


def test_ts_us_correct_without_tuned_confs(spark, vintage_dirs):
    """The µs vintage must load correctly even in a session where tune()'s
    confs were never applied (hostile driver session, non-UTC timezone).
    newSession() shares the context but has an isolated SQLConf."""
    us_dir, _ = vintage_dirs
    hostile = spark.newSession()
    hostile.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    df = hostile.read.parquet(f"{us_dir}/events.parquet")
    from flink_notebooks_spark.io import _events_ts_cols

    out = _events_ts_cols(df)
    got = [r["ts_us"] for r in out.select("ts_us").orderBy("event_id").collect()]
    assert got == US  # NTZ arithmetic — timezone cannot shift it


def test_stream_schema_is_footer_driven(vintage_dirs):
    us_dir, ns_dir = vintage_dirs
    assert events_stream_schema(f"{us_dir}/events.parquet") == EVENTS_RAW_SCHEMA
    assert events_stream_schema(f"{ns_dir}/events.parquet") == EVENTS_RAW_SCHEMA_NANOS


def test_stream_ts_cols_matches_batch(spark, vintage_dirs):
    us_dir, ns_dir = vintage_dirs
    for d in (us_dir, ns_dir):
        raw = spark.read.schema(events_stream_schema(f"{d}/events.parquet")).parquet(
            f"{d}/events.parquet"
        )
        out = stream_ts_cols(raw)
        assert dict(out.dtypes)["ev_time"] == "timestamp"
        got = [r["ts_us"] for r in out.select("ts_us").orderBy("event_id").collect()]
        assert got == US


def test_unsupported_vintage_fails_loudly(spark, tmp_path):
    pq.write_table(
        pa.table({"event_id": pa.array([1], pa.int64()), "ts": pa.array(["oops"])}),
        str(tmp_path / "events.parquet"),
    )
    with pytest.raises(TypeError, match="unsupported dtype"):
        load_table(spark, str(tmp_path), "events")
