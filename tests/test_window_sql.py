"""Unit tests for the Flink group-window → Spark SQL dialect rewrite."""

from __future__ import annotations

from flink_notebooks_spark.engine.window_sql import rewrite_group_windows as rw


def test_tumble():
    assert (
        rw("GROUP BY TUMBLE(ts, INTERVAL '10' SECOND)")
        == "GROUP BY window(ts, '10 seconds')"
    )


def test_tumble_selectors():
    s = rw("SELECT TUMBLE_START(ts, INTERVAL '10' SECOND), TUMBLE_END(ts, INTERVAL '10' SECOND)")
    assert s == "SELECT window.start, window.end"


def test_hop_swaps_slide_and_size():
    # Flink: HOP(time, slide, size); Spark: window(time, size, slide)
    assert (
        rw("GROUP BY HOP(ts, INTERVAL '5' SECOND, INTERVAL '10' SECOND)")
        == "GROUP BY window(ts, '10 seconds', '5 seconds')"
    )


def test_session():
    assert (
        rw("GROUP BY SESSION(ts, INTERVAL '30' MINUTE)")
        == "GROUP BY session_window(ts, '30 minutes')"
    )
    assert rw("SELECT SESSION_START(ts, INTERVAL '30' MINUTE)") == (
        "SELECT session_window.start"
    )


def test_no_window_syntax_untouched():
    q = "SELECT a, COUNT(*) FROM t GROUP BY a"
    assert rw(q) is q


def test_temporal_join_snapshot_rewrite():
    from flink_notebooks_spark.engine.window_sql import rewrite_temporal_join

    sql = (
        "SELECT o.id, d.name FROM orders o "
        "JOIN dim FOR SYSTEM_TIME AS OF o.proc_time AS d ON o.k = d.k"
    )
    out = rewrite_temporal_join(sql)
    assert "SYSTEM_TIME" not in out
    assert "JOIN dim" in out and "AS d ON o.k = d.k" in out


def test_tumble_tvf_rewrite():
    from flink_notebooks_spark.engine.window_sql import rewrite_window_tvfs

    out = rewrite_window_tvfs(
        "SELECT window_start, COUNT(*) FROM "
        "TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '10' SECOND)) "
        "GROUP BY window_start"
    )
    assert "TABLE(" not in out
    assert "window(ts, '10 seconds')" in out
    assert "AS window_start" in out


def test_hop_tvf_swaps_args():
    from flink_notebooks_spark.engine.window_sql import rewrite_window_tvfs

    out = rewrite_window_tvfs(
        "SELECT * FROM TABLE(HOP(TABLE e, DESCRIPTOR(ts), "
        "INTERVAL '5' SECOND, INTERVAL '10' SECOND))"
    )
    assert "window(ts, '10 seconds', '5 seconds')" in out
