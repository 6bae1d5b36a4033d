"""Edge-case unit tests for the custom operators (hand-built inputs).

The oracle sweep covers these at data scale; here we pin the semantic
corners: as-of tie-breaks and empty build sides, interval bounds
(inclusive/exclusive), hop/cumulate window alignment, pattern counting.
"""

from __future__ import annotations

import pytest

from flink_notebooks_spark.operators import (
    asof_join,
    cumulate_window,
    hop_window,
    interval_join,
    sequence_pattern,
)


def test_asof_inclusive_and_tiebreak(spark):
    probe = spark.createDataFrame(
        [(1, 100, 10), (1, 101, 20), (2, 102, 5)], "k int, pid int, t long"
    )
    build = spark.createDataFrame(
        # two builds at t=10 for k=1 → max bid wins; k=2 has no build ≤ 5
        [(1, 7, 10), (1, 8, 10), (1, 9, 15), (2, 6, 50)], "k int, bid int, bt long"
    )
    out = asof_join(probe, build, "k", "t", "bt", payload=["bid"])
    got = {r["pid"]: r["bid"] for r in out.collect()}
    assert got == {100: 8, 101: 9, 102: None}


def test_asof_empty_build(spark):
    probe = spark.createDataFrame([(1, 100, 10)], "k int, pid int, t long")
    build = spark.createDataFrame([], "k int, bid int, bt long")
    out = asof_join(probe, build, "k", "t", "bt", payload=["bid"]).collect()
    assert len(out) == 1 and out[0]["bid"] is None


def test_interval_join_bounds(spark):
    left = spark.createDataFrame([(1, 100, 1000)], "k int, lid int, lt long")
    right = spark.createDataFrame(
        # lower inclusive (900), upper exclusive (1000); 899 and 1000 excluded
        [(1, 899), (1, 900), (1, 999), (1, 1000)], "k int, rt long"
    )
    out = interval_join(left, right, "k", "lt", "rt", lower=-100, upper=0)
    assert sorted(r["rt"] for r in out.collect()) == [900, 999]


def test_hop_window_membership(spark):
    df = spark.createDataFrame([(12,)], "t long")
    out = hop_window(df, "t", width_us=10, slide_us=5)
    assert sorted(r["w_start_us"] for r in out.collect()) == [5, 10]


def test_cumulate_window_growth(spark):
    # span 60, step 10: a row at t=25 joins windows ending 30,40,50,60
    df = spark.createDataFrame([(25,)], "t long")
    out = cumulate_window(df, "t", step_us=10, span_us=60)
    rows = out.collect()
    assert all(r["w_start_us"] == 0 for r in rows)
    assert sorted(r["w_end_us"] for r in rows) == [30, 40, 50, 60]


def test_sequence_pattern_counts(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, "v"), (1, 2, 2, "p"), (1, 3, 3, "v"), (1, 4, 4, "p"), (2, 1, 5, "x")],
        "k int, t long, eid int, sym string",
    )
    out = sequence_pattern(df, "k", ["t", "eid"], "sym", "vp")
    got = {r["k"]: (r["seq"], r["n_matches"]) for r in out.collect()}
    assert got == {1: ("vpvp", 2), 2: ("x", 0)}


@pytest.mark.slow
def test_salted_join_equals_plain_join(spark):
    from flink_notebooks_spark.operators import salted_join

    # skewed: 90% of left rows share key 1
    left = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(2, i) for i in range(10)], "k int, lv int"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, rv string")
    got = sorted(
        (r["k"], r["lv"], r["rv"]) for r in salted_join(left, right, "k").collect()
    )
    want = sorted((r["k"], r["lv"], r["rv"]) for r in left.join(right, "k").collect())
    assert got == want
    # left-outer keeps unmatched probe rows
    l2 = left.union(spark.createDataFrame([(9, 0)], "k int, lv int"))
    got_l = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in salted_join(l2, right, "k", how="left").collect()
    )
    want_l = sorted(
        (r["k"], r["lv"], r["rv"]) for r in l2.join(right, "k", "left").collect()
    )
    assert got_l == want_l


def test_hot_keys_ranks_heaviest_join_keys(spark):
    from flink_notebooks_spark.operators import hot_keys

    df = spark.createDataFrame(
        [(1, "a")] * 50 + [(2, "b")] * 30 + [(3, "c")] * 5 + [(4, "d")],
        "k int, v string",
    )
    got = [(r["k"], r["n_rows"]) for r in hot_keys(df, "k", top=3).collect()]
    assert got == [(1, 50), (2, 30), (3, 5)]
