"""Property-based tests (hypothesis): the custom operators agree with
brute-force pandas oracles on arbitrary small inputs — shapes the fixed
test corpus can't enumerate (duplicate timestamps, empty sides, key skew)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_notebooks_spark.operators import asof_join, hop_window, interval_join

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

row = st.tuples(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=50),  # time
)


@given(
    probe=st.lists(row, min_size=1, max_size=12),
    build=st.lists(row, min_size=0, max_size=12),
)
@_slow
def test_asof_matches_bruteforce(spark, probe, build):
    pdf = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(probe)], columns=["k", "t", "pid"]
    )
    bdf = pd.DataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(build)], columns=["k", "bt", "bid"]
    )
    sp = spark.createDataFrame(pdf.astype({"k": "int64", "t": "int64", "pid": "int64"}))
    sb = (
        spark.createDataFrame(bdf.astype({"k": "int64", "bt": "int64", "bid": "int64"}))
        if len(bdf)
        else spark.createDataFrame([], "k long, bt long, bid long")
    )
    got = {
        r["pid"]: r["bid"]
        for r in asof_join(sp, sb, "k", "t", "bt", payload=["bid"]).collect()
    }

    def oracle(k, t):
        c = bdf[(bdf["k"] == k) & (bdf["bt"] <= t)]
        if c.empty:
            return None
        # latest bt; ties broken by max bid (operator contract)
        c = c.sort_values(["bt", "bid"])
        return int(c.iloc[-1]["bid"])

    want = {int(r.pid): oracle(r.k, r.t) for r in pdf.itertuples()}
    assert got == want


@given(
    left=st.lists(row, min_size=1, max_size=10),
    right=st.lists(row, min_size=0, max_size=10),
    lo=st.integers(min_value=-10, max_value=0),
    width=st.integers(min_value=1, max_value=15),
)
@_slow
def test_interval_join_matches_bruteforce(spark, left, right, lo, width):
    hi = lo + width
    ldf = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "lt", "lid"]
    )
    rdf = pd.DataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(right)], columns=["k", "rt", "rid"]
    )
    sl = spark.createDataFrame(ldf.astype("int64"))
    sr = (
        spark.createDataFrame(rdf.astype("int64"))
        if len(rdf)
        else spark.createDataFrame([], "k long, rt long, rid long")
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(sl, sr, "k", "lt", "rt", lower=lo, upper=hi).collect()
    }
    want = {
        (int(l.lid), int(r.rid))
        for l in ldf.itertuples()
        for r in rdf.itertuples()
        if l.k == r.k and l.lt + lo <= r.rt < l.lt + hi
    }
    assert got == want


@given(
    times=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15),
    slide=st.integers(min_value=1, max_value=10),
    mult=st.integers(min_value=1, max_value=4),
)
@_slow
def test_hop_window_membership_invariants(spark, times, slide, mult):
    width = slide * mult
    df = spark.createDataFrame([(i, t) for i, t in enumerate(times)], "rid long, t long")
    rows = hop_window(df, "t", width_us=width, slide_us=slide).collect()
    per_row = {}
    for r in rows:
        per_row.setdefault(r["rid"], []).append(r["w_start_us"])
        # every assigned window truly contains the row
        assert r["w_start_us"] <= r["t"] < r["w_end_us"]
        assert r["w_start_us"] % slide == 0
    for rid in range(len(times)):
        # exactly width/slide windows per event, all distinct
        starts = per_row[rid]
        assert len(starts) == mult and len(set(starts)) == mult
