"""State bounds of the round-11 TTL'd keyed-state operators
(queries/streaming3.py + the horizon-parameterized builders in corpus.py /
streaming.py).

The scale claims under test, per operator family:

* per-user funnel / retention state is O(users within the attribution
  horizon), not O(users ever) — proven with the streaming2-style two-wave
  disjoint-key replay where the final ``numRowsTotal`` lands at the live
  wave's key count (the NoTimeout form run on the same replay accumulates
  both waves — the DIFFERENCE is pinned, not one drift-prone number);
* TTL'd sessionization evicts every user whose session closed — on the
  sentinel-terminated replay the final state is exactly ONE row (the
  sentinel key), vs |users| for the NoTimeout form;
* the per-type anomaly hour tables are CONTENT-pruned to the horizon —
  hours behind ``watermark − horizon`` stop influencing revisions (the key
  count is already bounded by |event types|, so the proof is behavioral:
  a stale spike vanishes from the TTL'd run's final revision and persists
  in the NoTimeout run's);
* streaming near-dup dedup signature state is O(docs per TTL window) — a
  document arriving after the TTL no longer pairs with aged-out members
  (behavioral), live same-window pairs still emit (liveness), and the
  final state row count sits strictly below the NoTimeout form's.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _run_stream(df, mode, spark, partitions=4):
    """Start df into a memory sink (availableNow), return (table_df, query)
    — the test-side _run_to_memory that also surfaces progress."""
    import uuid

    name = "strm3_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
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
    return spark.table(name), q


def _final_state_rows(q) -> int:
    rows = [
        (p.get("stateOperators") or [{}])[0].get("numRowsTotal")
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    assert rows, "expected stateOperators progress"
    return rows[-1]


# ---------------------------------------------------------------------------
# synthetic fixtures
# ---------------------------------------------------------------------------

def _write_events(path, rows):
    """rows: list of (event_id, ts_s, user_id, event_type, value)."""
    import datetime

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


# Test horizon: 1 day, with waves 3 days apart. A day-scale horizon matters
# for retention, whose eviction timer anchors to the cohort DAY start (the
# same day-floor its offsets use) — a sub-day horizon would expire every
# cohort the moment the watermark passed its day's first 600 seconds.
HORIZON_S = 86_400


def _two_wave_events_dir(tmp_path, n1=8, n2=5):
    """events.parquet with two DISJOINT user waves separated by 3 horizons
    (plus 60 s slack — the watermark strictly exceeds every wave-1 timer):
    each user emits view→click→purchase, so funnel and retention state both
    populate. Returns (sf_dir, n1, n2)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    t0, rows, eid = 1_000_000, [], 0
    for wave, (start_uid, n, tw) in enumerate(
        [(1, n1, t0), (10_001, n2, t0 + 3 * HORIZON_S + 60)]
    ):
        for u in range(start_uid, start_uid + n):
            for k, et in enumerate(["view", "click", "purchase"]):
                rows.append((eid, tw + (u % 7) + k, u, et, 1.0))
                eid += 1
    rows.sort(key=lambda r: r[1])
    _write_events(str(sf / "events.parquet"), rows)
    return str(sf), n1, n2


@pytest.mark.slow
def test_funnel_ttl_state_lands_at_live_wave(spark, tmp_path):
    from flink_notebooks_spark.queries.corpus import (
        _funnel_rollup,
        _funnel_state_stream,
    )

    sf, n1, n2 = _two_wave_events_dir(tmp_path)
    out_t, q_t = _run_stream(
        _funnel_state_stream(spark, sf, horizon_s=HORIZON_S), "update", spark
    )
    out_e, q_e = _run_stream(_funnel_state_stream(spark, sf), "update", spark)
    # wave-1 users idle past the horizon are evicted; NoTimeout keeps all
    assert _final_state_rows(q_t) == n2
    assert _final_state_rows(q_e) == n1 + n2
    # eviction loses NOTHING emitted: both roll-ups count both waves
    row_t = _funnel_rollup(out_t).collect()[0]
    row_e = _funnel_rollup(out_e).collect()[0]
    assert row_t == row_e
    assert row_t["n_purchase_users"] == n1 + n2


@pytest.mark.slow
def test_retention_ttl_state_lands_at_live_wave(spark, tmp_path):
    from flink_notebooks_spark.queries.corpus import (
        _retention_rollup,
        _retention_state_stream,
    )

    sf, n1, n2 = _two_wave_events_dir(tmp_path)
    out_t, q_t = _run_stream(
        _retention_state_stream(spark, sf, horizon_s=HORIZON_S), "update", spark
    )
    out_e, q_e = _run_stream(_retention_state_stream(spark, sf), "update", spark)
    assert _final_state_rows(q_t) == n2
    assert _final_state_rows(q_e) == n1 + n2
    # cohort-window eviction is exact for the roll-up
    a = _retention_rollup(spark, out_t).collect()
    b = _retention_rollup(spark, out_e).collect()
    assert a == b
    assert sum(r["n_users"] for r in a) >= n1 + n2


@pytest.mark.slow
def test_sessionize_ttl_state_ends_at_sentinel_only(spark, sf_dir):
    """On the sentinel-terminated replay every real user's session closes
    and evicts — final state is exactly the one sentinel key — and the
    emitted sessions equal the NoTimeout form's (which retains every
    user's state forever, the leak the TTL form fixes)."""
    from flink_notebooks_spark.queries import QUERIES
    from flink_notebooks_spark.queries.streaming3 import _sessionize_ttl_stream

    out, q = _run_stream(_sessionize_ttl_stream(spark, sf_dir), "append", spark)
    assert _final_state_rows(q) == 1  # the sentinel key
    got = out.filter(F.col("user_id") >= 0).orderBy("user_id", "sid")
    ref = QUERIES["streaming_stateful_sessionize"](spark, sf_dir)
    assert got.schema == ref.schema
    assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()


@pytest.mark.slow
def test_anomaly_ttl_prunes_stale_hours(spark, tmp_path):
    """A wave-1 spike (z ≈ 3 within its wave) must vanish from the TTL'd
    run's final revision once the horizon passes, while the NoTimeout run
    still reports it at the final revision."""
    from flink_notebooks_spark.queries.corpus import _anomaly_scan_stream

    sf = tmp_path / "sf"
    sf.mkdir()
    hour = 3600
    t0 = 1_000_000_000 - (1_000_000_000 % hour)
    rows, eid = [], 0

    def spike_wave(tw):
        nonlocal eid
        for h in range(10):  # 10 quiet hours, count 1
            rows.append((eid, tw + h * hour, 1, "click", 1.0))
            eid += 1
        for i in range(200):  # the spike hour
            rows.append((eid, tw + 10 * hour + (i % 3000), 1, "click", 1.0))
            eid += 1

    spike_wave(t0)
    wave2_t = t0 + 3 * HORIZON_S * 1000  # far past the horizon
    wave2_t -= wave2_t % hour
    spike_wave(wave2_t)
    rows.sort(key=lambda r: r[1])
    _write_events(str(sf / "events.parquet"), rows)

    out_t, _ = _run_stream(
        _anomaly_scan_stream(spark, str(sf), horizon_s=HORIZON_S), "update", spark
    )
    out_e, _ = _run_stream(_anomaly_scan_stream(spark, str(sf)), "update", spark)

    def final_hours(out):
        rows = out.collect()
        maxrev = max(r["rev"] for r in rows)
        return {r["h_us"] for r in rows if r["rev"] == maxrev}

    w1_spike_us = (t0 + 10 * hour) * 1_000_000
    w2_spike_us = (wave2_t + 10 * hour) * 1_000_000
    ttl_hours = final_hours(out_t)
    exact_hours = final_hours(out_e)
    assert w2_spike_us in ttl_hours  # live anomaly still fires
    assert w1_spike_us not in ttl_hours  # stale hours pruned from the moments
    assert w1_spike_us in exact_hours  # the leak the TTL form fixes
    # every hour the TTL'd final revision scores is a live-wave hour
    assert all(h >= wave2_t * 1_000_000 for h in ttl_hours)


# ---------------------------------------------------------------------------
# streaming near-dup dedup TTL — the W8-analog signature-state leak
# ---------------------------------------------------------------------------

def _dedup_docs_dir(tmp_path):
    """12 documents, doc_id-ordered into 4 staged files (3 each) with a 1 s
    arrival step and ttl_s=1: a doc pairs only with members of its own and
    the previous file. Layout:
      file 0: A(0), A'(1) near-dups + pad(2)
      file 1/2: distinct junk (advance the watermark past A's expiry)
      file 3: B(9) ≈ A, C(10) ≈ C'(11)
    Expected verified pairs — TTL: {(0,1), (10,11)} (A aged out before B);
    NoTimeout: additionally (0,9)."""
    vocab = [f"w{i:03d}" for i in range(400)]

    def words(n, seed):
        r = np.random.default_rng(seed)
        return [vocab[i] for i in r.choice(400, size=n, replace=False)]

    base = words(60, 1)
    a = " ".join(base)
    a2 = " ".join(base[:30] + ["qqq"] + base[31:])  # jac ≈ 0.84 vs a
    b = " ".join(base[:10] + ["zzz"] + base[11:])  # jac ≈ 0.84 vs a
    cbase = words(60, 2)
    c = " ".join(cbase)
    c2 = " ".join(cbase[:20] + ["vvv"] + cbase[21:])
    junk = [" ".join(words(60, 100 + i)) for i in range(7)]
    texts = [a, a2, junk[0], junk[1], junk[2], junk[3], junk[4], junk[5], junk[6], b, c, c2]
    sf = tmp_path / "sf"
    sf.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(12)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 12, pa.string()),
            "source": pa.array(["t"] * 12, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(sf / "documents.parquet"))
    return str(sf)


@pytest.mark.slow
def test_minhash_dedup_ttl_evicts_aged_signatures(spark, tmp_path, monkeypatch):
    from flink_notebooks_spark.queries import streaming as streaming_mod
    from flink_notebooks_spark.queries.streaming import _minhash_pair_stream

    # pin fine shard granularity: with the corpus-derived default a 12-doc
    # fixture collapses to 1 shard per band, so content pruning never empties
    # a whole shard row and the row-count eviction proof below is vacuous
    monkeypatch.setattr(streaming_mod, "STREAM_SHARD_TARGET_MEMBERS", 2)
    sf = _dedup_docs_dir(tmp_path)
    out_t, q_t = _run_stream(_minhash_pair_stream(spark, sf, ttl_s=1), "append", spark)
    out_e, q_e = _run_stream(_minhash_pair_stream(spark, sf), "append", spark)
    ttl_pairs = {(r["a"], r["b"]) for r in out_t.collect()}
    exact_pairs = {(r["a"], r["b"]) for r in out_e.collect()}
    assert ttl_pairs == {(0, 1), (10, 11)}  # same-window pairs still emit
    assert exact_pairs == {(0, 1), (0, 9), (10, 11)}  # the unbounded form
    # aged-out shards dropped their state rows / evicted on timeout: the
    # TTL'd run ends with strictly less state than the accumulate-forever one
    assert _final_state_rows(q_t) < _final_state_rows(q_e)


def _dedup_embeddings_dir(tmp_path):
    """Same wave layout as _dedup_docs_dir but over vectors (dim 16).
    A/A'/B share a direction (cos ≈ 1 ≥ CLUSTER_SIM_T); C/C' share another,
    orthogonal; junk rides distinct basis axes (cos ≤ 1/√8 < 0.4)."""
    dim = 16
    va = np.zeros(dim); va[:8] = 1.0
    vc = np.zeros(dim); vc[8:] = 1.0

    def jiggle(v, i):
        r = np.random.default_rng(50 + i)
        return v + r.normal(0, 0.01, size=dim)

    junk = []
    for i in range(7):
        e = np.zeros(dim)
        e[i % dim] = 1.0 if i < 4 else -1.0
        junk.append(e)
    vecs = [va, jiggle(va, 0)] + junk + [jiggle(va, 1), vc, jiggle(vc, 2)]
    sf = tmp_path / "sf"
    sf.mkdir()
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(12)), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * 12, pa.int32()),
        }
    )
    pq.write_table(tbl, str(sf / "embeddings.parquet"))
    return str(sf)


@pytest.mark.slow
def test_embedding_dedup_ttl_evicts_aged_signatures(spark, tmp_path, monkeypatch):
    from flink_notebooks_spark.queries import streaming as streaming_mod
    from flink_notebooks_spark.queries.streaming import _embedding_pair_stream

    # fine shard granularity for the row-count eviction proof (see the
    # minhash twin above)
    monkeypatch.setattr(streaming_mod, "STREAM_SHARD_TARGET_MEMBERS", 2)
    sf = _dedup_embeddings_dir(tmp_path)
    out_t, q_t = _run_stream(
        _embedding_pair_stream(spark, sf, ttl_s=1), "append", spark
    )
    out_e, q_e = _run_stream(_embedding_pair_stream(spark, sf), "append", spark)
    ttl_pairs = {(r["a"], r["b"]) for r in out_t.collect()}
    exact_pairs = {(r["a"], r["b"]) for r in out_e.collect()}
    assert ttl_pairs == {(0, 1), (10, 11)}
    assert exact_pairs == {(0, 1), (0, 9), (1, 9), (10, 11)}
    assert _final_state_rows(q_t) < _final_state_rows(q_e)


def test_staging_shape_mismatch_raises_loudly(spark, tmp_path):
    """A pinned staging dir populated WITHOUT arrival_us must refuse a later
    TTL-shaped read (and vice versa) — silently reading nulls into the TTL
    state op would crash mid-stream with an opaque NaN cast instead."""
    from flink_notebooks_spark.queries.streaming import _staged_table_stream

    sf = _dedup_docs_dir(tmp_path)
    staging = str(tmp_path / "staged")
    schema = "doc_id bigint, text string"
    _staged_table_stream(spark, sf, "documents", "doc_id", schema,
                         staging_dir=staging)
    with pytest.raises(ValueError, match="arrival_us"):
        _staged_table_stream(spark, sf, "documents", "doc_id", schema,
                             staging_dir=staging, arrival_step_s=1)
    # and the reverse direction
    staging2 = str(tmp_path / "staged2")
    _staged_table_stream(spark, sf, "documents", "doc_id", schema,
                         staging_dir=staging2, arrival_step_s=1)
    with pytest.raises(ValueError, match="arrival_us"):
        _staged_table_stream(spark, sf, "documents", "doc_id", schema,
                             staging_dir=staging2)


def test_ttl_and_exact_dedup_agree_on_bounded_replay(spark, sf_dir):
    """Registered-query parity: the full fixture replay sits inside one TTL
    window, so the TTL'd dedups must emit EXACTLY the unbounded forms'
    verified pairs (the streaming2 parity contract)."""
    from flink_notebooks_spark.queries import QUERIES

    for base in ["streaming_dedup_minhash", "streaming_dedup_embedding"]:
        a = QUERIES[base](spark, sf_dir)
        b = QUERIES[base + "_ttl"](spark, sf_dir)
        assert a.schema == b.schema
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_stream_bucket_shards_scales_with_corpus():
    """The shard dial is corpus-derived (bounds per-group state members),
    never core-count-derived — r15's per-group overhead fix."""
    from flink_notebooks_spark.queries.streaming import (
        STREAM_SHARD_TARGET_MEMBERS,
        stream_bucket_shards,
    )

    assert stream_bucket_shards(0) == 1
    assert stream_bucket_shards(1) == 1
    assert stream_bucket_shards(STREAM_SHARD_TARGET_MEMBERS) == 1
    assert stream_bucket_shards(STREAM_SHARD_TARGET_MEMBERS + 1) == 2
    assert stream_bucket_shards(100 * STREAM_SHARD_TARGET_MEMBERS) == 100
