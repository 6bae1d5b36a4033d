"""Multimodal plumbing: schema, batch shape, determinism, stub gating."""

from __future__ import annotations

import hashlib

import pytest

from flink_notebooks_spark.operators import multimodal as mm


def _payload_df(spark):
    return spark.createDataFrame(
        [(1, b"hello world"), (2, b"\x00\x01\x02" * 100), (3, b"")],
        "doc_id long, img binary",
    )


def test_attach_payload_meta(spark):
    df = mm.attach_payload(_payload_df(spark), "img", kind="image")
    row = {r["doc_id"]: r["meta"] for r in df.collect()}
    assert row[1]["kind"] == "image" and row[1]["n_bytes"] == 11
    assert row[3]["n_bytes"] == 0


def test_decode_deterministic_and_matches_hash(spark):
    df = mm.attach_payload(_payload_df(spark), "img")
    out = {r["doc_id"]: r for r in mm.decode(df).collect()}
    h = hashlib.sha256(b"hello world").digest()
    assert out[1]["width"] == 16 + h[0] % 240
    assert out[1]["height"] == 16 + h[1] % 240
    assert out[1]["channels"] == 1 + h[2] % 3
    assert out[1]["mean_intensity"] == pytest.approx(h[3] / 255.0)
    # rerun → identical (stable across partitionings)
    again = {r["doc_id"]: r for r in mm.decode(df.repartition(3)).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {k: tuple(v) for k, v in again.items()}


def test_extract_features_width(spark):
    df = mm.attach_payload(_payload_df(spark), "img")
    rows = mm.extract_features(df).collect()
    assert all(len(r["features"]) == mm.N_FEATURES for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"])


def test_frame_sample_counts(spark):
    df = mm.attach_payload(_payload_df(spark), "img")
    rows = mm.frame_sample(df, every=2).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # 300-byte payload → 4 frames → sampled 0,2
    assert sorted(by_id[2]) == [0, 2]
    # empty payload still yields frame 0
    assert by_id[3] == [0]


def test_real_decode_is_marked_not_implemented(spark):
    df = mm.attach_payload(_payload_df(spark), "img")
    with pytest.raises(Exception, match="NotImplementedError|real image"):
        mm.decode(df, fake=False).collect()
