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
    with pytest.raises(Exception, match="NotImplementedError|pixel/sample decode"):
        mm.decode(df, fake=False).collect()


# --- real container-header parsing (no codec library needed) ----------------
# Hand-built headers, byte-for-byte per the public specs: PNG (ISO 15948
# §5.2/§11.2.2), JPEG (ITU T.81 B.2.2 SOFn), GIF89a (logical screen
# descriptor), WAV (RIFF fmt chunk).

import struct


def _png(w, h, color_type=6):
    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    return b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4


def _jpeg(w, h, ncomp=3):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"  # must be skipped
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    return b"\xff\xd8" + app0 + dht + sof0 + b"\x00" * 3 * ncomp


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _wav(n_ch, rate):
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size → pad byte
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = b"WAVE" + junk + fmt
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_sniff_header_png_jpeg_gif_wav():
    assert mm.sniff_header(_png(640, 480, color_type=6)) == {
        "fmt": "png", "kind": "image", "width": 640, "height": 480,
        "channels": 4, "sample_rate": None,
    }
    assert mm.sniff_header(_png(1, 99999, color_type=0))["channels"] == 1
    assert mm.sniff_header(_jpeg(222, 333)) == {
        "fmt": "jpeg", "kind": "image", "width": 222, "height": 333,
        "channels": 3, "sample_rate": None,
    }
    assert mm.sniff_header(_gif(320, 200)) == {
        "fmt": "gif", "kind": "image", "width": 320, "height": 200,
        "channels": 3, "sample_rate": None,
    }
    assert mm.sniff_header(_wav(2, 44100)) == {
        "fmt": "wav", "kind": "audio", "width": None, "height": None,
        "channels": 2, "sample_rate": 44100,
    }


def test_sniff_header_rejects_unknown_and_corrupt():
    assert mm.sniff_header(b"hello world") is None
    assert mm.sniff_header(b"") is None
    # known magic, truncated body → undecodable, never a crash
    assert mm.sniff_header(_png(640, 480)[:12]) is None
    assert mm.sniff_header(b"\xff\xd8\xff") is None
    assert mm.sniff_header(_wav(2, 44100)[:14]) is None
    # JPEG that desyncs (garbage between segments) → None
    assert mm.sniff_header(b"\xff\xd8\x00\x00\x00") is None


def test_decode_uses_real_headers_through_spark(spark):
    rows = [
        (1, _png(640, 480)),
        (2, _jpeg(222, 333)),
        (3, _gif(320, 200)),
        (4, _wav(2, 44100)),
        (5, b"not a container"),
    ]
    df = mm.attach_payload(
        spark.createDataFrame(rows, "doc_id long, img binary"), "img"
    )
    out = {r["doc_id"]: r for r in mm.decode(df).collect()}
    assert (out[1]["fmt"], out[1]["width"], out[1]["height"]) == ("png", 640, 480)
    assert (out[2]["fmt"], out[2]["width"], out[2]["height"]) == ("jpeg", 222, 333)
    assert (out[3]["fmt"], out[3]["width"], out[3]["height"]) == ("gif", 320, 200)
    assert (out[4]["fmt"], out[4]["channels"], out[4]["sample_rate"]) == ("wav", 2, 44100)
    assert out[5]["fmt"] == "unknown"  # hash-derived fallback

    # fake=False: known containers decode headers for real (pixel stat NULL);
    # the run only raises on unknown magics
    known = df.filter("doc_id < 5")
    real = {r["doc_id"]: r for r in mm.decode(known, fake=False).collect()}
    assert real[1]["width"] == 640 and real[1]["mean_intensity"] is None
    with pytest.raises(Exception, match="NotImplementedError|pixel/sample decode"):
        mm.decode(df, fake=False).collect()
