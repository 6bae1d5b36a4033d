"""Multimodal columns: opaque binary payloads + typed metadata + decode plumbing.

Design (per the 100 TB pipeline contract): image/audio/video payloads ride as
``binary`` columns with a typed metadata struct; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so the
payload bytes never leave the executors and each Python batch amortizes
serialization. The actual codec calls are STUBBED — image/audio libraries are
not available in this environment — behind ``_decode_bytes``: with
``fake=True`` (default) it produces a deterministic synthetic decode derived
from the payload hash (stable across runs/partitionings, so tests can assert
exact values); with ``fake=False`` it raises ``NotImplementedError`` marking
exactly where PIL/librosa/ffmpeg would plug in. Everything else — schemas,
batch iteration, partitioning, column pruning — is real Spark plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata struct carried alongside every payload
META_DDL = (
    "kind string, fmt string, width int, height int, "
    "sample_rate int, n_frames int, n_bytes long"
)

N_FEATURES = 8  # fixed feature-vector width emitted by extract_features


def _decode_bytes(payload: bytes, fake: bool) -> dict:
    """STUB decode. Real implementation would dispatch on container format
    (PIL.Image.open / soundfile / pyav). The deterministic fake derives
    plausible dimensions from a content hash so downstream plumbing is
    exercised with stable values."""
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires PIL/librosa/ffmpeg; "
            "not available in this environment — pass fake=True"
        )
    h = hashlib.sha256(payload).digest()
    return {
        "width": 16 + h[0] % 240,
        "height": 16 + h[1] % 240,
        "channels": 1 + h[2] % 3,
        "mean_intensity": float(h[3]) / 255.0,
    }


def attach_payload(df: DataFrame, binary_col: str, kind: str = "image") -> DataFrame:
    """Wrap a binary column into (payload, meta) — the canonical multimodal
    row shape. Metadata that is derivable JVM-side (sizes) never touches
    Python."""
    return df.withColumn("payload", F.col(binary_col)).withColumn(
        "meta",
        F.expr(
            f"named_struct('kind', '{kind}', 'fmt', 'raw', "
            "'width', CAST(NULL AS INT), 'height', CAST(NULL AS INT), "
            "'sample_rate', CAST(NULL AS INT), 'n_frames', CAST(NULL AS INT), "
            f"'n_bytes', CAST(octet_length(payload) AS LONG))"
        ),
    )


def decode(df: DataFrame, id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """payload → decoded dimensions via Arrow-batched mapInPandas.

    Output: (id, width, height, channels, mean_intensity). The input is
    column-pruned to (id, payload) before the Python stage so only the bytes
    actually needed cross the Arrow boundary.
    """
    pruned = df.select(id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_bytes(p, fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "channels": [d["channels"] for d in decoded],
                    "mean_intensity": [d["mean_intensity"] for d in decoded],
                }
            )

    return pruned.mapInPandas(
        run, f"{id_col} long, width int, height int, channels int, mean_intensity double"
    )


def extract_features(df: DataFrame, id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """payload → fixed-width float feature vector (the embedding-extraction
    stage of a multimodal pipeline; deterministic fake = normalized bytes of
    the content hash). Output: (id, features array<double>)."""
    pruned = df.select(id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if not fake:
                    raise NotImplementedError("real feature extraction needs a model runtime")
                h = hashlib.sha256(p).digest()
                feats.append([b / 255.0 for b in h[:N_FEATURES]])
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "features": feats})

    return pruned.mapInPandas(run, f"{id_col} long, features array<double>")


def frame_sample(
    df: DataFrame, id_col: str = "doc_id", every: int = 10, fake: bool = True
) -> DataFrame:
    """video payload → one row per sampled frame index (explode-shaped
    mapInPandas; the fake derives a frame count from payload length)."""
    pruned = df.select(id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                if not fake:
                    raise NotImplementedError("real frame sampling needs ffmpeg/pyav")
                n_frames = max(1, len(p) // 64)
                for k in range(0, n_frames, every):
                    ids.append(i)
                    frames.append(k)
            yield pd.DataFrame({id_col: ids, "frame_idx": frames})

    return pruned.mapInPandas(run, f"{id_col} long, frame_idx int")
