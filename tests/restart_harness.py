"""Shared two-phase checkpoint-restart harness.

The deterministic restart protocol (no kill-timing race), used by the
Markov-delta, budget-admission, and streaming-kNN restart tests: stage all
slices eagerly, HOLD BACK the tail, run availableNow to completion (phase 1),
reveal the held slices, resume from the SAME checkpoint (phase 2). State
survived the restart iff the union of both phases' emissions reproduces the
batch answer. One definition here so a protocol fix (slice ordering, mtime
handling, conf scoping) lands in one place.
"""

from __future__ import annotations

import os
import shutil


def two_phase_restart(
    spark,
    tmp_path,
    stream_factory,
    start_query,
    hold_from: int = 2,
    partitions: str = "8",
) -> str:
    """Run ``stream_factory(staging_dir)``'s stream in two availableNow
    phases sharing one checkpoint; slices ``[hold_from:]`` are hidden during
    phase 1. ``start_query(df, sink, ck)`` wires the sink and returns the
    started StreamingQuery. Returns the sink path."""
    staging = str(tmp_path / "staging")
    held = str(tmp_path / "held")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    try:
        # populate staging eagerly, then hold back the tail slices
        stream_factory(staging)
        os.makedirs(held)
        moved = []
        for f in sorted(os.listdir(staging))[hold_from:]:
            shutil.move(f"{staging}/{f}", f"{held}/{f}")
            moved.append(f)
        assert moved, "staging must hold back at least one slice"

        for phase in (1, 2):
            q = start_query(stream_factory(staging), sink, ck)
            q.awaitTermination()
            if phase == 1:
                for f in moved:
                    shutil.move(f"{held}/{f}", f"{staging}/{f}")
            else:
                # liveness, not just content: the resumed query must have
                # actually CONSUMED the revealed slices — without this a
                # phase 2 that silently processed nothing would pass any
                # downstream assertion that phase 1 alone satisfies
                consumed = sum(p.get("numInputRows") or 0 for p in q.recentProgress)
                assert consumed > 0, (
                    "phase-2 query reported no input rows — the restart never "
                    "processed the held-back slices"
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sink


def parquet_sink(df, sink: str, ck: str):
    """Default append-to-parquet sink wiring."""
    return (
        df.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
