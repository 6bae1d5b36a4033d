"""Per-trigger duration breakdown for the streaming bench entries.

The bench shows every streaming replay pinned at a 0.5-2 s PER-TRIGGER
floor (BENCH_LOCAL_r13_final: 36 entries x 3-5 triggers = 134 s of the
254 s total). This tool answers WHERE each trigger's time goes, using the
engine's own StreamingQueryProgress.durationMs (triggerExecution,
queryPlanning, addBatch, getBatch, walCommit, commitOffsets, ...):
optimization must target the dominant term, not guess (guide SS1.1).

Usage:
    python tools/stream_probe.py <query_name> [sf_dir]

Runs the named declared query once while a listener captures every
progress event, then prints one line per micro-batch with the duration
breakdown, plus per-component totals across the run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_notebooks_spark.queries import QUERIES  # noqa: E402
from flink_notebooks_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stream-probe")

    from pyspark.sql.streaming import StreamingQueryListener

    events: list[dict] = []

    class _Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            events.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(_Capture())

    # one discarded warm-up + one measured run, same as the bench protocol
    for rep in ("warmup", "measured"):
        events.clear()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        # listener delivery is async; give the bus a beat
        time.sleep(1.0)
        print(f"\n=== {name} [{rep}] wall={wall:.2f}s triggers={len(events)}")
        totals: dict[str, float] = {}
        for i, ev in enumerate(events):
            dur = ev.get("durationMs", {})
            rows = ev.get("numInputRows", 0)
            parts = " ".join(f"{k}={v}" for k, v in sorted(dur.items()))
            print(f"  batch {ev.get('batchId', i)}: rows={rows} {parts}")
            for k, v in dur.items():
                totals[k] = totals.get(k, 0) + v
            for op in ev.get("stateOperators", []):
                print(
                    "    state: commitMs={} rows={} mem={}".format(
                        op.get("commitTimeMs"),
                        op.get("numRowsTotal"),
                        op.get("memoryUsedBytes"),
                    )
                )
        print("  totals(ms): " + " ".join(f"{k}={v:.0f}" for k, v in sorted(totals.items())))
    spark.stop()


if __name__ == "__main__":
    main()
