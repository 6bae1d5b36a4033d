"""Isolated per-entry measurement with the bench's own protocol.

Usage:
    python tools/iso_bench.py name1 name2 ... [--reps N] [--sf DIR]

For each named declared query: one discarded warm-up + N (default 3)
measured reps through the noop sink, printed as per-rep seconds and the
median. Same session/tuning path as bench.py (get_spark + the queries'
own tune()), honoring $SPARK_GRAFT_CPUS, so numbers are comparable to the
suite's per-entry medians minus in-suite interference.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_notebooks_spark.queries import QUERIES  # noqa: E402
from flink_notebooks_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("iso-bench", cpus=cpus)
    for name in names:
        if name not in QUERIES:
            print(f"{name}: UNKNOWN", flush=True)
            continue
        fn = QUERIES[name]
        times: list[float] = []
        for r in range(reps + 1):
            spark.sparkContext.setJobDescription(f"iso:{name}:rep{r}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if r > 0:
                times.append(dt)
            for t in spark.catalog.listTables():
                if t.name.startswith("strm_"):
                    spark.catalog.dropTempView(t.name)
        print(
            f"{name}: median={statistics.median(times):.3f} reps={times}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
