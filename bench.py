"""Benchmark harness: runs the declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized with the no-op sink (full plan execution, no
driver transfer) — the number measures engine execution, not collect().
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_notebooks_spark.queries import QUERIES  # noqa: E402
from flink_notebooks_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _calib_jvm_sum(spark, _sf):
    return spark.range(0, 50_000_000, 1, 32).selectExpr("sum(id * 3 + 1) AS s")


def _calib_parquet_scan(spark, sf):
    from flink_notebooks_spark.io import load_table

    return load_table(spark, sf, "lineitem").selectExpr(
        "sum(l_extendedprice * (1 - l_discount)) AS s", "count(*) AS n"
    )


def _calib_shuffle_agg(spark, _sf):
    from pyspark.sql import functions as F  # noqa: N812

    return (
        spark.range(0, 8_000_000, 1, 32)
        .selectExpr("id % 100000 AS k", "id AS v")
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
        .selectExpr("count(*) AS n", "sum(s) AS t")
    )


def _calib_small_files(spark, _sf):
    """Host small-file metadata latency: create+unlink 2000 tiny files on
    the SYSTEM default tempdir (never the engine's resolved scratch — this
    probes the HOST class, not the engine's placement choice). Round 14/15
    showed this dimension moving 27x between hosts while the compute-bound
    calibrations read ~1.1x — the drift the serial/trigger-floor entries
    feel and the original calibration set was blind to (VERDICT r14 #1)."""
    import tempfile

    with tempfile.TemporaryDirectory(prefix="fns-calib-meta-") as d:
        for i in range(2000):
            p = os.path.join(d, f"f{i}")
            with open(p, "wb") as f:
                f.write(b"x")
            os.unlink(p)
    return spark.range(1)


_CALIB_STREAM_DIR: list = []


def _calib_stream_state(spark, _sf):
    """Fixed stateful streaming micro-replay: 2 one-file micro-batches
    through dropDuplicates into a memory sink — per-trigger scheduling,
    state-store load/commit, WAL/offset-log writes. This is the floor under
    every streaming bench entry; the compute calibrations never touch it
    (VERDICT r14 #1: streaming entries drifted x1.4-1.6 between host
    classes while calib_jvm_sum read x1.1). Staging is memoized per
    process; every call runs a fresh query + checkpoint."""
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    if not _CALIB_STREAM_DIR:
        d = tempfile.mkdtemp(prefix="fns-calib-stream-")
        for i in range(2):
            tbl = pa.table(
                {"k": pa.array(range(i * 64, i * 64 + 64), pa.int64())}
            )
            p = f"{d}/{i:02d}.parquet"
            pq.write_table(tbl, p)
            os.utime(p, (i, i))
        _CALIB_STREAM_DIR.append(d)
    name = "calib_strm_" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="fns-calib-ckpt-")
    # pin the state partition count (captured at query start) so the fixed
    # job is identical at every $SPARK_GRAFT_CPUS
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            spark.readStream.schema("k bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(_CALIB_STREAM_DIR[0])
            .dropDuplicates(["k"])
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    out = spark.table(name).groupBy().count()
    spark.catalog.dropTempView(name)
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    return out


# Fixed calibration jobs (VERDICT r12 #2): their code NEVER changes across
# rounds, so cross-archive movement on them measures the HOST (CPU steal,
# page cache, JVM/JIT variance), not the engine. bench_compare.py uses them
# to separate "host moved X%" from residual per-entry deltas. Measured with
# the same grouped-reps/median protocol as queries, once at the start and
# once at the end of the run (drift WITHIN a run shows up as start/end
# disagreement). DO NOT edit these bodies — that would break the baseline.
# r15 adds two members for the dimensions the original three are blind to
# (small-file metadata latency, the streaming trigger floor); they are
# fixed from r15 on, and bench_compare keys drift on the INTERSECTION of
# calibration names so archives without them still compare.
CALIBRATION = {
    "calib_jvm_sum": _calib_jvm_sum,  # pure whole-stage-codegen compute
    "calib_parquet_scan": _calib_parquet_scan,  # scan + column decode
    "calib_shuffle_agg": _calib_shuffle_agg,  # exchange + hash aggregate
    "calib_small_files": _calib_small_files,  # host metadata latency (r15+)
    "calib_stream_state": _calib_stream_state,  # trigger floor (r15+)
}


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("bench", cpus=cpus)

    # warm-up: JIT/codegen caches, parquet footer reads, Python worker pool —
    # so per-query numbers measure steady-state execution, not JVM warm-up
    from flink_notebooks_spark.io import load_all

    for df in load_all(spark, SF_DIR).values():
        df.limit(1).write.format("noop").mode("overwrite").save()
    # spin up the Python worker pool (Arrow + numpy/pandas imports) so the
    # first pandas-UDF query doesn't pay per-worker interpreter startup
    from pyspark.sql import functions as F  # noqa: N812

    def _noop_pd(it):
        import numpy  # noqa: F401

        yield from it

    (
        spark.range(0, cpus * 4, 1, cpus * 4)
        .withColumn("p", F.col("id"))
        .mapInPandas(_noop_pd, "id long, p long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # composite codegen warm-up: exercise the scan→filter→join→agg→window→
    # sort pipeline once so the first measured queries don't absorb
    # whole-stage-codegen compilation and shuffle-machinery init (query
    # registration order must not skew per-query numbers)
    from flink_notebooks_spark.io import load_table

    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    from pyspark.sql import Window

    (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("o_totalprice") > 0)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .withColumn("r", F.row_number().over(Window.orderBy(F.desc("s"))))
        .orderBy("r")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # shared corpus-prep plans: tokenization, shingling, verified jaccard
    # pairs, and the cosine pair table are persisted/memoized and reused by
    # every dedup/text query (Spark's cache manager plan-matches the
    # subtrees). Materialize them ONCE here, reported under their own
    # "shared_corpus_prep" entry — otherwise whichever query happens to run
    # first pays the whole preparation and its number depends on
    # registration order (the round-4 driver-vs-local 10× spread on
    # dedup_ngram_jaccard was exactly this coupling).
    # r15: the materialization order moved into the engine
    # (llm.warm_shared_caches) and overlaps the four INDEPENDENT leaf DAGs
    # (jaccard incl. shingles, cosine, word-freq, bm25 postings) after the
    # shared tokenization root — same six caches, same total work computed
    # from parquet, same timed quantity (wall to materialize all shared
    # caches); only the single-driver-thread serialization of
    # first-materialization codegen is removed (paired A/B on the r15
    # session-2 host: 20-25 s sequential vs 16-19 s overlapped).
    from flink_notebooks_spark.queries.llm import warm_shared_caches

    t0 = time.time()
    warm_shared_caches(spark, SF_DIR)
    shared_prep_sec = round(time.time() - t0, 3)

    # initialize the Structured-Streaming machinery (state-store providers,
    # checkpoint/commit-log managers, streaming listener bus) — the first
    # streaming query otherwise pays ~5s of one-time setup
    wq = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1")
        .load()
        .groupBy("value")
        .count()
        .writeStream.format("memory")
        .queryName("bench_stream_warmup")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    wq.awaitTermination()

    # Per-entry micro-batch (trigger) counts: streaming replays at bench SFs
    # are trigger-floor-dominated — ~1-3 s of per-micro-batch constants
    # (trigger scheduling, state-store commit, Arrow round-trip) swamp the
    # data-dependent part — so a wall-time delta on a streaming entry is
    # only interpretable next to its trigger count (an extra eviction
    # micro-batch reads as "1.5-2× slower" while the per-row cost is flat).
    # Counting is via the listener bus; delivery is async, so counts are
    # accurate to the rep boundary within listener-thread latency (ms) —
    # exact for terminated availableNow replays, approximate never by more
    # than the final event. Batch entries count 0.
    from pyspark.sql.streaming import StreamingQueryListener

    class _TriggerCounter(StreamingQueryListener):
        def __init__(self):
            self.n = 0

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            self.n += 1

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    trigger_counter = _TriggerCounter()
    spark.streams.addListener(trigger_counter)

    # Every query runs SPARK_GRAFT_BENCH_REPS measured times (default 3) and
    # reports the per-query median — single-run variance (JIT, page cache,
    # GC, machine CPU steal) was shown in r5 to swamp per-query deltas.
    # Round 10 de-noising (two rounds of judged false regressions — in-suite
    # numbers up to 2× the isolated median on sub-2 s entries):
    #   1. Reps are GROUPED PER QUERY with one extra DISCARDED warm-up rep,
    #      so every measured rep runs against just-warmed plan/page caches —
    #      the same state an isolated re-run measures — instead of whatever
    #      the previous 150 queries left behind. (clearCache would be the
    #      opposite fix and a wrong one: it would evict the shared corpus
    #      caches that shared_corpus_prep charges for explicitly.)
    #   2. Memory-sink tables the streaming replays register (strm_*) are
    #      dropped after each entry — they pin result rows in driver memory
    #      and their accumulation over 150+ entries is pure GC pressure for
    #      later queries.
    try:
        reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    except ValueError:
        print(
            "bench: SPARK_GRAFT_BENCH_REPS is not an integer; falling back to 1",
            file=sys.stderr,
        )
        reps = 1
    def measure(fn) -> list[float]:
        """reps measured runs after one discarded warm-up (same protocol as
        the query loop); used for the calibration entries."""
        out: list[float] = []
        for i in range(reps + 1):
            t0 = time.time()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
            except Exception as e:  # noqa: BLE001
                print(f"bench: calibration failed: {str(e)[:200]}", file=sys.stderr)
                dt = -1.0
            if i > 0:
                out.append(dt)
        return out

    calib_runs: dict[str, list[float]] = {
        name: measure(fn) for name, fn in CALIBRATION.items()
    }

    # Query order is SHUFFLED per run (VERDICT r12 #2): with a fixed order,
    # an entry's number silently depends on its position (what the previous
    # 150 entries left in the page cache / JIT / GC state) — a bias that
    # reads as a regression when registration order changes. Shuffling turns
    # the bias into noise the per-entry warm-up rep and median absorb; the
    # calibration entries above/below bracket whatever host drift remains.
    import random

    exec_order = list(QUERIES.items())
    random.Random(time.time_ns()).shuffle(exec_order)

    runs: dict[str, list[float]] = {name: [] for name in QUERIES}
    trig_runs: dict[str, list[int]] = {name: [] for name in QUERIES}
    for name, fn in exec_order:
        for i in range(reps + 1):
            n_trig0 = trigger_counter.n
            t0 = time.time()
            try:
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
            except Exception as e:  # noqa: BLE001
                print(f"bench: {name} failed: {str(e)[:200]}", file=sys.stderr)
                dt = -1.0
            if i > 0:  # rep 0 is the discarded per-query warm-up
                runs[name].append(dt)
                trig_runs[name].append(trigger_counter.n - n_trig0)
            elif dt < 0:
                # warm-up already failed — record the failure once and move
                # on instead of paying `reps` more attempts
                runs[name].append(dt)
                break
        # drop this entry's memory-sink tables (see de-noising note above)
        for t in spark.catalog.listTables():
            if t.name.startswith("strm_"):
                spark.catalog.dropTempView(t.name)

    def median(xs: list[float]) -> float:
        good = sorted(x for x in xs if x >= 0)
        if not good:
            return -1.0
        mid = len(good) // 2
        return good[mid] if len(good) % 2 else round((good[mid - 1] + good[mid]) / 2, 3)

    # end-of-run calibration pass: start/end disagreement measures drift
    # WITHIN this run (thermal, page-cache, competing load)
    for name, fn in CALIBRATION.items():
        calib_runs[f"{name}_end"] = measure(fn)

    timings = {name: median(xs) for name, xs in runs.items()}
    # max over measured reps: replays are deterministic so reps agree; max
    # is the conservative pick if a rep raced the async listener delivery
    triggers = {name: (max(xs) if xs else 0) for name, xs in trig_runs.items()}
    # the one-time shared preparation is real work the engine does for the
    # dedup/text family — charge it explicitly instead of to whichever query
    # ran first
    timings["shared_corpus_prep"] = shared_prep_sec
    ok = {k: v for k, v in timings.items() if v >= 0}
    total = round(sum(ok.values()), 3)
    # flaky queries (failed some but not all reps) still get a median, but
    # the failure is surfaced here rather than only on stderr
    rep_failures = {
        name: sum(1 for x in xs if x < 0) for name, xs in runs.items() if any(x < 0 for x in xs)
    }
    summary = {
        "metric": "total_declared_query_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # per-entry micro-batch counts (0 = pure batch): a streaming entry's
        # wall time is ~(triggers × 1-3 s floor) + data-dependent work at
        # bench SFs, so comparers must read deltas next to these
        "triggers": triggers,
        "sf": sf_of(SF_DIR),
        "n_queries": len(timings),
        "n_failed": len(timings) - len(ok),
        "rep_failures": rep_failures,
        "cpus": cpus,
        "reps": reps,
        # fixed-code host-drift probes (never edited; *_end = the same jobs
        # re-measured after the sweep). NOT in `queries`/`value`, so totals
        # stay comparable with pre-r13 archives.
        "calibration": {name: median(xs) for name, xs in calib_runs.items()},
        "exec_order": "shuffled-per-run",
        # measurement protocol marker: grouped per-query reps with a
        # discarded warm-up rep (round 10+). Numbers from different
        # protocols are NOT comparable — the grouped-warmup protocol
        # systematically lowers medians vs the old interleaved one, so
        # cross-round deltas must only be quoted protocol-to-same-protocol.
        "bench_protocol": "grouped-warmup-v2",
    }
    spark.stop()
    # Emit the summary as the sole, flushed, final stdout line: stop the
    # session first (no more JVM output), flush stderr so buffered progress
    # text can't interleave, then write the one JSON line.
    sys.stderr.flush()
    sys.stdout.flush()
    sys.stdout.write(json.dumps(summary) + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
