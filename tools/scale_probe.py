"""Empirical scale probe: run the most expensive registry ops at sf0.1 and
at a synthetic ~10x corpus, and measure the SLOPE (VERDICT r11 next-round #1).

The 100 TB story was previously argued from plan shapes and state-bound
proofs at one scale; this measures it. For each probed op the tool records
wall time, micro-batch (trigger) count, and the max keyed-state size
(``stateOperators[].numRowsTotal`` off the progress events) at both scales,
and emits SCALE_r12.json with per-op ratios. "Scales" here means: wall grows
at most ~linearly in input rows (streaming replays keep the same trigger
count, so their per-trigger data grows 10x), and streaming state stays at
the live-window size, not the key-domain history.

10x corpus construction (preserves dup-rate and skew — naive replication
would give every document 10 exact copies and inflate the near-dup pair
count quadratically):

- ``documents``: 10 shards; shard k suffixes every ``[a-z0-9]+`` token with
  ``q{k}x`` and offsets doc_id. Within a shard the dup/shingle structure is
  byte-identical to the original (pairs scale linearly); across shards every
  shingle differs (zero cross-shard near-dups, like independent data).
- ``embeddings``: GENERATED at both scales from one parametric model
  (256-dim, planted dup groups of 2-4 members at cos ~0.85, random
  singletons) instead of replicating the fixture. The fixture cannot be
  10x-replicated faithfully: its dup structure lives at the 64-dim random
  -cosine noise floor (920 pairs at the ops' 0.4 threshold but only 14 at
  0.5, and ANY orthogonal shard transform leaves a cross-shard tail up to
  ~0.75), so a 10x corpus would drown the planted pairs in ~90k random
  collisions and connected components would merge everything — a
  degenerate workload that measures nothing. At 256 dims the noise floor
  is cos ~0.25 for this corpus size, the 0.4 threshold separates exactly,
  and the dup-rate per row is scale-invariant by construction. The SMALL
  side uses the same generator at factor 1, so the slope compares like
  with like.
- ``events``: shard k offsets user_id and event_id; timestamps keep the
  original span, so the event-time window is unchanged and the keyed-state
  domain (users) grows 10x — exactly the axis the TTL'd operators must
  bound.
- every other table is hard-linked from the source dir unchanged.

Because the embedding table is generated on both sides, the probe builds
TWO dirs: a factor-1 probe dir (hardlinked fixture tables + generated
embeddings) and the factor-N dir — and the slope is measured between them.

Usage:
    python tools/scale_probe.py [--small /root/testdata/sf0.1]
        [--work-dir /tmp/spark_graft_scale] [--factor 10]
        [--reps 2] [--out SCALE_r12.json] [--ops name,name,...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the registry's heaviest entries (BENCH_LOCAL_r11_final ranking) plus the
# VERDICT-named families: near-dup dedup (both families, TTL'd forms),
# embedding LSH clustering, the curation pipeline, streaming OVER, the
# window TVF ops, and a heavy keyed-state TTL op
DEFAULT_OPS = [
    "streaming_dedup_minhash",
    "streaming_dedup_minhash_ttl",
    "streaming_dedup_embedding",
    "streaming_dedup_embedding_ttl",
    "dedup_embedding_clusters_lsh",
    "curation_pipeline",
    "streaming_over_range_agg",
    "streaming_window_join",
    "streaming_window_topn",
    "streaming_events_funnel_ttl",
]


EMB_DIM = 256  # above the noise floor for this corpus size (see docstring)
EMB_GROUP_P = 0.10  # probability a new row starts a dup group
EMB_NOISE = 0.4  # member = center + EMB_NOISE*gauss → member cos ~0.86


def gen_embeddings(n: int, seed: int):
    """Scale-invariant embedding corpus: planted dup groups (2-4 members,
    cos ~0.86 between members) among random singletons; dup-rate per row is
    constant in n, and at 256 dims the cross-group cosine tail stays far
    below the ops' 0.4 threshold at any probed scale."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    vecs = np.empty((n, EMB_DIM), dtype=np.float32)
    labels = np.empty(n, dtype=np.int32)
    vid = 0
    group = 0
    while vid < n:
        # the FIRST allocation is always a max-size dup group: the ANN ops'
        # fixed query batch is vec_id < TOPK_QUERY_IDS, and recall against
        # the brute-force twin is only meaningful on CONTRASTED pairs (true
        # sim ≥ the dedup threshold) — without this the queries can all be
        # noise-floor singletons and recall measures nothing (one forced
        # group among n leaves the dup-rate scale-invariance intact)
        if vid == 0 and n >= 4:
            c = rng.randn(EMB_DIM)
            c /= np.linalg.norm(c)
            for _ in range(4):
                v = c + EMB_NOISE * rng.randn(EMB_DIM) / np.sqrt(EMB_DIM)
                vecs[vid] = (v / np.linalg.norm(v)) * rng.uniform(0.8, 1.2)
                labels[vid] = group
                vid += 1
            group += 1
            continue
        if rng.rand() < EMB_GROUP_P and n - vid >= 2:
            size = min(int(rng.randint(2, 5)), n - vid)
            c = rng.randn(EMB_DIM)
            c /= np.linalg.norm(c)
            for _ in range(size):
                v = c + EMB_NOISE * rng.randn(EMB_DIM) / np.sqrt(EMB_DIM)
                vecs[vid] = (v / np.linalg.norm(v)) * rng.uniform(0.8, 1.2)
                labels[vid] = group
                vid += 1
        else:
            v = rng.randn(EMB_DIM)
            vecs[vid] = (v / np.linalg.norm(v)) * rng.uniform(0.8, 1.2)
            labels[vid] = group
            vid += 1
        group += 1
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(vecs),
            "label": labels,
        }
    )


def build_probe_corpus(small: str, out: str, factor: int) -> dict:
    """Materialize the factor-x probe corpus at ``out`` (idempotent via a
    manifest). factor=1 keeps documents/events hardlinked to the fixture;
    embeddings are generated at every factor (see module docstring).
    Returns {table: rows} for the scaled tables."""
    import pandas as pd
    import pyarrow.parquet as pq

    manifest_path = os.path.join(out, "_scale_manifest.json")
    want = {"source": os.path.abspath(small), "factor": factor, "v": 4}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == want:
                with open(os.path.join(out, "_scale_rows.json")) as f:
                    return json.load(f)
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    for name in os.listdir(small):
        if not name.endswith(".parquet"):
            continue
        dst = os.path.join(out, name)
        if not os.path.exists(dst):
            os.link(os.path.join(small, name), dst)

    rows = {}

    n_emb = pq.read_metadata(os.path.join(small, "embeddings.parquet")).num_rows
    emb = gen_embeddings(n_emb * factor, seed=20_260_816)
    os.unlink(os.path.join(out, "embeddings.parquet"))
    emb.to_parquet(os.path.join(out, "embeddings.parquet"), index=False)
    rows["embeddings"] = len(emb)

    if factor > 1:
        docs = pq.read_table(os.path.join(small, "documents.parquet")).to_pandas()
        base = int(docs["doc_id"].max() + 1)
        shards = []
        for k in range(factor):
            d = docs.copy()
            d["doc_id"] = d["doc_id"] + k * base
            if k:
                # suffix every token: shard-local shingles/vocab, zero
                # cross-shard overlap; lengths drift slightly (n_chars is
                # kept — it describes the original, and no probed op
                # cross-checks it)
                d["text"] = d["text"].str.replace(
                    r"([A-Za-z0-9]+)", rf"\g<1>q{k}x", regex=True
                )
            shards.append(d)
        big_docs = pd.concat(shards, ignore_index=True)
        os.unlink(os.path.join(out, "documents.parquet"))
        big_docs.to_parquet(os.path.join(out, "documents.parquet"), index=False)
        rows["documents"] = len(big_docs)

        ev = pq.read_table(os.path.join(small, "events.parquet")).to_pandas()
        ubase = int(ev["user_id"].max() + 1)
        ebase = int(ev["event_id"].max() + 1)
        shards = []
        for k in range(factor):
            e = ev.copy()
            e["user_id"] = e["user_id"] + k * ubase
            e["event_id"] = e["event_id"] + k * ebase
            shards.append(e)
        big_ev = (
            pd.concat(shards, ignore_index=True)
            .sort_values(["ts", "event_id"], kind="stable")
            .reset_index(drop=True)
        )
        os.unlink(os.path.join(out, "events.parquet"))
        big_ev.to_parquet(os.path.join(out, "events.parquet"), index=False)
        rows["events"] = len(big_ev)
    else:
        rows["documents"] = pq.read_metadata(
            os.path.join(small, "documents.parquet")
        ).num_rows
        rows["events"] = pq.read_metadata(
            os.path.join(small, "events.parquet")
        ).num_rows

    with open(os.path.join(out, "_scale_rows.json"), "w") as f:
        json.dump(rows, f)
    with open(manifest_path, "w") as f:
        json.dump(want, f)
    return rows


class _ProgressMeter:
    """Counts triggers and tracks the max keyed-state rows across every
    streaming query that progresses while an op runs."""

    def __init__(self):
        self.triggers = 0
        self.max_state_rows = 0

    def reset(self):
        self.triggers = 0
        self.max_state_rows = 0

    def snap(self):
        return (self.triggers, self.max_state_rows)


def _install_meter(spark) -> _ProgressMeter:
    from pyspark.sql.streaming import StreamingQueryListener

    meter = _ProgressMeter()

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            meter.triggers += 1
            try:
                p = json.loads(event.progress.json)
            except Exception:  # noqa: BLE001
                return
            for so in p.get("stateOperators") or []:
                n = so.get("numRowsTotal") or 0
                if n > meter.max_state_rows:
                    meter.max_state_rows = n

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(L())
    return meter


def geometry_report(rows: dict) -> dict:
    """The adaptive geometry the ops RESOLVE at this corpus size (VERDICT
    r13 #2: show which knobs engaged past their fixture floors). These are
    the same functions the real query paths call with the real row counts —
    recorded here so SCALE_r*.json documents the engagement, and asserted
    against the floors in the summary."""
    from flink_notebooks_spark.queries import llm

    n_doc = rows.get("documents") or 0
    n_emb = rows.get("embeddings") or 0
    nlist = llm.ivf_cells_for(n_emb)
    return {
        "simhash_blocks": llm.simhash_blocks_for(n_doc),
        "emb_lsh_bits": llm.lsh_bits_for(n_emb),
        "ann_lsh_planes": llm.lsh_planes_for(n_emb),
        "ivf_nlist": nlist,
        "ivf_nprobe": llm.ivf_nprobe_for(nlist),
        "ivf_train_sample": llm.ivf_train_sample_for(nlist),
    }


def ivf_recall_at(spark, sf_dir: str, sim_floor: float = 0.4) -> dict:
    """VERDICT r13 #4: recall of the IVF ANN against the brute-force twin
    at the probe corpus, for BOTH training paths — the driver-side sampler
    and the distributed pyspark.ml KMeans trainer, engaged through its
    public ``distributed_train`` parameter (the auto threshold sits at
    ~4.2M vectors; forcing the parameter exercises the identical code path
    on this corpus, where the brute-force truth is still computable).

    Recall reports twice: over ALL top-k truth pairs, and restricted to
    CONTRASTED pairs (true sim ≥ ``sim_floor``, the dedup threshold). On
    the synthetic probe corpus most of a query's exact top-10 sits at the
    random-cosine noise floor, where cell locality carries no signal and
    no ANN can (or needs to) recall — the contrasted recall is the metric
    the dedup/retrieval uses actually depend on."""
    from flink_notebooks_spark.queries.llm import ann_ivf_topk, similarity_topk

    truth_rows = similarity_topk(spark, sf_dir).select("q_id", "nn_id", "sim").collect()
    truth = {(r["q_id"], r["nn_id"]) for r in truth_rows}
    contrasted = {
        (r["q_id"], r["nn_id"]) for r in truth_rows if r["sim"] >= sim_floor
    }
    out = {"truth_pairs": len(truth), "contrasted_pairs": len(contrasted)}
    for label, dist in (("driver_train", False), ("distributed_train", True)):
        t0 = time.time()
        got = {
            (r["q_id"], r["nn_id"])
            for r in ann_ivf_topk(spark, sf_dir, distributed_train=dist)
            .select("q_id", "nn_id")
            .collect()
        }
        out[label] = {
            "recall": round(len(got & truth) / max(len(truth), 1), 4),
            "recall_contrasted": round(
                len(got & contrasted) / max(len(contrasted), 1), 4
            ),
            "wall_sec": round(time.time() - t0, 3),
        }
    return out


def _drop_strm_views(spark) -> None:
    for t in spark.catalog.listTables():
        if t.name.startswith("strm_"):
            spark.catalog.dropTempView(t.name)


def run_sweep(
    spark, meter, sf_dir: str, ops: list[str], reps: int, preps: list[str] | None = None
) -> dict:
    from flink_notebooks_spark.queries import QUERIES
    from flink_notebooks_spark.queries.corpus import _bm25_postings  # noqa: F401
    from flink_notebooks_spark.queries.llm import (
        cosine_pairs_df,
        jaccard_pairs_df,
        shingled_docs,
        tokenized_docs,
    )

    prep_fns = {
        "tokenized": tokenized_docs,
        "shingled": shingled_docs,
        "jaccard_pairs": jaccard_pairs_df,
        "cosine_pairs": cosine_pairs_df,
    }
    if preps is None:
        preps = list(prep_fns)
    out = {}
    # the shared corpus-prep caches are charged explicitly, like bench.py —
    # dedup entries then measure their own work, not the shared preparation.
    # `preps` restricts the set: the exact pair caches (jaccard/cosine) are
    # O(n²)-family and only warranted when a probed op actually reads them —
    # at factor 100 materializing an unused exact-GEMM pair table would
    # dominate the whole probe.
    t0 = time.time()
    for pname in preps:
        prep_fns[pname](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out["shared_corpus_prep"] = {
        "wall_sec": round(time.time() - t0, 3),
        "triggers": 0,
        "max_state_rows": 0,
        "out_rows": None,
    }
    for name in ops:
        fn = QUERIES[name]
        best = None
        for _ in range(reps):
            meter.reset()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # bench protocol
            wall = round(time.time() - t0, 3)
            n = df.count()  # outside the timer: output-volume sanity only
            trig, state = meter.snap()
            rec = {
                "wall_sec": wall,
                "triggers": trig,
                "max_state_rows": state,
                "out_rows": n,
            }
            if best is None or wall < best["wall_sec"]:
                # min wall; triggers/state are deterministic across reps
                best = rec
            _drop_strm_views(spark)
        out[name] = best
        print(f"  {sf_dir}: {name}: {best}", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--work-dir", default="/tmp/spark_graft_scale")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="SCALE_r12.json")
    ap.add_argument("--ops", default=",".join(DEFAULT_OPS))
    ap.add_argument(
        "--preps",
        default=None,
        help="comma list of shared preps to materialize "
        "(tokenized,shingled,jaccard_pairs,cosine_pairs); default all",
    )
    ap.add_argument(
        "--ivf-recall",
        action="store_true",
        help="also measure IVF recall vs the brute-force twin at the big "
        "corpus, for both the driver-side and distributed training paths",
    )
    args = ap.parse_args()
    ops = [o for o in args.ops.split(",") if o]

    small_dir = os.path.join(args.work_dir, "f1")
    big_dir = os.path.join(args.work_dir, f"f{args.factor}")
    small_rows = build_probe_corpus(args.small, small_dir, 1)
    big_rows = build_probe_corpus(args.small, big_dir, args.factor)
    print(f"probe corpora: f1={small_rows} f{args.factor}={big_rows}", file=sys.stderr)

    from flink_notebooks_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("scale-probe", cpus=cpus)
    meter = _install_meter(spark)
    # one throwaway stream: state-store/commit-log init is ~5 s once
    wq = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .groupBy("value").count()
        .writeStream.format("memory").queryName("scale_probe_warmup")
        .outputMode("update").trigger(availableNow=True).start()
    )
    wq.awaitTermination()

    preps = [p for p in args.preps.split(",") if p] if args.preps else None
    small_res = run_sweep(spark, meter, small_dir, ops, args.reps, preps)
    big_res = run_sweep(spark, meter, big_dir, ops, args.reps, preps)

    report = {
        "factor": args.factor,
        "fixture_dir": args.small,
        "small_dir": small_dir,
        "big_dir": big_dir,
        "small_rows": small_rows,
        "big_rows": big_rows,
        "cpus": cpus,
        "reps": args.reps,
        "geometry": {
            "small": geometry_report(small_rows),
            "big": geometry_report(big_rows),
        },
        "ops": {},
    }
    if args.ivf_recall:
        print("measuring IVF recall at the big corpus…", file=sys.stderr)
        report["ivf_recall_big"] = ivf_recall_at(spark, big_dir)
        print(f"  ivf_recall: {report['ivf_recall_big']}", file=sys.stderr)
    for name in ["shared_corpus_prep", *ops]:
        s, b = small_res[name], big_res[name]
        rec = {"small": s, "big": b}
        if s["wall_sec"] > 0:
            rec["wall_ratio"] = round(b["wall_sec"] / s["wall_sec"], 2)
        if s["max_state_rows"]:
            rec["state_ratio"] = round(b["max_state_rows"] / s["max_state_rows"], 2)
        report["ops"][name] = rec
    spark.stop()
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v.get("wall_ratio") for k, v in report["ops"].items()}))


if __name__ == "__main__":
    main()
