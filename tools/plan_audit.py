"""Render and audit the physical plans of the headline queries → PLANS.md.

The 100 TB contract is a *plan-shape* contract: filters reach the parquet
scan, scans are column-pruned, small dimensions broadcast, expressions stay
inside whole-stage codegen, and nothing falls back to a Cartesian product.
tests/test_plans.py pins these properties per-commit; this tool produces the
human-readable evidence — one section per headline query with the formatted
plan and an extracted property summary — so the claims can be checked by
reading, not just by trusting the test names.

Usage:
    python tools/plan_audit.py [sf_dir] [out_md]

Defaults: sf_dir=/root/testdata/sf0.01, out_md=PLANS.md.
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")


# headline queries: one per plan *family*, chosen so every scale claim in
# COVERAGE.md has a rendered plan behind it
HEADLINE = [
    ("q03_filter_project", "filter + projection pushdown into the parquet scan"),
    ("q06_join_agg_topk", "join → partial agg → TakeOrderedAndProject top-k"),
    ("q32_tpch_q5", "multi-way join with broadcast dims"),
    ("q13_tumble_window", "event-time tumble window aggregation"),
    ("q24_asof_join", "as-of (temporal) join"),
    ("q23_interval_join", "interval join with bounded range predicate"),
    ("dedup_exact", "hash-key dedup: one 32-byte-key shuffle"),
    ("dedup_ngram_jaccard", "inverted-index candidate join with df cap"),
    ("dedup_embedding_clusters_lsh", "banded-LSH candidates → exact verify → components"),
    ("dedup_keep_best", "cluster labels ⋈ docs → per-cluster quality argmax window"),
    ("profile_table_sketch", "single-pass HLL++ profile, fully map-side combined"),
    ("similarity_topk", "broadcast query batch over the corpus, no corpus shuffle"),
    ("ann_lsh_topk", "hyperplane-bucket join ANN"),
    ("tf_quality_features", "broadcast head + shuffle-join tail term frequencies"),
    ("text_stats", "pure JVM expression pipeline (whole-stage codegen)"),
    ("pii_scrub", "map-only regexp_replace chain"),
    ("corpus_mix_sample", "hash-stable per-source sampling, map-only until agg"),
    ("events_retention", "cohort retention: distinct → user-window min → cell agg"),
    ("corpus_ngrams", "corpus trigram table: (gram, doc_id) pre-agg → gram rollup → TakeOrdered"),
    ("unigram_logprob", "unigram NLL: capped-broadcast head + exact tail, DECIMAL-summed ln terms"),
    ("events_funnel", "ordered 3-step funnel: one user shuffle, three windows, single-row roll-up"),
    ("pack_sequences", "concat-and-chunk packing: per-source window + bounded example explode"),
    ("ann_ivf_pq_topk", "IVFADC hybrid: cell-pruned mapInPandas scan, shortlist-only shuffle"),
    ("source_kl_divergence", "per-source KL: one (source, word) agg feeds all distributions"),
    ("dedup_cross_source_matrix", "provenance matrix over the shared verified-jaccard cache"),
    ("dedup_containment", "directed containment: capped inverted-index candidates, exact per-direction scoring"),
    ("profile_quantiles", "exact quantiles via value histogram + rank cumsum (domain-sized shuffle)"),
    ("sample_per_source", "exact-k sample: hash-space prefilter + guarded rank window over survivors"),
    ("events_hypertable_rollup", "minute/hour/day rollups in ONE GROUPING SETS pass (single Expand)"),
    ("bm25_topk", "BM25: broadcast query terms filter the posting explode; shared postings cache feeds df + scoring branches"),
    ("doc_chunk", "context-window chunking: narrow sequence/posexplode manifest, no keyed shuffle"),
    ("decontaminate_fuzzy", "per-pair benchmark containment over the broadcast eval 8-gram index"),
    ("events_anomaly", "(type, hour) pre-agg → per-type window from exact integer sums"),
    ("dedup_winnow", "winnowing fingerprints: narrow array-native selection → capped inverted-index join"),
    ("bm25_prf_hybrid", "two-stage retrieval: shortlist-only embedding joins, broadcast PRF centroids"),
    ("quality_classifier", "linear quality gate: single narrow codegen projection, zero keyed shuffles"),
    ("dedup_semantic", "SemDeDup: narrow centroid assignment, one cell-keyed exchange, per-cell GEMM"),
    ("embedding_pca", "PCA projection: zero-shuffle narrow mapInPandas GEMM"),
    ("token_ngram_novelty", "gram first-occurrence via MIN window over gram partitioning, no self-join"),
    ("source_overlap_jaccard", "pairwise source-vocab Jaccard off one persisted (source, word) distinct"),
    ("embedding_kmeans", "distributed Lloyd: narrow assign + cell reduce to k rows per iteration"),
    ("token_freq_sketch", "count-min sketch: ONE map-side-combined cell aggregate, broadcast probes"),
    ("pmi_collocations", "PMI bigrams: two vocab-bounded aggs, vocab-keyed joins, TakeOrdered"),
    ("tfidf_topk_terms", "per-source tf-idf: one token scan, rank window on the tf agg's partitioning"),
    ("token_entropy", "per-doc entropy: two map-side-combined aggs, zero joins"),
    ("source_zipf_slope", "Zipf fit: regression sums reduce to |sources| rows"),
    ("events_markov_transitions", "transition matrix: one user-keyed window shuffle, broadcast totals"),
    ("dedup_graph_pagerank", "iterative PageRank over the checkpointed edge list (LogicalRDD per iteration)"),
    ("dedup_graph_triangles", "degree-oriented wedge join, canonicalized equi-join closer"),
    ("quality_weighted_sample", "deterministic portable-hash coin: map-only keep/drop"),
    ("budget_curation", "quality-ranked budget cut: ONE source-keyed window for rank + cumsum"),
    ("curation_pipeline", "staged capstone: shared caches + hash-projected md5 window + survivor-filtered components"),
    ("dedup_incremental", "per-shard ingestion verdicts: persisted base hash index probe + delta×base pair filter"),
    ("bpe_apply", "merge replay over the DISTINCT vocabulary: corpus touched twice regardless of merge count"),
    ("profile_quantiles_sketch", "GK rank sketch: ONE map-side-combined aggregate to |sources| rows"),
    ("streaming_budget_curation", "online admission: ONE-long per-source state, append-only emissions"),
    ("q38_tpch_q4", "correlated EXISTS decorrelated to a left-semi hash join"),
    ("q41_tpch_q17", "correlated scalar AVG decorrelated to a per-key aggregate join"),
    ("q42_tpch_q18", "IN + HAVING as semi join against the grouped aggregate, TakeOrdered top-100"),
    ("q43_tpch_q22", "scalar-average threshold + NOT EXISTS as a left-anti join"),
    ("q44_tpch_q7", "nation-pair volume: both fixed dims broadcast, date filter pushed"),
    ("dedup_span_scrub", "span-level dedup: hash-only dup detection, text crosses ONE exchange"),
    ("perplexity_buckets", "CCNet terciles: one per-source window over scalar rows"),
    ("mixture_temperature_sample", "temperature mixing: broadcast weight table, map-only coin filter"),
    ("rrf_fusion", "rank fusion: constant-size epilogue over the shared shortlist"),
    ("vocab_coverage", "fixed-size broadcast vocabulary, one explode + membership probe"),
    ("pretrain_mix_pipeline", "five-stage capstone: map-side gates, hashed dedup window, cached-token NLL, integer terciles, md5-coin mixing"),
    ("q49_tpch_q6", "pure scan-aggregate: three range predicates pushed, single-partition sum"),
    ("q50_tpch_q8", "8-way market-share join: selective filters pushed pre-join, dims broadcast"),
    ("q51_tpch_q9", "profit rollup: contains-LIKE pushed, partsupp-analog aggregate joined back"),
    ("q52_tpch_q11", "group-vs-global threshold: persisted value view, 1-row broadcast NLJ"),
    ("q53_tpch_q12", "priority buckets: 2-value IN + year window pushed, 2-group CASE counts"),
    ("q54_tpch_q14", "conditional-agg ratio: month filter pushed, one single-partition final"),
    ("q55_tpch_q16", "NOT IN as null-aware broadcast anti join + COUNT DISTINCT rollup"),
    ("q56_tpch_q19", "disjunctive OR-of-ANDs: per-side implications pushed to BOTH scans"),
    ("curation_split_leakage_safe", "cluster-consistent split: components label join + map-side hash bucket"),
    ("split_leakage_report", "near-dup pairs × split assignment: two id-keyed joins, ≤6-row aggregate"),
]


def _audit(plan: str) -> list[str]:
    """Extract the scale-relevant properties from a formatted plan."""
    notes = []
    pushed = sorted(set(re.findall(r"PushedFilters: \[([^\]]*)\]", plan)))
    nonempty = [p for p in pushed if p.strip()]
    if nonempty:
        notes.append(f"pushed filters: {len(nonempty)} scan(s) with filters")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        widths = [len(s.split(",")) if s else 0 for s in schemas]
        notes.append(f"scan column pruning: {len(schemas)} scan(s), widths {widths}")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    if n_bhj or n_smj:
        notes.append(f"joins: {n_bhj} broadcast-hash, {n_smj} sort-merge")
    wsc = len(re.findall(r"WholeStageCodegen \(\d+\)", plan))
    if wsc:
        notes.append(f"whole-stage codegen spans: {wsc}")
    n_ex = plan.count("Exchange ")
    notes.append(f"exchanges (shuffles): {n_ex}")
    if "CartesianProduct" in plan:
        notes.append("!! CartesianProduct present")
    if "BatchEvalPython" in plan:
        notes.append("!! row-at-a-time Python UDF present")
    for arrow_op in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        if arrow_op in plan:
            notes.append(f"arrow-batched python stage: {arrow_op}")
    if "TakeOrderedAndProject" in plan:
        notes.append("top-k as TakeOrderedAndProject (no global sort)")
    return notes


def main(sf_dir: str, out_md: str) -> int:
    from pyspark.sql import SparkSession

    from flink_notebooks_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sections = []
    bad = 0
    for name, claim in HEADLINE:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        # strip the session-scoped plan_id counters: they differ on every
        # run, so without this the tool is non-idempotent and every
        # regeneration buries real plan regressions under hundreds of
        # spurious [plan_id=N] diff lines
        plan = re.sub(r", \[plan_id=\d+\]", "", buf.getvalue())
        notes = _audit(plan)
        bad += sum(1 for n in notes if n.startswith("!!"))
        # the formatted plan's operator tree (before the per-node detail
        # listing) is the readable part; keep detail for scans only
        tree = plan.split("\n\n")[0]
        detail = "\n".join(
            line
            for line in plan.splitlines()
            if re.match(r"\s*(PushedFilters|ReadSchema|Arguments: .*Broadcast)", line)
        )
        sections.append(
            f"## {name}\n\n*{claim}*\n\n"
            + "".join(f"- {n}\n" for n in notes)
            + f"\n```\n{tree.strip()}\n"
            + (f"---\n{detail}\n" if detail else "")
            + "```\n"
        )
    header = (
        "# PLANS — physical-plan audit of the headline queries\n\n"
        f"Generated by `python tools/plan_audit.py {sf_dir}`. One section per\n"
        "plan family; the property lines are extracted from the same\n"
        "`explain('formatted')` text shown below them. `!!` lines are scale\n"
        "defects and fail the run. tests/test_plans.py pins the load-bearing\n"
        "properties per-commit; this file is the rendered evidence.\n\n"
    )
    with open(out_md, "w") as f:
        f.write(header + "\n".join(sections))
    print(f"wrote {out_md}: {len(sections)} plans, {bad} defect markers")
    return 1 if bad else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    raise SystemExit(main(sf, out))
