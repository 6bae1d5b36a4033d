"""Partition-count invariance — the determinism contract at cluster scale.

On a real cluster the same query runs at wildly different parallelism
(executors join and leave, AQE re-plans, configs differ between
environments). These tests pin the guarantee the engine claims throughout:
results are IDENTICAL at any shuffle parallelism — no float-summation order
sensitivity (DECIMAL aggregation), no rand()-based sampling, no
partition-index dependence, no nondeterministic tie-breaks.
"""

from __future__ import annotations

import pytest

from flink_notebooks_spark.queries import QUERIES

# one representative per determinism risk class:
#   dedup_exact          — hash groupBy keep-min
#   tf_quality_features  — broadcast-capped head + shuffle tail join, float scores
#   corpus_mix_sample    — hash-stable per-source sampling
#   dedup_keep_best      — iterative components + window argmax tie-break
#   shard_pack           — running-cumsum bin packing over an ordered window
#   q04_group_agg        — DECIMAL-summed money aggregates
INVARIANT_QUERIES = [
    "dedup_exact",
    "tf_quality_features",
    "corpus_mix_sample",
    "dedup_keep_best",
    "shard_pack",
    "q04_group_agg",
    #   ann_lsh_topk         — hash-derived buckets, window tie-breaks
    #   knn_label_vote       — broadcast vote set + count/argmax window
    "ann_lsh_topk",
    "knn_label_vote",
    #   corpus_ngrams        — integer tf/df + total-ordered TakeOrdered
    #   unigram_logprob      — DECIMAL-summed rounded ln terms (a raw
    #                          double sum would fail this very test)
    "corpus_ngrams",
    "unigram_logprob",
    #   events_funnel        — integer-microsecond latency sums
    "events_funnel",
    #   sample_per_source    — hash-rank exact-k selection behind a
    #                          prefilter whose cut depends only on counts
    #   profile_quantiles    — integer rank arithmetic over a value histogram
    #   dedup_containment    — float containment scores on persisted
    #                          candidate cache, rounded at the edge
    #   events_hypertable_rollup — DECIMAL sums across an Expand
    "sample_per_source",
    "profile_quantiles",
    "dedup_containment",
    "events_hypertable_rollup",
    #   bm25_topk            — DECIMAL-summed rounded-ln contributions +
    #                          rounded-score ranking with doc_id tie-break
    #   events_anomaly       — z-scores from exact integer window sums
    "bm25_topk",
    "events_anomaly",
    #   bm25_prf_hybrid      — rank-ordered centroid fold + rounded-sim
    #                          re-rank with doc_id tie-break
    #   dedup_winnow         — exact integer overlap counts on md5
    #                          fingerprints, rounded at the edge
    "bm25_prf_hybrid",
    "dedup_winnow",
    #   token_freq_sketch    — pure integer CMS cells over a portable hash
    #   token_ngram_novelty  — integer first-occurrence window counts
    #   quality_classifier   — per-row projection, rounded logit
    "token_freq_sketch",
    "token_ngram_novelty",
    "quality_classifier",
    #   pmi_collocations     — DECIMAL-combined rounded-ln terms with a
    #                          total (p9, x, y) TakeOrdered preference
    #   tfidf_topk_terms     — DECIMAL tf·idf scores, word tie-break ranks
    #   bpe_train            — integer pair counts + total argmax preference
    #                          through an iterative driver-synced loop
    "pmi_collocations",
    "tfidf_topk_terms",
    "bpe_train",
    #   dedup_graph_pagerank — iterative DECIMAL-summed rank updates over
    #                          the checkpointed edge list
    "dedup_graph_pagerank",
    #   token_entropy        — DECIMAL-summed rounded c*ln(c) terms
    #   source_zipf_slope    — DECIMAL regression sums, total rank order
    #   events_markov_transitions — exact counts, total (ts, event_id) order
    "token_entropy",
    "source_zipf_slope",
    "events_markov_transitions",
    #   quality_weighted_sample — portable-hash coin vs 9-dp score
    #   budget_curation      — DECIMAL-ordered rank + integer cumsum cut
    "quality_weighted_sample",
    "budget_curation",
    #   curation_pipeline    — staged composition: md5 windows, survivor-
    #                          filtered components, broadcast gram index
    "curation_pipeline",
    #   bpe_apply            — memoized merge replay + integer subword sums
    "bpe_apply",
    #   dedup_incremental    — md5 probe + best-partner window tie-break
    "dedup_incremental",
]


def _run_at(spark, sf_dir, name, partitions):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        return [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
@pytest.mark.slow
def test_result_invariant_under_shuffle_parallelism(name, spark, sf_dir):
    lo = _run_at(spark, sf_dir, name, 3)
    hi = _run_at(spark, sf_dir, name, 48)
    assert lo == hi, f"{name}: result depends on shuffle partition count"
