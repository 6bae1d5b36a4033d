"""Pipeline operators on EMPTY inputs — a 100 TB pipeline sees empty
partitions/shards constantly; operators must return empty results, not
throw (min/max over nothing, explode of nothing, GEMM with a zero side)."""

from __future__ import annotations

import pytest

from flink_notebooks_spark.queries import QUERIES

EMPTY_QUERIES = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_cosine_pairs",
    "similarity_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "knn_label_vote",
    "knn_label_vote_ann",
    "dedup_keep_best",
    "dedup_embedding_clusters_lsh",
    # profile_table_sketch is excluded like profile_table: a profile of an
    # empty table is one row per column (n=0), not zero rows
    "text_stats",
    "corpus_ngrams",
    "unigram_logprob",
    "doc_repetition",
    "lang_id",
    "token_count",
    "doc_fingerprint",
    "quality_filter",
    "dedup_materialize",
    "dedup_containment",
    "profile_quantiles",
    "sample_per_source",
    "streaming_dedup_minhash",
    "streaming_dedup_embedding",
    "multimodal_decode",
    "events_sessionize",
    "events_retention",
    "q27_cep_pattern",
    "q25_hop_window",
    "q26_cumulate_window",
    "bm25_topk",
    "bm25_prf_hybrid",
    "doc_chunk",
    "decontaminate_fuzzy",
    "token_length_histogram",
    "events_anomaly",
    "dedup_normalized",
    "dedup_winnow",
    "streaming_events_anomaly",
    "quality_classifier",
    "dedup_semantic",
    "embedding_pca",
    "embedding_kmeans",
    "token_ngram_novelty",
    "source_overlap_jaccard",
    "streaming_quality_filter",
    "streaming_events_retention",
    "pmi_collocations",
    "tfidf_topk_terms",
    # bpe_train: no pairs -> the merge loop exits on the first empty argmax
    "bpe_train",
    # empty pair graph -> n == 0 early return / no wedges
    "dedup_graph_pagerank",
    "dedup_graph_triangles",
    "token_entropy",
    "source_zipf_slope",
    "events_markov_transitions",
    "events_markov_transitions_stream",
    "quality_weighted_sample",
    "budget_curation",
    "curation_pipeline",
    "profile_quantiles_sketch",
    "streaming_budget_curation",
    "streaming_similarity_topk",
    "bpe_apply",
    "dedup_incremental",
    # streaming_token_freq_sketch excluded like token_freq_sketch: the probe
    # LEFT JOIN emits 13 zero-estimate rows on an empty corpus by contract
    # CMS probes on an empty corpus: every cell is empty -> 13 zero
    # estimates would still be emitted... no: the probe join is against an
    # empty cells table with COALESCE(0), so 13 rows of est 0 ARE emitted —
    # excluded here like profile_table (fixed-cardinality outputs)
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """A sf_dir whose documents/embeddings/events tables have 0 rows but the
    real schemas (taken from the sf0.001 fixtures)."""
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("sf_empty")
    for t in ("documents", "embeddings", "events"):
        tbl = pq.read_table(f"{src}/{t}.parquet")
        # slice(0,0) keeps the exact arrow schema (incl. timestamp[ns]),
        # version 2.6 writes it back as parquet TIMESTAMP(NANOS) like the
        # originals
        pq.write_table(tbl.slice(0, 0), f"{out}/{t}.parquet", version="2.6")
    return str(out)


@pytest.mark.parametrize("name", EMPTY_QUERIES)
@pytest.mark.slow
def test_query_on_empty_input_returns_empty(name, spark, empty_sf_dir):
    assert QUERIES[name](spark, empty_sf_dir).count() == 0
