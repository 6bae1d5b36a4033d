"""Every oracle-backed declared query must match DuckDB at sf0.001.

This is the same gate the driver applies at sf0.01 (CORRECTNESS_r{N}.json);
running it per-commit at the smallest SF keeps the suite fast.
"""

from __future__ import annotations

import pytest

from flink_notebooks_spark.queries import ORACLE, QUERIES
from flink_notebooks_spark.testing import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.sql(ORACLE[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_all_queries_have_entries():
    # every registered query is either oracle-backed or explicitly rows-only
    rows_only = set(QUERIES) - set(ORACLE)
    assert rows_only == {
        "dedup_minhash_lsh",
        "streaming_dedup_minhash",
        "streaming_dedup_embedding",
        # TTL'd forms of the two above — same probabilistic candidates;
        # exact parity with the unbounded forms pinned in test_streaming3
        "streaming_dedup_minhash_ttl",
        "streaming_dedup_embedding_ttl",
        "dedup_embedding_clusters_lsh",
        "dedup_simhash",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_pq_topk",
        "ann_ivf_pq_topk",
        "knn_label_vote_ann",
        "profile_table_sketch",
        "multimodal_decode",
        "dedup_semantic",
        "embedding_pca",
        # iterative merge training: no single ANSI-SQL statement expresses
        # it; exactness pinned by the pure-Python parity test
        "bpe_train",
        "bpe_apply",
        # GK sketch values depend on Spark's internal compaction — bounded
        # by the rank-tolerance test instead of an oracle
        "profile_quantiles_sketch",
        "embedding_kmeans",
    }
