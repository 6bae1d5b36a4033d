"""Leakage-safe splitting (queries/curation3.py): the guarantee under test
is structural — a near-dup pair can NEVER cross a split boundary when the
split hashes the cluster id, while the naive per-document split measurably
leaks on the same corpus."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_notebooks_spark.queries import QUERIES


@pytest.mark.slow
def test_safe_split_has_zero_cross_split_pairs(spark, sf_dir):
    from flink_notebooks_spark.queries.llm import jaccard_pairs_df

    assign = QUERIES["curation_split_leakage_safe"](spark, sf_dir)
    pairs = jaccard_pairs_df(spark, sf_dir).select("a", "b")
    sa = assign.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    sb = assign.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    crossing = (
        pairs.join(sa, "a").join(sb, "b").filter(F.col("sa") != F.col("sb"))
    )
    assert crossing.count() == 0  # the whole point of the operator


def test_naive_split_actually_leaks_on_this_corpus(spark, sf_dir):
    # the report counts cross-split near-dup pairs under the naive
    # per-document split — non-empty on the fixture, else the safe split
    # would be fixing a non-problem here and the previous test is vacuous
    rep = QUERIES["split_leakage_report"](spark, sf_dir)
    assert rep.agg(F.sum("n_pairs")).collect()[0][0] > 0


def test_cluster_maps_to_exactly_one_split(spark, sf_dir):
    assign = QUERIES["curation_split_leakage_safe"](spark, sf_dir)
    multi = (
        assign.groupBy("cluster")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert multi.count() == 0
    # and all three splits are populated (80/10/10 over enough clusters)
    assert assign.select("split").distinct().count() == 3
