"""Exactness pins for the lexical/tokenizer operators (queries/lexical.py).

The three oracle-backed entries (pmi_collocations, tfidf_topk_terms,
streaming_token_freq_sketch) are hash-compared against DuckDB by the
per-commit gate in test_queries_oracle.py; this file pins the rows-only
bpe_train against a pure-Python reference implementation of the exact same
algorithm, plus the fold-expression semantics the merge step relies on.
"""

from __future__ import annotations

import pytest


from collections import Counter

from flink_notebooks_spark.queries.lexical import (
    _BPE_EOW,
    _bpe_merge_expr,
    BPE_MERGES,
)


def _apply_merge(syms: list, l: str, r: str) -> list:
    """Reference greedy non-overlapping left-to-right merge (Sennrich) —
    the single reference implementation shared by the bpe_train and
    bpe_apply parity tests."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(word_counts: dict[str, int], n_merges: int) -> list[tuple]:
    """Reference BPE (Sennrich et al. 2016 get_stats/merge loop): pair
    counts over adjacent positions (overlapping occurrences counted),
    weighted by word frequency; argmax by (count desc, left, right);
    greedy non-overlapping left-to-right merge."""
    vocab = {tuple(list(w) + [_BPE_EOW]): n for w, n in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        stats: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += n
        if not stats:
            break
        (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, c))
        new_vocab = {}
        for syms, n in vocab.items():
            key = tuple(_apply_merge(list(syms), l, r))
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


@pytest.mark.slow
def test_bpe_train_matches_reference(spark, sf_dir, duck):
    rows = duck.execute(
        "SELECT word, COUNT(*) FROM (SELECT unnest("
        "regexp_extract_all(lower(text), '[a-z0-9]+')) AS word "
        "FROM documents) GROUP BY word"
    ).fetchall()
    expected = _ref_bpe(dict(rows), BPE_MERGES)

    from flink_notebooks_spark.queries import QUERIES

    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in QUERIES["bpe_train"](spark, sf_dir).collect()
    ]
    assert got == expected
    # the corpus is big enough that all requested merges materialize
    assert len(got) == BPE_MERGES


def test_merge_fold_is_greedy_left_to_right_nonoverlapping(spark):
    # "aaaa" with rule (a,a): greedy non-overlapping -> [aa, aa]; the fused
    # symbol must not re-merge with the following single 'a' of "aaa".
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a", "b"],)],
        "syms array<string>",
    )
    from pyspark.sql import functions as F

    out = [r[0] for r in df.select(F.expr(_bpe_merge_expr("a", "a"))).collect()]
    assert out == [["aa", "a"], ["aa", "aa"], ["b", "aa", "b"]]


def test_merge_fold_handles_multichar_and_eow(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(["ab", "c", _BPE_EOW],), (["c", "ab", "c"],)], "syms array<string>"
    )
    out = [r[0] for r in df.select(F.expr(_bpe_merge_expr("c", _BPE_EOW))).collect()]
    assert out == [["ab", "c" + _BPE_EOW], ["c", "ab", "c"]]


@pytest.mark.slow
def test_bpe_merge_parity_fuzz(spark):
    """The SQL fold and the reference scan must agree on ANY symbol
    sequence, including the adversarial shapes the fixture lacks (runs of
    one char, merged-symbol collisions, end-of-word fusions)."""
    from hypothesis import given, settings, strategies as st

    sym = st.sampled_from(["a", "b", "ab", "aa", _BPE_EOW])
    from pyspark.sql import functions as F

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.lists(sym, min_size=1, max_size=8), min_size=1, max_size=8),
        st.tuples(sym, sym),
    )
    def check(seqs, rule):
        l, r = rule

        def ref_merge(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        df = spark.createDataFrame([(s,) for s in seqs], "syms array<string>")
        got = [row[0] for row in df.select(F.expr(_bpe_merge_expr(l, r))).collect()]
        assert got == [ref_merge(s) for s in seqs]

    check()


def test_quantile_sketch_within_rank_tolerance(spark, sf_dir):
    """GK guarantee: each reported quantile's RANK is within n/accuracy of
    the target rank. With accuracy=10k and fixture groups of ~25-500 docs
    the allowed rank slack rounds to one position; assert each sketch value
    sits between the exact values one rank-step around the target."""
    from flink_notebooks_spark.queries import QUERIES

    exact = {
        r["source"]: r
        for r in QUERIES["profile_quantiles"](spark, sf_dir).collect()
    }
    import duckdb

    con = duckdb.connect()
    vals = {}
    for src_name, ln in con.execute(
        f"SELECT source, length(text) FROM '{sf_dir}/documents.parquet'"
    ).fetchall():
        vals.setdefault(src_name, []).append(ln)
    for r in QUERIES["profile_quantiles_sketch"](spark, sf_dir).collect():
        xs = sorted(vals[r["source"]])
        n = len(xs)
        assert r["n_docs"] == n and r["v_max"] == xs[-1] == exact[r["source"]]["v_max"]
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            import math

            target = math.ceil(q * n)
            slack = max(1, round(n / 10_000))
            lo = xs[max(0, target - 1 - slack)]
            hi = xs[min(n - 1, target - 1 + slack)]
            assert lo <= r[col] <= hi, (r["source"], col, r[col], lo, hi)


@pytest.mark.slow
def test_streaming_budget_admission_chunk_order_safe(spark, sf_dir, duck):
    """admit() must concat-then-sort ALL Arrow chunks before the cumsum:
    with 16-row Arrow batches every source group spans multiple chunks in
    arbitrary order, and a per-chunk cumsum would charge docs in chunk
    order, not doc_id order. The result must still equal the oracle's
    window-cumsum predicate exactly."""
    from flink_notebooks_spark.queries import ORACLE, QUERIES

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        got = [
            (r["source"], r["doc_id"], r["n_tokens"], r["cum_tokens"])
            for r in QUERIES["streaming_budget_curation"](spark, sf_dir).collect()
        ]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    want = [tuple(r) for r in duck.execute(ORACLE["streaming_budget_curation"]).fetchall()]
    assert got == want


@pytest.mark.slow
def test_streaming_markov_checkpoint_restart(spark, sf_dir, tmp_path):
    """Resume the Markov delta stream from its checkpoint: per-user
    last-type state must restore, no boundary transition may be lost or
    double-counted, and the summed sink deltas must equal the batch matrix.

    DETERMINISTIC split (no kill-timing race): phase 1 sees only the first
    2 of 4 staged files and runs availableNow to completion; the remaining
    files then appear and phase 2 resumes from the same checkpoint — the
    cross-phase transitions exist iff state restored."""
    from restart_harness import parquet_sink, two_phase_restart

    from flink_notebooks_spark.queries import QUERIES
    from flink_notebooks_spark.queries.corpus import markov_delta_stream

    sink = two_phase_restart(
        spark,
        tmp_path,
        lambda staging: markov_delta_stream(spark, sf_dir, staging_dir=staging),
        parquet_sink,
    )

    from pyspark.sql import functions as F

    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in spark.read.parquet(sink)
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    want = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in QUERIES["events_markov_transitions"](spark, sf_dir).collect()
    }
    assert got == want


def test_bpe_apply_matches_reference(spark, sf_dir, duck):
    """Per-doc subword counts under the trained merges must equal a pure
    Python application of the same merge table to every word."""
    from flink_notebooks_spark.queries import QUERIES
    from flink_notebooks_spark.queries.lexical import _bpe_merges

    merges, _ = _bpe_merges(spark, sf_dir)

    def apply_all(word):
        syms = list(word) + [_BPE_EOW]
        for _, l, r, _, _ in merges:
            syms = _apply_merge(syms, l, r)
        return len(syms)

    rows = duck.execute(
        "SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') "
        "FROM documents ORDER BY doc_id"
    ).fetchall()
    cache: dict[str, int] = {}
    want = {}
    for doc_id, ws in rows:
        if not ws:
            continue
        n_sub = 0
        for wd in ws:
            if wd not in cache:
                cache[wd] = apply_all(wd)
            n_sub += cache[wd]
        want[doc_id] = (len(ws), n_sub, round(n_sub / len(ws), 6))
    got = {
        r["doc_id"]: (r["n_words"], r["n_subtokens"], r["fertility"])
        for r in QUERIES["bpe_apply"](spark, sf_dir).collect()
    }
    assert got == want


@pytest.mark.slow
def test_bpe_batching_reduces_rounds(spark, sf_dir):
    """VERDICT r8 #2: one Spark job per merge serializes ~50k
    driver-scheduled jobs at production vocab sizes. The batched loop
    must cover the fixture's merges in strictly fewer rounds (observed:
    24 merges in ≤ half the rounds) while test_bpe_train_matches_reference
    separately pins that the merge table is bit-identical."""
    from flink_notebooks_spark.queries import QUERIES, lexical

    lexical._BPE_MEMO.clear()
    QUERIES["bpe_train"](spark, sf_dir).collect()
    assert 0 < lexical._BPE_LAST_ROUNDS <= BPE_MERGES // 2, (
        lexical._BPE_LAST_ROUNDS
    )


@pytest.mark.slow
def test_bpe_batched_loop_matches_sequential_fuzz(spark):
    """The batch selection must be EXACT on adversarial vocabularies —
    tiny alphabets force maximally-interacting top pairs (shared symbols,
    fused-symbol collisions like 'ab' already existing, self-pairs (a,a)),
    the shapes where an unsound batch rule would diverge from the
    sequential reference."""
    from hypothesis import given, settings, strategies as st

    from flink_notebooks_spark.queries.lexical import (
        _bpe_init_syms,
        _bpe_train_loop,
    )

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    from pyspark.sql import functions as F

    @settings(max_examples=12, deadline=None)
    @given(st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=10))
    def check(wc):
        want = _ref_bpe(wc, 8)
        init = spark.createDataFrame(
            list(wc.items()), "word string, n long"
        ).select("word", "n", _bpe_init_syms().alias("syms"))
        got, _ = _bpe_train_loop(init, 8)
        assert got == want, (wc, got, want)

    check()


@pytest.mark.slow
def test_streaming_budget_curation_checkpoint_restart(spark, sf_dir, tmp_path, duck):
    """VERDICT r8 #5: the admission stream's per-source spent-counter must
    survive a restart. Deterministic two-phase split (the markov pattern):
    phase 1 sees only the first 2 of 4 staged slices and runs availableNow
    to completion; the held-back slices then appear and phase 2 resumes
    from the same checkpoint. Budget admission is ORDER-SENSITIVE state —
    if the counter does not restore, phase 2 re-admits past the budget and
    the sink union diverges from the exact window-cumsum oracle."""
    from restart_harness import parquet_sink, two_phase_restart

    from flink_notebooks_spark.queries import ORACLE
    from flink_notebooks_spark.queries.corpus import budget_admission_stream

    sink = two_phase_restart(
        spark,
        tmp_path,
        lambda staging: budget_admission_stream(spark, sf_dir, staging_dir=staging),
        parquet_sink,
    )

    got = [
        tuple(r)
        for r in spark.read.parquet(sink)
        .select("source", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("source", "doc_id")
        .collect()
    ]
    want = [tuple(r) for r in duck.execute(ORACLE["streaming_budget_curation"]).fetchall()]
    assert got == want
    # the restart genuinely crossed state: phase 2 admitted nothing beyond
    # budget means some sources stopped mid-stream — sanity: row count > 0
    assert got


@pytest.mark.slow
def test_streaming_similarity_topk_checkpoint_restart(spark, sf_dir, tmp_path):
    """VERDICT r8 #5: the per-shard running-top-k state must survive a
    restart. Two-phase held-back replay; the stream is an UPDATE-mode
    stateful op, so each phase appends its emissions via foreachBatch and
    the final answer takes each shard's LATEST revision across the union.
    Revisions live in state — if state does not restore, phase-2 revisions
    restart below phase 1's and the merged top-k loses every phase-1
    candidate, diverging from the exact batch kNN."""
    from restart_harness import two_phase_restart

    from flink_notebooks_spark.queries import QUERIES
    from flink_notebooks_spark.queries.lexical import (
        _knn_latest_topk,
        knn_topk_stream,
    )

    def update_foreach_sink(df, sink, ck):
        # UPDATE-mode stateful op: append each phase's emissions, the
        # reader takes each shard's latest revision across the union
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
        lambda staging: knn_topk_stream(spark, sf_dir, staging_dir=staging),
        update_foreach_sink,
    )

    union = spark.read.parquet(sink)
    # revisions must be cumulative across the restart (state restored)
    from pyspark.sql import functions as F

    assert union.agg(F.max("rev")).collect()[0][0] >= 3
    got = [tuple(r) for r in _knn_latest_topk(union).collect()]
    want = [tuple(r) for r in QUERIES["similarity_topk"](spark, sf_dir).collect()]
    assert got == want


def test_cms_python_hash_matches_catalyst(spark):
    """corpus._cms_cols_py must be bit-identical to the _CMS_HASH Catalyst
    expression — an independent Python (hashlib) reimplementation of the
    portable md5-lower-64 convention the DuckDB oracle recomputes in SQL;
    one divergent cell silently shifts a probe estimate."""
    import random
    import string

    from pyspark.sql import functions as F

    from flink_notebooks_spark.queries.corpus import (
        _CMS_HASH,
        _cms_cols_py,
        CMS_D,
        CMS_PROBES,
        CMS_W,
    )

    rng = random.Random(1405)
    words = list(CMS_PROBES) + [
        "".join(rng.choices(string.ascii_lowercase + string.digits, k=rng.randint(1, 24)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string").join(
        spark.range(CMS_D).select(F.col("id").cast("int").alias("d"))
    )
    got = {
        (r["word"], r["d"]): r["col"]
        for r in df.select(
            "word",
            "d",
            (
                F.expr(_CMS_HASH.format(key="concat(word, '|', CAST(d AS STRING))"))
                % CMS_W
            ).cast("long").alias("col"),
        ).collect()
    }
    for w in words:
        cols = _cms_cols_py(w)
        for d in range(CMS_D):
            assert got[(w, d)] == cols[d], (w, d, got[(w, d)], cols[d])


@pytest.mark.slow
def test_streaming_cms_matches_batch_sketch(spark, sf_dir):
    """The streaming sketch (per-occurrence stateful cell COUNT) must equal
    the batch sketch (per-word pre-aggregate, then cell SUM of counts)
    estimate-for-estimate after a bounded replay — both reduce to the same
    D x W cell matrix, which is exactly the associativity claim the batch
    rewrite rests on."""
    from flink_notebooks_spark.queries import QUERIES

    batch = {
        r["word"]: r["est_count"]
        for r in QUERIES["token_freq_sketch"](spark, sf_dir).collect()
    }
    stream = {
        r["word"]: r["est_count"]
        for r in QUERIES["streaming_token_freq_sketch"](spark, sf_dir).collect()
    }
    assert stream == batch and len(batch) > 0
