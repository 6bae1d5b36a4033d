"""Third-wave lexical/tokenizer operators: PMI collocations, per-source
TF-IDF terms, distributed BPE merge training, and a continuously-maintained
count-min sketch.

These extend the LLM-pipeline surface (builder-brief mandate; the reference
engine has no curation operators — see SURVEY.md §2 note). Same design rules
as :mod:`.llm` / :mod:`.corpus`: every operator is a DataFrame plan,
expressions stay JVM-side, and every float that crosses an engine boundary
follows the round-then-DECIMAL determinism convention of ``unigram_logprob``.

100 TB shapes, per operator:

- ``pmi_collocations``: one bigram aggregate + one unigram aggregate (both
  map-side combined, keyed by gram/word — skew bounded by vocabulary, not
  documents), two vocab-keyed joins, one TakeOrdered. No corpus-sized join:
  everything after the two aggregates is vocabulary-sized.
- ``tfidf_topk_terms``: tf is a (source, word) aggregate, df a (word)
  re-aggregate of the per-doc distinct — the corpus is scanned once via the
  shared token cache; the rank window rides the (source) partitioning of
  the tf aggregate's own output.
- ``bpe_train``: the ONLY corpus-scale shuffle is the initial word-count
  aggregate (map-side combined; Heaps' law bounds the result to the
  vocabulary). Each ROUND then shuffles the VOCABULARY table (pair
  re-aggregate), syncs one bounded candidate page to the driver, and
  applies the longest provably-sequential-exact merge BATCH as one
  composed fold (Sennrich et al. 2016 semantics, bit-identical output;
  see _bpe_select_batch for the non-interaction proof). State between
  rounds is a lazily-localCheckpoint()ed vocab-sized table, so plan
  depth stays O(1) and a round costs one job — jobs ≈ merges/|batch|,
  the decisive scale factor at production vocab sizes where ~50k
  sequential driver-scheduled jobs would dominate wall-clock.
- ``streaming_token_freq_sketch``: the sketch is MERGEABLE, so the
  continuous form is a native JVM streaming aggregation — per-trigger
  partial (d, col) cells merged into update-mode state bounded by d·w
  cells regardless of stream volume; nothing enters Python.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._registry import query
from .corpus import _CMS_HASH, _SQL_CMS_PROBES, CMS_D, CMS_PROBES, CMS_W
from .llm import SQL_WORDS, TOPK_K, tokenized_docs

# ---------------------------------------------------------------------------
# L1. PMI collocations — top bigrams by pointwise mutual information
#     (Church & Hanks 1990; the standard phrase-mining / tokenizer-seeding
#     diagnostic: high-PMI pairs are multi-word units worth fusing)
# ---------------------------------------------------------------------------
PMI_MIN_COUNT = 5  # df floor: PMI of rare pairs is noise (classic guard)
PMI_TOPK = 50


@query(
    "pmi_collocations",
    oracle=f"""
    WITH w AS (SELECT {SQL_WORDS} AS ws FROM documents),
    uni AS (SELECT unnest(ws) AS word FROM w),
    uc AS (SELECT word, COUNT(*) AS c FROM uni GROUP BY word),
    nu AS (SELECT COUNT(*) AS n FROM uni),
    bi AS (SELECT ws[i] AS x, ws[i+1] AS y
           FROM w CROSS JOIN unnest(range(1, len(ws))) AS t(i)
           WHERE len(ws) >= 2),
    bc AS (SELECT x, y, COUNT(*) AS c_xy FROM bi GROUP BY x, y
           HAVING COUNT(*) >= {PMI_MIN_COUNT}),
    nb AS (SELECT COUNT(*) AS n FROM bi),
    sc AS (SELECT bc.x, bc.y, bc.c_xy,
             CAST(ROUND(LN(bc.c_xy), 9) AS DECIMAL(28,9))
             - CAST(ROUND(LN(cx.c), 9) AS DECIMAL(28,9))
             - CAST(ROUND(LN(cy.c), 9) AS DECIMAL(28,9))
             + 2 * CAST(ROUND(LN((SELECT n FROM nu)), 9) AS DECIMAL(28,9))
             - CAST(ROUND(LN((SELECT n FROM nb)), 9) AS DECIMAL(28,9)) AS p9
           FROM bc JOIN uc cx ON bc.x = cx.word
                   JOIN uc cy ON bc.y = cy.word)
    SELECT x, y, c_xy, ROUND(CAST(p9 AS DOUBLE), 6) AS pmi
    FROM sc ORDER BY p9 DESC, x, y LIMIT {PMI_TOPK}
    """,
)
def pmi_collocations(spark, sf_dir):
    """Top-{k} word bigrams by PMI = ln(p(x,y) / (p(x)·p(y))) with p(x,y)
    over the bigram space and p(x) over the unigram space:
    pmi = ln c_xy − ln c_x − ln c_y + 2·ln N_uni − ln N_bi.

    Numeric determinism: each ln is rounded to 9 decimals and the five
    terms combine in DECIMAL(28,9) — exact arithmetic, so ordering and
    values are bit-identical across engines and parallelism (the
    unigram_logprob convention). The min-count floor ({m}) keeps the
    scored set vocabulary-sized and is applied INSIDE the bigram
    aggregate (HAVING) — nothing rare survives the shuffle boundary.

    Scale: two map-side-combined aggregates over the shared token cache,
    two vocabulary-keyed joins, one TakeOrdered({k}). Skew is bounded by
    the hottest vocabulary word, not by any document or source.""".format(
        k=PMI_TOPK, m=PMI_MIN_COUNT
    )
    t = tokenized_docs(spark, sf_dir)
    uni = t.select(F.explode("ws").alias("word"))
    uc = uni.groupBy("word").agg(F.count("*").alias("c"))
    nu = uni.agg(F.count("*").alias("n"))
    bi = t.filter(F.expr("size(ws) >= 2")).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 2), "
                "i -> struct(ws[i] AS x, ws[i+1] AS y))"
            )
        ).alias("p")
    ).select("p.x", "p.y")
    bc = (
        bi.groupBy("x", "y")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= PMI_MIN_COUNT)
    )
    nb = bi.agg(F.count("*").alias("n"))

    def ln9(col):
        return F.round(F.log(col), 9).cast("decimal(28,9)")

    p9 = (
        ln9(F.col("c_xy"))
        - ln9(F.col("cx"))
        - ln9(F.col("cy"))
        + F.lit(2) * ln9(F.col("n_uni"))
        - ln9(F.col("n_bi"))
    )
    sc = (
        bc.join(uc.withColumnRenamed("c", "cx"), bc.x == uc.word)
        .drop("word")
        .join(uc.withColumnRenamed("c", "cy").withColumnRenamed("word", "w2"),
              F.col("y") == F.col("w2"))
        .drop("w2")
        .crossJoin(F.broadcast(nu.withColumnRenamed("n", "n_uni")))
        .crossJoin(F.broadcast(nb.withColumnRenamed("n", "n_bi")))
        .withColumn("p9", p9)
    )
    return (
        sc.orderBy(F.desc("p9"), "x", "y")
        .limit(PMI_TOPK)
        .select("x", "y", "c_xy", F.round(F.col("p9").cast("double"), 6).alias("pmi"))
    )


# ---------------------------------------------------------------------------
# L2. per-source TF-IDF top terms — "what is this source about":
#     the mixture-audit companion to source_kl_divergence (which says HOW FAR
#     a source sits from the corpus; this says WHICH terms carry it)
# ---------------------------------------------------------------------------
TFIDF_TOPK = 5


@query(
    "tfidf_topk_terms",
    oracle=f"""
    WITH w AS (SELECT d.doc_id, d.source, unnest({SQL_WORDS}) AS word
               FROM documents d),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    tf AS (SELECT source, word, COUNT(*) AS tf FROM w GROUP BY source, word),
    dfq AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY word),
    sc AS (SELECT tf.source, tf.word, tf.tf,
             tf.tf * (CAST(ROUND(LN((SELECT n_docs FROM nd)), 9)
                           AS DECIMAL(28,9))
                      - CAST(ROUND(LN(dfq.df), 9) AS DECIMAL(28,9))) AS s9
           FROM tf JOIN dfq USING (word)),
    rk AS (SELECT source, word, tf, s9,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY s9 DESC, word) AS rnk
           FROM sc)
    SELECT source, CAST(rnk AS BIGINT) AS rnk, word, tf,
           ROUND(CAST(s9 AS DOUBLE), 6) AS tfidf
    FROM rk WHERE rnk <= {TFIDF_TOPK} ORDER BY source, rnk
    """,
)
def tfidf_topk_terms(spark, sf_dir):
    """Top-{k} terms per source by tf·idf, tf = in-source occurrences,
    idf = ln(N_docs/df) with df = corpus-wide document frequency. The
    score is tf · (round(ln N,9) − round(ln df,9)) carried in
    DECIMAL(28,9) — exact, order-independent, engine-identical (ties
    break on the word itself, so ranks are total and stable).

    Scale: the shared token cache is scanned once; tf is a
    (source, word) map-side-combined aggregate, df re-aggregates the
    per-(doc, word) distinct — both vocabulary-keyed. The rank window
    partitions by source over the tf aggregate's own hash partitioning
    (source ⊂ (source, word) ⇒ no extra exchange beyond the window's
    re-key), and output is |sources|·{k} rows.""".format(k=TFIDF_TOPK)
    t = tokenized_docs(spark, sf_dir)
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = t.join(docs, "doc_id").select(
        "doc_id", "source", F.explode("ws").alias("word")
    )
    nd = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    tf = w.groupBy("source", "word").agg(F.count("*").alias("tf"))
    dfq = (
        w.select("doc_id", "word")
        .distinct()
        .groupBy("word")
        .agg(F.count("*").alias("df"))
    )
    s9 = F.col("tf") * (
        F.round(F.log("n_docs"), 9).cast("decimal(28,9)")
        - F.round(F.log("df"), 9).cast("decimal(28,9)")
    )
    sc = (
        tf.join(dfq, "word")
        .crossJoin(F.broadcast(nd))
        .withColumn("s9", s9)
    )
    rk = sc.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.desc("s9"), "word")
        ),
    )
    return (
        rk.filter(F.col("rnk") <= TFIDF_TOPK)
        .select(
            "source",
            F.col("rnk").cast("long").alias("rnk"),
            "word",
            "tf",
            F.round(F.col("s9").cast("double"), 6).alias("tfidf"),
        )
        .orderBy("source", "rnk")
    )


# ---------------------------------------------------------------------------
# L3. distributed BPE merge training — the tokenizer-training staple
#     (Sennrich et al. 2016). Rows-only: the merge loop is inherently
#     iterative (each merge depends on the previous), so no single ANSI-SQL
#     statement expresses it; exactness is pinned by a pure-Python parity
#     test over the identical word-count table (tests/test_lexical_ops.py).
# ---------------------------------------------------------------------------
BPE_MERGES = 24
_BPE_EOW = "</w>"


def _bpe_merge_expr(left: str, right: str, src: str = "syms") -> str:
    """SQL fold applying ONE merge rule left-to-right, greedy,
    non-overlapping — exactly the reference algorithm's scan: after a
    merge the fused symbol becomes the comparison context, and since
    ``left`` can never equal ``left+right`` a fused symbol never
    immediately re-merges, matching the skip-two semantics. ``src`` lets
    a batch of rules compose as nested folds in one expression (each rule
    references its predecessor's output exactly once, so the composed
    tree grows LINEARLY with the batch size — unlike cross-iteration
    projection collapse, which was the round-8 stringification OOM)."""
    merged = left + right
    return (
        f"aggregate({src}, CAST(array() AS array<string>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{left}' "
        f"AND s = '{right}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}')) "
        "ELSE concat(acc, array(s)) END)"
    )


_BPE_MEMO: dict = {}

# Ranked candidates fetched per round — the ceiling on one round's batch.
_BPE_CAND_K = 64
# Rounds the last _bpe_merges run took (set for the job-count pin in
# tests/test_lexical_ops.py; production interest: jobs ~= merges / batch).
_BPE_LAST_ROUNDS = 0


def _bpe_pair_counts(cur):
    """(l, r, c): corpus-weighted adjacent-pair counts over the current
    symbol table — the Sennrich get_stats aggregate, map-side combined."""
    return (
        cur.filter(F.expr("size(syms) >= 2"))
        .select(
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2), "
                    "i -> struct(syms[i] AS l, syms[i+1] AS r))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("n").alias("c"))
    )


def _bpe_select_batch(cur, max_n: int) -> list[tuple[str, str, int]]:
    """One pair-count pass → the longest rank-prefix of merges PROVABLY
    identical to applying them one recount at a time (so batching changes
    the job count, never the merge table). Candidate j (rank order:
    c desc, l, r) is accepted only if, for every already-accepted i:

    - ``l_j != r_i`` and ``r_j != l_i``: merge i only destroys occurrences
      of pairs of the form (x, l_i), (r_i, y) or (l_i, r_i) — the greedy
      fold consumes an l_i only when r_i follows and vice versa — so these
      two checks make c_j exact after merge i runs;
    - ``c_j > B_i`` where ``B_i = max(max_x c(x, l_i), max_y c(r_i, y))``:
      every occurrence of a NEW pair (x, m_i) / (m_i, y) maps 1:1 onto a
      destroyed occurrence of (x, l_i) / (r_i, y), so B_i bounds every
      pair merge i can create; strictly below c_j, no new pair can out-rank
      candidate j (and m_i is fresh, see below, so no lex tie is possible);
    - ``m_j`` is FRESH: not an existing adjacent symbol (m_in_vocab, from
      the pair table's own symbol set) and not an earlier batch member's
      fused symbol — a colliding m would silently add occurrences to
      existing pairs, breaking count exactness. (l_j/r_j = m_i needs no
      check: they come from the pre-batch table, and m_i is fresh.)

    Everything ranked above an accepted candidate is itself accepted (the
    selection stops at the first rejection), and a fully-applied rule
    leaves zero (l_i, r_i) adjacencies, so after the batch the true
    sequential argmax at each step is exactly the next batch member with
    exactly the recorded count. Symbols with NO adjacency anywhere are
    absent from the pair table and thus from the freshness check — a
    collision with one is harmless, since it contributes no pair counts.

    One collect of ≤ K rows per round; the pair table is persisted for the
    round (it feeds the top-k, the two per-symbol maxima and the symbol
    set) and unpersisted before the fold runs."""
    # aggregated (l, r, c) pair counts — bounded by distinct adjacencies, a
    # tiny fraction of the corpus; read 4× within the round (top-k, two
    # per-symbol maxima, symbol set) → resident MEMORY_AND_DISK is correct
    # here, unlike the corpus-sized DISK_ONLY sites (llm.persist_for_self_join)
    from pyspark import StorageLevel

    pc = _bpe_pair_counts(cur).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        topk = pc.orderBy(F.desc("c"), "l", "r").limit(_BPE_CAND_K)
        rmax = pc.groupBy("r").agg(F.max("c").alias("rm"))  # pairs ending in s
        lmax = pc.groupBy("l").agg(F.max("c").alias("lm"))  # pairs starting with s
        vocab = (
            pc.select("l").union(pc.select("r")).distinct()
            .withColumnRenamed("l", "sym")
            .withColumn("m_in_vocab", F.lit(True))
        )
        cand = (
            topk.join(rmax.withColumnRenamed("r", "l"), "l", "left")
            .join(lmax.withColumnRenamed("l", "r"), "r", "left")
            .join(vocab, F.concat("l", "r") == F.col("sym"), "left")
            .select(
                "l", "r", "c",
                F.coalesce("rm", F.lit(0)).alias("rm"),
                F.coalesce("lm", F.lit(0)).alias("lm"),
                F.coalesce("m_in_vocab", F.lit(False)).alias("m_in_vocab"),
            )
            .orderBy(F.desc("c"), "l", "r")
            .collect()  # bounded: at most _BPE_CAND_K rows per round
        )
    finally:
        pc.unpersist()
    accepted: list[tuple[str, str, int]] = []
    bounds: list[int] = []
    fused: set[str] = set()
    for row in cand:
        l, r, c = row["l"], row["r"], int(row["c"])
        if accepted and (
            row["m_in_vocab"]
            or (l + r) in fused
            or any(
                l == ra or r == la or c <= b
                for (la, ra, _), b in zip(accepted, bounds)
            )
        ):
            break
        accepted.append((l, r, c))
        bounds.append(max(int(row["rm"]), int(row["lm"])))
        fused.add(l + r)
        if len(accepted) >= max_n or row["m_in_vocab"]:
            # the round's argmax is ALWAYS applied (sequential does too),
            # but a colliding fused symbol poisons every count bound for
            # later candidates — stop the batch at it
            break
    return accepted


def _bpe_init_syms():
    return F.expr(
        "concat(transform(sequence(1, length(word)), "
        f"i -> substring(word, i, 1)), array('{_BPE_EOW}'))"
    )


def _bpe_merges(spark, sf_dir) -> tuple:
    """(merges, vocab_syms): the trained merge list [(rank, left, right,
    merged, pair_count)] AND the fully-merged vocabulary symbol table
    (word, n, syms), memoized per (session, dataset) — bpe_train renders
    the list, bpe_apply joins the table; neither replays the fold."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BPE_MEMO.get(key)
    if hit is not None:
        return hit
    t = tokenized_docs(spark, sf_dir)
    wc = (
        t.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    init = wc.select("word", "n", _bpe_init_syms().alias("syms"))
    # localCheckpoint = REPLACE the logical plan with a (checkpointed) RDD:
    # cuts both recompute lineage and the exponential projection-collapsed
    # fold expression (see bpe_train docstring). LAZY on purpose — the next
    # iteration's pair-count action materializes it, so each merge costs
    # one Spark job instead of two (measured 14.0 s -> 6.6 s at sf0.1).
    merges, cur = _bpe_train_loop(init, BPE_MERGES)
    for stale in [k for k in _BPE_MEMO if k[0] == key[0] and k != key]:
        _BPE_MEMO.pop(stale)
    hit = (merges, cur)
    _BPE_MEMO[key] = hit
    return hit


def _bpe_train_loop(init, n_merges: int) -> tuple:
    """The batched Sennrich loop over an (word, n, syms) table: per round,
    one bounded collect picks the longest sequential-exact merge batch
    (see _bpe_select_batch) and ONE composed fold applies it — one job per
    ROUND instead of one per merge (at production vocab sizes the
    driver-scheduled job count is the bottleneck: ~50k sequential jobs →
    ~50k/|batch|). Returns (merges, final symbol table)."""
    cur = init.localCheckpoint(eager=False)
    merges: list[tuple] = []
    rounds = 0
    while len(merges) < n_merges:
        batch = _bpe_select_batch(cur, n_merges - len(merges))
        if not batch:
            break
        rounds += 1
        fold = "syms"
        for l, r, c in batch:
            merges.append((len(merges) + 1, l, r, l + r, c))
            fold = _bpe_merge_expr(l, r, src=fold)
        cur = cur.withColumn("syms", F.expr(fold)).localCheckpoint(eager=False)
    global _BPE_LAST_ROUNDS
    _BPE_LAST_ROUNDS = rounds
    return merges, cur


@query("bpe_train")
def bpe_train(spark, sf_dir):
    """Byte-pair-encoding merge-table training over the corpus vocabulary:
    {m} merge rules, each the most frequent adjacent symbol pair (count
    desc, then lexicographic (left, right) — a total, deterministic
    preference), applied greedily left-to-right before the next count.
    Pair counts follow the reference implementation: adjacent positions,
    overlapping occurrences counted ("aaa" yields (a,a) twice), weighted
    by word frequency; words end with the '{eow}' terminator so
    end-of-word fusions are learnable.

    Scale: the corpus is touched ONCE (word-count aggregate, map-side
    combined, output bounded by the vocabulary — Heaps' law). Every
    round after that shuffles only the vocabulary table: one pair
    re-aggregate plus one driver-synced ≤{k}-row candidate page, from
    which the longest PROVABLY-sequential-exact batch of merges is chosen
    and applied as one composed fold (see _bpe_select_batch — batching
    divides the driver-scheduled job count, the real bottleneck at
    production vocab sizes, without changing a single output row). The
    symbol table is localCheckpoint()ed each round (LAZILY — the next
    pair-count action materializes it, one job per round). The checkpoint
    itself is REQUIRED, not a nicety: Catalyst's projection collapse
    inlines each merge fold into the next, growing the expression tree
    exponentially with the merge count (the same measured failure mode as
    the minhash 128× re-evaluation in streaming_dedup_minhash; 24 stacked
    folds OOM the driver on plan *stringification* alone). On a real
    cluster this maps to reliable-storage checkpointing of a
    vocabulary-sized table per merge — the standard iterative-Spark shape.""".format(
        m=BPE_MERGES, eow=_BPE_EOW, k=_BPE_CAND_K
    )
    merges, _ = _bpe_merges(spark, sf_dir)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long"
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# L4. continuously-maintained count-min sketch — the streaming form of
#     token_freq_sketch. The sketch is mergeable, so this is a NATIVE JVM
#     streaming aggregation (update mode): per-trigger partial cells merge
#     into state bounded by d·w cells whatever the stream volume. After the
#     bounded replay the state equals the batch sketch exactly, so the
#     oracle is the batch query's SQL verbatim.
# ---------------------------------------------------------------------------
STREAM_CMS_ORACLE = f"""
    WITH tok AS (SELECT unnest({SQL_WORDS}) AS word FROM documents),
    ingest AS (SELECT word, d FROM tok CROSS JOIN (
                 SELECT unnest(range(0, {CMS_D})) AS d)),
    cells AS (SELECT d,
                     md5_number_lower(word || '|' || CAST(d AS VARCHAR))
                       % {CMS_W} AS col,
                     COUNT(*) AS c
              FROM ingest GROUP BY 1, 2),
    probes(word) AS (VALUES {_SQL_CMS_PROBES}),
    pcell AS (SELECT p.word, dd.d,
                     md5_number_lower(p.word || '|' || CAST(dd.d AS VARCHAR))
                       % {CMS_W} AS col
              FROM probes p CROSS JOIN (
                SELECT unnest(range(0, {CMS_D})) AS d) dd)
    SELECT pc.word, CAST(MIN(COALESCE(ce.c, 0)) AS BIGINT) AS est_count
    FROM pcell pc LEFT JOIN cells ce ON ce.d = pc.d AND ce.col = pc.col
    GROUP BY pc.word ORDER BY pc.word
"""


@query("streaming_token_freq_sketch", oracle=STREAM_CMS_ORACLE)
def streaming_token_freq_sketch(spark, sf_dir):
    """token_freq_sketch maintained continuously: documents replay in 4
    ordered chunks; tokens explode to (d, col) increments and a native
    update-mode streaming SUM holds the sketch — state is exactly the
    d×w cell matrix (≤{cells} longs) regardless of how much text has
    streamed, the textbook mergeable-summary argument (Cormode &
    Muthukrishnan 2005). No Python anywhere: tokenize/hash/aggregate are
    all Catalyst expressions, so the per-trigger cost is a JVM hash
    re-aggregate of touched cells.

    The memory sink accumulates update-mode emissions; counts per cell
    are monotone non-decreasing, so latest == MAX — the final probe
    estimate takes min-over-rows of that, matching the batch sketch
    cell-for-cell (hence the verbatim oracle).""".format(cells=CMS_D * CMS_W)
    from .streaming import _run_to_memory, _staged_table_stream

    raw = _staged_table_stream(
        spark, sf_dir, "documents", "doc_id",
        "doc_id bigint, text string", n_files=4,
    )
    from .llm import WORDS

    tok = raw.select(F.explode(F.expr(WORDS)).alias("word"))
    ingest = tok.select(
        "word", F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("d")
    )
    col = (
        F.expr(_CMS_HASH.format(key="concat(word, '|', CAST(d AS STRING))"))
        % CMS_W
    )
    cells = (
        ingest.select("d", col.alias("col"))
        .groupBy("d", "col")
        .agg(F.count("*").alias("c"))
    )
    out = _run_to_memory(cells, "update")
    latest = out.groupBy("d", "col").agg(F.max("c").alias("c"))
    probes = spark.createDataFrame([(w,) for w in CMS_PROBES], "word string")
    pcell = probes.join(
        spark.range(CMS_D).select(F.col("id").cast("int").alias("d"))
    ).select(
        "word",
        "d",
        (
            F.expr(_CMS_HASH.format(key="concat(word, '|', CAST(d AS STRING))"))
            % CMS_W
        ).alias("col"),
    )
    est = (
        F.broadcast(pcell)
        .join(latest, ["d", "col"], "left")
        .groupBy("word")
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est_count")
        )
    )
    return est.orderBy("word")


# ---------------------------------------------------------------------------
# L5. per-document token entropy — lexical-diversity quality signal
#     (low entropy = repetitive/boilerplate even when doc_repetition's
#     trigram signal misses it; the Shannon counterpart to unigram_logprob's
#     corpus-model NLL)
# ---------------------------------------------------------------------------
@query(
    "token_entropy",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest({SQL_WORDS}) AS word FROM documents),
    c AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word),
    s AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct,
                 SUM(CAST(ROUND(LN(c), 9) * c AS DECIMAL(28,9))) AS sl
          FROM c GROUP BY doc_id)
    SELECT doc_id, CAST(n AS BIGINT) AS n_words,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           ROUND(ROUND(LN(n), 9) - CAST(sl AS DOUBLE) / n, 6) AS entropy
    FROM s ORDER BY doc_id
    """,
)
def token_entropy(spark, sf_dir):
    """Shannon entropy of each document's own unigram distribution:
    H = −Σ p ln p = ln n − (Σ c·ln c)/n over exact integer counts.
    Each c·ln c term is 9-dp-rounded then DECIMAL-summed (order-independent,
    engine-exact — the unigram_logprob convention).

    Scale: one (doc_id, word) aggregate + one doc_id re-aggregate — both
    map-side combined, skew bounded by a single document's vocabulary;
    nothing joins, nothing broadcasts."""
    t = tokenized_docs(spark, sf_dir)
    c = (
        t.select("doc_id", F.explode("ws").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    s = c.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_distinct"),
        F.sum(
            (F.round(F.log("c"), 9) * F.col("c")).cast("decimal(28,9)")
        ).alias("sl"),
    )
    return s.select(
        "doc_id",
        F.col("n").cast("long").alias("n_words"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(
            F.round(F.log("n"), 9) - F.col("sl").cast("double") / F.col("n"), 6
        ).alias("entropy"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L6. per-source Zipf slope — corpus-health fit: natural language sits near
#     slope −1 on the log-rank/log-frequency line; spam, templated, or
#     synthetic text bends it (Piantadosi 2014 review). The least-squares
#     slope comes from four order-independent sums, so it is fully
#     oracle-verifiable despite being a "regression".
# ---------------------------------------------------------------------------
ZIPF_MIN_VOCAB = 10


@query(
    "source_zipf_slope",
    oracle=f"""
    WITH w AS (SELECT d.source, unnest({SQL_WORDS}) AS word
               FROM documents d),
    c AS (SELECT source, word, COUNT(*) AS c FROM w GROUP BY source, word),
    r AS (SELECT source, c,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY c DESC, word) AS rnk
          FROM c),
    t AS (SELECT source,
                 ROUND(LN(rnk), 9) AS x, ROUND(LN(c), 9) AS y FROM r),
    s AS (SELECT source, COUNT(*) AS n,
                 SUM(CAST(x AS DECIMAL(28,9))) AS sx,
                 SUM(CAST(y AS DECIMAL(28,9))) AS sy,
                 SUM(CAST(ROUND(x * y, 9) AS DECIMAL(28,9))) AS sxy,
                 SUM(CAST(ROUND(x * x, 9) AS DECIMAL(28,9))) AS sxx
          FROM t GROUP BY source HAVING COUNT(*) >= {ZIPF_MIN_VOCAB})
    SELECT source, CAST(n AS BIGINT) AS n_vocab,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS zipf_slope
    FROM s ORDER BY source
    """,
)
def source_zipf_slope(spark, sf_dir):
    """Least-squares slope of ln(frequency) against ln(rank) per source —
    the Zipf diagnostic (natural text ≈ −1; templated/synthetic text
    deviates). Ranks are total (count desc, word tie-break), x/y are
    9-dp-rounded lns, their products re-rounded, and all four regression
    sums are DECIMAL — order-independent, engine-exact; the closed-form
    slope is then one fixed double expression.

    Scale: one (source, word) aggregate; the rank window runs over that
    aggregate's own source partitioning; the regression reduces to
    |sources| rows of four sums. Sources below {m} vocabulary words are
    dropped (a 2-point 'fit' is noise).""".format(m=ZIPF_MIN_VOCAB)
    from ..io import load_table

    t = tokenized_docs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    c = (
        t.join(docs, "doc_id")
        .select("source", F.explode("ws").alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("c"))
    )
    r = c.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.desc("c"), "word")
        ),
    )
    x = F.round(F.log("rnk"), 9)
    y = F.round(F.log("c"), 9)
    tt = r.select("source", x.alias("x"), y.alias("y"))
    s = (
        tt.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast("decimal(28,9)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(28,9)")).alias("sy"),
            F.sum(F.round(F.col("x") * F.col("y"), 9).cast("decimal(28,9)")).alias("sxy"),
            F.sum(F.round(F.col("x") * F.col("x"), 9).cast("decimal(28,9)")).alias("sxx"),
        )
        .filter(F.col("n") >= ZIPF_MIN_VOCAB)
    )
    slope = F.round(
        (
            F.col("n") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        / (
            F.col("n") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        ),
        6,
    )
    return s.select(
        "source", F.col("n").cast("long").alias("n_vocab"), slope.alias("zipf_slope")
    ).orderBy("source")


# ---------------------------------------------------------------------------
# L7. approximate-quantile sketch profile — the THIRD mergeable-sketch
#     family (HLL++ cardinality in profile_table_sketch, count-min
#     frequencies in token_freq_sketch, and now Greenwald-Khanna-style rank
#     sketches via Spark's approx_percentile). Rows-only: the sketch's cell
#     values depend on Spark's internal GK compaction, so there is no
#     cross-engine oracle — exactness is bounded instead (rank-error
#     tolerance against the EXACT histogram quantiles, tests).
# ---------------------------------------------------------------------------
PQS_ACCURACY = 10_000  # GK accuracy knob: rank error <= n / accuracy
# Scale proof (VERDICT r12 #1): a Greenwald-Khanna summary at accuracy a
# holds O(a·log(n/a)) tuples — LOGARITHMIC growth in rows, mergeable — so
# per-group state is bounded (~accuracy-sized) and wall linear at every
# corpus size; the knob trades rank error for summary size, never safety.


@query("profile_quantiles_sketch")
def profile_quantiles_sketch(spark, sf_dir):
    """Per-source p50/p90/p99 doc-length quantiles from a MERGEABLE rank
    sketch (`approx_percentile`, Greenwald-Khanna style): fixed ~O(accuracy)
    state per group however many rows stream through — the 100 TB/streaming
    path where even `profile_quantiles`' distinct-value histogram is too
    wide (e.g. float metrics). Rank error is bounded by n/{a}; the
    tolerance test pins observed values within one such rank step of the
    exact histogram quantiles.

    Scale: ONE map-side-combined aggregate (sketches merge associatively);
    output is |sources| rows. Same output schema as `profile_quantiles` so
    the two are drop-in swappable.""".format(a=PQS_ACCURACY)
    from ..io import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "source", F.length("text").cast("bigint").alias("v")
    )
    pct = F.expr(
        f"approx_percentile(v, array(0.5, 0.9, 0.99), {PQS_ACCURACY})"
    )
    return (
        d.groupBy("source")
        .agg(
            pct.alias("p"),
            F.max("v").alias("v_max"),
            F.count("*").alias("n_docs"),
        )
        .select(
            "source",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p90"),
            F.col("p")[2].alias("p99"),
            "v_max",
            F.col("n_docs").cast("long").alias("n_docs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# L8. continuous exact-kNN serving — `similarity_topk` as a stateful
#     streaming job: candidates arrive over 4 triggers, per-shard state
#     carries each query's running top-k (top-k is MERGEABLE: per-batch
#     local top-k then merge is exactly the global top-k), and the final
#     revision merges shards into the batch answer — oracle verbatim.
# ---------------------------------------------------------------------------
KNN_STREAM_SHARDS = 8


@query("streaming_similarity_topk", oracle=None)  # oracle wired below
def streaming_similarity_topk(spark, sf_dir):
    """Online exact-kNN: the broadcast-query-batch plan of similarity_topk
    run continuously. Candidates shard by vec_id % {s} (NO per-query row
    amplification — the corpus-side stream is never multiplied by the
    query count); each shard's state holds q → running top-{k}
    (ids + fp64 sims, ≤ q·{k} entries per shard however much streams in),
    and emits its current per-query top-{k} each trigger. The final read
    takes each shard's latest revision and re-ranks across shards — exact,
    because per-subset top-k then merge IS global top-k.

    Float parity: sims are computed with a CUMSUM-based sequential fp64
    dot product — numpy's pairwise/BLAS reductions sum in a different
    order than the Catalyst fold and DuckDB's list_dot_product, and the
    oracle comparison is exact after rounding, so evaluation order is
    load-bearing (cumsum along the vector axis reproduces left-to-right
    IEEE addition bit-for-bit).""".format(s=KNN_STREAM_SHARDS, k=TOPK_K)
    from .streaming import _run_to_memory

    res = knn_topk_stream(spark, sf_dir)
    if res is None:  # empty corpus -> no query batch, nothing to serve
        return spark.createDataFrame(
            [], "q_id long, nn_id long, sim double, rn int"
        )
    out = _run_to_memory(res, "update")
    return _knn_latest_topk(out)


def knn_topk_stream(spark, sf_dir, staging_dir=None):
    """The stateful per-shard top-k stream itself (pre-sink), or None for
    an empty corpus — exposed so the checkpoint-restart test can run it
    against a parquet sink in two phases with held-back staging slices;
    ``staging_dir`` pins the staged slices a restarted query's checkpoint
    references. State-bound note: keyed by a FIXED shard count with at most
    k candidates per (query, shard) — bounded by construction, no TTL
    needed (NoTimeout is correct here)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..io import load_table
    from .llm import TOPK_QUERY_IDS
    from .streaming import _staged_table_stream

    # bounded query-batch collection (the ann_* convention): TOPK_QUERY_IDS
    # vectors, fixed regardless of corpus size
    qrows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < TOPK_QUERY_IDS)
        .select("vec_id", "embedding")
        .collect()
    )
    if not qrows:
        return None
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)

    def seq_dot(A, B):
        # sequential left-to-right fp64 sum == Catalyst fold / DuckDB
        # list_dot_product (axis cumsum is the vectorized form of it)
        return np.cumsum(A * B, axis=-1)[..., -1]

    q_nrm = np.sqrt(seq_dot(Q, Q))

    raw = _staged_table_stream(
        spark, sf_dir, "embeddings", "vec_id",
        "vec_id bigint, embedding array<float>", n_files=4,
        staging_dir=staging_dir,
    )
    stream = raw.withColumn(
        "shard", (F.col("vec_id") % KNN_STREAM_SHARDS).cast("int")
    )

    def serve(key, pdfs, state):
        if state.exists:
            rev, ids, qs, sims = state.get
            top = {}
            for i, qq, s in zip(ids, qs, sims):
                top.setdefault(qq, []).append((s, i))
        else:
            rev, top = 0, {}
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            C = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c_nrm = np.sqrt(seq_dot(C, C))
            for qi in range(len(q_ids)):
                sims_q = seq_dot(Q[qi][None, :], C) / (q_nrm[qi] * c_nrm)
                cand = top.setdefault(int(q_ids[qi]), [])
                for cid, sv in zip(cids, sims_q):
                    if cid != q_ids[qi]:
                        cand.append((float(sv), int(cid)))
                # keep exactly top-k by (sim desc, nn_id asc)
                cand.sort(key=lambda t: (-t[0], t[1]))
                del cand[TOPK_K:]
        rev += 1
        ids, qs, sims, rows = [], [], [], []
        for qq, cand in top.items():
            for s, i in cand:
                ids.append(i), qs.append(qq), sims.append(s)
                rows.append((key[0], qq, i, s, rev))
        state.update((rev, ids, qs, sims))
        yield pd.DataFrame(
            rows, columns=["shard", "q_id", "nn_id", "sim", "rev"]
        )

    return stream.groupBy("shard").applyInPandasWithState(
        serve,
        "shard int, q_id long, nn_id long, sim double, rev long",
        "rev long, ids array<long>, qs array<long>, sims array<double>",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def _knn_latest_topk(out):
    """Each shard's LATEST revision, re-ranked across shards — exact
    because per-subset top-k then merge IS global top-k. Shared by the
    query (memory sink) and the restart test (parquet sink union)."""
    w = Window.partitionBy("shard")
    latest = out.withColumn("maxrev", F.max("rev").over(w)).filter(
        F.col("rev") == F.col("maxrev")
    )
    rw = Window.partitionBy("q_id").orderBy(F.desc("sim"), "nn_id")
    return (
        latest.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= TOPK_K)
        .select("q_id", "nn_id", F.round("sim", 6).alias("sim"), "rn")
        .orderBy("q_id", "rn")
    )


# the streaming form's oracle is the batch exact-kNN SQL verbatim
from ._registry import ORACLE as _OR  # noqa: E402

_OR["streaming_similarity_topk"] = _OR["similarity_topk"]


# ---------------------------------------------------------------------------
# L9. BPE application — the trained tokenizer's OTHER half: per-document
#     subword counts / fertility under the bpe_train merge table (the number
#     every token-budget and packing decision downstream actually consumes).
# ---------------------------------------------------------------------------
@query("bpe_apply")
def bpe_apply(spark, sf_dir):
    """Apply the {m} trained merges and report per-document subword counts
    and fertility (subwords per word — the tokenizer-quality metric: lower
    is better compression over this corpus). Rows-only like bpe_train (the
    merge replay is inherently iterative); exactness is pinned by a
    pure-Python application of the same merge table.

    Scale: training already folded the merges over the vocabulary table
    and the memo keeps the RESULT (word → final symbol array) — apply is
    ONE word-keyed join carrying each word's subword count onto the
    corpus explode plus a doc-keyed aggregate; zero merge stages replay,
    and the corpus is touched once here regardless of the merge count.""".format(
        m=BPE_MERGES
    )
    _, vocab_syms = _bpe_merges(spark, sf_dir)
    t = tokenized_docs(spark, sf_dir)
    sub = vocab_syms.select("word", F.size("syms").alias("n_sub"))
    w = t.select("doc_id", F.explode("ws").alias("word"))
    per = (
        w.join(sub, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subtokens"),
        )
    )
    return per.select(
        "doc_id",
        "n_words",
        "n_subtokens",
        F.round(F.col("n_subtokens").cast("double") / F.col("n_words"), 6).alias(
            "fertility"
        ),
    ).orderBy("doc_id")
