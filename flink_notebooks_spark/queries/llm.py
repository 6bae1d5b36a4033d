"""LLM-training-data pipeline operators over ``documents`` / ``embeddings``.

These extend the reference's SQL surface (which has no such operators) with
the data-curation primitives a 100 TB corpus pipeline needs: exact and fuzzy
deduplication, vector similarity search, text analysis, and multimodal-column
plumbing. Design rules:

- Everything is a DataFrame → DataFrame plan. No ``collect()`` in any
  operator; candidate generation is always a *join* (inverted index, LSH
  band bucket, hash block), never an all-pairs driver loop.
- Expressions stay JVM-side (higher-order functions ``transform`` /
  ``aggregate`` / ``zip_with``, ``xxhash64``) so whole-stage codegen applies;
  Python/Arrow is used only where noted (LSH bucketing Pandas UDF).
- Float determinism: similarity thresholds are compared on identically
  constructed double expressions on both the Spark and DuckDB sides.

Fuzzy-dedup shingle unit: **word 5-grams** (5 consecutive lowercase tokens).
Character shingles would make every pair of English documents collide on
common fragments (" the ") and blow up the inverted-index join; 5-token
sequences are discriminative, keeping the join output proportional to true
near-duplicates — the property that makes this plan viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import load_table
from ._registry import dsum, query, sql_dsum

# ---------------------------------------------------------------------------
# shared text expressions (identical semantics mirrored in each oracle)
# ---------------------------------------------------------------------------

WORDS = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
# distinct word k-grams over a token array column; slice+array_join is 2
# interpreted calls per gram vs 5 try_element_at + concat (~2× faster), with
# identical output: docs shorter than k produce no grams
NGRAMS = (
    "IF(size({ws}) >= {k}, "
    "array_distinct(transform(sequence(1, size({ws}) - {k} + 1), "
    "g -> array_join(slice({ws}, g, {k}), ' '))), "
    "array())"
)

def persist_for_self_join(df: DataFrame) -> DataFrame:
    """Pin DISK_ONLY on caches that hold MULTIPLE rows per corpus document
    and are read back exactly once per join side (LSH bands: 32 rows/doc,
    SimHash blocks: 4 rows/doc, winnowing fingerprints: ~|doc|/W rows/doc,
    per-occurrence token tables: 1 row/token). At 100 TB these tables are
    corpus-sized or larger; the default MEMORY_AND_DISK level would flood
    executor storage memory — evicting the compact long-lived caches
    (token arrays, signatures, pair sets) that ARE worth keeping resident —
    for data each consumer streams through once. DISK_ONLY keeps the
    columnar batches serialized on local disk (still saving the recompute,
    which is the point of the persist) with zero storage-memory footprint;
    sequential disk scan bandwidth ≫ re-running the upstream shuffle/regex.
    tests/test_plans.py asserts the level on this exact code path."""
    from pyspark import StorageLevel

    return df.persist(StorageLevel.DISK_ONLY)


# DuckDB-side equivalents
SQL_WORDS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
SQL_SHINGLE_CTES = f"""
    w AS (SELECT doc_id, {SQL_WORDS} AS ws FROM documents),
    idx AS (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 4, 1) + 1)) AS g FROM w),
    sh AS (SELECT DISTINCT doc_id,
                  ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] || ' ' || ws[g+3] || ' ' || ws[g+4] AS s
           FROM idx WHERE ws[g+4] IS NOT NULL)
"""


def tokenized_docs(spark, sf_dir) -> DataFrame:
    """documents → (doc_id, ws array<string>), persisted.

    One regex pass shared by every text operator (jaccard, MinHash, SimHash —
    Spark's cache manager matches this plan subtree across separate queries
    in a session, so the corpus is tokenized once per dataset, not per op).

    The explicit partition count BEFORE the regex projection matters: the raw
    table may arrive as few (or one) file splits, and AQE's size-based
    coalescing would otherwise serialize this CPU-bound stage — bytes are a
    bad proxy for regex cost. An explicit-count exchange is exempt from AQE
    coalescing; the count scales with the cluster, not the data. The exchange
    also stops Catalyst's CollapseProject from inlining the regex into every
    downstream consumer (e.g. re-running it 128× inside MinHash — measured
    ~20× slowdown), and MEMORY_AND_DISK persistence spills rather than OOMs
    (token arrays ≪ raw corpus size).
    """
    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents")
    # 1× parallelism: one task wave. 2× measured 6× slower on the FIRST run
    # (cold-thread wave effects dominate at notebook scale) for zero
    # steady-state gain; the count still scales with the cluster.
    n = spark.sparkContext.defaultParallelism
    out = d.repartition(n, "doc_id").select("doc_id", F.expr(WORDS).alias("ws"))
    return out.persist(StorageLevel.MEMORY_AND_DISK)


def warm_shared_caches(spark, sf_dir) -> None:
    """Materialize the shared corpus caches (tokenized/shingled docs,
    verified jaccard pairs, cosine pairs, word-freq join, BM25 postings)
    for a session — the cold-start path a notebook pays before its first
    text/dedup query, and what the bench charges to ``shared_corpus_prep``.

    The six caches form a shallow DAG: ``tokenized_docs`` is the shared
    root; ``jaccard_pairs_df`` (which materializes ``shingled_docs``'s
    cache en route through the cache manager), ``cosine_pairs_df``
    (embeddings-rooted, independent), ``_word_freq_joined`` and
    ``_bm25_postings`` only share that root. Materializing the root once
    and then the four leaf DAGs CONCURRENTLY overlaps each job's
    driver-side planning/codegen with the others' execution — cold-start
    cost is dominated by first-materialization codegen (r15 decomposition:
    ~2/3), which a single driver thread serializes. Concurrent jobs on one
    SparkSession are the supported scheduler path, and the shared cached
    blocks are computed once regardless (block-level get-or-compute), so
    results and total work are unchanged — only the wall clock overlaps.
    """
    from concurrent.futures import ThreadPoolExecutor

    from .corpus import _bm25_postings  # lazy: corpus imports from llm

    def _mat(fn):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    _mat(tokenized_docs)
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [
            ex.submit(_mat, fn)
            for fn in (
                jaccard_pairs_df,
                cosine_pairs_df,
                _word_freq_joined,
                _bm25_postings,
            )
        ]
        for f in futs:
            f.result()


def shingled_docs(spark, sf_dir) -> DataFrame:
    """documents → (doc_id, shingles array<string>), persisted (referenced
    from ≥2 plan branches by every dedup operator: signature + verification,
    or the two sides of a self-join)."""
    from pyspark import StorageLevel

    t = tokenized_docs(spark, sf_dir)
    out = t.select("doc_id", F.expr(NGRAMS.format(ws="ws", k=5)).alias("shingles"))
    return out.persist(StorageLevel.MEMORY_AND_DISK)


# Candidate-generation document-frequency cap: a shingle occurring in more
# than this many documents is boilerplate (header/license/template text) and
# is dropped from the inverted index BEFORE the self-join — one hot shingle
# with df=d would otherwise emit d² join rows on a single reducer, the one
# quadratic failure mode of inverted-index dedup at 100 TB. Verification
# still scores candidate pairs on their FULL shingle sets, so reported
# jaccard values are exact; only pairs whose overlap is pure boilerplate
# (true jaccard ≥0.8 with every shared shingle in >CAP docs) can be missed.
JACCARD_DF_CAP = 64


_JACCARD_CAND_MEMO: dict = {}


def _shingle_candidates(spark, sf_dir):
    """(docs, candidates): the shingled corpus plus the capped inverted-index
    candidate pair set, PERSISTED + memoized per (session, dataset) — the
    jaccard and containment operators score the same candidates, so the
    self-join runs once, not once per operator."""
    from pyspark import StorageLevel

    docs = shingled_docs(spark, sf_dir).filter(F.size("shingles") > 0)
    key = (spark.sparkContext.applicationId, sf_dir)
    cand = _JACCARD_CAND_MEMO.get(key)
    if cand is None:
        sh = docs.select("doc_id", F.explode("shingles").alias("s")).select(
            "doc_id", F.xxhash64("s").alias("h")
        )
        cand = _jaccard_candidates(sh).persist(StorageLevel.MEMORY_AND_DISK)
        _memo_put(_JACCARD_CAND_MEMO, key, cand)
    return docs, cand


def _jaccard_candidates(sh: DataFrame, cap: int = JACCARD_DF_CAP) -> DataFrame:
    """(doc_id, h) inverted index → distinct candidate pairs (a < b), with
    shingles of document frequency > cap excluded from the index."""
    rare = sh.join(
        sh.groupBy("h").agg(F.count("*").alias("df")).filter(F.col("df") <= cap).select("h"),
        "h",
    )
    a, b = rare.alias("a"), rare.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )


def _verify_pairs(docs: DataFrame, cand: DataFrame, threshold: float) -> DataFrame:
    """Exact jaccard over full shingle arrays for the (small) candidate set —
    shared by the inverted-index and MinHash-LSH paths."""
    sa = docs.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sha"))
    sb = docs.select(F.col("doc_id").alias("b"), F.col("shingles").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    jac = inter.cast("double") / (F.size("sha") + F.size("shb") - inter)
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .filter(jac >= threshold)
        .select("a", "b", F.round(jac, 6).alias("jac"))
        .orderBy("a", "b")
    )


# ---------------------------------------------------------------------------
# D1. exact dedup — hash groupBy (scales: one shuffle keyed by content hash)
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS dups
    FROM documents GROUP BY md5(text) ORDER BY keep_id
    """,
)
def dedup_exact(spark, sf_dir):
    # Group by a 128-bit content hash, not the full text: the shuffle carries
    # 32-byte keys instead of document bodies — the standard exact-dedup plan
    # at corpus scale. keep_id = canonical survivor (min doc_id).
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dups"))
        .orderBy("keep_id")
    )


# ---------------------------------------------------------------------------
# D2. exact n-gram Jaccard near-dedup — inverted-index join (oracle-matched)
# ---------------------------------------------------------------------------
SQL_JACCARD_CAND_CTES = f"""
    rare AS (SELECT sh.doc_id, sh.s FROM sh
             JOIN (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {JACCARD_DF_CAP}) r
             USING (s)),
    cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
             FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pair AS (SELECT c.a, c.b, COUNT(*) AS i
             FROM cand c JOIN sh x ON x.doc_id = c.a
             JOIN sh y ON y.doc_id = c.b AND y.s = x.s
             GROUP BY 1, 2)
"""


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {SQL_SHINGLE_CTES},
    {SQL_JACCARD_CAND_CTES}
    SELECT p.a, p.b, ROUND(CAST(p.i AS DOUBLE) / (ca.n + cb.n - p.i), 6) AS jac
    FROM pair p JOIN cnt ca ON ca.doc_id = p.a JOIN cnt cb ON cb.doc_id = p.b
    WHERE CAST(p.i AS DOUBLE) / (ca.n + cb.n - p.i) >= 0.8
    ORDER BY a, b
    """,
)
def jaccard_pairs_df(spark, sf_dir) -> DataFrame:
    """Verified jaccard-≥0.8 pairs (a < b), persisted — consumed by the
    jaccard query itself plus dedup_materialize (loser set) and
    dedup_components (edge list): one candidate join + verification for all
    three instead of three."""
    from pyspark import StorageLevel

    docs, cand = _shingle_candidates(spark, sf_dir)
    out = _verify_pairs(docs, cand, 0.8)
    return out.persist(StorageLevel.MEMORY_AND_DISK)


def dedup_ngram_jaccard(spark, sf_dir):
    # Inverted-index self-join on shingle: candidate cost ∝ Σ_s df(s)² over
    # the CAPPED index (df ≤ JACCARD_DF_CAP), so no single shingle can make
    # a reducer quadratic; word-5-grams keep the sum near-linear. Scoring is
    # exact on full shingle sets (_verify_pairs), so the cap only affects
    # candidate recall for pure-boilerplate overlaps.
    # join on the 64-bit hash of each shingle, not the ~30-char string: the
    # inverted-index shuffle carries 8-byte keys and compares longs. A hash
    # collision would need two distinct shingles in the same corpus to share
    # an xxhash64 (P ≈ n²/2⁶⁴ — negligible at any realistic shingle count).
    return jaccard_pairs_df(spark, sf_dir)


@query(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH {SQL_SHINGLE_CTES},
    {SQL_JACCARD_CAND_CTES},
    v AS (
      SELECT p.a, p.b
      FROM pair p JOIN cnt ca ON ca.doc_id = p.a JOIN cnt cb ON cb.doc_id = p.b
      WHERE CAST(p.i AS DOUBLE) / (ca.n + cb.n - p.i) >= 0.8),
    e AS (SELECT a AS x, b AS y FROM v UNION ALL SELECT b, a FROM v)
    SELECT dx.source AS src_a, dy.source AS src_b, COUNT(*) AS n_pairs,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / (SELECT COUNT(*) FROM documents d WHERE d.source = dx.source),
                 6) AS dup_rate_a
    FROM e JOIN documents dx ON dx.doc_id = e.x
           JOIN documents dy ON dy.doc_id = e.y
    GROUP BY dx.source, dy.source ORDER BY src_a, src_b
    """,
)
def dedup_cross_source_matrix(spark, sf_dir):
    """Provenance contamination matrix: for every ordered source pair
    (src_a, src_b), how many near-duplicate relationships src_a's docs
    have into src_b, and what fraction of src_a that represents — the
    curation diagnostic that tells you which ingest feeds re-crawl each
    other before you weight a mixture. Rides the SHARED verified jaccard
    pair cache (no extra candidate join); the doc→source attachment joins the
    O(corpus) (doc_id, source) projection against the bounded near-dup
    edge list (AQE broadcasts the edge side when it is small), and the
    matrix aggregate is |sources|² rows — driver-trivial at any corpus
    size."""
    pairs = jaccard_pairs_df(spark, sf_dir).select("a", "b")
    edges = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src_counts = docs.groupBy("source").count().withColumnRenamed("count", "n_src")
    out = (
        # doc→source attachment: docs is O(corpus) — a plain join (AQE
        # broadcasts whichever side is actually small at runtime; at scale
        # the bounded near-dup edge list is the broadcastable side)
        edges.join(
            docs.withColumnsRenamed({"doc_id": "a", "source": "src_a"}), "a"
        )
        .join(docs.withColumnsRenamed({"doc_id": "b", "source": "src_b"}), "b")
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_pairs"))
        .join(
            F.broadcast(src_counts.withColumnRenamed("source", "src_a")), "src_a"
        )
        .select(
            "src_a",
            "src_b",
            "n_pairs",
            F.round(F.col("n_pairs") / F.col("n_src"), 6).alias("dup_rate_a"),
        )
        .orderBy("src_a", "src_b")
    )
    return out


# ---------------------------------------------------------------------------
# D2b. asymmetric n-gram CONTAINMENT near-dedup (Broder's containment,
#      C(src→host) = |grams(src) ∩ grams(host)| / |grams(src)|): detects a
#      document excerpted/quoted INSIDE a larger one — the skewed-size
#      duplication Jaccard structurally misses (a 50-gram doc fully inside a
#      5000-gram doc has J ≈ 0.01 but containment 1.0). Distinct from
#      dedup_substring (verbatim shared spans, symmetric, presence-only):
#      containment tolerates edits and reports a direction + score.
# ---------------------------------------------------------------------------
CONTAINMENT_THRESHOLD = 0.9


@query(
    "dedup_containment",
    oracle=f"""
    WITH {SQL_SHINGLE_CTES},
    {SQL_JACCARD_CAND_CTES},
    dir AS (
      SELECT p.a AS src_doc, p.b AS host_doc,
             CAST(p.i AS DOUBLE) / ca.n AS c
      FROM pair p JOIN cnt ca ON ca.doc_id = p.a
      UNION ALL
      SELECT p.b, p.a, CAST(p.i AS DOUBLE) / cb.n
      FROM pair p JOIN cnt cb ON cb.doc_id = p.b)
    SELECT src_doc, host_doc, ROUND(c, 6) AS cont
    FROM dir WHERE c >= {CONTAINMENT_THRESHOLD}
    ORDER BY src_doc, host_doc
    """,
)
def dedup_containment(spark, sf_dir):
    """Directed near-containment pairs (src_doc ⊑ host_doc, cont ≥ 0.9).

    Plan shape at 100 TB: candidate generation is the SAME capped inverted-
    index join every shingle dedup here uses (df ≤ JACCARD_DF_CAP kills the
    quadratic hot-gram reducer; candidates are symmetric so both directions
    ride one join), and scoring is exact on the full shingle sets of the
    candidate pairs only. The denominator is the SOURCE doc's gram count, so
    small-into-large duplication scores ~1.0 regardless of the size ratio —
    the case worth catching before training: a few hot documents quoted
    across a crawl inflate memorization without tripping Jaccard dedup."""
    docs, cand = _shingle_candidates(spark, sf_dir)
    sa = docs.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sha"))
    sb = docs.select(F.col("doc_id").alias("b"), F.col("shingles").alias("shb"))
    scored = (
        cand
        .join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sha", "shb")).cast("double").alias("i"),
            F.size("sha").alias("na"),
            F.size("shb").alias("nb"),
        )
    )
    # both directions EXPLODE out of one scored row — a fwd/rev UNION of two
    # selects over `scored` would duplicate the whole candidate-join subtree
    # in the physical plan (two inverted-index joins, two verifications)
    directed = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("src_doc"),
                    F.col("b").alias("host_doc"),
                    (F.col("i") / F.col("na")).alias("c"),
                ),
                F.struct(
                    F.col("b").alias("src_doc"),
                    F.col("a").alias("host_doc"),
                    (F.col("i") / F.col("nb")).alias("c"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    return (
        directed.filter(F.col("c") >= CONTAINMENT_THRESHOLD)
        .select("src_doc", "host_doc", F.round("c", 6).alias("cont"))
        .orderBy("src_doc", "host_doc")
    )


# ---------------------------------------------------------------------------
# D3. MinHash + LSH near-dedup — the 100 TB scale path (rows-only check;
#     the LSH pruning is probabilistic so no SQL oracle — tests assert it
#     reproduces dedup_ngram_jaccard's output exactly at test scale)
# ---------------------------------------------------------------------------
N_HASHES = 128
BAND_ROWS = 4  # 32 bands × 4 rows: P(catch | J=0.8) ≈ 1 - (1-0.8⁴)³² ≈ 0.99998
# Scale proof — why this geometry needs NO corpus-size adaptation (VERDICT
# r12 #1, unlike the small-keyspace families CLUSTER_LSH_BITS / SimHash
# blocks / LSH planes): the band join key is a 64-BIT hash of 4 minhashes,
# so RANDOM bucket collisions are ~C(n,2)·bands/2⁶⁴ — ≈ 0.09 expected
# spurious pairs at n = 10¹² docs, zero occupancy growth with n. Non-random
# collisions are true minhash band agreements, whose rate is governed by
# the corpus's Jaccard-similarity structure (a DATA property: pairs per
# document, not pairs per corpus²). band/rows is therefore purely a RECALL
# knob (the S-curve above), orthogonal to scale safety; the r13 probe
# measures the end-to-end slope empirically.


@query("dedup_minhash_lsh")
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(128) signatures → 32 LSH bands → banded candidate join →
    exact-Jaccard verification at 0.8.

    Signature/band computation is pure Catalyst expressions (xxhash64 under
    whole-stage codegen), one row per (doc, band) in the candidate join — at
    100 TB the shuffle is 32 small rows per document, never all-pairs.
    """
    n_bands = N_HASHES // BAND_ROWS
    docs = shingled_docs(spark, sf_dir).filter(F.size("shingles") > 0)
    # MinHash as a min-reduce aggregation: explode shingles, hash each with
    # 128 seeds (one wide row per shingle), then per-doc column-wise MIN.
    # Partial (map-side) aggregation shrinks the shuffle to one 128-long row
    # per document — the canonical 100 TB-safe formulation.
    # hash each shingle STRING once to a fixed-width long, then derive the
    # 128 signature hashes from the long (8-byte input) — ~4× cheaper than
    # re-hashing the full shingle text per seed, identical LSH guarantees
    exploded = docs.select("doc_id", F.explode("shingles").alias("s")).select(
        "doc_id", F.xxhash64("s").alias("s64")
    )
    hashed = exploded.select(
        "doc_id",
        *[F.xxhash64(F.lit(i), F.col("s64")).alias(f"h{i}") for i in range(N_HASHES)],
    )
    sig = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(N_HASHES)]
    )
    # 32 bands of 4 rows → band hash; unpivot to (doc_id, band, bh)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * BAND_ROWS + r}") for r in range(BAND_ROWS)]).alias("bh"),
        )
        for b in range(n_bands)
    ]
    # both sides of the candidate self-join; 32 rows/doc → DISK_ONLY (each
    # side streams it once; resident caching would cost 32× corpus row count)
    bands = persist_for_self_join(
        sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )
    # exact verification on the (small) candidate set via array_intersect
    return _verify_pairs(docs, cand, 0.8)


# ---------------------------------------------------------------------------
# D4. SimHash near-dedup — 64-bit signatures, Manku-style block LSH
#     (pigeonhole: hamming ≤ 3 ⟹ at most 3 of B blocks differ ⟹ at least
#     B−3 blocks agree ⟹ some (B−3)-subset key matches, so the subset-key
#     join has *exact* recall at every B; rows-only check since DuckDB lacks
#     xxhash64 — tests verify against an in-Spark brute-force)
# ---------------------------------------------------------------------------
SIMHASH_HAM_T = 3  # hamming budget the pigeonhole guarantee covers
SIMHASH_BLOCKS = 4  # tuned small-corpus floor: 4×16-bit blocks, 4 keys/doc
# Target expected occupancy of a random (subset, key) bucket. The candidate
# join does Σ occ² work per bucket, so holding n/2^keybits near a constant
# keeps total candidate pairs ≤ ~TARGET_OCC·keys·n — linear in n (the same
# invariant CLUSTER_LSH_TARGET_OCC pins for the embedding-LSH family, the
# geometry class the r12 probe measured going quadratic when fixed).
SIMHASH_TARGET_OCC = 32
SIMHASH_MAX_BLOCKS = 7  # C(7,4)=35 keys/doc, 36-bit keys → ~2^41 docs at occ 32


def simhash_blocks_for(n: int) -> int:
    """Adaptive Manku block count: smallest B in [SIMHASH_BLOCKS,
    SIMHASH_MAX_BLOCKS] whose (B−SIMHASH_HAM_T)-subset keys — key width
    (B−3)·floor(64/B) bits — keep expected random bucket occupancy
    n / 2^keybits at or under SIMHASH_TARGET_OCC. Every test fixture (and
    the factor-10 probe corpus) resolves to the B=4 floor, so pinned
    brute-force-parity behavior is unchanged; B grows only past ~2M docs
    (B=5 to ~0.5B at 24-bit keys, B=6 to ~34B at 30-bit, B=7 beyond).
    Recall stays EXACT at every B (pigeonhole, see section header) — the
    cost of growth is keys/doc: C(B, B−3) = 4/10/20/35 rows per document,
    the classic Manku et al. table-count trade (public web-dedup result)."""
    for b in range(SIMHASH_BLOCKS, SIMHASH_MAX_BLOCKS + 1):
        keybits = (b - SIMHASH_HAM_T) * (64 // b)
        if n <= SIMHASH_TARGET_OCC * (1 << keybits):
            return b
    return SIMHASH_MAX_BLOCKS


def _documents_rowcount(spark, sf_dir) -> int:
    """Row count of the documents table — parquet footer when the path is a
    single file (the fixture layout), else a metadata-only Spark count."""
    try:
        import pyarrow.parquet as pq

        return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    except Exception:  # noqa: BLE001 - directory layout or remote store
        return load_table(spark, sf_dir, "documents").count()


@query("dedup_simhash")
def dedup_simhash(spark, sf_dir, blocks: int | None = None):
    """SimHash(64) near-dedup with corpus-adaptive Manku block geometry:
    ``blocks`` defaults to :func:`simhash_blocks_for` (B=4 on every fixture
    — 16-bit keys — growing only past ~2M docs so random-collision bucket
    occupancy stays ≤ SIMHASH_TARGET_OCC and candidate work stays linear).
    Recall is exact for hamming ≤ 3 at every B (pigeonhole over the
    (B−3)-subset keys); tests pin output invariance across B."""
    # Features are word *3-grams*, not unigrams: the synthetic corpus has a
    # tiny vocabulary, so unigram sets collide across unrelated documents;
    # 3-gram features keep SimHash discriminative (same choice a web-scale
    # pipeline makes for templated/boilerplate-heavy text).
    toks = (
        tokenized_docs(spark, sf_dir)
        .select("doc_id", F.expr(NGRAMS.format(ws="ws", k=3)).alias("ws"))
        .filter(F.size("ws") > 0)
    )
    # per-bit vote as a partial-agg sum: explode features, one ±1 column per
    # bit, column-wise SUM per doc, then pack sign bits into the signature.
    # (A nested higher-order aggregate expresses the same thing but falls out
    # of whole-stage codegen — measured ~8× slower.)
    hashed = toks.select("doc_id", F.explode("ws").alias("w")).select(
        "doc_id", F.xxhash64("w").alias("h")
    )
    votes = hashed.select(
        "doc_id",
        *[
            F.expr(f"IF((shiftright(h, {b}) & 1) = 1, 1, -1)").alias(f"v{b}")
            for b in range(64)
        ],
    )
    sums = votes.groupBy("doc_id").agg(*[F.sum(f"v{b}").alias(f"v{b}") for b in range(64)])
    pack = " + ".join(f"IF(v{b} > 0, shiftleft(1L, {b}), 0L)" for b in range(64))
    sig = sums.select("doc_id", F.expr(pack).alias("sig"))
    # Manku subset keys: B blocks of floor(64/B) bits (last block absorbs
    # the remainder), one xxhash64 key per (B−3)-subset of blocks. Hash
    # collisions can only ADD candidates (killed by the exact hamming
    # filter), never drop one — recall stays exact. keys/doc = C(B, B−3).
    from itertools import combinations

    if blocks is None:
        blocks = simhash_blocks_for(_documents_rowcount(spark, sf_dir))
    w = 64 // blocks
    blk_expr = [
        F.expr(
            f"shiftright(sig, {i * w}) & {(1 << (w if i < blocks - 1 else 64 - i * w)) - 1}"
        )
        for i in range(blocks)
    ]
    key_structs = [
        F.struct(
            F.lit(sid).alias("sid"),
            F.xxhash64(F.lit(sid), *[blk_expr[i] for i in subset]).alias("kh"),
        )
        for sid, subset in enumerate(
            combinations(range(blocks), blocks - SIMHASH_HAM_T)
        )
    ]
    # both sides of the key self-join; C(B,B−3) rows/doc → DISK_ONLY (single
    # streaming read per join side, no storage-memory claim at corpus scale)
    keys = persist_for_self_join(
        sig.select(
            "doc_id", "sig", F.explode(F.array(*key_structs)).alias("k")
        ).select("doc_id", "sig", F.col("k.sid").alias("sid"), F.col("k.kh").alias("kh"))
    )
    a, b = keys.alias("a"), keys.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.kh") == F.col("b.kh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= SIMHASH_HAM_T)
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            ham.alias("hamming"),
        )
        .distinct()
        .orderBy("a", "b")
    )


# ---------------------------------------------------------------------------
# V1. embedding near-dup pairs — exact cosine ≥ 0.4 (oracle-matched)
# ---------------------------------------------------------------------------
# nb(nb+1)/2 block-pair GEMM tasks; nb ≈ sqrt(4 × cores) targets ~2 tasks
# per core so tasks saturate executors while per-vector replication stays
# O(nb) and each block is large enough to amortize the Arrow/worker overhead.


def _gemm_blocks(spark) -> int:
    import math

    return max(4, int(math.sqrt(4 * spark.sparkContext.defaultParallelism)))
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def _with_norm(df: DataFrame, id_alias: str) -> DataFrame:
    e = df.select(
        F.col("vec_id").alias(id_alias),
        F.col("embedding").cast("array<double>").alias(f"emb_{id_alias}"),
    )
    dot_self = _DOT.format(a=f"emb_{id_alias}", b=f"emb_{id_alias}")
    return e.withColumn(f"norm_{id_alias}", F.expr(f"sqrt({dot_self})"))


@query(
    "embedding_cosine_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
               FROM embeddings)
    SELECT a.vec_id AS a, b.vec_id AS b,
           ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.4
    ORDER BY a, b
    """,
)
def embedding_cosine_pairs(spark, sf_dir):
    return cosine_pairs_df(spark, sf_dir).select(
        "a", "b", F.round("sim", 6).alias("sim")
    ).orderBy("a", "b")


_COSINE_PAIRS_MEMO: dict = {}


def _memo_put(memo: dict, key: tuple, df: DataFrame) -> None:
    """Bound a per-session DataFrame memo: keep only the latest dataset per
    live session.

    Long-lived sessions touching many datasets would otherwise accumulate
    persisted blocks and dead DataFrame references indefinitely; evicting the
    displaced entry unpersists its cached blocks eagerly."""
    app = key[0]
    for stale in [k for k in memo if k[0] == app and k != key]:
        try:
            memo.pop(stale).unpersist()
        except Exception:
            pass  # session already stopped; blocks are gone with it
    memo[key] = df


def cosine_pairs_df(spark, sf_dir) -> DataFrame:
    """Exact all-pairs cosine ≥ 0.4 via *block* matrix multiplication.

    The naive row-pair join evaluates an interpreted 64-term fold per pair —
    O(n²·d) scalar ops outside codegen. Instead: hash vectors into nb blocks,
    replicate each vector to the nb block-pair tasks it participates in, and
    run one vectorized float64 GEMM per task inside ``applyInPandas``. Same
    O(n²·d) FLOPs, but executed as BLAS — orders of magnitude faster — with
    shuffle volume O(n·nb) rows, never the O(n²) pair stream. This is the
    standard outer-product blocking that scales the exact baseline to large
    corpora; the ANN paths below avoid O(n²) entirely.

    Returns unordered (a < b) pairs with ``sim``; shared by
    ``embedding_cosine_pairs`` and ``dedup_embedding_clusters``.
    """
    import numpy as np
    import pandas as pd

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _COSINE_PAIRS_MEMO.get(key)
    if hit is not None:
        return hit

    nb = _gemm_blocks(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        (F.col("vec_id") % nb).cast("int").alias("blk"),
    )
    # a-side: block i serves tasks (i, j≥i); b-side: block j serves (i≤j, j)
    tasks_a = e.select(
        F.col("blk").alias("bi"),
        F.explode(F.expr(f"sequence(blk, {nb - 1})")).alias("bj"),
        F.lit(0).alias("side"),
        "vec_id",
        "emb",
    )
    tasks_b = e.select(
        F.explode(F.expr("sequence(0, blk)")).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit(1).alias("side"),
        "vec_id",
        "emb",
    )

    def gemm(key, pdf):
        bi, bj = key
        A, B = pdf[pdf["side"] == 0], pdf[pdf["side"] == 1]
        if len(A) == 0 or len(B) == 0:
            return pd.DataFrame({"a": [], "b": [], "sim": []})
        ida, idb = A["vec_id"].to_numpy(), B["vec_id"].to_numpy()
        Ma, Mb = np.vstack(A["emb"].to_numpy()), np.vstack(B["emb"].to_numpy())
        S = (Ma @ Mb.T) / np.outer(
            np.sqrt((Ma * Ma).sum(1)), np.sqrt((Mb * Mb).sum(1))
        )
        mask = S >= 0.4
        if bi == bj:  # same block on both sides: keep each unordered pair once
            mask &= ida[:, None] < idb[None, :]
        ii, jj = np.nonzero(mask)
        return pd.DataFrame(
            {
                "a": np.minimum(ida[ii], idb[jj]),
                "b": np.maximum(ida[ii], idb[jj]),
                "sim": S[ii, jj],
            }
        )

    # pre-partition on the task key with an explicit count: the groupBy's
    # ClusteredDistribution is already satisfied, so no AQE-coalescible
    # exchange is inserted and every GEMM task can run in parallel (the
    # shuffle is tiny in bytes but each task is a dense matmul)
    from pyspark import StorageLevel

    # persisted + memoized (the cache manager can't plan-match two
    # applyInPandas calls — each builds a fresh Python closure — so the
    # memo hands both consumers the SAME DataFrame): the GEMM runs once
    # per (session, dataset) across embedding_cosine_pairs and
    # dedup_embedding_clusters. The pair set is a vanishing fraction of
    # the corpus — MEMORY_AND_DISK spills rather than OOMs.
    out = (
        tasks_a.unionByName(tasks_b)
        .repartition(nb * (nb + 1) // 2, "bi", "bj")
        .groupBy("bi", "bj")
        .applyInPandas(gemm, "a long, b long, sim double")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _memo_put(_COSINE_PAIRS_MEMO, key, out)
    return out


@query(
    "dedup_embedding_clusters",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    p AS (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.4),
    edges AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, x.v FROM reach r JOIN edges x ON x.u = r.v)
    SELECT u AS vec_id, CAST(LEAST(u, MIN(v)) AS BIGINT) AS cluster
    FROM reach GROUP BY u ORDER BY vec_id
    """,
)
def dedup_embedding_clusters(spark, sf_dir):
    """Embedding near-duplicate CLUSTERS, **exact pair source**: the
    all-pairs block-GEMM (cosine_pairs_df) fed into large-star/small-star
    connected components — the small-sf oracle baseline whose labels are
    exact at any scale factor. The scale path is
    ``embedding_clusters(source='lsh')`` / ``dedup_embedding_clusters_lsh``
    below, which replaces the O(n²·d) GEMM with banded-LSH candidates +
    exact verify; this exact form remains registered with the recursive-CTE
    oracle precisely because its answer is deterministic."""
    return embedding_clusters(spark, sf_dir, source="exact")


def embedding_clusters(spark, sf_dir, source: str = "lsh") -> DataFrame:
    """Cluster labels (vec_id, cluster) from a pluggable pair source.

    ``source='lsh'`` (default — the 100 TB path): banded random-hyperplane
    candidates with exact cosine verification inside each bucket
    (cluster_pairs_lsh_df). ``source='exact'``: the all-pairs block-GEMM
    (cosine_pairs_df) — exact at any scale, O(n²·d) FLOPs; the small-sf
    oracle baseline. Either way the cluster id is the minimum vec_id
    reachable through the pair graph."""
    if source == "lsh":
        pairs = cluster_pairs_lsh_df(spark, sf_dir).select("a", "b")
    elif source == "exact":
        pairs = cosine_pairs_df(spark, sf_dir).select("a", "b")
    else:
        raise ValueError(f"unknown pair source {source!r} (exact | lsh)")
    labels, _ = _connected_components(pairs)
    return labels.select(
        F.col("doc_id").alias("vec_id"), F.col("component").alias("cluster")
    ).orderBy("vec_id")


# Banded-LSH geometry for the cluster candidate generator. Random-hyperplane
# sign bits: P(bit agrees | cosine = s) = 1 - acos(s)/π, so an edge at the
# threshold survives a band of `bits` planes with p = (1 - acos(t)/π)^bits
# and is MISSED by all bands with (1 - p)^bands. At t = 0.4, bits = 6,
# bands = 80: per-edge miss ≈ 0.5%. `bits` is the scale dial — it divides
# expected bucket size by 2 per extra bit (verification work per band is
# Σ_buckets s², the classic LSH hot-bucket quadratic); `bands` buys recall
# linearly in signature cost. Planes are a seeded Rademacher (±1) matrix —
# deterministic across runs/executors (NumPy PCG64 stream stability is a
# documented API guarantee), BLAS-friendly, and identical on every batch.
CLUSTER_LSH_BITS = 6
CLUSTER_LSH_BANDS = 80
CLUSTER_LSH_SEED = 0
CLUSTER_SIM_T = 0.4  # mirrored in dedup_embedding_clusters' oracle SQL


# Per-(band,sig) bucket row cap before the salted sub-split kicks in. A
# bucket of s rows costs an s×s GEMM — the cap bounds per-task memory and
# straggler time no matter how skewed the corpus is (a near-constant
# embedding column puts ~n rows in ONE bucket, which no static `bits`
# fixes: identical vectors agree on every extra hash bit too).
CLUSTER_LSH_BUCKET_CAP = 2048
# Hot buckets are collected to the driver to build the salt map — a skew
# summary, not data. If a corpus produces more than this many over-cap
# buckets, per-bucket work dominates everywhere and the right fix is more
# `bits`, not a bigger map; fail loudly instead of building a huge plan.
CLUSTER_LSH_MAX_HOT = 100_000

# Target expected bucket occupancy for the adaptive bit count below: the
# in-bucket verification work is Σ s² per band, so holding n/2^bits near a
# constant keeps the TOTAL pipeline cost ~linear in n as the corpus grows
# (the r12 scale probe measured the fixed-6-bit geometry at 73x wall for
# 10x rows on streaming_dedup_embedding — bucket occupancy, and with it the
# per-arrival pair loop, grew 10x).
CLUSTER_LSH_TARGET_OCC = 32


def lsh_bits_for(n: int) -> int:
    """Adaptive hyperplanes per band: smallest `bits` that keeps expected
    bucket occupancy (n / 2^bits) at or under CLUSTER_LSH_TARGET_OCC,
    floored at the tuned small-corpus CLUSTER_LSH_BITS (every test fixture
    resolves to exactly that floor, so pinned recall/parity behavior is
    unchanged) and capped at 16 (the uint16 sigpack lanes). More bits
    trade at-threshold recall for linear scaling — at t = 0.4, bits = 10,
    bands = 80 the per-edge miss is ≈45% AT the threshold and ≈0.2% at the
    planted-duplicate similarity (~0.85); real corpora dedup at ≥0.8 where
    the loss is negligible. Callers that need exact recall at the
    threshold pass `bits` explicitly."""
    import math

    return min(16, max(CLUSTER_LSH_BITS, math.ceil(math.log2(max(n, 1) / CLUSTER_LSH_TARGET_OCC)) if n > CLUSTER_LSH_TARGET_OCC else CLUSTER_LSH_BITS))


def _embeddings_rowcount(spark, sf_dir) -> int:
    """Row count of the embeddings table — parquet footer when the path is
    a single file (the fixture layout), else a metadata-only Spark count."""
    try:
        import pyarrow.parquet as pq

        return pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    except Exception:  # noqa: BLE001 - directory layout or remote store
        return load_table(spark, sf_dir, "embeddings").count()


def _lsh_signatures(spark, sf_dir, bits: int, bands: int):
    """Map-only signature stage: one n×d · d×planes BLAS product per Arrow
    batch, emitting a COMPACT row per vector — the int8-quantized vector
    (``qvec``, d bytes), its rigorous relative quantization error
    (``qerr``), the per-band signatures (for the explode), and all bands
    packed as uint16-LE bytes (``sigpack``) for the first-agreeing-band
    dedup prefix. The fp64 embedding never leaves this stage.

    This is the ONLY corpus scan in the LSH pipeline: the caller persists
    the result so the salt-counting pass and the bucket stage share one
    execution (cluster_pairs_lsh_df)."""
    import numpy as np
    import pandas as pd

    if bits > 16:
        raise ValueError("cluster LSH: bits > 16 would overflow the uint16 sigpack")
    emb = load_table(spark, sf_dir, "embeddings")
    n_planes = bits * bands
    seed = CLUSTER_LSH_SEED
    weights = 1 << np.arange(bits, dtype=np.int64)

    def signatures(batches):
        H = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf["embd"].to_numpy())
            if H is None:  # planes depend only on (seed, dim): identical everywhere
                rng = np.random.default_rng(seed)
                H = (
                    rng.integers(0, 2, size=(n_planes, M.shape[1])) * 2 - 1
                ).astype(np.float64)
            bits_m = (M @ H.T > 0).astype(np.int64)  # n × planes sign bits
            sigs = [
                bits_m[:, k * bits : (k + 1) * bits] @ weights for k in range(bands)
            ]
            sig_mat = np.stack(sigs, axis=1)
            # int8 quantization: q = round(u/s), s = max|u|/127 per vector.
            # qerr = 2·‖u − s·q‖/‖u‖ is the RIGOROUS per-vector cosine
            # perturbation bound (‖û − d̂‖ ≤ 2‖u−d‖/‖u‖ for the normalized
            # dequantized vector d̂), so threshold − (qerr_a + qerr_b) can
            # never drop a true pair in the in-bucket prefilter.
            scale = np.maximum(np.abs(M).max(axis=1), 1e-30) / 127.0
            Q = np.rint(M / scale[:, None]).astype(np.int8)
            err = np.linalg.norm(M - Q.astype(np.float64) * scale[:, None], axis=1)
            nrm = np.maximum(np.linalg.norm(M, axis=1), 1e-30)
            qerr = (2.0 * err / nrm).astype(np.float32)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "qvec": [q.tobytes() for q in Q],
                    "qerr": qerr,
                    "sigs": list(sig_mat),
                    "sigpack": [s.astype("<u2").tobytes() for s in sig_mat],
                }
            )

    schema = "vec_id long, qvec binary, qerr float, sigs array<long>, sigpack binary"
    return emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embd")
    ).mapInPandas(signatures, schema)


def _lsh_salt_plan(sigged, cap: int) -> dict[str, int]:
    """Skew pass: per-(band,sig) bucket sizes over the narrow key projection
    (map-side-combined count — no payload moves), returning the sub-split
    factor m = ceil(size/cap) for every over-cap bucket. Empty for
    well-behaved corpora, so the common case pays one cheap counting
    aggregate and no plan growth."""
    import math

    counts = (
        sigged.select(F.posexplode("sigs").alias("band", "sig"))
        .groupBy("band", "sig")
        .count()
        .filter(F.col("count") > cap)
    )
    hot = counts.collect()
    if len(hot) > CLUSTER_LSH_MAX_HOT:
        raise ValueError(
            f"cluster LSH: {len(hot)} buckets exceed cap={cap} — the corpus "
            "is too skewed for this geometry; raise CLUSTER_LSH_BITS"
        )
    return {f"{r['band']}:{r['sig']}": math.ceil(r["count"] / cap) for r in hot}


def _lsh_bucket_rows(sigged, salt_plan: dict[str, int]):
    """The shuffle input for the bucket verify stage — deliberately COMPACT:
    (vec_id, qvec int8-bytes, qerr, band, sig, salt, i, j, prefix). No
    array<double> crosses this exchange (pinned by a plan test): the fp64
    payload would otherwise be replicated ×bands, the dominant cost at
    100 TB scale.

    Hot buckets (salt_plan) are sub-split: each row gets a deterministic
    salt in [0, m) and is replicated to the m sub-tasks (i, j) = (min(salt,
    o), max(salt, o)) that contain it, so every pair inside the bucket is
    produced by exactly one bounded sub-task — pair set unchanged, per-task
    GEMM bounded by ~2·cap rows, work parallelized across m(m+1)/2 tasks.
    Cold buckets take the m=1 fast path (salt 0, single (0,0) task)."""
    base = sigged.select(
        "vec_id", "qvec", "qerr", F.posexplode("sigs").alias("band", "sig"), "sigpack"
    ).withColumn(
        # band k's task only consults EARLIER bands' signatures (first-
        # agreeing-band rule): carry just bands [0, band) as packed uint16
        # bytes — 2·band bytes, not band longs
        "prefix",
        F.expr("substring(sigpack, 1, 2 * band)"),
    ).drop("sigpack")
    if not salt_plan:
        return base.withColumn("salt", F.lit(0)).withColumn(
            "i", F.lit(0)
        ).withColumn("j", F.lit(0))
    if len(salt_plan) <= 1024:
        # few hot buckets: a literal map folds into the projection
        m_map = F.create_map(
            *[F.lit(x) for kv in salt_plan.items() for x in kv]
        )
        base = base.withColumn(
            "m", F.coalesce(m_map[F.format_string("%d:%d", "band", "sig")], F.lit(1))
        )
    else:
        # many hot buckets: a 100k-entry create_map would be a 200k-node
        # Catalyst expression — broadcast-join the (band, sig, m) plan
        # instead, keeping the expression tree O(1)
        spark = base.sparkSession
        plan_df = spark.createDataFrame(
            [
                (int(k.split(":")[0]), int(k.split(":")[1]), int(m))
                for k, m in salt_plan.items()
            ],
            "band int, sig long, m int",
        )
        base = base.join(F.broadcast(plan_df), ["band", "sig"], "left").withColumn(
            "m", F.coalesce(F.col("m"), F.lit(1))
        )
    return (
        base
        .withColumn("salt", F.pmod(F.xxhash64("vec_id"), F.col("m")).cast("int"))
        .withColumn(
            "sub",
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, m - 1), "
                    "o -> struct(least(salt, o) AS i, greatest(salt, o) AS j))"
                )
            ),
        )
        .withColumn("sub", F.explode("sub"))
        .select(
            "vec_id", "qvec", "qerr", "band", "sig", "prefix", "salt",
            F.col("sub.i").alias("i"), F.col("sub.j").alias("j"),
        )
    )


def cluster_pairs_lsh_df(
    spark,
    sf_dir,
    threshold: float = CLUSTER_SIM_T,
    bits: int | None = None,
    bands: int = CLUSTER_LSH_BANDS,
) -> DataFrame:
    """Near-duplicate pairs via banded-LSH candidates + exact verification.

    The scale-safe replacement for the exact all-pairs GEMM, in four stages:

    1. **Signatures** (map-only): one BLAS product per Arrow batch emits
       per-band signatures plus an int8-quantized vector and its rigorous
       quantization-error bound — the fp64 embedding stays in this stage.
    2. **Bucket shuffle** (the ONLY wide exchange over vector payloads):
       n·bands compact rows — int8 bytes + packed-uint16 band prefix —
       never the O(n²) pair stream and never the ×bands-replicated fp64
       vector. Hot buckets are salt-split into bounded sub-tasks
       (_lsh_bucket_rows), so a skewed corpus cannot create a quadratic
       straggler task.
    3. **In-bucket prefilter** (int8 GEMM): candidate pairs with quantized
       cosine ≥ threshold − (qerr_a + qerr_b) − 1e-3. The margin is a
       per-pair rigorous bound, so no true pair is dropped; cross-band
       dedup stays MAP-SIDE via the first-agreeing-band rule (a bucket in
       band k emits a pair only when no earlier band already bucketed it
       together), so there is no pair-keyed dedup shuffle at all.
    4. **Exact verify join-back**: the (a, b) candidates — a set
       proportional to true near-duplicates, not to n — join the fp64
       embeddings once per side and keep pairs with exact cosine ≥
       threshold. Every emitted pair satisfies ``sim ≥ threshold``
       EXACTLY (no false positives); recall is the banded-LSH probability
       (≈99.5% per edge at the default geometry, measured 100% at
       verification scale and pinned by label-parity tests).

    Recall geometry: P(bit agrees | cosine = s) = 1 − acos(s)/π; an edge at
    threshold t survives a band of `bits` planes with p = (1 − acos(t)/π)^bits
    and is missed by all bands with (1 − p)^bands — at t = 0.4, bits = 6,
    bands = 80 the per-edge miss is ≈0.5%. Output is (a, b, sim), a < b.

    ``bits=None`` (default) resolves ADAPTIVELY from the corpus row count
    (lsh_bits_for): expected bucket occupancy n/2^bits is held near a
    constant, keeping total in-bucket work ~linear in n (the r12 scale
    probe measured fixed-6-bit occupancy growth turning the pipeline
    super-linear). Fixture sizes resolve to the tuned 6-bit floor, so the
    pinned recall numbers above are unchanged there.
    """
    import numpy as np
    import pandas as pd
    from pyspark import StorageLevel

    if bits is None:
        # adaptive geometry: constant expected bucket occupancy as the
        # corpus grows (see lsh_bits_for) — fixtures resolve to the tuned
        # CLUSTER_LSH_BITS floor, so pinned recall behavior is unchanged
        bits = lsh_bits_for(_embeddings_rowcount(spark, sf_dir))
    # SINGLE signature scan: the salt-counting pass and the bucket stage
    # share one cached pass instead of re-reading the corpus and re-running
    # the BLAS sign-bit product (the old sigs_only second scan was ~40% of
    # stage-1 cost at scale). The cached row is the COMPACT signature
    # projection — int8 qvec (d bytes) + sigs/sigpack (~10·bands bytes) —
    # a fraction of the fp64 source, and MEMORY_AND_DISK spills rather
    # than recomputes. Spark's CacheManager dedupes by canonicalized plan,
    # so repeated calls at the same (sf_dir, bits, bands) reuse one entry.
    sigged = _lsh_signatures(spark, sf_dir, bits, bands).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    salt_plan = _lsh_salt_plan(
        sigged.select("vec_id", "sigs"), CLUSTER_LSH_BUCKET_CAP
    )
    buckets = _lsh_bucket_rows(sigged, salt_plan)

    def bucket_pairs(key, pdf):
        if len(pdf) < 2:
            return pd.DataFrame({"a": [], "b": []})
        (band, _sig, ti, tj) = key
        ids = pdf["vec_id"].to_numpy()
        Q = np.vstack(
            [np.frombuffer(b, dtype=np.int8) for b in pdf["qvec"]]
        ).astype(np.float32)
        nrm = np.maximum(np.sqrt((Q * Q).sum(1)), 1e-30)
        S = (Q @ Q.T) / np.outer(nrm, nrm)
        qe = pdf["qerr"].to_numpy().astype(np.float64)
        # quantized-cosine prefilter with the rigorous per-pair margin
        # (+1e-3 for the float32 GEMM itself): keeps every true pair
        thresh = threshold - np.add.outer(qe, qe) - 1e-3
        cand = S >= thresh
        if ti == tj:
            cand = np.triu(cand, 1)
            ii, jj = np.nonzero(cand)
        else:
            # sub-split cross task: only pairs BETWEEN the two salt sides
            # (within-side pairs belong to tasks (i,i) and (j,j))
            salt = pdf["salt"].to_numpy()
            cand &= np.not_equal.outer(salt, salt)
            ii, jj = np.nonzero(np.triu(cand, 1))
        if band > 0 and len(ii):
            # first-agreeing-band rule: if any EARLIER band put this pair
            # in one bucket, that band's task owns the emission (prefix is
            # exactly bands [0, band) as uint16 — constant length here)
            sg = np.vstack(
                [np.frombuffer(p, dtype="<u2") for p in pdf["prefix"]]
            )
            fresh = ~(sg[ii] == sg[jj]).any(axis=1)
            ii, jj = ii[fresh], jj[fresh]
        return pd.DataFrame(
            {"a": np.minimum(ids[ii], ids[jj]), "b": np.maximum(ids[ii], ids[jj])}
        )

    # explicit-count exchange on the grouping keys: satisfies the groupBy's
    # ClusteredDistribution (no second shuffle) and is exempt from AQE
    # size-based coalescing — each bucket GEMM is CPU-bound, bytes are a bad
    # proxy (same rationale as cosine_pairs_df's pre-partition). The
    # map-side first-agreeing-band dedup means this is the only wide
    # exchange of vector payloads in the whole pipeline.
    #
    # Grouping granularity (guide §4): one Python call PER BUCKET was
    # bands × 2^bits ≈ 5k calls of ~30 rows each at sf0.1 — the fixed
    # per-call applyInPandas cost outweighed the tiny per-bucket GEMMs. The
    # call key is therefore a HASH SHARD of buckets (one call per shard,
    # the in-shard loop runs the same per-bucket kernel), sized to the
    # cluster so every core gets work; pair emission is per-bucket either
    # way, so the shard count can never change results. Data per call =
    # bucket_rows/shards — the same per-task volume the old 4×parallelism
    # repartition produced, just without ~40 function dispatches per task.
    n_shards = 4 * spark.sparkContext.defaultParallelism

    def shard_pairs(pdf):
        outs = [
            bucket_pairs(key, grp)
            for key, grp in pdf.groupby(["band", "sig", "i", "j"], sort=False)
        ]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame({"a": [], "b": []}, dtype="int64")
        return pd.concat(outs, ignore_index=True)

    cand = (
        buckets.withColumn(
            "bshard",
            F.pmod(F.xxhash64("band", "sig", "i", "j"), F.lit(n_shards)).cast(
                "int"
            ),
        )
        .repartition(n_shards, "bshard")
        .groupBy("bshard")
        .applyInPandas(lambda key, pdf: shard_pairs(pdf), "a long, b long")
    )
    # exact fp64 verification on the candidate set only — candidates are
    # proportional to true near-duplicates, so this join-back moves orders
    # of magnitude less vector payload than carrying fp64 through stage 2
    ea = _with_norm(load_table(spark, sf_dir, "embeddings"), "a")
    eb = _with_norm(load_table(spark, sf_dir, "embeddings"), "b")
    dot = F.expr(_DOT.format(a="emb_a", b="emb_b"))
    return (
        cand.join(ea, "a")
        .join(eb, "b")
        .withColumn("sim", dot / (F.col("norm_a") * F.col("norm_b")))
        .filter(F.col("sim") >= threshold)
        .select("a", "b", "sim")
    )


@query("dedup_embedding_clusters_lsh")
def dedup_embedding_clusters_lsh(spark, sf_dir):
    """The default/scale form of embedding clustering: LSH candidates →
    exact verify → components. No SQL oracle (banded-LSH recall is
    probabilistic by construction — same contract as dedup_minhash_lsh);
    pinned instead by exact label-parity tests against the GEMM baseline at
    verification scale and a no-all-pairs plan test."""
    return embedding_clusters(spark, sf_dir, source="lsh")


# ---------------------------------------------------------------------------
# V2. brute-force cosine top-k similarity search (oracle-matched)
# ---------------------------------------------------------------------------
TOPK_QUERY_IDS = 5  # vec_id < 5 are the query vectors
TOPK_K = 10


@query(
    "similarity_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
               FROM embeddings),
    s AS (SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
                 list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS sim
          FROM e q JOIN e c ON q.vec_id < {TOPK_QUERY_IDS} AND q.vec_id <> c.vec_id),
    r AS (SELECT q_id, nn_id, sim,
                 ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
          FROM s)
    SELECT q_id, nn_id, ROUND(sim, 6) AS sim, rn FROM r WHERE rn <= {TOPK_K}
    ORDER BY q_id, rn
    """,
)
def similarity_topk(spark, sf_dir):
    # Broadcast the (tiny) query set against the corpus: one scan, no corpus
    # shuffle; per-query top-k via window over the per-partition survivors.
    # This is the exact-kNN plan that scales to any corpus size as long as
    # the query batch is broadcast-able.
    emb = load_table(spark, sf_dir, "embeddings")
    q = _with_norm(emb.filter(F.col("vec_id") < TOPK_QUERY_IDS), "q")
    # spread the scoring scan: queries × d interpreted dot products per
    # corpus row run inside the scan task, and a single-file corpus is ONE
    # task (the r13 probe's ANN finding; same fix)
    c = _with_norm(
        emb.repartition(spark.sparkContext.defaultParallelism, "vec_id"), "c"
    )
    dot = F.expr(_DOT.format(a="emb_q", b="emb_c"))
    sim = (dot / (F.col("norm_q") * F.col("norm_c"))).alias("sim_raw")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q") != F.col("c"))
        .select(F.col("q").alias("q_id"), F.col("c").alias("nn_id"), sim)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_raw"), "nn_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_K)
        .select("q_id", "nn_id", F.round("sim_raw", 6).alias("sim"), "rn")
        .orderBy("q_id", "rn")
    )


@query(
    "knn_label_vote",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
               FROM embeddings),
    s AS (SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
                 list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS sim
          FROM e q JOIN e c ON q.vec_id < {TOPK_QUERY_IDS} AND q.vec_id <> c.vec_id),
    r AS (SELECT q_id, nn_id,
                 ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
          FROM s),
    votes AS (SELECT k.q_id, CAST(l.label AS BIGINT) AS label_pred, COUNT(*) AS n
              FROM r k JOIN embeddings l ON l.vec_id = k.nn_id
              WHERE k.rn <= {TOPK_K} GROUP BY 1, 2),
    best AS (SELECT q_id, label_pred, n,
                    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY n DESC, label_pred) AS rr
             FROM votes)
    SELECT q_id, label_pred, n FROM best WHERE rr = 1 ORDER BY q_id
    """,
)
def knn_label_vote(spark, sf_dir):
    """Nearest-neighbor labeling: each query vector takes the majority label
    of its exact top-k cosine neighbors (ties → smallest label) — the
    embedding-proximity classification pass corpus curation uses to extend
    a small set of human quality labels across a corpus. Plan shape: the
    exact-kNN scan (broadcast query batch, no corpus shuffle) produces a
    tiny q×k vote set, which is BROADCAST into the label join — the
    corpus-sized label table is never shuffled — and the majority vote is a
    count + row_number window over q×k rows. At 100 TB swap the kNN stage
    for one of the ANN paths; the vote stages are unchanged."""
    emb = load_table(spark, sf_dir, "embeddings")
    topk = similarity_topk(spark, sf_dir).select("q_id", "nn_id")
    lab = emb.select(
        F.col("vec_id").alias("nn_id"), F.col("label").cast("long").alias("label_pred")
    )
    votes = (
        lab.join(F.broadcast(topk), "nn_id")
        .groupBy("q_id", "label_pred")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("n"), "label_pred")
    return (
        votes.withColumn("rr", F.row_number().over(w))
        .filter(F.col("rr") == 1)
        .select("q_id", "label_pred", "n")
        .orderBy("q_id")
    )


@query("knn_label_vote_ann")
def knn_label_vote_ann(spark, sf_dir):
    """The scale form of ``knn_label_vote``: identical vote/argmax stages
    fed from the LSH-bucketed ANN neighbors instead of the exact scan —
    the composition the exact form's docstring promises. Rows-only (ANN
    recall is probabilistic); pinned by an agreement-floor test against
    the exact vote."""
    emb = load_table(spark, sf_dir, "embeddings")
    topk = ann_lsh_topk(spark, sf_dir).select("q_id", "nn_id")
    lab = emb.select(
        F.col("vec_id").alias("nn_id"), F.col("label").cast("long").alias("label_pred")
    )
    votes = (
        lab.join(F.broadcast(topk), "nn_id")
        .groupBy("q_id", "label_pred")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("n"), "label_pred")
    return (
        votes.withColumn("rr", F.row_number().over(w))
        .filter(F.col("rr") == 1)
        .select("q_id", "label_pred", "n")
        .orderBy("q_id")
    )


# ---------------------------------------------------------------------------
# V3. LSH-bucketed approximate NN — the scale path (rows-only check; tests
#     measure recall ≥ 0.9 vs similarity_topk at verification scale)
# ---------------------------------------------------------------------------
LSH_PLANES = 6  # tuned floor: 64 buckets; 1-bit multiprobe (7 probes/query)
# Adaptive plane count (VERDICT r12 #1): a fixed 64-bucket table makes
# per-bucket size — and with it the per-query candidate scan — grow
# linearly with the corpus. Planes now grow with log2(n) so expected
# bucket occupancy stays ≤ LSH_TARGET_BUCKET and per-query candidates stay
# ~(planes+1)·LSH_TARGET_BUCKET, constant in n. More planes with a fixed
# 1-bit probe radius trade recall for that bound (a production deployment
# raises the multiprobe radius or table count alongside — documented, not
# emulated); the fixtures (≤ 2k vectors) resolve to the tuned 6-plane
# floor, so pinned recall behavior is unchanged.
LSH_TARGET_BUCKET = 64
LSH_MAX_PLANES = 24  # 16M buckets ≈ 1B vectors at the target occupancy


def lsh_planes_for(n: int) -> int:
    """Smallest plane count keeping expected bucket occupancy n / 2^planes
    at or under LSH_TARGET_BUCKET — floored at the tuned LSH_PLANES, capped
    at LSH_MAX_PLANES."""
    import math

    if n <= LSH_TARGET_BUCKET * (1 << LSH_PLANES):
        return LSH_PLANES
    return min(LSH_MAX_PLANES, math.ceil(math.log2(n / LSH_TARGET_BUCKET)))


@query("ann_lsh_topk")
def ann_lsh_topk(spark, sf_dir):
    """Random-hyperplane LSH: corpus-adaptive sign bits → bucket id
    (lsh_planes_for — the 6-plane floor on every fixture); queries probe
    their own bucket plus all 1-bit-flip neighbors; exact cosine re-rank
    inside the probed buckets. Replaces the O(n·q) cross join with a
    bucket join — per-query candidates ~(planes+1)·LSH_TARGET_BUCKET rows,
    constant in corpus size.

    Hyperplane components are xxhash64-derived (deterministic, seedable,
    computed JVM-side — no Python in the corpus-side path).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    planes = lsh_planes_for(_embeddings_rowcount(spark, sf_dir))
    # the per-vector sign-bit expression is the heavy stage (d × planes
    # interpreted higher-order evals per row) — spread it across the
    # executor cores BEFORE computing it: a single-parquet-file corpus
    # otherwise arrives as ONE scan task and the whole signature map runs
    # single-threaded (the r13 probe measured 222 s at 20k×256d exactly
    # this way; at cluster scale the scan is already many-partitioned and
    # this round-robin exchange is one narrow row shuffle of the vectors)
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    # hp(p, d) ∈ {−1, +1} from xxhash64(p, d); bucket bit p = sign of dot
    bucket_expr = F.expr(
        f"""
        aggregate(sequence(0, {planes - 1}), 0L, (acc, p) -> acc +
          IF(aggregate(sequence(0, size(embd) - 1), 0D,
               (s, d) -> s + element_at(embd, d + 1) *
                         IF((xxhash64(p, d) & 1) = 1, 1D, -1D)) > 0D,
             shiftleft(1L, CAST(p AS INT)), 0L))
        """
    )
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embd")
    ).withColumn("bucket", bucket_expr)
    # persist the signed corpus: BOTH join sides read it (probes are the
    # first TOPK_QUERY_IDS corpus rows), and — the r13 probe's second
    # finding — without a persist boundary the join's implicit
    # isnotnull(bucket) pushes below the repartition, re-evaluating the
    # whole signature expression in a single pre-exchange scan task (the
    # 217 s plan: the heavy aggregate ran twice, once on 1 core)
    corpus = persist_for_self_join(
        base.select(
            "vec_id",
            "embd",
            F.expr(f"sqrt({_DOT.format(a='embd', b='embd')})").alias("nrm"),
            "bucket",
        )
    )
    # queries probe own bucket + every 1-bit flip (multiprobe)
    probes = (
        corpus.filter(F.col("vec_id") < TOPK_QUERY_IDS)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embd").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.explode(
                F.expr(
                    f"array_union(array(bucket), transform(sequence(0, {planes - 1}),"
                    " p -> bucket ^ shiftleft(1L, CAST(p AS INT))))"
                )
            ).alias("bucket"),
        )
    )
    dot = F.expr(_DOT.format(a="q_emb", b="embd"))
    sim = (dot / (F.col("q_nrm") * F.col("nrm"))).alias("sim_raw")
    cand = (
        corpus.join(F.broadcast(probes), "bucket")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("nn_id"), sim)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_raw"), "nn_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_K)
        .select("q_id", "nn_id", F.round("sim_raw", 6).alias("sim"), "rn")
        .orderBy("q_id", "rn")
    )


# ---------------------------------------------------------------------------
# V5. int8 embedding quantization — the storage-reduction step of an
#     embedding pipeline (4× smaller vectors; oracle-matched)
# ---------------------------------------------------------------------------
@query(
    "embedding_quantize",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    s AS (SELECT vec_id, emb,
                 greatest(list_aggregate(list_transform(emb, x -> abs(x)), 'max'), 1e-12) AS mx
          FROM e)
    SELECT vec_id, ROUND(mx / 127, 9) AS scale,
           CAST(list_sum(list_transform(emb, x -> CAST(round(x * 127 / mx) AS BIGINT))) AS BIGINT)
             AS q_checksum,
           CAST(list_aggregate(list_transform(emb, x -> abs(CAST(round(x * 127 / mx) AS BIGINT))), 'max') AS BIGINT)
             AS q_max
    FROM s ORDER BY vec_id
    """,
)
def embedding_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization: q = round(x·127/max|x|),
    dequantize with the stored scale. Pure higher-order expressions — at
    corpus scale this is a map-only stage (no shuffle) that cuts vector
    storage 4× before ANN indexing. The checksum/max columns make the
    quantized array oracle-comparable without materializing it in the
    result hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    mx = F.greatest(
        F.expr("array_max(transform(emb, x -> abs(x)))"), F.lit(1e-12)
    )
    q = "transform(emb, x -> CAST(round(x * 127 / __mx) AS BIGINT))"
    return (
        e.withColumn("__mx", mx)
        .select(
            "vec_id",
            F.round(F.col("__mx") / 127, 9).alias("scale"),
            F.expr(f"aggregate({q}, 0L, (a, v) -> a + v)").alias("q_checksum"),
            F.expr(f"array_max(transform({q}, v -> abs(v)))").alias("q_max"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# V4. IVF approximate NN — coarse quantizer + cell probing (rows-only; tests
#     measure recall vs similarity_topk)
# ---------------------------------------------------------------------------
IVF_CELLS = 16
# nprobe trades scan fraction for recall; 6/16 cells ≈ 37% scanned reaches
# ~0.75 recall on the near-random verification corpus (real embedding
# corpora cluster far more sharply, so the same nprobe scans less and
# recalls more). The previous nprobe=4 figure was flattered by id-prefix
# centroids that made every query its own centroid — the bias this
# hash-stable trained pipeline removes.
IVF_NPROBE = 6
IVF_TRAIN_SAMPLE = 256  # bounded driver-side k-means pool (bottom-k by hash)
# Adaptive geometry (VERDICT r12 #1 — the fixed-constant class): with
# nlist fixed at 16, per-query scanned rows are nprobe·n/16 ≈ 37% of the
# corpus — linear per query, but not IVF's sub-linear point. nlist now
# grows with the corpus so cells hold ~IVF_TARGET_CELL_ROWS each, and
# nprobe grows ~√nlist (1.5·√nlist, = the tuned 6 at the 16-cell floor) so
# the scan FRACTION shrinks ~1/√nlist as the corpus grows. Every fixture
# (≤ 2k vectors) resolves to the 16/6 floor — pinned recall unchanged.
IVF_TARGET_CELL_ROWS = 1024
# Past this nlist the driver-side spherical k-means (16·nlist sample rows,
# chunked BLAS assignment) stops being the right tool — ann_ivf_topk then
# switches to DISTRIBUTED training (_ivf_train_distributed: GEMM-assigned
# per-cell partials over the whole corpus, one pass per Lloyd iteration)
# and raises the cell cap to IVF_DIST_MAX_CELLS; the corpus size where
# that engages is IVF_MAX_CELLS · IVF_TARGET_CELL_ROWS ≈ 4.2M vectors.
IVF_MAX_CELLS = 4096
IVF_DIST_MAX_CELLS = 65536  # ≈ 67M..1e9+ vectors at the target occupancy


def ivf_cells_for(n: int, cap: int = IVF_MAX_CELLS) -> int:
    """Smallest power-of-two nlist keeping expected rows/cell (n / nlist)
    at or under IVF_TARGET_CELL_ROWS — floored at the tuned small-corpus
    IVF_CELLS, capped at ``cap`` (IVF_MAX_CELLS for driver-side training,
    IVF_DIST_MAX_CELLS once the distributed trainer engages)."""
    import math

    if n <= IVF_CELLS * IVF_TARGET_CELL_ROWS:
        return IVF_CELLS
    return min(cap, 1 << math.ceil(math.log2(n / IVF_TARGET_CELL_ROWS)))


def ivf_nprobe_for(nlist: int) -> int:
    """Probe count 1.5·√nlist (= the tuned IVF_NPROBE exactly at the
    16-cell floor): recall per probe improves as cells shrink, so √ growth
    holds recall roughly steady while the scan fraction nprobe/nlist falls
    ~1/√nlist."""
    import math

    return max(IVF_NPROBE, round(1.5 * math.sqrt(nlist)))


def ivf_train_sample_for(nlist: int) -> int:
    """Training-pool size 16·nlist (floored at the tuned IVF_TRAIN_SAMPLE,
    which the 16-cell floor resolves to exactly — fixture training inputs
    are unchanged): k-means needs a multiple of k samples, and 16×cells
    keeps the pool bounded (≤ 65k rows at IVF_MAX_CELLS — a driver-side
    sample, never a corpus scan)."""
    return max(IVF_TRAIN_SAMPLE, 16 * nlist)


def _hash_stable_pool(base, n: int) -> list:
    """The n vectors with the smallest ``xxhash64(vec_id)`` — a distributed
    TakeOrdered (k rows to the driver, O(n) scan), deterministic across
    runs, and unbiased even when vec_ids correlate with source/ingest time
    (an id-prefix pick is not). Shared by every driver-side ANN training
    stage (IVF centroids, PQ codebooks, the IVFPQ hybrid)."""
    return [
        r["embd"]
        for r in base.orderBy(F.xxhash64("vec_id"), "vec_id").limit(n).collect()
    ]


def _query_vectors(base) -> list:
    """(vec_id, numpy vector) for the benchmark query batch, id-sorted —
    the broadcast-able probe set shared by the PQ and IVFPQ scans."""
    import numpy as np

    return sorted(
        (r["vec_id"], np.asarray(r["embd"]))
        for r in base.filter(F.col("vec_id") < TOPK_QUERY_IDS).collect()
    )


def _ivf_train(vectors, k: int = IVF_CELLS, iters: int = 8):
    """Spherical k-means over a BOUNDED hash-stable sample → k unit centroids.

    Same contract as _pq_train: driver-side on a fixed-size sample (never a
    corpus scan), deterministic (first-k init over hash-ordered rows, fixed
    iteration count, no RNG), tiny broadcastable artifact. Cosine geometry:
    vectors are L2-normalized and assignment maximizes the dot product, so
    cells are angular regions — matching the search-time metric.
    """
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    if x.size == 0:  # empty shard/corpus: no cells, downstream joins stay empty
        return np.zeros((0, 1))
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cents = x[:k].copy()
    k_eff = len(cents)
    for _ in range(iters):
        # chunked assignment: the n×k dot matrix is materialized 8192 rows
        # at a time so driver memory stays bounded at adaptive nlist
        # (ivf_cells_for) — 8192 × IVF_MAX_CELLS fp64 ≈ 268 MB worst-case
        assign = np.empty(len(x), dtype=np.int64)
        for s in range(0, len(x), 8192):
            assign[s : s + 8192] = (x[s : s + 8192] @ cents.T).argmax(axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=k_eff)
        nz = counts > 0
        means = sums[nz] / counts[nz, None]
        cents[nz] = means / np.maximum(
            np.linalg.norm(means, axis=1, keepdims=True), 1e-12
        )
    return cents


def _ivf_train_distributed(base, k: int, iters: int = 8):
    """Spherical k-means over the WHOLE distributed corpus — the
    beyond-IVF_MAX_CELLS training path the driver-side sampler documents.
    One corpus pass per Lloyd iteration: a BLAS GEMM per Arrow batch
    (inside mapInPandas, against the broadcast centroid matrix) assigns
    rows and folds per-cell PARTIAL (count, vector-sum) rows — at most k
    per task — which a k-row aggregation merges element-wise; only (k, d)
    arrays ever reach the driver (the broadcastable artifact, same
    contract as _ivf_train).

    This replaces the pyspark.ml KMeans path, which the r14 factor-100
    probe measured at 272 s vs 6.4 s for the driver sampler at equal
    recall: k-means|| init alone is several corpus passes, assignment is
    per-row JVM distance loops over boxed ml Vectors, and every iteration
    re-materializes the features column. Same Lloyd update as _ivf_train
    (spherical: cell means re-normalized to unit), same determinism shape:
    hash-stable first-k init, fixed iteration count, no RNG; argmax ties
    break to the lowest cell id on both paths. (Partial-merge order is
    still fp-nondeterministic across runs — as pyspark.ml's aggregation
    was — which only matters past the auto-engage corpus size, where no
    oracle applies.)"""
    import numpy as np

    spark = base.sparkSession
    init = _hash_stable_pool(base, k)
    if not init:  # empty corpus: no cells, downstream joins stay empty
        return np.zeros((0, 1))
    cents = np.asarray(init, dtype=np.float64)
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    d = cents.shape[1]
    zero = F.array_repeat(F.lit(0.0), d)
    vecs = base.select("embd")
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(np.ascontiguousarray(cents))

        def partials(it):
            import pandas as pd

            C = bc.value
            sums = np.zeros_like(C)
            counts = np.zeros(len(C), dtype=np.int64)
            for pdf in it:
                if len(pdf) == 0:
                    continue
                M = np.vstack(pdf["embd"].to_numpy())
                M = M / np.maximum(
                    np.linalg.norm(M, axis=1, keepdims=True), 1e-12
                )
                a = (M @ C.T).argmax(axis=1)
                np.add.at(sums, a, M)
                counts += np.bincount(a, minlength=len(C))
            nz = np.flatnonzero(counts)
            if nz.size:
                yield pd.DataFrame(
                    {
                        "cell": nz.astype(np.int64),
                        "cnt": counts[nz],
                        "vsum": list(sums[nz]),
                    }
                )

        part = vecs.mapInPandas(
            partials, "cell long, cnt long, vsum array<double>"
        )
        merged = (
            part.groupBy("cell")
            .agg(
                F.sum("cnt").alias("n"),
                F.aggregate(
                    F.collect_list("vsum"),
                    zero,
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("s"),
            )
            .collect()
        )
        for r in merged:
            m = np.asarray(r["s"]) / r["n"]
            cents[r["cell"]] = m / max(float(np.linalg.norm(m)), 1e-12)
    return cents


@query("ann_ivf_topk")
def ann_ivf_topk(spark, sf_dir, distributed_train: bool | None = None):
    """IVF: partition the corpus into cells around spherical-k-means
    centroids trained on a bounded hash-stable sample — the
    ``IVF_TRAIN_SAMPLE`` vectors with the smallest ``xxhash64(vec_id)``
    (one distributed TakeOrdered: deterministic, and unbiased even when
    vec_ids correlate with source/ingest time, unlike an id-prefix pick).
    Each query scans only its nprobe nearest cells. The centroid
    matrix is broadcast for both assignment (a per-Arrow-batch BLAS GEMM —
    see the in-line note) and probing, so the corpus-side plan is
    scan → vectorized assign → per-cell shuffle — no O(n·q) cross join,
    and the cell assignment is reusable across query batches (in a real
    deployment it is precomputed and bucketed on cell id).

    Geometry is corpus-adaptive (VERDICT r12 #1): nlist/nprobe/sample
    resolve from the row count (ivf_cells_for — the 16/6/256 floor on
    every fixture), so the per-query scan fraction SHRINKS ~1/√nlist as
    the corpus grows instead of staying a fixed 37%."""
    emb = load_table(spark, sf_dir, "embeddings")
    # spread the assignment stage (n × nlist interpreted dot products) —
    # a single-file corpus otherwise runs it in ONE scan task (see the
    # ann_lsh_topk note; same r13 probe finding)
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embd"))
    corpus = base.withColumn(
        "nrm", F.expr(f"sqrt({_DOT.format(a='embd', b='embd')})")
    )
    n_rows = _embeddings_rowcount(spark, sf_dir)
    if distributed_train is None:
        # auto: past the driver trainer's corpus envelope (cap × target
        # occupancy ≈ 4.2M vectors), train distributedly with the raised
        # cell cap — the scale path the constants' notes describe
        distributed_train = n_rows > IVF_MAX_CELLS * IVF_TARGET_CELL_ROWS
    nlist = ivf_cells_for(
        n_rows, cap=IVF_DIST_MAX_CELLS if distributed_train else IVF_MAX_CELLS
    )
    nprobe = ivf_nprobe_for(nlist)
    if distributed_train:
        trained = _ivf_train_distributed(base, nlist)
    else:
        trained = _ivf_train(
            _hash_stable_pool(base, ivf_train_sample_for(nlist)), k=nlist
        )
    # unit centroids (c_nrm ≡ 1); join sites add the broadcast hint
    cents = spark.createDataFrame(
        [(i, [float(v) for v in c], 1.0) for i, c in enumerate(trained)],
        "cell long, c_emb array<double>, c_nrm double",
    )
    # nearest-centroid assignment: one BLAS GEMM per Arrow batch against
    # the broadcast (nlist, d) centroid matrix. The previous broadcast-join
    # + max_by form evaluated n × nlist INTERPRETED array folds — fine at
    # the 16-cell fixture floor, but the r14 factor-100 probe measured it
    # as the op's bottleneck once the adaptive geometry engaged (256 cells
    # × 200k vectors ≈ 13G interpreted scalar ops, ~70 s of the 48× wall
    # ratio); the same FLOPs as a vectorized matmul are ~two orders
    # cheaper. The row norm is a positive per-row scale, so it cannot
    # change that row's argmax over cells (unit centroids) and is dropped;
    # ties break to the LOWEST cell id (np.argmax returns the first
    # maximum), matching the old max_by(cell, (sim, -cell)) order exactly.
    import numpy as np

    cmat = spark.sparkContext.broadcast(
        np.ascontiguousarray(np.asarray(trained, dtype=np.float64))
    )

    def _assign(it):
        import pandas as pd

        C = cmat.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf["embd"].to_numpy())
            yield pd.DataFrame(
                {
                    "a_id": pdf["vec_id"].to_numpy(),
                    "cell": (M @ C.T).argmax(axis=1),
                }
            )

    if np.asarray(trained).shape[0] == 0:  # empty corpus: no cells
        assigned = spark.createDataFrame([], "a_id long, cell long")
    else:
        assigned = corpus.select("vec_id", "embd").mapInPandas(
            _assign, "a_id long, cell long"
        )
    assigned = assigned.join(
        corpus.select(F.col("vec_id").alias("a_id"), "embd", "nrm"), "a_id"
    )
    # queries probe their NPROBE nearest cells
    probe_rank = Window.partitionBy("q_id").orderBy(F.desc("p_sim"), "cell")
    probes = (
        corpus.filter(F.col("vec_id") < TOPK_QUERY_IDS)
        .select(F.col("vec_id").alias("q_id"), F.col("embd").alias("q_emb"), F.col("nrm").alias("q_nrm"))
        .join(F.broadcast(cents))
        .withColumn("p_sim", F.expr(_DOT.format(a="q_emb", b="c_emb")) / (F.col("q_nrm") * F.col("c_nrm")))
        .withColumn("pr", F.row_number().over(probe_rank))
        .filter(F.col("pr") <= nprobe)
        .select("q_id", "q_emb", "q_nrm", "cell")
    )
    sim = (
        F.expr(_DOT.format(a="q_emb", b="embd")) / (F.col("q_nrm") * F.col("nrm"))
    ).alias("sim_raw")
    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("q_id") != F.col("a_id"))
        .select("q_id", F.col("a_id").alias("nn_id"), sim)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_raw"), "nn_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_K)
        .select("q_id", "nn_id", F.round("sim_raw", 6).alias("sim"), "rn")
        .orderBy("q_id", "rn")
    )


# ---------------------------------------------------------------------------
# V5. product quantization ANN — PQ codebooks + ADC top-k (rows-only;
#     recall floor pinned in tests/test_llm_ops.py)
# ---------------------------------------------------------------------------
PQ_M = 8  # subspaces (dims split M ways, e.g. 64-dim → 8 dims per subspace)
PQ_K = 16  # centroids per subspace → 4-bit codes, 8 bytes per vector
PQ_SAMPLE = 512  # training-sample cap (driver-side k-means input)
# Scale proof (VERDICT r12 #1): M/K set per-vector ENCODE work (O(M·K·d/M)
# = O(K·d), constant per row) and quantization ERROR — never bucket
# occupancy (PQ has no buckets; ADC scans are pruned by the IVF cells,
# whose geometry IS corpus-adaptive above). The shuffle stays
# partitions × queries × shortlist at every n; the sample is an accuracy
# knob for codebook quality, bounded by construction.


def _pq_train(vectors):
    """Per-subspace Lloyd k-means over a BOUNDED sample → (M, K, d/M) array.

    Codebook training is the one deliberately driver-side step: the input is
    a fixed-size sample (PQ_SAMPLE rows regardless of corpus size — at
    100 TB you sample, never scan, for codebooks) and the artifact is tiny
    (M·K·d/M floats), broadcast back to executors. Deterministic: first-K
    init, fixed iteration count, no RNG. The caller supplies a
    bottom-k-by-hash sample, so the rows (and the init) are pseudo-random
    with respect to id/source/time ordering.
    """
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    if x.size == 0:  # empty shard/corpus: zero-entry codebooks
        return np.zeros((PQ_M, 0, 1))
    n, d = x.shape
    sub = d // PQ_M
    books = np.empty((PQ_M, PQ_K, sub))
    for m in range(PQ_M):
        xs = x[:, m * sub : (m + 1) * sub]
        cents = xs[:PQ_K].copy()  # deterministic init: first K sample rows
        for _ in range(8):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(PQ_K):
                sel = xs[assign == k]
                if len(sel):
                    cents[k] = sel.mean(axis=0)
        books[m] = cents
    return books


@query("ann_pq_topk")
def ann_pq_topk(spark, sf_dir):
    """PQ + asymmetric distance computation (ADC) with exact re-rank:
    vectors compress to 8 one-byte codes; each query builds an M×K lookup
    table of partial dot products against the codebooks, so SCANNING a
    vector is M table lookups. Per partition, the ADC scan selects a
    shortlist (4× the final k) and only those rows get an exact cosine —
    the standard IVFADC + re-rank pipeline: quantization error then only
    matters at the shortlist boundary, not in the final ranking. The
    corpus-side plan is encode (map-only, broadcast codebooks) →
    per-partition vectorized ADC + bounded re-rank → global top-k; shuffle
    is partitions × queries × shortlist rows, independent of corpus size.
    Approximation error is pinned by the recall tests against the exact
    scan (including on an id-relabeled corpus)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embd"))
    books = _pq_train(_hash_stable_pool(base, PQ_SAMPLE))
    queries_rows = _query_vectors(base)
    bc = spark.sparkContext.broadcast(
        (books, [(q, v) for q, v in queries_rows])
    )
    n_parts = spark.sparkContext.defaultParallelism
    sub = None  # derived inside workers from the codebook shape

    def adc(iterator):
        import numpy as np
        import pandas as pd

        books_, queries_ = bc.value
        m, k, sub_ = books_.shape
        # per-query ADC lookup tables + exact query norms
        luts = {}
        for qid, qv in queries_:
            luts[qid] = np.stack(
                [books_[i] @ qv[i * sub_ : (i + 1) * sub_] for i in range(m)]
            )  # (M, K)
        # accumulate per-query winners ACROSS Arrow batches and emit once
        # per task: a partition arrives as many ~10k-row batches, and
        # per-batch emission would make the shuffled rows grow with corpus
        # size instead of the documented partitions × queries × k
        acc: dict = {qid: ([], []) for qid, _ in queries_}
        for pdf in iterator:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            x = np.stack(pdf["embd"].to_numpy())  # (n, d)
            nrm = np.sqrt((x * x).sum(axis=1))
            # encode: nearest codebook entry per subspace
            codes = np.empty((len(ids), m), dtype=np.int64)
            for i in range(m):
                xs = x[:, i * sub_ : (i + 1) * sub_]
                d2 = ((xs[:, None, :] - books_[i][None, :, :]) ** 2).sum(axis=2)
                codes[:, i] = d2.argmin(axis=1)
            for qid, qv in queries_:
                qn = np.sqrt(qv @ qv)
                approx = luts[qid][np.arange(m)[:, None], codes.T].sum(axis=0)
                sim = approx / (qn * np.maximum(nrm, 1e-12))
                keep = np.nonzero(ids != qid)[0]
                short = keep[np.argsort(-sim[keep])[: 4 * TOPK_K]]
                # exact re-rank of the bounded shortlist only
                exact = (x[short] @ qv) / (qn * np.maximum(nrm[short], 1e-12))
                order = np.argsort(-exact)[: TOPK_K]
                acc[qid][0].append(ids[short][order])
                acc[qid][1].append(exact[order])
        out = []
        for qid, (id_parts, sim_parts) in acc.items():
            if not id_parts:
                continue
            cid = np.concatenate(id_parts)
            csim = np.concatenate(sim_parts)
            order = np.argsort(-csim)[: TOPK_K]
            out.append(
                pd.DataFrame(
                    {"q_id": qid, "nn_id": cid[order], "sim_raw": csim[order]}
                )
            )
        if out:
            yield pd.concat(out)

    local = (
        base.repartition(n_parts, "vec_id")
        .mapInPandas(adc, "q_id long, nn_id long, sim_raw double")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_raw"), "nn_id")
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_K)
        .select("q_id", "nn_id", F.round("sim_raw", 6).alias("sim"), "rn")
        .orderBy("q_id", "rn")
    )


# ---------------------------------------------------------------------------
# V6. IVF + PQ hybrid ANN — the FAISS-style IVFADC layout: coarse cells
#     prune the scan, residual product-quantization + ADC scores only the
#     probed cells' rows, an exact re-rank fixes the shortlist boundary.
#     This is the standard billion-scale layout: per-vector storage is the
#     cell id + M bytes of codes, and a query touches nprobe/nlist of the
#     corpus. (rows-only; recall floor pinned in tests/test_llm_ops.py)
# ---------------------------------------------------------------------------
@query("ann_ivf_pq_topk")
def ann_ivf_pq_topk(spark, sf_dir):
    """IVFADC: spherical-k-means coarse cells (shared geometry with
    ann_ivf_topk) + product quantization of the RESIDUAL (x − centroid) —
    residual PQ is what makes the codes accurate, since in-cell residuals
    span a much smaller ball than raw vectors — + per-(query, cell) ADC
    lookup tables + exact cosine re-rank of a bounded shortlist.

    Spark plan: everything corpus-side is ONE mapInPandas over the scan —
    cell assignment (n×nlist BLAS per batch), probe-set membership check
    (a row is scored only for queries probing its cell: the nprobe/nlist
    scan pruning), residual encode + ADC, per-partition shortlist. The
    only shuffled rows are partitions × queries × shortlist; a final
    window takes the global top-k. Training samples are hash-stable
    bottom-k (same contract as IVF/PQ: deterministic, id-permutation
    invariant)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embd"))
    # corpus-adaptive coarse geometry, same resolution as ann_ivf_topk
    nlist = ivf_cells_for(_embeddings_rowcount(spark, sf_dir))
    nprobe = ivf_nprobe_for(nlist)
    ivf_sample = ivf_train_sample_for(nlist)
    pool = _hash_stable_pool(base, max(ivf_sample, PQ_SAMPLE))
    cents = np.asarray(_ivf_train(pool[:ivf_sample], k=nlist))  # (nlist, d)
    # PQ codebooks train on the sample's RESIDUALS against its own cells
    P = np.asarray(pool[:PQ_SAMPLE])
    p_cells = (P @ cents.T).argmax(axis=1)  # spherical: max dot
    books = _pq_train([list(r) for r in (P - cents[p_cells])])
    queries_rows = _query_vectors(base)
    # per-query probe cells (by centroid dot product, nprobe nearest)
    probes = {
        qid: np.argsort(-(cents @ qv))[:nprobe]
        for qid, qv in queries_rows
    }
    bc = spark.sparkContext.broadcast((cents, books, queries_rows, probes))
    n_parts = spark.sparkContext.defaultParallelism

    def ivfadc(iterator):
        import numpy as np
        import pandas as pd

        cents_, books_, queries_, probes_ = bc.value
        m, k, sub_ = books_.shape
        # per-query residual LUT: q·x̂ = q·c_cell + q·r̂, and q·r̂ is
        # Σ_i lut[i, code_i] with lut[i] = books[i]·q_sub_i — the LUT is
        # CELL-INDEPENDENT because the decoded vector is c + r̂
        q_luts = {
            qid: np.stack(
                [books_[i] @ qv[i * sub_ : (i + 1) * sub_] for i in range(m)]
            )
            for qid, qv in queries_
        }
        q_cdots = {qid: cents_ @ qv for qid, qv in queries_}
        # accumulate per-query winners ACROSS Arrow batches, emit once per
        # task — keeps the shuffle at partitions × queries × k regardless
        # of how many ~10k-row batches a big partition arrives as
        acc: dict = {qid: ([], []) for qid, _ in queries_}
        for pdf in iterator:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            x = np.stack(pdf["embd"].to_numpy())
            nrm = np.maximum(np.sqrt((x * x).sum(axis=1)), 1e-12)
            cell = (x @ cents_.T).argmax(axis=1)
            res = x - cents_[cell]
            codes = np.empty((len(ids), m), dtype=np.int64)
            for i in range(m):
                rs = res[:, i * sub_ : (i + 1) * sub_]
                d2 = ((rs[:, None, :] - books_[i][None, :, :]) ** 2).sum(axis=2)
                codes[:, i] = d2.argmin(axis=1)
            for qid, qv in queries_:
                qn = np.sqrt(qv @ qv)
                # cell-pruned scan: only rows whose cell this query probes
                mask = np.isin(cell, probes_[qid]) & (ids != qid)
                rows = np.nonzero(mask)[0]
                if not rows.size:
                    continue
                q_r = q_luts[qid][np.arange(m)[:, None], codes[rows].T].sum(axis=0)
                approx = (q_cdots[qid][cell[rows]] + q_r) / (qn * nrm[rows])
                short = rows[np.argsort(-approx)[: 4 * TOPK_K]]
                exact = (x[short] @ qv) / (qn * nrm[short])
                order = np.argsort(-exact)[: TOPK_K]
                acc[qid][0].append(ids[short][order])
                acc[qid][1].append(exact[order])
        out = []
        for qid, (id_parts, sim_parts) in acc.items():
            if not id_parts:
                continue
            cid = np.concatenate(id_parts)
            csim = np.concatenate(sim_parts)
            order = np.argsort(-csim)[: TOPK_K]
            out.append(
                pd.DataFrame(
                    {"q_id": qid, "nn_id": cid[order], "sim_raw": csim[order]}
                )
            )
        if out:
            yield pd.concat(out)

    local = (
        base.repartition(n_parts, "vec_id")
        .mapInPandas(ivfadc, "q_id long, nn_id long, sim_raw double")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_raw"), "nn_id")
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_K)
        .select("q_id", "nn_id", F.round("sim_raw", 6).alias("sim"), "rn")
        .orderBy("q_id", "rn")
    )


# ---------------------------------------------------------------------------
# T1. text statistics + quality score (oracle-matched)
# ---------------------------------------------------------------------------
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
_SW = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "text_stats",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             length(text) AS n_chars_calc,
             len(regexp_extract_all(text, '\\S+')) AS n_tokens,
             len({SQL_WORDS}) AS n_words,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
             len(list_filter({SQL_WORDS}, x -> x IN ({_SW}))) AS n_stop
      FROM documents)
    SELECT doc_id, n_chars_calc, n_tokens, n_words, n_punct,
           ROUND(CAST(n_stop AS DOUBLE) / greatest(n_words, 1), 6) AS stop_ratio,
           ROUND(least(CAST(n_words AS DOUBLE) / 50, 1.0) * 0.6
                 + (1 - CAST(n_stop AS DOUBLE) / greatest(n_words, 1)) * 0.2
                 + least(CAST(n_chars_calc AS DOUBLE) / 500, 1.0) * 0.2, 6) AS quality
    FROM b ORDER BY doc_id
    """,
)
def text_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_words = F.expr(f"size({WORDS})")
    n_stop = F.expr(f"size(filter({WORDS}, x -> x IN ({_SW})))")
    stop_ratio = n_stop.cast("double") / F.greatest(n_words, F.lit(1))
    quality = (
        F.least(n_words.cast("double") / 50, F.lit(1.0)) * 0.6
        + (1 - stop_ratio) * 0.2
        + F.least(F.length("text").cast("double") / 500, F.lit(1.0)) * 0.2
    )
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        F.expr("size(regexp_extract_all(text, '\\\\S+', 0))").cast("long").alias("n_tokens"),
        n_words.cast("long").alias("n_words"),
        F.length(F.regexp_replace("text", "[^.,;:!?]", "")).cast("long").alias("n_punct"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T1b. token counting — whitespace + BPE-ish regex segmentation
# ---------------------------------------------------------------------------
# letter runs | single digits | single non-alphanumeric marks (GPT-2-flavored
# pre-tokenization, minus byte-level merges — deterministic + JVM-regex-able)
BPE_PAT = r"[a-z]+|[0-9]|[^a-z0-9\s]"


@query(
    "token_count",
    oracle=rf"""
    WITH b AS (
      SELECT doc_id, length(text) AS n_chars_calc,
             len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
             len(regexp_extract_all(lower(text), '{BPE_PAT}')) AS n_bpe_tokens
      FROM documents)
    SELECT doc_id, n_chars_calc, n_ws_tokens, n_bpe_tokens,
           ROUND(CAST(n_chars_calc AS DOUBLE) / greatest(n_bpe_tokens, 1), 6)
             AS chars_per_token
    FROM b ORDER BY doc_id
    """,
)
def token_count(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_ws = F.expr(r"size(regexp_extract_all(text, '\\S+', 0))").cast("long")
    n_bpe = F.expr(rf"size(regexp_extract_all(lower(text), '{BPE_PAT.replace(chr(92), chr(92) * 2)}', 0))").cast(
        "long"
    )
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(
            F.length("text").cast("double") / F.greatest(n_bpe, F.lit(1)), 6
        ).alias("chars_per_token"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T2. n-gram-marker language ID (oracle-matched; deterministic heuristic)
# ---------------------------------------------------------------------------
_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "que"),
}


def _marker_counts_sql() -> str:
    parts = []
    for lang, ws in _MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in ws)
        parts.append(f"len(list_filter({SQL_WORDS}, x -> x IN ({lst}))) AS c_{lang}")
    return ", ".join(parts)


@query(
    "lang_id",
    oracle=f"""
    WITH b AS (SELECT doc_id, lang, {_marker_counts_sql()} FROM documents)
    SELECT doc_id, lang,
           CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
                WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                WHEN c_fr >= c_es THEN 'fr'
                ELSE 'es' END AS pred_lang,
           c_en, c_de, c_fr, c_es
    FROM b ORDER BY doc_id
    """,
)
def lang_id(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    cols = {}
    for lang, ws in _MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in ws)
        cols[lang] = F.expr(f"size(filter({WORDS}, x -> x IN ({lst})))").cast("long")
    pred = (
        F.when(
            (cols["en"] >= cols["de"]) & (cols["en"] >= cols["fr"]) & (cols["en"] >= cols["es"]),
            "en",
        )
        .when((cols["de"] >= cols["fr"]) & (cols["de"] >= cols["es"]), "de")
        .when(cols["fr"] >= cols["es"], "fr")
        .otherwise("es")
    )
    return d.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        cols["en"].alias("c_en"),
        cols["de"].alias("c_de"),
        cols["fr"].alias("c_fr"),
        cols["es"].alias("c_es"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T3. document fingerprint — md5 over whitespace-normalized text
# ---------------------------------------------------------------------------
@query(
    "doc_fingerprint",
    oracle=r"""
    SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def doc_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fp"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# M1. multimodal column plumbing — binary payload + typed metadata
# ---------------------------------------------------------------------------
@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS digest
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_meta(spark, sf_dir):
    # Binary columns are first-class: payload stays opaque bytes; metadata
    # (size, content digest) is computed JVM-side. The decode path for real
    # image/audio payloads is in operators/multimodal.py (mapInPandas).
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T4. quality gate — threshold filter over the quality score (the curation
#     decision a training pipeline applies before dedup; oracle-matched)
# ---------------------------------------------------------------------------
# THE quality score as an inline DuckDB expression over documents' text —
# the SQL twin of quality_expr() below; consumed by the
# quality_weighted_sample / budget_curation / curation_pipeline oracles
# (quality_filter's and streaming_quality_filter's oracles carry the same
# formula in CTE-decomposed form — a heuristic tweak must touch all of them)
QUALITY_SQL = f"""least(CAST(len({SQL_WORDS}) AS DOUBLE) / 50, 1.0) * 0.6
              + (1 - CAST(len(list_filter({SQL_WORDS}, x -> x IN ({_SW})))
                      AS DOUBLE) / greatest(len({SQL_WORDS}), 1)) * 0.2
              + least(CAST(length(text) AS DOUBLE) / 500, 1.0) * 0.2"""


def quality_expr():
    """THE quality score, as a Spark Column over a `text` column — the single
    Python definition consumed by quality_filter, streaming_quality_filter,
    quality_weighted_sample, and budget_curation (QUALITY_SQL above is its
    inline DuckDB twin; a heuristic tweak must change this helper and the
    oracle strings together or engines disagree)."""
    n_words = F.expr(f"size({WORDS})")
    n_stop = F.expr(f"size(filter({WORDS}, x -> x IN ({_SW})))")
    return (
        F.least(n_words.cast("double") / 50, F.lit(1.0)) * 0.6
        + (1 - n_stop.cast("double") / F.greatest(n_words, F.lit(1))) * 0.2
        + F.least(F.length("text").cast("double") / 500, F.lit(1.0)) * 0.2
    )


QUALITY_MIN = 0.5
MIN_WORDS = 10


@query(
    "quality_filter",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang, source, length(text) AS n_chars_calc,
             len({SQL_WORDS}) AS n_words,
             len(list_filter({SQL_WORDS}, x -> x IN ({_SW}))) AS n_stop
      FROM documents),
    q AS (
      SELECT *, least(CAST(n_words AS DOUBLE) / 50, 1.0) * 0.6
              + (1 - CAST(n_stop AS DOUBLE) / greatest(n_words, 1)) * 0.2
              + least(CAST(n_chars_calc AS DOUBLE) / 500, 1.0) * 0.2 AS quality
      FROM b)
    SELECT source, COUNT(*) AS n_kept,
           ROUND(SUM(quality) / COUNT(*), 6) AS avg_quality
    FROM q WHERE quality >= {QUALITY_MIN} AND n_words >= {MIN_WORDS}
    GROUP BY source ORDER BY source
    """,
)
def quality_filter(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_words = F.expr(f"size({WORDS})")
    quality = quality_expr()
    return (
        d.withColumn("quality", quality)
        .filter((F.col("quality") >= QUALITY_MIN) & (n_words >= MIN_WORDS))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.sum("quality") / F.count("*"), 6).alias("avg_quality"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# D5. dedup materialization — the surviving corpus after exact + fuzzy dedup
#     (pairs → loser set → anti-join; the end-to-end curation step)
# ---------------------------------------------------------------------------
@query(
    "dedup_materialize",
    oracle=f"""
    WITH exact_losers AS (
      SELECT doc_id FROM (
        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents) WHERE rn > 1),
    {SQL_SHINGLE_CTES},
    {SQL_JACCARD_CAND_CTES},
    fuzzy_losers AS (
      SELECT DISTINCT p.b AS doc_id
      FROM pair p JOIN cnt ca ON ca.doc_id = p.a JOIN cnt cb ON cb.doc_id = p.b
      WHERE CAST(p.i AS DOUBLE) / (ca.n + cb.n - p.i) >= 0.8),
    losers AS (SELECT doc_id FROM exact_losers UNION SELECT doc_id FROM fuzzy_losers)
    SELECT d.source, COUNT(*) AS n_surviving
    FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
    GROUP BY d.source ORDER BY d.source
    """,
)
def dedup_materialize(spark, sf_dir):
    """Pairs → canonical-survivor corpus: exact-dup losers (all but the min
    doc_id per content hash) plus fuzzy losers (the larger id of every
    Jaccard-≥0.8 pair) are anti-joined away. At scale the loser set is tiny
    relative to the corpus, so the anti-join broadcasts."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact_losers = (
        d.select("doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    fuzzy_losers = jaccard_pairs_df(spark, sf_dir).select(F.col("b").alias("doc_id"))
    losers = exact_losers.union(fuzzy_losers).distinct()
    return (
        d.join(F.broadcast(losers), "doc_id", "left_anti")
        .groupBy("source")
        .agg(F.count("*").alias("n_surviving"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# M2. multimodal decode + feature pipeline (rows-only: the stub decode is
#     hash-derived, not SQL-expressible; unit tests pin exact values)
# ---------------------------------------------------------------------------
@query("multimodal_decode")
def multimodal_decode(spark, sf_dir):
    """Binary payload → mapInPandas decode → feature extraction → join.

    The full multimodal shape: payloads stay executor-side as binary columns,
    decode and feature stages are Arrow-batched (operators/multimodal.py),
    and the result is a per-document typed record. Text bytes stand in for
    image payloads (no codecs in this environment; decode is a deterministic
    stub)."""
    from ..operators import multimodal as mm

    d = load_table(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    payloads = mm.attach_payload(
        d.repartition(n, "doc_id").withColumn("img", F.encode("text", "UTF-8")), "img"
    )
    decoded = mm.decode(payloads)
    feats = mm.extract_features(payloads)
    return (
        decoded.join(feats, "doc_id")
        .select(
            "doc_id",
            "fmt",  # real container sniff (text payloads → 'unknown')
            "width",
            "height",
            "channels",
            F.round("mean_intensity", 6).alias("mean_intensity"),
            F.round(F.element_at("features", 1), 6).alias("f0"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# E1. gap-based sessionization of the events stream, batch analog
#     (session-window semantics over window functions; oracle-matched)
# ---------------------------------------------------------------------------
SESSION_GAP_US = 1_800_000_000  # 30 min


@query(
    "events_sessionize",
    oracle=f"""
    WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
    f AS (SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id) > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS nf FROM b),
    s AS (SELECT *, CAST(1 + SUM(nf) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM f)
    SELECT user_id, sid, COUNT(*) AS n_events,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
    FROM s GROUP BY user_id, sid ORDER BY user_id, sid
    """,
)
def events_sessionize(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts_us")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    # two steps: window functions can't nest (lag inside sum), so the
    # new-session flag is materialized before the running sum
    flagged = e.withColumn(
        "nf",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US, 1).otherwise(0),
    )
    sid = (
        F.lit(1)
        + F.sum("nf").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ).cast("long")
    return (
        flagged.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
        )
        .orderBy("user_id", "sid")
    )


# ---------------------------------------------------------------------------
# D6. deterministic corpus split — train/val/test by a portable content hash
#     (lower 64 bits of md5 over the stable doc key; DuckDB exposes the same
#     value as md5_number_lower, Spark reconstructs it with conv over the
#     byte-reversed hex tail — verified bit-identical)
# ---------------------------------------------------------------------------
_SPLIT_HASH = (
    "CAST(conv(concat_ws('', transform(sequence(15, 0, -1), "
    "i -> substring(md5(CAST(doc_id AS STRING)), 17 + i*2, 2))), 16, 10) "
    "AS DECIMAL(20,0))"
)


@query(
    "curation_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, len({SQL_WORDS}) AS n_tokens,
             md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS bucket
      FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM b GROUP BY 1 ORDER BY split
    """,
)
def curation_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split. Hashing the stable key
    (not a random()) makes the split reproducible across runs, engines, and
    repartitioning — the property a training pipeline needs so no document
    ever migrates between splits. Map-only until the 3-group aggregate;
    scales embarrassingly."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPLIT_HASH) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), F.expr(f"size({WORDS})").alias("n_tokens"))
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("sum_tokens"))
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# E0. hypertable rollup — minute/hour/day continuous aggregates of the
#     events table in ONE pass (the timeseries-DB materialized-rollup
#     primitive). GROUPING SETS compiles to a single Expand over the scan:
#     every resolution's partial aggregates combine map-side, so the 100 TB
#     cost is one scan + one (bucket, event_type)-keyed shuffle whose
#     cardinality is the union of the three rollup tables — not three scans
#     and not raw rows.
# ---------------------------------------------------------------------------
@query(
    "events_hypertable_rollup",
    oracle=f"""
    WITH b AS (
      SELECT (epoch_us(ts) // 60000000) * 60 AS m,
             (epoch_us(ts) // 3600000000) * 3600 AS h,
             (epoch_us(ts) // 86400000000) * 86400 AS d,
             event_type, value
      FROM events)
    SELECT CASE WHEN GROUPING(m) = 0 THEN 'minute'
                WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS resolution,
           CAST(COALESCE(m, h, d) AS BIGINT) AS bucket_start,
           event_type, COUNT(*) AS c, {sql_dsum("value", "sv")}
    FROM b
    GROUP BY GROUPING SETS ((m, event_type), (h, event_type), (d, event_type))
    ORDER BY resolution, bucket_start, event_type
    """,
)
def events_hypertable_rollup(spark, sf_dir):
    """Multi-resolution event rollup: (minute, hour, day) × event_type
    bucket aggregates from one GROUPING SETS pass. Buckets are exact
    epoch-second integers (bigint floor-division — engine- and
    timezone-independent), sums are DECIMAL-exact, so the three rollup
    resolutions hash-match the oracle bit-for-bit at any parallelism."""
    b = load_table(spark, sf_dir, "events").select(
        (F.expr("ts_us div 60000000") * 60).alias("m"),
        (F.expr("ts_us div 3600000000") * 3600).alias("h"),
        (F.expr("ts_us div 86400000000") * 86400).alias("d"),
        "event_type",
        "value",
    )
    res = (
        F.when(F.grouping("m") == 0, "minute")
        .when(F.grouping("h") == 0, "hour")
        .otherwise("day")
    )
    return (
        b.groupingSets(
            [["m", "event_type"], ["h", "event_type"], ["d", "event_type"]],
            "m",
            "h",
            "d",
            "event_type",
        )
        .agg(
            res.alias("resolution"),
            F.coalesce("m", "h", "d").alias("bucket_start"),
            F.count("*").alias("c"),
            dsum("value", "sv"),
        )
        .select("resolution", "bucket_start", "event_type", "c", "sv")
        .orderBy("resolution", "bucket_start", "event_type")
    )


# ---------------------------------------------------------------------------
# D7. token-balanced shard packing — assign docs to fixed-token-budget shards
#     (sequential bin packing per source partition: running token cumsum /
#     capacity; the per-source window keeps the sort parallel across sources,
#     never a global single-partition sort)
# ---------------------------------------------------------------------------
SHARD_TOKENS = 4096


@query(
    "shard_pack",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id, len({SQL_WORDS}) AS n_tokens FROM documents),
    c AS (
      SELECT source, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT source, CAST(FLOOR((cum - n_tokens) / {SHARD_TOKENS}) AS BIGINT) AS shard,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM c GROUP BY source, shard ORDER BY source, shard
    """,
)
def shard_pack(spark, sf_dir):
    """Greedy sequential packing: a doc opens a new shard when the running
    token count crosses the budget. PARTITION BY source bounds each sort to
    one source's rows — shards are computed in parallel across sources and
    the plan has exactly one shuffle (the window partitioning). A global
    ORDER BY doc_id instead would serialize the cumsum at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id", F.expr(f"size({WORDS})").alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        t.withColumn("shard", F.floor((cum - F.col("n_tokens")) / SHARD_TOKENS))
        .groupBy("source", "shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("sum_tokens"))
        .orderBy("source", "shard")
    )


# ---------------------------------------------------------------------------
# D7b. sequence packing — concat-and-chunk into fixed-length training
#      examples. Unlike shard_pack (whole docs into token-budget shards),
#      this is the pretraining data layout: the per-source token stream is
#      cut every SEQ_LEN tokens and a document SPANS example boundaries.
# ---------------------------------------------------------------------------
SEQ_LEN = 512


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id, len({SQL_WORDS}) AS n FROM documents),
    p AS (
      SELECT source, doc_id, n,
             SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM t WHERE n > 0),
    e AS (
      SELECT source, doc_id, n, cum,
             unnest(range(CAST(FLOOR((cum - n) / {SEQ_LEN}.0) AS BIGINT),
                          CAST(FLOOR((cum - 1) / {SEQ_LEN}.0) AS BIGINT) + 1)) AS ex
      FROM p)
    SELECT source, ex AS example_id, COUNT(*) AS n_docs,
           CAST(SUM(LEAST(cum, (ex + 1) * {SEQ_LEN})
                    - GREATEST(cum - n, ex * {SEQ_LEN})) AS BIGINT) AS n_tokens
    FROM e GROUP BY source, ex ORDER BY source, example_id
    """,
)
def pack_sequences(spark, sf_dir):
    """Sequence packing for pretraining: concatenate each source's token
    stream (docs in doc_id order) and cut a training example every SEQ_LEN
    tokens; a document can SPAN example boundaries — the standard
    concat-and-chunk layout, vs shard_pack's whole-doc binning. Output is
    one row per (source, example) with the overlapping-doc count and the
    example's token count (= SEQ_LEN except each source's last example).

    Scale shape: the running cumsum is one window shuffle PARTITIONED BY
    source (parallel across sources, never a global sort); each doc then
    explodes to only the examples it overlaps — total extra rows ≈
    total_tokens / SEQ_LEN + n_docs, linear — and the (source, example)
    aggregate is map-side combinable. Deterministic by doc_id order, so
    the layout is reproducible across runs and engines."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id", F.expr(f"size({WORDS})").alias("n")).filter(
        F.col("n") > 0
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("cum", F.sum("n").over(w))
    first_ex = F.expr(f"(cum - n) div {SEQ_LEN}")
    last_ex = F.expr(f"(cum - 1) div {SEQ_LEN}")
    e = t.select(
        "source",
        "n",
        "cum",
        F.explode(F.sequence(first_ex, last_ex)).alias("example_id"),
    )
    tok_in_ex = F.least(
        F.col("cum"), (F.col("example_id") + 1) * SEQ_LEN
    ) - F.greatest(F.col("cum") - F.col("n"), F.col("example_id") * SEQ_LEN)
    return (
        e.groupBy("source", "example_id")
        .agg(F.count("*").alias("n_docs"), F.sum(tok_in_ex).alias("n_tokens"))
        .orderBy("source", "example_id")
    )


@query(
    "pack_sequences_spans",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id, len({SQL_WORDS}) AS n FROM documents),
    p AS (
      SELECT source, doc_id, n,
             SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM t WHERE n > 0),
    e AS (
      SELECT source, doc_id, n, cum,
             unnest(range(CAST(FLOOR((cum - n) / {SEQ_LEN}.0) AS BIGINT),
                          CAST(FLOOR((cum - 1) / {SEQ_LEN}.0) AS BIGINT) + 1)) AS ex
      FROM p)
    SELECT source, ex AS example_id, doc_id,
           CAST(GREATEST(cum - n, ex * {SEQ_LEN}) - (cum - n) AS BIGINT)
             AS start_tok,
           CAST(LEAST(cum, (ex + 1) * {SEQ_LEN}) - (cum - n) AS BIGINT)
             AS end_tok,
           CAST(GREATEST(cum - n, ex * {SEQ_LEN}) - ex * {SEQ_LEN} AS BIGINT)
             AS ex_offset
    FROM e ORDER BY source, example_id, ex_offset
    """,
)
def pack_sequences_spans(spark, sf_dir):
    """The packing LAYOUT itself — what a shard writer consumes (VERDICT
    r6/r7 #4; :func:`pack_sequences` keeps the per-example stats view).
    One row per document-example OVERLAP: example ``example_id`` of
    ``source`` contains tokens ``[start_tok, end_tok)`` of ``doc_id``
    (doc-relative, end-exclusive), placed at ``ex_offset`` within the
    example. A writer materializes example ``e`` by concatenating its rows
    in ``ex_offset`` order, slicing each doc's token stream at
    [start_tok, end_tok) — no re-tokenization, no second pass over the
    text.

    Same scale shape as the stats view: ONE window shuffle partitioned by
    source for the running cumsum, then a linear explode to only the
    examples each doc overlaps (≈ total_tokens/SEQ_LEN + n_docs rows) —
    no aggregate at all, so this is strictly cheaper than the stats query.
    Invariants pinned by tests/test_llm_ops.py: spans within an example
    tile [0, SEQ_LEN) gaplessly (except each source's final example), and
    concatenating every source's spans in (example_id, ex_offset) order
    reassembles its token stream exactly."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id", F.expr(f"size({WORDS})").alias("n")).filter(
        F.col("n") > 0
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("cum", F.sum("n").over(w))
    first_ex = F.expr(f"(cum - n) div {SEQ_LEN}")
    last_ex = F.expr(f"(cum - 1) div {SEQ_LEN}")
    e = t.select(
        "source",
        "doc_id",
        "n",
        "cum",
        F.explode(F.sequence(first_ex, last_ex)).alias("example_id"),
    )
    doc_start = F.col("cum") - F.col("n")  # doc's global token offset
    g_start = F.greatest(doc_start, F.col("example_id") * SEQ_LEN)
    g_end = F.least(F.col("cum"), (F.col("example_id") + 1) * SEQ_LEN)
    return e.select(
        "source",
        "example_id",
        "doc_id",
        (g_start - doc_start).cast("long").alias("start_tok"),
        (g_end - doc_start).cast("long").alias("end_tok"),
        (g_start - F.col("example_id") * SEQ_LEN).cast("long").alias("ex_offset"),
    ).orderBy("source", "example_id", "ex_offset")


# ---------------------------------------------------------------------------
# D8. table profiling — per-column null/distinct/extremes in ONE pass
#     (data-quality gate before a corpus ships to training)
# ---------------------------------------------------------------------------
_PROFILE_COLS = ("doc_id", "lang", "source", "n_chars")


@query(
    "profile_table",
    oracle=" UNION ALL ".join(
        f"""SELECT '{c}' AS col, COUNT(*) AS n, COUNT({c}) AS n_nonnull,
            COUNT(DISTINCT {c}) AS n_distinct,
            CAST(MIN({c}) AS VARCHAR) AS min_v, CAST(MAX({c}) AS VARCHAR) AS max_v
            FROM documents"""
        for c in _PROFILE_COLS
    )
    + " ORDER BY col",
)
def profile_table(spark, sf_dir):
    """Column profile (row count, non-null count, exact distinct, extremes)
    for the curation dashboard. ONE aggregation pass computes every column's
    stats (Catalyst plans the distincts via a single Expand), instead of one
    job per column — the difference between 1 scan and N scans of a 100 TB
    table. At real scale swap COUNT(DISTINCT) for approx_count_distinct and
    keep the plan shape; exact distinct here keeps the DuckDB oracle
    hash-matched."""
    d = load_table(spark, sf_dir, "documents")
    profiled = d.agg(
        F.count("*").alias("n"),
        *[
            agg
            for c in _PROFILE_COLS
            for agg in (
                F.count(c).alias(f"nn_{c}"),
                F.countDistinct(c).alias(f"nd_{c}"),
                F.min(c).cast("string").alias(f"mn_{c}"),
                F.max(c).cast("string").alias(f"mx_{c}"),
            )
        ],
    )
    unpivoted = profiled.selectExpr(
        "stack({n}, {args}) AS (col, n_nonnull, n_distinct, min_v, max_v)".format(
            n=len(_PROFILE_COLS),
            args=", ".join(
                f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
            ),
        ),
        "n",
    )
    return unpivoted.select(
        "col", "n", "n_nonnull", "n_distinct", "min_v", "max_v"
    ).orderBy("col")


@query("profile_table_sketch")
def profile_table_sketch(spark, sf_dir):
    """The 100 TB form of ``profile_table``: identical output schema and
    single-pass plan, but distinct counts come from HyperLogLog++ sketches
    (``approx_count_distinct``, rsd=0.02) instead of exact COUNT(DISTINCT).
    Exact per-column distincts expand the input once per column (Catalyst's
    Expand) and shuffle raw values; HLL++ sketches are fixed-size (~1.5 KB
    at rsd=0.02), merge associatively in the partial-agg combine, and keep
    the whole profile a single map-side-combined aggregation — the only
    shape that profiles a 100 TB table in one bounded-memory pass. No SQL
    oracle (sketch estimates are engine-specific); pinned by a tolerance
    test against the exact ``profile_table`` and by exactness of every
    non-sketched column."""
    d = load_table(spark, sf_dir, "documents")
    profiled = d.agg(
        F.count("*").alias("n"),
        *[
            agg
            for c in _PROFILE_COLS
            for agg in (
                F.count(c).alias(f"nn_{c}"),
                F.approx_count_distinct(c, rsd=0.02).alias(f"nd_{c}"),
                F.min(c).cast("string").alias(f"mn_{c}"),
                F.max(c).cast("string").alias(f"mx_{c}"),
            )
        ],
    )
    unpivoted = profiled.selectExpr(
        "stack({n}, {args}) AS (col, n_nonnull, n_distinct, min_v, max_v)".format(
            n=len(_PROFILE_COLS),
            args=", ".join(
                f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
            ),
        ),
        "n",
    )
    return unpivoted.select(
        "col", "n", "n_nonnull", "n_distinct", "min_v", "max_v"
    ).orderBy("col")


# ---------------------------------------------------------------------------
# P3. exact distributed quantiles via VALUE HISTOGRAM — per-source p50/p90/
#     p99 of document length. The 100 TB design point: Spark's exact
#     ``percentile`` buffers every value per group on one reducer, and
#     ``approx_percentile`` trades exactness for mergeability. A histogram
#     plan gets BOTH when the value domain is bounded (lengths, token
#     counts, status codes): groupBy (source, v) is a map-side-combined
#     aggregate whose shuffle cardinality is the DISTINCT-VALUE count, not
#     the row count; the rank cumsum then runs over that bounded histogram.
# ---------------------------------------------------------------------------
@query(
    "profile_quantiles",
    oracle="""
    WITH h AS (SELECT source, length(text) AS v, COUNT(*) AS c
               FROM documents GROUP BY source, length(text)),
    t AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    cum AS (SELECT h.source, h.v,
                   SUM(h.c) OVER (PARTITION BY h.source ORDER BY h.v) AS cum,
                   t.n
            FROM h JOIN t USING (source))
    SELECT source,
           MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN v END) AS p50,
           MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN v END) AS p90,
           MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN v END) AS p99,
           MAX(v) AS v_max, MAX(n) AS n_docs
    FROM cum GROUP BY source ORDER BY source
    """,
)
def profile_quantiles(spark, sf_dir):
    """Exact per-source length quantiles (lower quantile_disc convention:
    the smallest value whose cumulative count reaches ceil(q·n)) — same
    rank arithmetic on both engines, so the oracle is exact, not a
    tolerance check. Window cumsum runs over the HISTOGRAM (one row per
    distinct (source, value)), never the raw rows."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.length("text").cast("bigint").alias("v")
    )
    h = d.groupBy("source", "v").agg(F.count("*").alias("c"))
    # per-source totals as an UNBOUNDED window over the same partitioning as
    # the rank cumsum — one shuffle, one pipeline; a separate groupBy + join
    # would re-evaluate the histogram subtree (second corpus scan)
    cum = h.withColumn(
        "cum", F.sum("c").over(Window.partitionBy("source").orderBy("v"))
    ).withColumn("n", F.sum("c").over(Window.partitionBy("source")))

    def pick(q: float, alias: str):
        return F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("v"))
        ).alias(alias)

    return (
        cum.groupBy("source")
        .agg(
            pick(0.5, "p50"),
            pick(0.9, "p90"),
            pick(0.99, "p99"),
            F.max("v").alias("v_max"),
            F.max("n").alias("n_docs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# D8. benchmark decontamination — flag training docs sharing word-8-grams
#     with an evaluation/benchmark set (the standard n-gram-collision
#     decontamination pass run before every training job)
# ---------------------------------------------------------------------------
def sql_g8_ctes(tag: str = "") -> str:
    """Word-8-gram CTE chain ending in g8(doc_id, s) — THE gram definition
    shared by decontaminate, decontaminate_fuzzy, and curation_pipeline.
    `tag` de-collides the intermediate CTE names when the chain is composed
    with the shingle CTEs (which also define w/idx) in one statement."""
    return f"""
    w{tag} AS (SELECT doc_id, {SQL_WORDS} AS ws FROM documents),
    idx{tag} AS (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 7, 1) + 1)) AS g FROM w{tag}),
    g8 AS (SELECT DISTINCT doc_id,
                  ws[g]||' '||ws[g+1]||' '||ws[g+2]||' '||ws[g+3]||' '||
                  ws[g+4]||' '||ws[g+5]||' '||ws[g+6]||' '||ws[g+7] AS s
           FROM idx{tag} WHERE ws[g+7] IS NOT NULL)
"""


_SQL_G8_CTES = sql_g8_ctes()


def hashed_g8(spark, sf_dir) -> DataFrame:
    """(doc_id, h): xxhash64'd word-8-grams off the shared token cache —
    the single Spark-side gram construction behind the three consumers of
    sql_g8_ctes (8-byte keys shuffle/broadcast instead of ~60-char strings;
    the oracles join the strings, collision P negligible)."""
    t = tokenized_docs(spark, sf_dir)
    return t.select(
        "doc_id", F.explode(F.expr(NGRAMS.format(ws="ws", k=8))).alias("s")
    ).select("doc_id", F.xxhash64("s").alias("h"))


@query(
    "decontaminate",
    oracle=f"""
    WITH {_SQL_G8_CTES},
    bench AS (SELECT doc_id AS bench_id, s FROM g8 WHERE doc_id % 20 = 0),
    train AS (SELECT doc_id, s FROM g8 WHERE doc_id % 20 <> 0)
    SELECT t.doc_id, COUNT(DISTINCT t.s) AS n_grams_hit,
           COUNT(DISTINCT b.bench_id) AS n_bench_docs
    FROM train t JOIN bench b ON t.s = b.s
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def decontaminate(spark, sf_dir):
    """Decontamination: training documents that share any word-8-gram with
    the benchmark partition (here: every 20th doc_id stands in for the eval
    set). 100 TB shape: benchmark sets are tiny (MBs of eval data against TBs
    of corpus), so the benchmark's hashed-8-gram index BROADCASTS — the
    collision check is a map-side hash probe over the corpus scan, no
    shuffle until the tiny per-contaminated-doc aggregate. 8-gram hashes are
    8-byte xxhash64 (collision P negligible; oracle joins the strings)."""
    g8 = hashed_g8(spark, sf_dir)
    bench = g8.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("bench_id"), "h"
    )
    train = g8.filter(F.col("doc_id") % 20 != 0)
    return (
        train.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_grams_hit"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# D9. duplicate-cluster connected components — min-label propagation over the
#     near-dup pair graph (real pipelines keep ONE representative per dup
#     CLUSTER, not per pair; a–b, b–c must collapse to one component)
# ---------------------------------------------------------------------------
@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {SQL_SHINGLE_CTES},
    {SQL_JACCARD_CAND_CTES},
    jpairs AS (
      SELECT p.a, p.b
      FROM pair p JOIN cnt ca ON ca.doc_id = p.a JOIN cnt cb ON cb.doc_id = p.b
      WHERE CAST(p.i AS DOUBLE) / (ca.n + cb.n - p.i) >= 0.8),
    edges AS (SELECT a AS u, b AS v FROM jpairs UNION SELECT b, a FROM jpairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v)
    SELECT u AS doc_id, CAST(LEAST(u, MIN(v)) AS BIGINT) AS component
    FROM reach GROUP BY u ORDER BY doc_id
    """,
)
def dedup_components(spark, sf_dir):
    """Connected components over the jaccard-pair graph; the component id is
    the minimum doc_id reachable. Uses alternating large-star/small-star
    (see _connected_components) — O(log² n) rounds on ANY graph topology, so
    a pathological long-chain dup graph cannot stall the pipeline the way
    plain min-label propagation (O(diameter) rounds) would."""
    pairs = jaccard_pairs_df(spark, sf_dir).select("a", "b")
    labels, _ = _connected_components(pairs)
    return labels.orderBy("doc_id")


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {SQL_SHINGLE_CTES},
    {SQL_JACCARD_CAND_CTES},
    jpairs AS (
      SELECT p.a, p.b
      FROM pair p JOIN cnt ca ON ca.doc_id = p.a JOIN cnt cb ON cb.doc_id = p.b
      WHERE CAST(p.i AS DOUBLE) / (ca.n + cb.n - p.i) >= 0.8),
    edges AS (SELECT a AS u, b AS v FROM jpairs UNION SELECT b, a FROM jpairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v),
    comp AS (
      SELECT u AS doc_id, CAST(LEAST(u, MIN(v)) AS BIGINT) AS component
      FROM reach GROUP BY u),
    everydoc AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster, d.n_chars
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
    SELECT doc_id, cluster, n_chars FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rn
      FROM everydoc)
    WHERE rn = 1 ORDER BY cluster
    """,
)
def dedup_keep_best(spark, sf_dir):
    """Duplicate-cluster representative selection — the step that turns the
    dup-cluster labels into a curated corpus: every document joins its
    connected component (singletons form their own cluster), and ONE
    representative per cluster survives, chosen by quality (longest text,
    doc_id tie-break). Plan shape: doc→label join keyed on doc_id, then one
    window over cluster — both shuffles are on the natural keys, labels are
    joined (never collected; the label table grows with the corpus, so no
    broadcast), and the quality argmax is a row_number window, not a
    groupBy + self-join."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labels, _ = _connected_components(
        jaccard_pairs_df(spark, sf_dir).select("a", "b")
    )
    every = d.join(labels, "doc_id", "left").withColumn(
        "cluster", F.coalesce("component", F.col("doc_id"))
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("n_chars"), "doc_id")
    return (
        every.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster", "n_chars")
        .orderBy("cluster")
    )


def _connected_components(pairs: DataFrame, max_rounds: int = 25):
    """Alternating large-star/small-star connected components.

    The MapReduce CC algorithm of Kiveris et al., "Connected Components in
    MapReduce and Beyond" (SoCC'14): each round rewires every node's
    strictly-larger neighbors to its minimum neighbor (large-star), then
    collapses each node's smaller neighbors onto that minimum (small-star).
    The edge set converges to stars centered at component minima in
    O(log² n) rounds regardless of graph diameter. Each star phase is ONE
    edge-list shuffle (per-u minima via an unbounded window over the rows'
    own partitioning) — no collect_list (a mega-hub's neighbor set never
    materializes in one row), no driver-side data (the loop carries only
    counts), and localCheckpoint truncates per-round lineage.

    ``pairs`` is an undirected edge list with columns (a, b). Returns
    (labels, rounds): labels has (doc_id, component) for every node incident
    to an edge.

    Lineage truncation: when the session has a reliable checkpoint dir
    configured (``sc.setCheckpointDir``), per-round state goes through
    ``checkpoint()`` — executor loss on a real cluster then recovers from
    the checkpoint files instead of killing the job, which matters for a
    long iterative loop at 100 TB. Without one (local notebooks),
    ``localCheckpoint()`` keeps the round cheap.
    """
    sc = pairs.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _truncate(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint()

    edges = _truncate(
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev_n = edges.count()
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # large-star: for each u, every neighbor v > u links to
        # m = min({u} ∪ N(u)). Output edges all satisfy u > v. Per-u minima
        # come from an unbounded window over the SAME partitioning the rows
        # already need — ONE shuffle of b per star phase, where a
        # groupBy+join-back shape shuffles b twice (the agg's combine output
        # can't serve the join's raw-row side). Duplicate emissions are
        # deliberately NOT deduped — the round's single distinct (on the
        # small-star output) dedupes once. A mega-hub's rows co-locate in
        # one task either way (join-back has the same property); the window
        # is sort-based and spills, never materializing the neighbor set in
        # a single row.
        b = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        wu = Window.partitionBy("u")
        large = (
            b.withColumn("m", F.least(F.col("u"), F.min("v").over(wu)))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # small-star on the (u > v)-oriented edges: all of u's neighbors —
        # and u itself — collapse onto m = min(N(u) ∪ {u}); the (u, m) self
        # edge is emitted per input row, duplicates absorbed by the distinct.
        small_src = large.withColumn("m", F.min("v").over(wu))
        small = _truncate(
            small_src.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(small_src.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # exact fixpoint test, cheapest-first: a changed distinct-count
        # proves non-convergence without any join; only a plateaued count
        # pays for the anti-join ((small ⊆ edges) ∧ equal counts ⇒ equal,
        # both sides being distinct)
        n_small = small.count()
        converged = n_small == prev_n and small.subtract(edges).count() == 0
        edges = small
        if converged:
            break
        prev_n = n_small
    else:
        # a non-converged edge set is NOT a star forest — the labels union
        # below would emit conflicting components per node. Fail loudly.
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds "
            "(O(log² n) expected — raise max_rounds or inspect the graph)"
        )
    # fixpoint: edges are stars u → root; roots label themselves
    labels = edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("component")
    ).union(
        edges.select(F.col("v").alias("doc_id"), F.col("v").alias("component")).distinct()
    )
    return labels.distinct(), rounds


# ---------------------------------------------------------------------------
# D10. mixture sampling — deterministic per-source sampling rates (data
#      mixing: each source keeps a hash-stable fraction of its documents)
# ---------------------------------------------------------------------------
_DOC_HASH = (
    "CAST(conv(concat_ws('', transform(sequence(15, 0, -1), "
    "i -> substring(md5({key}), 17 + i*2, 2))), 16, 10) "
    "AS DECIMAL(20,0))"
)


@query(
    "corpus_mix_sample",
    oracle=f"""
    WITH r AS (
      SELECT source,
             20 + md5_number_lower(source) % 61 AS rate_pct
      FROM (SELECT DISTINCT source FROM documents)),
    b AS (
      SELECT d.doc_id, d.source, r.rate_pct,
             md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 100 AS bucket,
             len({SQL_WORDS}) AS n_tokens
      FROM documents d JOIN r USING (source))
    SELECT source, CAST(MIN(rate_pct) AS BIGINT) AS rate_pct,
           COUNT(*) FILTER (WHERE bucket < rate_pct) AS n_kept,
           CAST(SUM(n_tokens) FILTER (WHERE bucket < rate_pct) AS BIGINT) AS kept_tokens
    FROM b GROUP BY source ORDER BY source
    """,
)
def corpus_mix_sample(spark, sf_dir):
    """Data-mixing sampler: every source gets a deterministic sampling rate
    (hash of the source name → 20–80%), and a document survives iff its own
    stable hash bucket falls under the rate. Both hashes are content-derived
    (no random()), so the sampled corpus is reproducible across runs,
    engines, and repartitioning — and a document's fate never depends on
    which executor saw it. Map-only until the per-source aggregate; the
    source-rate table is tiny and computed inline (no driver collect)."""
    d = load_table(spark, sf_dir, "documents")
    rate = (F.expr(_DOC_HASH.format(key="source")) % 61 + 20).alias("rate_pct")
    bucket = F.expr(_DOC_HASH.format(key="CAST(doc_id AS STRING)")) % 100
    b = d.select(
        "source",
        rate,
        bucket.alias("bucket"),
        F.expr(f"size({WORDS})").alias("n_tokens"),
    )
    kept = F.col("bucket") < F.col("rate_pct")
    return (
        b.groupBy("source")
        .agg(
            F.min("rate_pct").cast("long").alias("rate_pct"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens"))).cast("long").alias("kept_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# D10b. exact-k per-source sampling — deterministic bounded uniform sample
#       (eval-set carving / per-source QA samples): the K lowest-hash docs
#       of every source, reproducible across runs, engines, partitionings.
# ---------------------------------------------------------------------------
SAMPLE_K = 50
# prefilter admission margin: keep hashes under (MARGIN·K/n_s)·2^64 before
# the exact rank. P(fewer than K of n_s uniform hashes land under a
# 4K/n_s cut) ≤ e^{-9K/8} (Chernoff) — never observed at K=50; the plan
# still guards it loudly rather than assuming it.
SAMPLE_MARGIN = 4


@query(
    "sample_per_source",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rank
      FROM documents)
    SELECT source, rank, doc_id FROM r WHERE rank <= {SAMPLE_K}
    ORDER BY source, rank
    """,
)
def sample_per_source(spark, sf_dir):
    """The K=50 lowest-hash documents per source (md5 lower 64 bits of the
    doc_id — the repo's portable hash, so the sample never depends on
    executor placement or row order).

    100 TB shape: a naive per-source ROW_NUMBER shuffles the whole corpus
    into per-source sort partitions. Instead the corpus is PREFILTERED
    map-side to hashes under (MARGIN·K/n_s)·2⁶⁴ — per-source survivor
    expectation MARGIN·K (~200 rows), so the exact rank window runs over
    ~sources·200 rows regardless of corpus size. The margin assumption is
    enforced IN the plan: `assert_true` fails the job loudly if any
    undersized survivor set could truncate the true top-K (never silently
    wrong). Sources smaller than MARGIN·K skip the prefilter entirely."""
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    h = F.expr(_DOC_HASH.format(key="CAST(doc_id AS STRING)"))
    counts = d.groupBy("source").agg(F.count("*").alias("n_s"))
    # admission cut in hash space: full range for small sources, else
    # (MARGIN·K/n_s) of 2^64 (DECIMAL arithmetic — the hash is DECIMAL(20,0))
    full_range = F.expr(f"CAST({2**64} AS DECIMAL(21,0))")
    cut = F.when(
        F.col("n_s") <= F.lit(SAMPLE_MARGIN * SAMPLE_K), full_range
    ).otherwise(
        (F.lit(SAMPLE_MARGIN * SAMPLE_K) * full_range / F.col("n_s")).cast(
            "decimal(21,0)"
        )
    )
    from pyspark import StorageLevel

    # survivors are ~sources·MARGIN·K rows — persist so the guard count and
    # the rank window read them once instead of re-scanning the corpus
    surv = (
        d.withColumn("h", h)
        .join(F.broadcast(counts.withColumn("cut", cut)), "source")
        .filter(F.col("h") < F.col("cut"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # margin guard: a truncated survivor set (< K rows for a source with
    # n_s ≥ K, or < n_s rows below K) could silently drop true sample rows —
    # refuse to answer instead. assert_true evaluates per output row after
    # the survivor count joins back (a broadcast of ~|sources| rows).
    surv_counts = surv.groupBy("source").agg(F.count("*").alias("n_surv"))
    guarded = surv.join(F.broadcast(surv_counts), "source").filter(
        F.assert_true(
            F.col("n_surv") >= F.least(F.lit(SAMPLE_K), F.col("n_s")),
            F.lit(
                "sample_per_source: prefilter margin breached — raise "
                "SAMPLE_MARGIN"
            ),
        ).isNull()
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        guarded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SAMPLE_K)
        .select("source", "rank", "doc_id")
        .orderBy("source", "rank")
    )


# ---------------------------------------------------------------------------
# D11. corpus-frequency quality features — per-document term-frequency stats
#      (rare-word ratio is the classic cheap quality signal: gibberish and
#      boilerplate sit at the two extremes of mean corpus frequency)
# ---------------------------------------------------------------------------
@query(
    "tf_quality_features",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest({SQL_WORDS}) AS word FROM documents),
    f AS (SELECT word, COUNT(*) AS n_occ FROM w GROUP BY word)
    SELECT w.doc_id, COUNT(*) AS n_words,
           ROUND(CAST(SUM(f.n_occ) AS DOUBLE) / COUNT(*), 6) AS mean_tf,
           ROUND(CAST(COUNT(*) FILTER (WHERE f.n_occ <= 2) AS DOUBLE)
                 / COUNT(*), 6) AS rare_ratio
    FROM w JOIN f USING (word)
    GROUP BY w.doc_id ORDER BY w.doc_id
    """,
)
def tf_quality_features(spark, sf_dir):
    return _tf_quality_features(spark, sf_dir)


# Broadcast at most this many vocabulary rows. 2M (word, count) rows is tens
# of MB — safely under executor/driver broadcast budgets at any corpus size.
TF_BROADCAST_CAP = 2_000_000


_WORD_FREQ_MEMO: dict = {}


def _word_freq_joined(spark, sf_dir, broadcast_cap: int = TF_BROADCAST_CAP):
    """(doc_id, word, n_occ): every word occurrence joined to its corpus
    frequency — the shared first pass of the corpus-frequency features.
    The frequency table is vocabulary-sized (unbounded at web scale), so
    the join is split: a CAPPED broadcast head of the most frequent words
    resolves the overwhelming share of occurrences map-side (Zipf), and
    the residual tail resolves through an ordinary shuffle join carrying
    only the tail occurrences. Exact at any cap; tests pin cap-invariance.

    Memoized + persisted per (session, dataset, cap) like the cosine GEMM:
    tf_quality_features and unigram_logprob both consume this pass, and a
    real pipeline at scale would likewise share the scan across features
    rather than recompute the frequency join per metric."""
    key = (spark.sparkContext.applicationId, sf_dir, broadcast_cap)
    hit_df = _WORD_FREQ_MEMO.get(key)
    if hit_df is not None:
        return hit_df
    t = tokenized_docs(spark, sf_dir)
    w = t.select("doc_id", F.explode("ws").alias("word"))
    freq = w.groupBy("word").agg(F.count("*").alias("n_occ"))
    # deterministic top-K head; above the TakeOrdered threshold this compiles
    # to a parallel range sort + global limit, never a driver collect
    head = freq.orderBy(F.desc("n_occ"), "word").limit(broadcast_cap)
    hit = w.join(F.broadcast(head), "word")
    miss = w.join(F.broadcast(head.select("word")), "word", "left_anti").join(freq, "word")
    # one row per token OCCURRENCE — larger than the corpus itself; each
    # consumer (tf_quality_features, unigram_logprob) aggregates it in a
    # single streaming pass → DISK_ONLY, never resident (persist_for_self_join
    # rationale; the memo saves the recompute, disk saves the memory)
    out = persist_for_self_join(hit.unionByName(miss))
    _memo_put(_WORD_FREQ_MEMO, key, out)
    return out


def _tf_quality_features(spark, sf_dir, broadcast_cap: int = TF_BROADCAST_CAP):
    """Two-pass corpus-frequency features: (1) build the term-frequency
    table (one shuffle on word), (2) score each document against it.

    The TF table is vocabulary-sized — unbounded at web scale — so the
    broadcast is CAPPED: the ``broadcast_cap`` most frequent words form a
    broadcast "head" that resolves the overwhelming share of token
    occurrences map-side (Zipf: the top 2M words cover ~all occurrences of
    any natural-language corpus); the residual tail words — many keys, few
    occurrences each — resolve through an ordinary shuffle join whose volume
    is the tail occurrences only. Results are exactly the uncapped ones (the
    tail join is exact, not an OOV approximation), so the oracle is
    cap-invariant; tests pin head-path/tail-path equality.

    All features derive from integer counts (sums exact in doubles ≪ 2^53),
    so values are bit-stable at any parallelism — the same determinism rule
    the money aggregates use (README scale notes)."""
    return (
        _word_freq_joined(spark, sf_dir, broadcast_cap)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.sum("n_occ").cast("double") / F.count("*"), 6).alias("mean_tf"),
            F.round(
                F.count(F.when(F.col("n_occ") <= 2, 1)).cast("double") / F.count("*"), 6
            ).alias("rare_ratio"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# D12. intra-document repetition (Gopher-class quality filter: the fraction
#      of word trigrams that are repeats — high values flag boilerplate,
#      keyword stuffing, and degenerate generations)
# ---------------------------------------------------------------------------
@query(
    "doc_repetition",
    oracle=f"""
    WITH w AS (SELECT doc_id, {SQL_WORDS} AS ws FROM documents),
    g AS (SELECT doc_id,
                 ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
          FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
          WHERE len(ws) >= 3)
    SELECT doc_id, COUNT(*) AS n_grams,
           COUNT(DISTINCT gram) AS n_distinct,
           ROUND(1.0 - CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*), 6)
             AS rep_ratio
    FROM g GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_repetition(spark, sf_dir):
    """Duplicate-trigram fraction per document (the Gopher/MassiveText
    repetition signal). Trigram construction is a JVM higher-order
    ``transform`` over the shared token array — no Python, map-side until
    the per-(doc, gram) count; the only shuffle keys on (doc_id, gram), so
    skew is bounded by a single document's length, not the corpus."""
    t = tokenized_docs(spark, sf_dir)
    g = (
        t.filter(F.expr("size(ws) >= 3"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 3), "
                    "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
                )
            ).alias("gram"),
        )
    )
    return (
        g.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.countDistinct("gram").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_distinct",
            F.round(1.0 - F.col("n_distinct").cast("double") / F.col("n_grams"), 6).alias(
                "rep_ratio"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# D11b. unigram negative log-likelihood — the classic cheap perplexity proxy
#       (a real LM scorer would sit behind a Pandas-UDF inference stage; the
#       corpus-unigram model is the standard no-model baseline and exercises
#       the identical two-pass frequency machinery)
# ---------------------------------------------------------------------------
@query(
    "unigram_logprob",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest({SQL_WORDS}) AS word FROM documents),
    f AS (SELECT word, COUNT(*) AS n_occ FROM w GROUP BY word),
    n AS (SELECT COUNT(*) AS total FROM w),
    j AS (SELECT w.doc_id, CAST(ROUND(LN(f.n_occ), 9) AS DECIMAL(28,9)) AS l
          FROM w JOIN f USING (word))
    SELECT j.doc_id, COUNT(*) AS n_words,
           ROUND(ROUND(LN((SELECT total FROM n)), 9)
                 - CAST(SUM(j.l) AS DOUBLE) / COUNT(*), 6) AS nll
    FROM j GROUP BY j.doc_id ORDER BY j.doc_id
    """,
)
def unigram_logprob(spark, sf_dir):
    """Per-document mean negative log-likelihood under the corpus unigram
    model: avg over words of −ln(n_occ/N) = ln(N) − avg(ln n_occ). Low =
    boilerplate (all frequent words), high = gibberish/rare-token soup —
    the two tails a quality filter cuts.

    Numeric determinism: each word's ln(n_occ) is rounded to 9 decimals and
    summed as DECIMAL(28,9) — exact, order-independent addition — so the
    result is bit-stable at any parallelism AND engine-independent (a raw
    double sum would vary with partial-aggregation order and diverge from
    the oracle's own summation order). The frequency join reuses the
    capped-broadcast head + exact shuffle tail of tf_quality_features."""
    joined = _word_freq_joined(spark, sf_dir)
    tot = joined.agg(F.count("*").alias("total"))
    per_doc = (
        joined.withColumn("l", F.round(F.log("n_occ"), 9).cast("decimal(28,9)"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_words"), F.sum("l").alias("sl"))
    )
    return (
        per_doc.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_words",
            F.round(
                F.round(F.log("total"), 9)
                - F.col("sl").cast("double") / F.col("n_words"),
                6,
            ).alias("nll"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# D11c. per-source unigram KL divergence — the mixture-weighting diagnostic:
#       how far each source's token distribution sits from the corpus.
# ---------------------------------------------------------------------------
@query(
    "source_kl_divergence",
    oracle=f"""
    WITH w AS (
      SELECT d.source, unnest({SQL_WORDS}) AS word FROM documents d),
    sw AS (SELECT source, word, COUNT(*) AS n_sw FROM w GROUP BY source, word),
    nw AS (SELECT word, SUM(n_sw) AS n_w FROM sw GROUP BY word),
    ns AS (SELECT source, SUM(n_sw) AS n_s FROM sw GROUP BY source),
    nn AS (SELECT SUM(n_sw) AS total FROM sw),
    t AS (SELECT sw.source,
                 CAST(ROUND(LN(sw.n_sw) - LN(nw.n_w), 9) * sw.n_sw
                      AS DECIMAL(28,9)) AS term
          FROM sw JOIN nw USING (word))
    SELECT t.source, CAST(ns.n_s AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(t.term) AS DOUBLE) / ns.n_s
                 - ROUND(LN(ns.n_s), 9) + ROUND(LN((SELECT total FROM nn)), 9),
                 6) AS kl
    FROM t JOIN ns USING (source)
    GROUP BY t.source, ns.n_s ORDER BY source
    """,
)
def source_kl_divergence(spark, sf_dir):
    """KL(source ‖ corpus) over unigram distributions, per source — the
    mixture-weighting diagnostic: a source far from the corpus (jargon,
    another language, boilerplate) shifts the trained model more per token
    than its size suggests. Algebra: KL = Σ_w p_s·ln(p_s/p_c) =
    (Σ_w n_sw·(ln n_sw − ln n_w))/n_s − ln n_s + ln N, so one
    (source, word) aggregate feeds everything — corpus counts derive from
    re-aggregating it (no second scan), and the per-word term is rounded
    to 9 decimals then DECIMAL-summed: order-independent and
    engine-exact, the same determinism contract as unigram_logprob.
    Scale shape: one (source, word) shuffle ∝ per-source vocabulary, one
    vocab-keyed join, |sources| output rows."""
    t = tokenized_docs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = t.join(docs, "doc_id").select("source", F.explode("ws").alias("word"))
    sw = w.groupBy("source", "word").agg(F.count("*").alias("n_sw"))
    nw = sw.groupBy("word").agg(F.sum("n_sw").alias("n_w"))
    ns = sw.groupBy("source").agg(F.sum("n_sw").alias("n_s"))
    nn = sw.agg(F.sum("n_sw").alias("total"))
    term = (
        F.round(F.log("n_sw") - F.log("n_w"), 9) * F.col("n_sw")
    ).cast("decimal(28,9)")
    per_src = (
        sw.join(nw, "word")
        .withColumn("term", term)
        .groupBy("source")
        .agg(F.sum("term").alias("st"))
    )
    return (
        per_src.join(ns, "source")
        .crossJoin(F.broadcast(nn))
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            F.round(
                F.col("st").cast("double") / F.col("n_s")
                - F.round(F.log("n_s"), 9)
                + F.round(F.log("total"), 9),
                6,
            ).alias("kl"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# T6b. corpus-level n-gram frequency table — the training-data analysis
#      staple (boilerplate discovery, contamination screening, memorization
#      risk triage all start from "which n-grams dominate the corpus").
# ---------------------------------------------------------------------------
CORPUS_NGRAM_MIN_DF = 2  # keep trigrams seen in >= 2 documents
CORPUS_NGRAM_TOPK = 200


@query(
    "corpus_ngrams",
    oracle=f"""
    WITH w AS (SELECT doc_id, {SQL_WORDS} AS ws FROM documents),
    g AS (SELECT doc_id,
                 ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
          FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
          WHERE len(ws) >= 3),
    dg AS (SELECT gram, doc_id, COUNT(*) AS tf FROM g GROUP BY gram, doc_id),
    agg AS (SELECT gram, CAST(SUM(tf) AS BIGINT) AS tf, COUNT(*) AS df
            FROM dg GROUP BY gram)
    SELECT gram, tf, df FROM agg WHERE df >= {CORPUS_NGRAM_MIN_DF}
    ORDER BY tf DESC, gram LIMIT {CORPUS_NGRAM_TOPK}
    """,
)
def corpus_ngrams(spark, sf_dir):
    """Top-K corpus trigrams with total frequency and document frequency.

    100 TB design: trigram construction is a map-side JVM higher-order
    ``transform`` over the shared token scan (no Python). The FIRST
    aggregation keys on (gram, doc_id) with map-side partial combine, so a
    gram's skew is bounded by one document's repetitions before the
    gram-level rollup — and document frequency then becomes a plain
    COUNT(*) over the pre-aggregate instead of a COUNT(DISTINCT)
    shuffle-expand. The final top-K is TakeOrdered, not a global sort.
    """
    t = tokenized_docs(spark, sf_dir)
    g = t.filter(F.expr("size(ws) >= 3")).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 3), "
                "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
            )
        ).alias("gram"),
    )
    per_doc = g.groupBy("gram", "doc_id").agg(F.count("*").alias("tf"))
    return (
        per_doc.groupBy("gram")
        .agg(F.sum("tf").alias("tf"), F.count("*").alias("df"))
        .filter(F.col("df") >= CORPUS_NGRAM_MIN_DF)
        .orderBy(F.desc("tf"), "gram")
        .limit(CORPUS_NGRAM_TOPK)
    )


# ---------------------------------------------------------------------------
# D13. PII scrubbing as a declared pipeline stage. The synthetic corpus has
#      no real PII, so the query PLANTS deterministic PII derived from
#      doc_id, then scrubs it — the oracle plants and scrubs identically, so
#      redaction + audit counts are value-checked end-to-end.
# ---------------------------------------------------------------------------
_PII_SUFFIX_SQL = (
    "' contact user' || doc_id || '@example.com from 10.0.' || "
    "(doc_id % 256) || '.1 ssn 123-45-' || "
    "lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"  # STRING parses in Spark AND DuckDB
)


@query(
    "pii_scrub",
    oracle=f"""
    WITH t AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS text FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                 '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
               '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '<SSN>', 'g'),
             '\\+?\\d[\\d().\\-\\s]{{6,}}\\d\\b', '<PHONE>', 'g') AS text,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_pii_email,
           len(regexp_extract_all(text,
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS n_pii_ipv4,
           len(regexp_extract_all(text,
             '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b')) AS n_pii_ssn,
           len(regexp_extract_all(text,
             '\\+?\\d[\\d().\\-\\s]{{6,}}\\d\\b')) AS n_pii_phone
    FROM t ORDER BY doc_id
    """,
)
def pii_scrub(spark, sf_dir):
    """Declared PII redaction stage (operators/text.py scrub_pii): typed
    placeholder substitution plus per-kind audit counts, all regexp
    expressions in whole-stage codegen — map-only at any corpus size. The
    planted-PII construction keeps the driver's value-hash oracle
    meaningful on a PII-free synthetic corpus; tests/test_text_ops.py
    covers the adversarial cases."""
    from ..operators.text import scrub_pii

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"text || {_PII_SUFFIX_SQL}").alias("text")
    )
    out = scrub_pii(d, "text", kinds=("email", "ipv4", "ssn", "phone"))
    return out.select(
        "doc_id", "text", "n_pii_email", "n_pii_ipv4", "n_pii_ssn", "n_pii_phone"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# D14. exact-substring dedup, stride-sampled (BigCode-class: documents that
#      share a long verbatim character span — code/license boilerplate,
#      copy-paste chains — that token-level jaccard can miss)
# ---------------------------------------------------------------------------
SUBSTR_W = 64  # gram window (chars)
SUBSTR_S = 32  # sampling stride: any shared span >= W + S - 1 chars is
#                guaranteed to contain an aligned sampled gram in both docs
SUBSTR_DF_CAP = 64  # boilerplate guard, same rationale as jaccard's cap


@query(
    "dedup_substring",
    oracle=f"""
    WITH g AS (
      SELECT DISTINCT doc_id, substr(text, i * {SUBSTR_S} + 1, {SUBSTR_W}) AS gram
      FROM documents,
           UNNEST(range(0, (len(text) - {SUBSTR_W}) // {SUBSTR_S} + 1)) AS t(i)
      WHERE len(text) >= {SUBSTR_W}),
    f AS (SELECT gram FROM g GROUP BY gram
          HAVING COUNT(*) BETWEEN 2 AND {SUBSTR_DF_CAP})
    SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
    FROM g a JOIN f USING (gram) JOIN g b USING (gram)
    WHERE a.doc_id < b.doc_id
    ORDER BY a, b
    """,
)
def dedup_substring(spark, sf_dir):
    """Document pairs sharing a sampled {W}-char gram (stride {S}): any
    verbatim shared span of >= W + S - 1 chars is guaranteed detected —
    the sampled-suffix shortcut to exact-substring dedup. All JVM
    expressions: a higher-order ``transform`` emits ~len/S grams per doc
    (corpus-linear, vs quadratic all-substrings), the inverted-index join
    keys on the gram, and the df cap kills the quadratic hot-gram reducer
    exactly as in dedup_ngram_jaccard — the cap is mirrored in the oracle,
    so results stay value-checked."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.expr(f"length(text) >= {SUBSTR_W}")
    )
    g = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, (length(text) - {SUBSTR_W}) div {SUBSTR_S}), "
                f"i -> substring(text, i * {SUBSTR_S} + 1, {SUBSTR_W}))"
            )
        ).alias("gram"),
    ).distinct()
    f = (
        g.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= SUBSTR_DF_CAP))
        .select("gram")
    )
    gk = g.join(f, "gram")
    pairs = (
        gk.alias("x")
        .join(gk.alias("y"), "gram")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    return pairs.orderBy("a", "b")


# ---------------------------------------------------------------------------
# E3. ordered conversion funnel — first view, first click AFTER that view,
#     first purchase AFTER that click, per user; step counts + conversion
#     rates + mean step latencies (the other canonical product-analytics
#     composite next to retention/sessionize)
# ---------------------------------------------------------------------------
FUNNEL_ORACLE = """
    WITH d AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1,
             ts, event_type
      FROM events),
    d2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                       OVER (PARTITION BY user_id) AS t2 FROM d),
    d3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                       OVER (PARTITION BY user_id) AS t3 FROM d2),
    u AS (SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
          FROM d3 GROUP BY user_id)
    SELECT COUNT(t1) AS n_view_users, COUNT(t2) AS n_click_users,
           COUNT(t3) AS n_purchase_users,
           ROUND(CAST(COUNT(t2) AS DOUBLE) / NULLIF(COUNT(t1), 0), 6)
             AS view_to_click_rate,
           ROUND(CAST(COUNT(t3) AS DOUBLE) / NULLIF(COUNT(t2), 0), 6)
             AS click_to_purchase_rate,
           ROUND(CAST(SUM(date_diff('microsecond', t1, t2)) AS DOUBLE)
                 / NULLIF(COUNT(t2), 0) / 1e6, 6) AS avg_view_to_click_s,
           ROUND(CAST(SUM(date_diff('microsecond', t2, t3)) AS DOUBLE)
                 / NULLIF(COUNT(t3), 0) / 1e6, 6) AS avg_click_to_purchase_s
    FROM u
    """


@query("events_funnel", oracle=FUNNEL_ORACLE)
def events_funnel(spark, sf_dir):
    """Strictly-ordered three-step funnel. Plan shape: the raw events are
    touched ONCE and shuffled ONCE (user_id); the three step timestamps are
    unbounded windows over that same partitioning (no sort, no join-back —
    the events_retention trim), the per-user collapse reuses the
    partitioning, and the final roll-up is a single-row aggregate. Step
    latencies sum exact integer microseconds, so every output value is a
    deterministic function of integer counts/sums — bit-stable at any
    parallelism and identical to the oracle's arithmetic."""
    w = Window.partitionBy("user_id")
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    d = e.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    d = d.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    d = d.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    # one row per user — t1/t2/t3 are constant within the user partition,
    # and the groupBy rides the window's user partitioning (no new shuffle)
    u = d.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3")
    )
    return u.agg(
        F.count("t1").alias("n_view_users"),
        F.count("t2").alias("n_click_users"),
        F.count("t3").alias("n_purchase_users"),
        F.round(
            F.count("t2").cast("double") / F.nullif(F.count("t1"), F.lit(0)), 6
        ).alias("view_to_click_rate"),
        F.round(
            F.count("t3").cast("double") / F.nullif(F.count("t2"), F.lit(0)), 6
        ).alias("click_to_purchase_rate"),
        F.round(
            F.sum(F.expr("timestampdiff(MICROSECOND, t1, t2)")).cast("double")
            / F.nullif(F.count("t2"), F.lit(0))
            / 1e6,
            6,
        ).alias("avg_view_to_click_s"),
        F.round(
            F.sum(F.expr("timestampdiff(MICROSECOND, t2, t3)")).cast("double")
            / F.nullif(F.count("t3"), F.lit(0))
            / 1e6,
            6,
        ).alias("avg_click_to_purchase_s"),
    )


# ---------------------------------------------------------------------------
# E1. cohort retention — the events-warehouse composite every product
#     analytics stack runs (cohort by first-seen day, distinct-user
#     retention at day offsets)
# ---------------------------------------------------------------------------
RETENTION_MAX_OFFSET = 3


RETENTION_ORACLE = f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(EXTRACT(EPOCH FROM ts) / 86400) AS BIGINT) AS day
      FROM events),
    cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id)
    SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
           COUNT(DISTINCT ud.user_id) AS n_users
    FROM ud JOIN cohort c ON c.user_id = ud.user_id
    WHERE ud.day - c.cohort_day <= {RETENTION_MAX_OFFSET}
    GROUP BY 1, 2 ORDER BY cohort_day, day_offset
    """


@query("events_retention", oracle=RETENTION_ORACLE)
def events_retention(spark, sf_dir):
    """Cohort retention over the events stream: users cohort by their
    first-activity day; each (cohort_day, day_offset) cell counts the
    distinct users still active that many days later. Plan shape: one
    distinct on (user, day) — the only pass over the raw events — then a
    per-user min (same user-keyed partitioning, no extra scan), a user-keyed
    join, and a small (cohorts × offsets) aggregation. Every shuffle is on
    a natural key; the raw event volume is touched exactly once."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.expr(
            "CAST(FLOOR(timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) / 86400) AS BIGINT)"
        ).alias("day"),
    ).distinct()
    # per-user first day as an unbounded window over the user partitioning —
    # one shuffle, no groupBy + join-back (the same trim as the
    # connected-components star phases)
    ud = ud.withColumn(
        "cohort_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    return (
        ud.withColumn("day_offset", F.col("day") - F.col("cohort_day"))
        .filter(F.col("day_offset") <= RETENTION_MAX_OFFSET)
        .groupBy("cohort_day", "day_offset")
        # ud is distinct per (user, day), so each user contributes at most
        # one row per cell: COUNT(*) IS the distinct-user count, without the
        # Expand + double shuffle a COUNT(DISTINCT) plans
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# D12. incremental dedup — the PRODUCTION ingestion shape: dedup an arriving
#      shard against the existing corpus without re-deduping the corpus
#      (delta×base candidates only, never delta×delta re-verification of
#      the base). Here the delta is doc_id%10==9, the base everything else.
# ---------------------------------------------------------------------------
_BASE_HASH_MEMO: dict = {}


def _base_exact_index(spark, sf_dir) -> DataFrame:
    """(doc_id, h): md5 content index of the EXISTING corpus, persisted +
    memoized per (session, dataset) — built ONCE and probed by every
    arriving shard (tests/test_llm_ops.py pins the one-build property).
    At 100 TB this is the production shape: a ~48-byte-row index table
    maintained incrementally as shards commit, so each shard's exact
    probe scans the index, never the base corpus text."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BASE_HASH_MEMO.get(key)
    if hit is None:
        base = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 != 9)
            .select("doc_id", F.md5("text").alias("h"))
        )
        hit = base.persist(StorageLevel.MEMORY_AND_DISK)
        _memo_put(_BASE_HASH_MEMO, key, hit)
    return hit


def _dedup_incremental_df(spark, sf_dir, is_delta=None) -> DataFrame:
    """Shard-parameterized core of dedup_incremental: ``is_delta`` is a
    Column-predicate builder selecting which arriving docs this shard
    carries (default: the whole doc_id%10==9 delta). The base corpus
    ("already ingested", doc_id%10!=9) is FIXED regardless of sharding,
    so the union of disjoint shard runs equals the one-shot run row for
    row — and every shard probes the same persisted base hash index."""
    if is_delta is None:
        is_delta = lambda c: c % 10 == 9  # noqa: E731
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    newdocs = d.filter(is_delta(F.col("doc_id")))
    exact = (
        newdocs.select("doc_id", F.md5("text").alias("h"))
        .join(_base_exact_index(spark, sf_dir).withColumnRenamed("doc_id", "b_id"), "h")
        .groupBy("doc_id")
        .agg(F.min("b_id").alias("ex_match"))
    )
    jp = jaccard_pairs_df(spark, sf_dir).select("a", "b", F.round("jac", 6).alias("jac"))
    cross_jp = (
        jp.filter(is_delta(F.col("a")) & (F.col("b") % 10 != 9))
        .select(F.col("a").alias("new_id"), F.col("b").alias("base_id"), "jac")
        .union(
            jp.filter(is_delta(F.col("b")) & (F.col("a") % 10 != 9)).select(
                F.col("b").alias("new_id"), F.col("a").alias("base_id"), "jac"
            )
        )
    )
    best = (
        cross_jp.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("new_id").orderBy(F.desc("jac"), "base_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    out = (
        newdocs.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(best.withColumnRenamed("new_id", "doc_id"), "doc_id", "left")
    )
    verdict = (
        F.when(F.col("ex_match").isNotNull(), "exact_dup")
        .when(F.col("base_id").isNotNull(), "near_dup")
        .otherwise("unique")
    )
    match_id = F.coalesce(
        "ex_match",
        F.when(F.col("ex_match").isNull(), F.col("base_id")),
        F.lit(-1),
    )
    return out.select(
        "doc_id",
        verdict.alias("verdict"),
        match_id.cast("long").alias("match_id"),
        F.coalesce(
            F.when(F.col("ex_match").isNull(), F.col("jac")), F.lit(0.0)
        ).alias("jac"),
    ).orderBy("doc_id")
@query(
    "dedup_incremental",
    oracle=f"""
    WITH newdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 9),
    base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 9),
    exact AS (
      SELECT n.doc_id, MIN(b.doc_id) AS match_id
      FROM newdocs n JOIN base b ON md5(b.text) = md5(n.text)
      GROUP BY n.doc_id),
    {SQL_SHINGLE_CTES},
    {SQL_JACCARD_CAND_CTES},
    jp AS (
      SELECT p.a, p.b,
             ROUND(CAST(p.i AS DOUBLE) / (ca.n + cb.n - p.i), 6) AS jac
      FROM pair p JOIN cnt ca ON ca.doc_id = p.a JOIN cnt cb ON cb.doc_id = p.b
      WHERE CAST(p.i AS DOUBLE) / (ca.n + cb.n - p.i) >= 0.8),
    cross_jp AS (
      SELECT a AS new_id, b AS base_id, jac FROM jp
      WHERE a % 10 = 9 AND b % 10 <> 9
      UNION ALL
      SELECT b, a, jac FROM jp WHERE b % 10 = 9 AND a % 10 <> 9),
    best AS (
      SELECT new_id, base_id, jac,
             ROW_NUMBER() OVER (PARTITION BY new_id
                                ORDER BY jac DESC, base_id) AS rn
      FROM cross_jp)
    SELECT n.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN b.new_id IS NOT NULL THEN 'near_dup'
                ELSE 'unique' END AS verdict,
           COALESCE(e.match_id,
                    CASE WHEN e.doc_id IS NULL THEN b.base_id END,
                    -1) AS match_id,
           COALESCE(CASE WHEN e.doc_id IS NULL THEN b.jac END, 0.0) AS jac
    FROM newdocs n
    LEFT JOIN exact e ON e.doc_id = n.doc_id
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.new_id = n.doc_id
    ORDER BY n.doc_id
    """,
)
def dedup_incremental(spark, sf_dir):
    """Dedup verdict for each ARRIVING document against the EXISTING
    corpus (exact content hash first, then best near-dup partner from the
    verified jaccard pairs restricted to delta×base) — the incremental
    ingestion shape: per shard, work is proportional to the delta's
    candidates, and the base corpus is never re-deduped. match_id = the
    exact match's minimum base doc_id, else the best (jac desc, id)
    near-dup partner, else -1; sentinel -1/0.0 instead of NULLs so the
    value-hash comparison is unambiguous.

    Scale: the exact probe joins the delta's md5 against the PERSISTED
    base hash index (_base_exact_index — one build per session/dataset,
    every shard probes it; the base corpus text is never rescanned per
    shard); near-dup candidates ride the SHARED verified-pair cache
    filtered to delta×base endpoints, adding zero new corpus-scale
    stages here. _dedup_incremental_df exposes the per-shard form: the
    union of disjoint shard runs equals this one-shot run row for row."""
    return _dedup_incremental_df(spark, sf_dir)
