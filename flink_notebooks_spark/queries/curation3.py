"""Round-11 curation additions: leakage-safe corpus splitting.

`curation_split` (queries/llm.py) hashes each document's own key into
train/val/test — reproducible, but NEAR-DUPLICATES of a training document
can land in val/test, leaking training content into evaluation (the classic
contamination path benchmark decontamination doesn't catch, because the
eval set here IS a split of the corpus). The production fix is
CLUSTER-CONSISTENT splitting: hash the near-dup CLUSTER id, not the doc id,
so an entire duplicate family lands in one split by construction.

Both operators ride the shared verified-pair cache + connected components
(queries/llm.py jaccard_pairs_df / _connected_components) — no new
corpus-scale stage; the split itself stays a map-side hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ._registry import query
from .llm import (
    SQL_JACCARD_CAND_CTES,
    SQL_SHINGLE_CTES,
    _DOC_HASH,
    _connected_components,
    jaccard_pairs_df,
)

# md5-lower-64 of the CLUSTER id / doc id — the single parameterized
# portable-hash expression (llm._DOC_HASH), NOT a re-derivation: the
# byte-reversal trick must stay byte-identical to DuckDB md5_number_lower
# everywhere (see the parity-traps notes)
_CLUSTER_HASH = _DOC_HASH.format(key="CAST(cluster AS STRING)")
_DOCKEY_HASH = _DOC_HASH.format(key="CAST(doc_id AS STRING)")

# the components + cluster CTEs shared by both oracles: verified pairs →
# undirected reachability → min-reachable label; singletons label themselves
_SQL_CLUSTER_CTES = f"""
    {SQL_SHINGLE_CTES},
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
    clustered AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
"""


def _clustered_docs(spark, sf_dir):
    """(doc_id, cluster) for every document — near-dup component label,
    singletons labeled by their own id. Shared by both registered queries."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    labels, _ = _connected_components(
        jaccard_pairs_df(spark, sf_dir).select("a", "b")
    )
    return d.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("cluster")
    )


@query(
    "curation_split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE {_SQL_CLUSTER_CTES}
    SELECT doc_id, cluster,
           CASE WHEN md5_number_lower(CAST(cluster AS VARCHAR)) % 100 < 80
                THEN 'train'
                WHEN md5_number_lower(CAST(cluster AS VARCHAR)) % 100 < 90
                THEN 'val' ELSE 'test' END AS split
    FROM clustered ORDER BY doc_id
    """,
)
def curation_split_leakage_safe(spark, sf_dir):
    """Cluster-consistent 80/10/10 split: the split bucket hashes the
    near-dup COMPONENT id, so every member of a duplicate family lands in
    the same split — zero near-dup pairs cross a split boundary, by
    construction (tests/test_curation3.py asserts the count). Deterministic
    like `curation_split` (portable md5 hash, no rand()): re-runs, engines,
    and repartitionings agree.

    Scale plan: rides the shared verified-pair cache and the large-star/
    small-star components (no new corpus-scale stage); the label join is
    doc_id-keyed, the bucket hash and CASE are map-side, and the output
    presentation sort is the only extra exchange. The split proportions are
    over CLUSTERS, not documents — with duplicates concentrated in few
    clusters the document-level proportions skew slightly, the price of the
    no-leakage guarantee (stated, not papered over)."""
    every = _clustered_docs(spark, sf_dir)
    bucket = F.expr(_CLUSTER_HASH) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return every.select("doc_id", "cluster", split.alias("split")).orderBy(
        "doc_id"
    )


@query(
    "split_leakage_report",
    oracle=f"""
    WITH RECURSIVE {_SQL_CLUSTER_CTES},
    naive AS (
      SELECT doc_id,
             CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 80
                  THEN 'train'
                  WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 90
                  THEN 'val' ELSE 'test' END AS split
      FROM documents)
    SELECT na.split AS split_a, nb.split AS split_b, COUNT(*) AS n_pairs
    FROM jpairs j JOIN naive na ON na.doc_id = j.a
                  JOIN naive nb ON nb.doc_id = j.b
    WHERE na.split <> nb.split
    GROUP BY 1, 2 ORDER BY split_a, split_b
    """,
)
def split_leakage_report(spark, sf_dir):
    """The diagnostic that motivates the safe split: counts verified
    near-dup pairs whose members fall in DIFFERENT splits under the naive
    per-document hash split — each such pair is evaluation data leaking
    training content. Run against `curation_split_leakage_safe`'s
    assignment the same join returns zero rows (pinned in tests).

    Scale plan: the pair list (already bounded by the banded candidate
    generation) joins the split assignment twice on doc_id — two hash
    joins keyed on the ids, aggregate cardinality ≤ 6 (split pairs)."""
    pairs = jaccard_pairs_df(spark, sf_dir).select("a", "b")
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    bucket = F.expr(_DOCKEY_HASH) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    naive = d.select("doc_id", split.alias("split"))
    na = naive.select(F.col("doc_id").alias("a"), F.col("split").alias("split_a"))
    nb = naive.select(F.col("doc_id").alias("b"), F.col("split").alias("split_b"))
    return (
        pairs.join(na, "a")
        .join(nb, "b")
        .filter(F.col("split_a") != F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("split_a", "split_b")
    )
