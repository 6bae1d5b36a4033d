"""Third-wave embedding-space curation operators: SemDeDup-style semantic
dedup and distributed PCA projection.

These extend the embedding family in :mod:`.llm` (cosine pairs, dup
clusters, ANN) with the two remaining curation stages a large-scale
training-data pipeline runs over an embedding column:

- ``dedup_semantic`` — SemDeDup (Abbas et al., "SemDeDup: Data-efficient
  learning at web-scale through semantic deduplication", 2023): cluster the
  corpus around k-means centroids, then search for near-duplicate pairs
  ONLY within each cluster. Unlike the LSH family (which targets
  high-similarity near-copies), SemDeDup's cluster-bounded search is the
  standard way to push *semantic* dedup below the near-copy threshold
  without an O(n²) pair stream.
- ``embedding_pca`` — PCA projection to a lower dimension, the standard
  whitening/compression step before ANN indexing or clustering at scale
  (OPQ/IVF pipelines train exactly such a rotation first).

100 TB shapes:

- Both trainers (k-means centroids, PCA basis) run driver-side over the
  BOUNDED hash-stable sample shared with the ANN family
  (``llm._hash_stable_pool``): one distributed TakeOrdered brings k rows to
  the driver, the artifact is tiny and broadcast, and the corpus itself is
  never collected. This is the established pattern of ``ann_ivf_topk`` /
  ``ann_pq_topk`` — deterministic, unbiased under id/source/time
  correlation, and identical at any corpus size.
- ``dedup_semantic``: assignment is a narrow ``mapInPandas`` (one vectorized
  X·Cᵀ argmax per Arrow batch — no join, no shuffle); the ONLY exchange is
  the cluster-keyed shuffle feeding the per-cluster scorer. Per-cluster
  pairwise work is bounded because k scales with the corpus (cluster size
  ≈ n/k stays fixed); a loud in-operator cap refuses clusters that would
  not fit a task rather than silently truncating (``sample_per_source``'s
  guard convention).
- ``embedding_pca``: projection is a pure narrow ``mapInPandas`` GEMM over
  the scan — zero shuffles at any scale (the ``orderBy`` on the returned
  frame exists for stable test output and is dropped by a real sink).

Verification: both trainers are deterministic (fixed sample, fixed
iteration count, no RNG), so the operators are rows-only entries with EXACT
numpy-parity pins in tests/test_semantic_ops.py (the flags/projections are
recomputed off-Spark from the same sample) plus partition-invariance and
empty-input coverage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ._registry import query
from .llm import _hash_stable_pool, _ivf_train

# ---------------------------------------------------------------------------
# SemDeDup — cluster-bounded semantic near-dedup
# ---------------------------------------------------------------------------
SEM_CELLS = 8  # k scales with corpus size in production (cluster size ~ n/k)
SEM_TAU = 0.4  # cosine threshold for "semantic duplicate" within a cluster
# (CLUSTER_SIM_T's value — the synthetic fixture's planted near-dup band;
# SemDeDup deployments tune τ per corpus)
SEM_TRAIN_SAMPLE = 256  # bounded driver-side k-means pool (bottom-k by hash)
SEM_MAX_CELL = 200_000  # loud per-cluster cap — refuse, never truncate


def _sem_centroids(spark, sf_dir):
    """Unit k-means centroids over the bounded hash-stable sample, as a
    plain float64 numpy array (tiny; rides the closure into mapInPandas)."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embd")
    )
    return base, _ivf_train(_hash_stable_pool(base, SEM_TRAIN_SAMPLE), k=SEM_CELLS)


@query("dedup_semantic")
def dedup_semantic(spark, sf_dir):
    """SemDeDup: k-means cells bound the pairwise search; within each cell,
    a vector is a semantic duplicate if some other cell member has cosine
    ≥ ``SEM_TAU`` with it AND ranks ahead of it under the paper's keep rule
    (keep the member with the LOWEST similarity to the cell centroid —
    SemDeDup §2 keeps the example farthest from the centroid to preserve
    diversity; ties break on vec_id for determinism).

    Output: one row per vector — (vec_id, cell, c_sim, is_dup, dup_of)
    where ``dup_of`` is the surviving member that evicted it (highest
    cosine among its beaters, ties on id). Row count == corpus size, so
    the rows-only check pins cardinality; tests pin the values exactly.

    Plan: scan → narrow mapInPandas (assign) → ONE cell-keyed exchange →
    per-cell vectorized scorer (X·Xᵀ GEMM in Arrow batches) → sort.
    """
    import numpy as np
    import pandas as pd

    base, cents = _sem_centroids(spark, sf_dir)
    if cents.size == 0:  # empty corpus: no centroids, nothing to score
        return spark.createDataFrame(
            [], "vec_id long, cell int, c_sim double, is_dup int, dup_of long"
        )
    C = np.ascontiguousarray(cents, dtype=np.float64)

    def assign(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.asarray(pdf["embd"].tolist(), dtype=np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            S = Xn @ C.T  # centroids are unit vectors → this IS the cosine
            cell = S.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": cell.astype("int32"),
                    "c_sim": S[np.arange(len(X)), cell],
                    "embd": pdf["embd"],
                }
            )

    assigned = base.mapInPandas(
        assign, "vec_id long, cell int, c_sim double, embd array<double>"
    )

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > SEM_MAX_CELL:
            raise ValueError(
                f"dedup_semantic: cluster {int(pdf['cell'].iloc[0])} has {n} "
                f"members (> {SEM_MAX_CELL}); raise SEM_CELLS so cluster "
                "size stays bounded — refusing to truncate"
            )
        ids = pdf["vec_id"].to_numpy()
        c_sim = pdf["c_sim"].to_numpy()
        X = np.asarray(pdf["embd"].tolist(), dtype=np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        S = Xn @ Xn.T
        near = S >= SEM_TAU
        np.fill_diagonal(near, False)
        # y beats x ⇔ (c_sim[y], y_id·sign) ranks ahead under "keep the
        # farthest-from-centroid": lower c_sim wins, ties → lower id wins
        beats = (c_sim[None, :] < c_sim[:, None]) | (
            (c_sim[None, :] == c_sim[:, None]) & (ids[None, :] < ids[:, None])
        )
        evict = near & beats  # evict[x, y]: y is near x and y beats x
        is_dup = evict.any(axis=1)
        # dup_of: the beater with the highest cosine (ties → lowest id):
        # rank by (sim, -id) via a lexsort-free argmax over masked scores
        sim_m = np.where(evict, S, -np.inf)
        order = np.argsort(ids, kind="stable")  # prefer low ids on sim ties
        best = np.full(n, -1, dtype=np.int64)
        for x in np.nonzero(is_dup)[0]:
            cand = order[evict[x][order]]
            best[x] = cand[np.argmax(sim_m[x][cand])]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"].to_numpy(),
                "c_sim": np.round(c_sim, 6),
                "is_dup": is_dup.astype("int32"),
                "dup_of": pd.array(
                    [ids[b] if b >= 0 else None for b in best], dtype="Int64"
                ),
            }
        )

    return (
        assigned.groupBy("cell")
        .applyInPandas(
            score_cell, "vec_id long, cell int, c_sim double, is_dup int, dup_of long"
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# PCA projection — bounded-sample basis, narrow GEMM projection
# ---------------------------------------------------------------------------
PCA_DIM = 16
PCA_SAMPLE = 512  # training-sample cap, same contract as PQ_SAMPLE


def _pca_train(vectors, dim: int = PCA_DIM):
    """(mean, components) from the bounded sample: eigendecomposition of the
    sample covariance, top-``dim`` eigenvectors sign-fixed so each row's
    largest-magnitude coordinate is positive (removes eigh's sign
    ambiguity → byte-stable output across runs). Deterministic: fixed
    sample, no RNG. Returns (None, None) on an empty sample."""
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    if X.size == 0:
        return None, None
    mu = X.mean(axis=0)
    Xc = X - mu
    cov = (Xc.T @ Xc) / max(len(X) - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    idx = np.argsort(evals)[::-1][:dim]
    W = np.ascontiguousarray(evecs[:, idx].T)  # dim × d
    for i in range(W.shape[0]):
        j = int(np.argmax(np.abs(W[i])))
        if W[i, j] < 0:
            W[i] = -W[i]
    return mu, W


@query("embedding_pca")
def embedding_pca(spark, sf_dir):
    """Project every embedding onto the top-``PCA_DIM`` principal components
    of the bounded hash-stable sample: y = W·(x − μ), rounded to 6dp.

    The basis trains driver-side on ≤``PCA_SAMPLE`` vectors (the ANN
    trainers' sampling contract — one TakeOrdered, deterministic, unbiased)
    and broadcasts via the task closure; the projection itself is a pure
    narrow mapInPandas GEMM — zero shuffles at any corpus size. Output row
    count == corpus size (rows-only cardinality pin); exact numpy parity,
    orthonormality of the basis, and partition invariance are pinned in
    tests/test_semantic_ops.py."""
    import numpy as np
    import pandas as pd

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embd")
    )
    mu, W = _pca_train(_hash_stable_pool(base, PCA_SAMPLE))
    if mu is None:
        return spark.createDataFrame([], "vec_id long, pc array<double>")

    def project(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.asarray(pdf["embd"].tolist(), dtype=np.float64)
            Y = np.round((X - mu) @ W.T, 6)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "pc": list(Y)}
            )

    return base.mapInPandas(project, "vec_id long, pc array<double>").orderBy(
        "vec_id"
    )


# ---------------------------------------------------------------------------
# Distributed spherical k-means — Lloyd refinement over the full corpus
# ---------------------------------------------------------------------------
KM_CELLS = 8
KM_ITERS = 2  # refinement rounds over the full corpus after the sample init


def _km_assign_stats(base, C):
    """One Lloyd half-step as a plan: narrow mapInPandas assignment against
    the broadcast centroids, then a cell-keyed applyInPandas that reduces
    each cell to (n, Σx per dim, Σcos) — ONE shuffle whose reduce side is k
    rows. Per-dim sums use math.fsum (correctly rounded independent of
    summation order), so the reduction is bit-identical at any partitioning
    — the float-determinism contract the DECIMAL convention provides for
    SQL aggregates, applied to a Python reducer."""
    import math

    import numpy as np
    import pandas as pd

    d = C.shape[1]

    def assign(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.asarray(pdf["embd"].tolist(), dtype=np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            S = Xn @ C.T
            cell = S.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "cell": cell.astype("int32"),
                    "sim": S[np.arange(len(X)), cell],
                    "embd": pdf["embd"],
                }
            )

    def reduce_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray(pdf["embd"].tolist(), dtype=np.float64)
        s = [math.fsum(X[:, j]) for j in range(d)]
        return pd.DataFrame(
            {
                "cell": [int(pdf["cell"].iloc[0])],
                "n": [len(pdf)],
                "s": [s],
                "sim_sum": [math.fsum(pdf["sim"])],
            }
        )

    return (
        base.mapInPandas(assign, "cell int, sim double, embd array<double>")
        .groupBy("cell")
        .applyInPandas(
            reduce_cell, "cell int, n long, s array<double>, sim_sum double"
        )
    )


@query("embedding_kmeans")
def embedding_kmeans(spark, sf_dir):
    """Spherical k-means over the FULL corpus: sample-initialized centroids
    (the shared deterministic trainer) refined by ``KM_ITERS`` distributed
    Lloyd iterations, then a final assignment pass that reports per-cluster
    size and mean cosine-to-centroid.

    This is the iterative-algorithm template at scale: each iteration is one
    narrow assignment pass + one cell-keyed reduce to k rows; the ONLY
    driver-side data is the k×d centroid matrix collected at each sync point
    (the textbook k-means synchronization barrier — bytes ∝ k·d, never the
    corpus). Output: k rows (cell, n, mean_sim) — rows-only with an exact
    numpy-parity pin (fsum reduction makes every value partitioning-
    independent) in tests/test_semantic_ops.py."""
    import math

    import numpy as np

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embd")
    )
    cents = _ivf_train(_hash_stable_pool(base, SEM_TRAIN_SAMPLE), k=KM_CELLS)
    if cents.size == 0:
        return spark.createDataFrame([], "cell int, n long, mean_sim double")
    C = np.ascontiguousarray(cents, dtype=np.float64)
    for _ in range(KM_ITERS):
        rows = _km_assign_stats(base, C).collect()  # k rows — bounded
        for r in rows:
            m = np.asarray(r["s"], dtype=np.float64)
            nrm = float(np.linalg.norm(m))
            if r["n"] and nrm > 1e-12:
                C[r["cell"]] = m / nrm
    stats = _km_assign_stats(base, C)
    return stats.select(
        "cell",
        "n",
        F.round(F.col("sim_sum") / F.col("n"), 6).alias("mean_sim"),
    ).orderBy("cell")
