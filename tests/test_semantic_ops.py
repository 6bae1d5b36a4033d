"""Exactness pins for the rows-only semantic operators (SemDeDup + PCA):
both trainers are deterministic (bounded hash-stable sample, no RNG), so
the full operator output is recomputable off-Spark with numpy — these tests
pin the Spark plans to that recomputation exactly, plus partition
invariance and the loud per-cluster cap."""

from __future__ import annotations

import numpy as np
import pytest

from flink_notebooks_spark.queries import QUERIES
from flink_notebooks_spark.queries.llm import _hash_stable_pool
from flink_notebooks_spark.queries.semantic import (
    PCA_SAMPLE,
    SEM_CELLS,
    SEM_TAU,
    SEM_TRAIN_SAMPLE,
    _ivf_train,
    _pca_train,
)


def _base(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_notebooks_spark.io import load_table

    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embd")
    )


def _corpus(spark, sf_dir):
    rows = sorted(
        (r["vec_id"], np.asarray(r["embd"], dtype=np.float64))
        for r in _base(spark, sf_dir).collect()
    )
    ids = np.array([i for i, _ in rows])
    X = np.array([v for _, v in rows])
    return ids, X


def _sem_reference(spark, sf_dir):
    """The SemDeDup rule recomputed entirely in numpy from the same
    deterministic centroids: returns {vec_id: (cell, is_dup, dup_of)}."""
    ids, X = _corpus(spark, sf_dir)
    cents = _ivf_train(
        _hash_stable_pool(_base(spark, sf_dir), SEM_TRAIN_SAMPLE), k=SEM_CELLS
    )
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    A = Xn @ np.asarray(cents).T
    cell = A.argmax(axis=1)
    c_sim = A[np.arange(len(X)), cell]
    out = {}
    for c in np.unique(cell):
        sel = np.nonzero(cell == c)[0]
        S = Xn[sel] @ Xn[sel].T
        near = S >= SEM_TAU
        np.fill_diagonal(near, False)
        cs, cid = c_sim[sel], ids[sel]
        beats = (cs[None, :] < cs[:, None]) | (
            (cs[None, :] == cs[:, None]) & (cid[None, :] < cid[:, None])
        )
        evict = near & beats
        for k, x in enumerate(sel):
            beaters = np.nonzero(evict[k])[0]
            if len(beaters):
                # highest cosine, ties -> lowest id
                b = beaters[
                    np.lexsort((cid[beaters], -S[k][beaters]))[0]
                ]
                out[int(ids[x])] = (int(c), True, int(cid[b]))
            else:
                out[int(ids[x])] = (int(c), False, None)
    return out


def test_dedup_semantic_matches_numpy_reference(spark, sf_dir):
    ref = _sem_reference(spark, sf_dir)
    got = {
        r["vec_id"]: (r["cell"], bool(r["is_dup"]), r["dup_of"])
        for r in QUERIES["dedup_semantic"](spark, sf_dir).collect()
    }
    assert set(got) == set(ref)
    mismatch = {i: (got[i], ref[i]) for i in ref if got[i] != ref[i]}
    assert not mismatch, f"{len(mismatch)} rows diverge: {list(mismatch.items())[:5]}"
    # the fixture's planted near-dup band must actually fire
    assert sum(1 for _, d, _ in got.values() if d) > 0


def test_dedup_semantic_flagged_pairs_are_true_near_dups(spark, sf_dir):
    """Every (x, dup_of) the operator reports is a genuine cosine >= tau
    pair, and the keeper ranks ahead of the loser under the SemDeDup rule."""
    ids, X = _corpus(spark, sf_dir)
    pos = {int(i): k for k, i in enumerate(ids)}
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rows = QUERIES["dedup_semantic"](spark, sf_dir).filter("is_dup = 1").collect()
    assert rows
    for r in rows:
        sim = float(Xn[pos[r["vec_id"]]] @ Xn[pos[r["dup_of"]]])
        assert sim >= SEM_TAU - 1e-12, (r, sim)


def test_dedup_semantic_partition_invariance(spark, sf_dir, tmp_path):
    """Same output when the embeddings arrive in 7 shuffled partitions —
    assignment is per-row and the per-cell scorer sorts internally."""
    import pyspark.sql.functions as F

    from flink_notebooks_spark.io import load_table

    repart = str(tmp_path / "emb_repart")
    load_table(spark, sf_dir, "embeddings").repartition(7, F.expr("vec_id % 13")).write.parquet(
        f"{repart}/embeddings.parquet"
    )
    for t in ("documents", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.parquet(
            f"{repart}/{t}.parquet"
        )
    a = sorted(map(tuple, QUERIES["dedup_semantic"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["dedup_semantic"](spark, repart).collect()))
    assert a == b


def test_dedup_semantic_cell_cap_raises_loudly(spark, sf_dir, monkeypatch):
    import flink_notebooks_spark.queries.semantic as sem

    monkeypatch.setattr(sem, "SEM_MAX_CELL", 3)
    with pytest.raises(Exception, match="dedup_semantic"):
        QUERIES["dedup_semantic"](spark, sf_dir).count()


def test_embedding_pca_matches_numpy_reference(spark, sf_dir):
    ids, X = _corpus(spark, sf_dir)
    mu, W = _pca_train(_hash_stable_pool(_base(spark, sf_dir), PCA_SAMPLE))
    want = np.round((X - mu) @ W.T, 6)
    got = QUERIES["embedding_pca"](spark, sf_dir).collect()
    assert [r["vec_id"] for r in got] == list(ids)
    np.testing.assert_array_equal(
        np.array([r["pc"] for r in got]), want
    )


def test_pca_basis_is_orthonormal_and_variance_ordered(spark, sf_dir):
    pool = _hash_stable_pool(_base(spark, sf_dir), PCA_SAMPLE)
    mu, W = _pca_train(pool)
    np.testing.assert_allclose(W @ W.T, np.eye(W.shape[0]), atol=1e-9)
    # on the training sample, per-component variance must be non-increasing
    Y = (np.asarray(pool) - mu) @ W.T
    v = Y.var(axis=0)
    assert all(v[i] >= v[i + 1] - 1e-12 for i in range(len(v) - 1))
    # sign fix: each component's largest-magnitude coordinate is positive
    for row in W:
        assert row[int(np.argmax(np.abs(row)))] > 0


def _km_reference(spark, sf_dir):
    """Lloyd refinement recomputed off-Spark with the identical fsum
    reduction — {cell: (n, mean_sim)}."""
    import math

    from flink_notebooks_spark.queries.semantic import KM_CELLS, KM_ITERS

    ids, X = _corpus(spark, sf_dir)
    C = np.asarray(
        _ivf_train(
            _hash_stable_pool(_base(spark, sf_dir), SEM_TRAIN_SAMPLE),
            k=KM_CELLS,
        ),
        dtype=np.float64,
    ).copy()
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    for _ in range(KM_ITERS):
        S = Xn @ C.T
        cell = S.argmax(axis=1)
        for c in range(KM_CELLS):
            sel = X[cell == c]
            if len(sel):
                m = np.array([math.fsum(sel[:, j]) for j in range(X.shape[1])])
                nrm = float(np.linalg.norm(m))
                if nrm > 1e-12:
                    C[c] = m / nrm
    S = Xn @ C.T
    cell = S.argmax(axis=1)
    sim = S[np.arange(len(X)), cell]
    return {
        int(c): (
            int((cell == c).sum()),
            round(math.fsum(sim[cell == c]) / (cell == c).sum(), 6),
        )
        for c in np.unique(cell)
    }


def test_embedding_kmeans_matches_numpy_reference(spark, sf_dir):
    ref = _km_reference(spark, sf_dir)
    got = {
        r["cell"]: (r["n"], r["mean_sim"])
        for r in QUERIES["embedding_kmeans"](spark, sf_dir).collect()
    }
    assert got == ref


@pytest.mark.slow
def test_embedding_kmeans_partition_invariance(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    from flink_notebooks_spark.io import load_table

    repart = str(tmp_path / "emb_repart_km")
    load_table(spark, sf_dir, "embeddings").repartition(
        5, F.expr("vec_id % 11")
    ).write.parquet(f"{repart}/embeddings.parquet")
    for t in ("documents", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.parquet(
            f"{repart}/{t}.parquet"
        )
    a = sorted(map(tuple, QUERIES["embedding_kmeans"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["embedding_kmeans"](spark, repart).collect()))
    assert a == b
