"""Structural invariants for the dedup-graph operators (queries/graph.py).

Value-exactness is pinned by the DuckDB oracles in test_queries_oracle.py
(PageRank via an unrolled 8-iteration CTE chain, triangles via the sorted
wedge join); these tests pin the graph-theoretic invariants that the
oracle comparison alone wouldn't explain if they broke.
"""

from __future__ import annotations

import math

from flink_notebooks_spark.queries import QUERIES


def test_pagerank_mass_conservation_and_positivity(spark, sf_dir):
    rows = QUERIES["dedup_graph_pagerank"](spark, sf_dir).collect()
    assert rows, "fixture corpus has near-dup pairs"
    total = math.fsum(r["pagerank"] for r in rows)
    # per-node 9-dp rounding each iteration leaks at most n*1e-9 per round;
    # rank mass must still sum to ~1
    assert abs(total - 1.0) < 1e-4
    assert all(r["pagerank"] > 0 for r in rows)
    # ordering contract: descending rank, doc_id tie-break
    key = [(-r["pagerank"], r["doc_id"]) for r in rows]
    assert key == sorted(key)


def test_triangles_invariants(spark, sf_dir):
    rows = QUERIES["dedup_graph_triangles"](spark, sf_dir).collect()
    assert rows
    # handshake: every triangle contributes exactly 3 corner rows
    assert sum(r["n_triangles"] for r in rows) % 3 == 0
    for r in rows:
        deg, t, c = r["deg"], r["n_triangles"], r["clustering"]
        assert t <= deg * (deg - 1) // 2, "more triangles than wedge pairs"
        assert 0.0 <= c <= 1.0
        if deg < 2:
            assert t == 0 and c == 0.0


def test_pagerank_and_triangles_agree_on_node_set(spark, sf_dir):
    pr = {r["doc_id"] for r in QUERIES["dedup_graph_pagerank"](spark, sf_dir).collect()}
    tr = {r["doc_id"] for r in QUERIES["dedup_graph_triangles"](spark, sf_dir).collect()}
    assert pr == tr
