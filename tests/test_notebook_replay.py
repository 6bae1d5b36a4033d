"""Execute the reference's own example notebooks (.flinknb) end-to-end.

The examples are the reference's de-facto acceptance corpus (SURVEY.md §5);
their saved cell metadata records observed row counts we can assert
(examples/02: total_rows_fetched 100 / 19-groups / 50). Skipped when the
read-only reference checkout isn't present (standalone repo runs).
"""

from __future__ import annotations

import os

import pytest

from flink_notebooks_spark.engine import Engine
from flink_notebooks_spark.notebook import CODE, MARKDOWN, Cell, Notebook, load, run, save

EXAMPLES = "/root/reference/examples"


@pytest.fixture()
def engine(spark):
    eng = Engine(spark)
    yield eng
    eng.close()


def test_roundtrip_serialization(tmp_path):
    nb = Notebook(
        cells=[
            Cell(kind=MARKDOWN, value="# title", language="markdown"),
            Cell(kind=CODE, value="SELECT 1 AS x", metadata={"a": 1}),
        ]
    )
    p = str(tmp_path / "t.flinknb")
    save(nb, p)
    back = load(p)
    assert [c.kind for c in back.cells] == [MARKDOWN, CODE]
    assert back.cells[1].value == "SELECT 1 AS x"
    assert back.cells[1].metadata == {"a": 1}


@pytest.mark.skipif(not os.path.isdir(EXAMPLES), reason="reference not present")
def test_example_02_batch_notebook_replays(engine):
    nb = load(f"{EXAMPLES}/02-datagen-batch.flinknb")
    results = run(nb, engine)
    by_sql = {}
    for r in results:
        for s in r.statements:
            by_sql[s["sql"][:40]] = s

    # every statement completed (batch mode switch happens inside the
    # notebook itself via SET 'execution.runtime-mode')
    assert all(s["status"] in ("FINISHED",) for r in results for s in r.statements)

    # observed row counts recorded by the reference's saved notebook:
    # full scan = 100 rows (examples/02:31), complex-type scan = 50 (:99)
    def is_scan(sql, table):
        from flink_notebooks_spark.engine.ddl import strip_comments

        up = strip_comments(sql).upper()
        return up.startswith("SELECT") and table.upper() in up and "GROUP BY" not in up

    scans = [
        s for r in results for s in r.statements if is_scan(s["sql"], "orders_batch")
    ]
    assert scans and len(scans[0]["rows"]) == 100
    complex_scans = [
        s for r in results for s in r.statements
        if is_scan(s["sql"], "products_with_metadata")
    ]
    assert complex_scans and len(complex_scans[0]["rows"]) == 50

    # the revenue aggregation produced 1..20 product groups (19 observed in
    # the reference run; datagen randomness differs, bounds don't)
    aggs = [
        s for r in results for s in r.statements
        if "GROUP BY product_id" in s["sql"]
    ]
    assert aggs and 1 <= len(aggs[0]["rows"]) <= 20


@pytest.mark.skipif(not os.path.isdir(EXAMPLES), reason="reference not present")
@pytest.mark.slow
def test_example_01_streaming_notebook_replays(engine):
    nb = load(f"{EXAMPLES}/01-datagen-streaming.flinknb")
    # clickstream generates 2 rows/s (the notebook declares it); cap low
    results = run(nb, engine, max_stream_rows=10, stream_timeout=45.0)
    streaming = [s for r in results for s in r.statements if s["streaming"]]
    # the notebook's unbounded SELECT and windowed agg both produced rows
    # and were capped+canceled like the client's stop flow
    assert streaming
    from flink_notebooks_spark.engine.ddl import strip_comments

    raw = [
        s for s in streaming
        if strip_comments(s["sql"]).upper().startswith("SELECT")
        and "TUMBLE" not in s["sql"].upper()
    ]
    assert raw and len(raw[0]["rows"]) >= 3 and raw[0]["status"] == "CANCELED"
    # cell metadata mirrors the reference's saved shape
    assert any(c.metadata.get("is_streaming") for c in nb.cells if c.kind == CODE)
