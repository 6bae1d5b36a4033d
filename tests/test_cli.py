"""CLI entry points (python -m flink_notebooks_spark) — the reference's
three user flows without an editor: run a notebook, ad-hoc SQL, gateway."""

from __future__ import annotations

import json

from flink_notebooks_spark.__main__ import main


def test_cli_sql_prints_rows(spark, capsys):
    rc = main(["sql", "SELECT 1 AS x, 'hi' AS s"])
    assert rc == 0
    out = capsys.readouterr()
    assert "x | s" in out.out and "1 | hi" in out.out
    assert "-- 1 rows" in out.err


def test_cli_run_notebook(spark, tmp_path, capsys):
    nb = {
        "cells": [
            {"kind": 2, "languageId": "sql", "value": (
                "CREATE TABLE cli_orders (id INT) WITH ("
                "'connector' = 'datagen', 'number-of-rows' = '5', "
                "'fields.id.kind' = 'sequence', 'fields.id.start' = '1', "
                "'fields.id.end' = '5')"
            ), "metadata": {}},
            {"kind": 2, "languageId": "sql", "value": (
                "SET 'execution.runtime-mode' = 'batch';\n"
                "SELECT id FROM cli_orders ORDER BY id"
            ), "metadata": {}},
        ],
        "metadata": {},
    }
    path = tmp_path / "cli.flinknb"
    path.write_text(json.dumps(nb))
    rc = main(["run", str(path), "--save"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[batch]" in out and "id" in out
    # --save wrote observed metadata back, like the reference's notebooks
    saved = json.loads(path.read_text())
    assert saved["cells"][1]["metadata"]["total_rows_fetched"] == 6  # OK + 5
