"""``.flinknb`` notebook documents: load / save / run.

The reference's document model (reference vscode-extension/src/serializers/
flinkNotebookSerializer.ts:7-22,40-66): a JSON object ``{"cells": [...]}``
where each cell has ``kind`` (1 = markdown, 2 = code), ``language``
(``sql`` / ``flink-sql`` for code), ``value``, ``metadata`` (statement_id,
is_streaming, total_rows_fetched — models/types.ts:64-72) and base64
``outputs``. The runner executes code cells sequentially through an
``Engine`` session — exactly what the notebook controller does per cell
(flinkNotebookController.ts:61-123) — draining batch results fully and
capping unbounded streaming results by rows/time like the client's poll
loop with its 10k cap (flinkNotebookController.ts:427-428).

This makes the reference's example notebooks directly executable against
this engine — they are its de-facto acceptance corpus (SURVEY.md §5).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any

from .engine import Engine
from .engine.ddl import split_statements

MARKDOWN, CODE = 1, 2


@dataclass
class Cell:
    kind: int
    value: str
    language: str = "sql"
    metadata: dict = field(default_factory=dict)
    outputs: list = field(default_factory=list)


@dataclass
class Notebook:
    cells: list[Cell]

    @property
    def code_cells(self) -> list[Cell]:
        return [c for c in self.cells if c.kind == CODE]


def load(path: str) -> Notebook:
    with open(path) as f:
        doc = json.load(f)
    return Notebook(
        cells=[
            Cell(
                kind=c.get("kind", CODE),
                value=c.get("value", ""),
                language=c.get("language", "sql"),
                metadata=c.get("metadata") or {},
                outputs=c.get("outputs") or [],
            )
            for c in doc.get("cells", [])
        ]
    )


def save(nb: Notebook, path: str) -> None:
    doc = {
        "cells": [
            {
                "kind": c.kind,
                "language": c.language,
                "value": c.value,
                "metadata": c.metadata,
                **({"outputs": c.outputs} if c.outputs else {}),
            }
            for c in nb.cells
        ]
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


@dataclass
class CellResult:
    cell_index: int
    statements: list[dict]  # per statement: {sql, status, columns, rows, streaming}


def run(
    nb: Notebook,
    engine: Engine,
    max_stream_rows: int = 100,
    stream_timeout: float = 15.0,
) -> list[CellResult]:
    """Execute every code cell in order; returns per-cell results.

    Batch statements drain all pages; streaming statements poll like the
    client (500 ms interval, flinkNotebookController.ts:427) until
    ``max_stream_rows`` or ``stream_timeout``, then cancel — the notebook's
    stop-button flow. Cell metadata is updated with the observed
    ``total_rows_fetched``, mirroring the reference's saved notebooks.
    """
    out: list[CellResult] = []
    for idx, cell in enumerate(nb.cells):
        if cell.kind != CODE:
            continue
        stmts = []
        for sql in split_statements(cell.value):
            stmt = engine.execute_sql(sql)
            rows: list[dict] = []
            cols: list[str] = []
            token = 0
            deadline = time.time() + stream_timeout
            while True:
                page = stmt.fetch(token)
                cols = [c.name for c in page.columns] or cols
                if page.result_type == "PAYLOAD":
                    rows.extend(page.data)
                    token = page.next_token
                elif page.result_type == "EOS":
                    break
                else:  # NOT_READY
                    time.sleep(0.5)
                if stmt.is_streaming and (
                    len(rows) >= max_stream_rows or time.time() > deadline
                ):
                    stmt.cancel()
                    break
            stmts.append(
                {
                    "sql": sql,
                    "status": stmt.status(),
                    "columns": cols,
                    "rows": rows,
                    "streaming": stmt.is_streaming,
                }
            )
        total = sum(len(s["rows"]) for s in stmts)
        cell.metadata.update(
            {"total_rows_fetched": total, "is_streaming": any(s["streaming"] for s in stmts)}
        )
        out.append(CellResult(cell_index=idx, statements=stmts))
    return out
