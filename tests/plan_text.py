"""Shared formatted-plan text audits (used by test_llm_ops and
test_curation2 — one definition of the exchange/text scan so the block
format and the REPARTITION_BY_NUM exemption can't drift between copies)."""

from __future__ import annotations

import contextlib
import io


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_text_exchanges(df) -> int:
    """How many DATA-shuffle exchanges in the physical plan carry a ``text``
    attribute. Excludes the token-cache build's explicit REPARTITION_BY_NUM,
    where raw text crosses once by design (it IS the scan distribution for
    the CPU-bound tokenize stage — see tokenized_docs' docstring)."""
    blocks = [
        b
        for b in formatted_plan(df).split("\n\n")
        if "Exchange" in b.split("\n")[0]
    ]
    crossings = 0
    for block in blocks:
        if "REPARTITION_BY_NUM" in block:
            continue
        for line in block.split("\n"):
            if (line.startswith("Input") or line.startswith("Arguments")) and (
                "text#" in line
            ):
                crossings += 1
                break
    return crossings
