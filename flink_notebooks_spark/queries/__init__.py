"""Declared correctness queries: SURVEY.md §2.11 (Q1–Q18), LLM-pipeline
operators, and Structured-Streaming checks. Importing this package populates
the shared registry (`QUERIES` / `ORACLE`) consumed by __spark_entry__.py.
"""

# Registration order matters: the driver's CORRECTNESS report may truncate to
# the first N registry entries, so the §2.11 core contract (q01–q18, tpch)
# must register first, then relational/streaming breadth, then LLM-pipeline ops.
from . import tpch, relational, streaming, llm, corpus, semantic, lexical, graph, tpch2, curation2, streaming2, tpch3, streaming3, curation3, streaming4  # noqa: F401  (registration side effects)
from ._registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
