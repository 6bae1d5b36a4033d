"""Declared correctness queries: SURVEY.md §2.11 (Q1–Q18), LLM-pipeline
operators, and Structured-Streaming checks. Importing this package populates
the shared registry (`QUERIES` / `ORACLE`) consumed by __spark_entry__.py.
"""

from . import llm, relational, streaming, tpch  # noqa: F401  (registration side effects)
from ._registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
