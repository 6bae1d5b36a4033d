"""Query registry shared by the declared-query modules.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus (optionally)
an equivalent ANSI-SQL oracle string for DuckDB. The driver hash-compares the
two at sf0.01 (CORRECTNESS gate); entries without an oracle get a weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).

Float determinism contract: wherever an aggregate sums binary-inexact doubles
(money-like columns with 2 decimals), BOTH sides sum via DECIMAL(18,2) — an
exact, order-independent sum — then cast to double once. This makes results
bit-identical regardless of partitioning/shuffle order, so the engine remains
correct at any parallelism (local[32] today, 1000 executors at 100 TB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def dsum(col: str, alias: str):
    """Order-independent exact sum of a 2-decimal double column → double."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)


def davg(col: str, alias: str):
    """Deterministic average: exact decimal sum cast to double, / count."""
    return (
        F.sum(F.col(col).cast("decimal(18,2)")).cast("double") / F.count(F.col(col))
    ).alias(alias)


def sql_dsum(col: str, alias: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def sql_davg(col: str, alias: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col}) AS {alias}"
