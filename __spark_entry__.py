"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``   — every implemented operator from SURVEY.md §2 (Q1–Q37 +
                  LLM-pipeline/curation + streaming; see COVERAGE.md for the full
                  inventory map), each ``(spark, sf_dir) → DataFrame``.
``oracle_sql()``— DuckDB-equivalent SQL per query (omitted only for the
                  probabilistic/hash-stub ops — MinHash-LSH, SimHash,
                  LSH/IVF ANN, multimodal decode — which get rows-only
                  checks; tests pin those against exact in-Spark baselines
                  or recall floors).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_notebooks_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Multi-join + aggregation + top-k (SURVEY.md §2.11 Q6) — exercises scan,
    broadcast + shuffle joins, partial aggregation, and TakeOrdered.
    """
    return QUERIES["q06_join_agg_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
