"""MATCH_RECOGNIZE-lite: per-key ordered symbol sequences + pattern counting.

Reference capability: Flink SQL ``MATCH_RECOGNIZE`` (SURVEY.md §2.5 W9,
declared via the planner dependency). Full CEP needs an NFA; the common
analytics uses (count/detect a fixed event-type pattern per key) reduce to:

    per key: sort events, project each to a 1-char symbol, concatenate,
    then count regex/substring occurrences of the pattern.

This is one shuffle (the groupBy key) and the per-key state is a string the
length of the key's event count — bounded in practice by sessionization or a
time window upstream. The sort happens inside ``array_sort`` on the grouped
array (no global sort), keeping the plan a single hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sequence_pattern(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    symbol: str,
    pattern: str,
) -> DataFrame:
    """→ (key, seq, n_matches): non-overlapping count of `pattern` (a plain
    substring) inside the key's time-ordered symbol string.

    ``symbol`` is a column/expression producing a single character per row;
    ``order_cols`` must make the per-key order total (deterministic output).
    """
    ordered = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols], F.expr(symbol).alias("__s")))
    )
    seq = F.array_join(F.expr("transform(__arr, x -> x.__s)"), "")
    counted = (
        df.groupBy(key)
        .agg(ordered.alias("__arr"))
        .withColumn("seq", seq)
        .drop("__arr")
        .withColumn(
            "n_matches",
            (
                (F.length("seq") - F.length(F.replace(F.col("seq"), F.lit(pattern), F.lit(""))))
                / F.lit(len(pattern))
            ).cast("long"),
        )
    )
    return counted
