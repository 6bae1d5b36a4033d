"""Time-bounded joins: as-of (temporal) and interval joins.

Reference capability: Flink SQL temporal/`FOR SYSTEM_TIME AS OF` joins and
interval joins (SURVEY.md §2.3 J6/J7 — declared via the planner dependency,
reference flink-runtime/build.gradle:37). Spark has no as-of primitive, so
``asof_join`` uses the union-tag + running ``last(ignorenulls)`` rewrite:

    tag build rows 0 / probe rows 1, union, then one window pass per key
    ordered by (time, tag, tiebreak) carries the latest build payload forward
    onto each probe row.

Cost model: ONE shuffle on the key (the window partitioning), zero row
explosion — every input row appears exactly once in the window pass. The
naive alternative (join on key + time filter + rank) materializes
|probe|×|builds-per-key| intermediate rows; at 100 TB with hot keys that is
the difference between a working plan and an OOM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    probe_time: str,
    build_time: str,
    payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each probe row, attach the latest build payload with
    ``build_time <= probe_time`` on the same key(s).

    Returns the probe rows plus ``payload`` columns (null when no build row
    precedes the probe). Ties on build_time resolve to the row with the
    greatest ``tiebreak`` (default: first payload column).
    """
    keys = [on] if isinstance(on, str) else list(on)
    tiebreak = tiebreak or payload[0]

    probe_cols = [c for c in probe.columns if c not in keys]
    b = build.select(
        *keys,
        F.col(build_time).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__b_{c}") for c in payload],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
    )
    p = probe.select(
        *keys,
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"__b_{c}") for c in payload],
        *probe_cols,
    )
    # build rows sort before probe rows at equal time (as-of is inclusive);
    # among equal-time build rows the last one wins the tiebreak order
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__tag", F.col(f"__b_{tiebreak}").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = b.unionByName(p).select(
        *keys,
        *probe_cols,
        F.col("__tag"),
        *[F.last(f"__b_{c}", ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return carried.filter(F.col("__tag") == 1).drop("__tag")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    lower: Column | int,
    upper: Column | int,
    how: str = "inner",
) -> DataFrame:
    """Join rows on equal key(s) where
    ``left_time + lower <= right_time < left_time + upper``.

    The equi-key keeps this a hash/sort-merge join (one shuffle per side on
    the key); the time bound is a post-join filter pushed into the join
    condition, so Catalyst never builds the unbounded cross product. Matches
    Flink's interval-join semantics (SURVEY.md §2.3 J6).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lt, rt = F.col(f"__l.{left_time}"), F.col(f"__r.{right_time}")
    cond = [F.col(f"__l.{k}") == F.col(f"__r.{k}") for k in keys]
    cond.append(rt >= lt + lower)
    cond.append(rt < lt + upper)
    joined = left.alias("__l").join(right.alias("__r"), cond, how)
    # USING-style output: keys come from the left side only
    right_keep = [c for c in right.columns if c not in keys]
    return joined.select(
        *[F.col(f"__l.{c}") for c in left.columns],
        *[F.col(f"__r.{c}") for c in right_keep],
    )
