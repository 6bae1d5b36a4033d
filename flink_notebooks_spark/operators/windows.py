"""HOP (sliding) and CUMULATE windows over an epoch-microsecond time column.

Reference capability: Flink 1.20 windowing TVFs ``TUMBLE``/``HOP``/``CUMULATE``
(SURVEY.md §2.5 W1/W2; capability via flink-runtime/build.gradle:37). Spark's
``F.window`` covers tumble and hop natively; CUMULATE (growing windows that
share a span start) has no Spark analog, so it is expressed as an explode over
the per-row set of covering window ends — pure integer arithmetic inside
whole-stage codegen, fan-out bounded by span/step (a small constant).

Both helpers work on a bigint epoch-µs column to stay timezone-proof and
bit-exact against integer-arithmetic oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hop_window(df: DataFrame, time_us: str, width_us: int, slide_us: int) -> DataFrame:
    """Assign each row to every sliding window containing it.

    Adds ``w_start_us`` / ``w_end_us``; output has width/slide rows per input
    row (each row belongs to exactly width/slide windows). Windows are aligned
    to epoch 0, matching both Flink HOP and Spark ``F.window(w, s)``.
    """
    if width_us % slide_us != 0:
        raise ValueError("hop_window: width must be a multiple of slide")
    n = width_us // slide_us
    # k-th candidate start: the window aligned slide*k below the row's slide slot
    starts = F.expr(
        f"transform(sequence(0, {n - 1}), "
        f"k -> (({time_us} div {slide_us}) - k) * {slide_us})"
    )
    out = df.withColumn("w_start_us", F.explode(starts))
    return out.withColumn("w_end_us", F.col("w_start_us") + F.lit(width_us))


def cumulate_window(df: DataFrame, time_us: str, step_us: int, span_us: int) -> DataFrame:
    """CUMULATE: within each span, emit growing windows [span_start, k*step).

    A row at offset x into its span belongs to every window whose end exceeds
    x: ends (floor(x/step)+1)*step .. span. Adds ``w_start_us`` (span start)
    and ``w_end_us`` (growing end).
    """
    if span_us % step_us != 0:
        raise ValueError("cumulate_window: span must be a multiple of step")
    span_start = F.expr(f"({time_us} div {span_us}) * {span_us}")
    out = df.withColumn("w_start_us", span_start)
    ends = F.expr(
        f"transform(sequence((({time_us} - w_start_us) div {step_us}) + 1, {span_us // step_us}), "
        f"k -> w_start_us + k * {step_us})"
    )
    return out.withColumn("w_end_us", F.explode(ends))
