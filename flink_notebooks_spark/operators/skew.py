"""Skew mitigation: salted equi-join for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in this engine's session confs) handles most skew at runtime by
splitting oversized partitions. Salting is the *manual* fallback for the
cases AQE can't fix — a single key too hot for any split (all rows equal on
the join key), or non-AQE execution paths:

    left:  salt = hash(whole row) % s          (deterministic, uniform)
    right: replicate each row s times, salt = 0..s-1
    join on (key, salt)                        → hot key spreads over s tasks

Replication multiplies the right side by s, so use it with a small/medium
right side and s sized to the hottest key's row count / target task size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across ``salt``
    sub-partitions. Output equals ``left.join(right, on, how)`` exactly
    (same rows; the salt columns are internal)."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (salting the probe side)")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_s = left.withColumn("__salt", lsalt.cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = l_s.join(r_s, [*keys, "__salt"], how)
    return out.drop("__salt")


def hot_keys(df: DataFrame, on: str | list[str], top: int = 20) -> DataFrame:
    """The heaviest join keys with their row counts — the one-pass
    diagnostic run before choosing broadcast / AQE / salting. A key whose
    row count approaches a shuffle partition's row budget is the salting
    candidate; partial aggregation keeps this cheap even on the skewed
    input itself (the hot key combines map-side)."""
    keys = [on] if isinstance(on, str) else list(on)
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.desc("n_rows"), *keys)
        .limit(top)
    )
