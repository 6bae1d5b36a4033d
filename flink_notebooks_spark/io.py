"""Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md).

All tables are plain parquet scans — Catalyst pushes filters/projections down
to the scan, so callers should filter/select on the returned DataFrame rather
than pre-materializing. ``events`` needs special handling: its ``ts`` column is
parquet TIMESTAMP(NANOS), which Spark's reader rejects; with
``spark.sql.legacy.parquet.nanosAsLong`` we read raw nanos and truncate to
microseconds with *integer* division — exactly what DuckDB's reader does — so
oracle comparisons are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Schema of events.parquet once nanos are read as long (for readStream, which
# requires an explicit schema).
EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def _events_ts_cols(df: DataFrame) -> DataFrame:
    """Derive µs-truncated time columns from the raw nano ``ts`` long.

    - ``ts``      → TIMESTAMP_NTZ at µs precision (DuckDB-reader equivalent)
    - ``ts_us``   → epoch microseconds (bigint; exact integer arithmetic)

    ``timestampadd`` on an NTZ base stays NTZ, so this is independent of the
    session timezone. ``div`` is integer division (no double rounding).
    """
    return df.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
        "ts", F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. ``events`` gets µs-exact ``ts`` plus ``ts_us``."""
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _events_ts_cols(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the SQL surface)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
