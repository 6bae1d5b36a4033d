"""JDBC connector adapter (SURVEY.md S5; reference CONNECTORS.md:113-121,
144-152 — Postgres/MySQL source/sink).

Maps Flink JDBC table options onto ``spark.read.jdbc``. Partitioned reads
(scan.partition.*) become Spark's partitionColumn/lowerBound/upperBound/
numPartitions — the parallel-scan path that matters at scale. Requires a
JDBC driver jar + live database, so tests cover option mapping only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def reader_options(table) -> dict[str, str]:
    o = table.options
    opts = {
        "url": o.get("url", ""),
        "dbtable": o.get("table-name", table.name),
    }
    for src, dst in (("username", "user"), ("password", "password"), ("driver", "driver")):
        if src in o:
            opts[dst] = o[src]
    if "scan.partition.column" in o:
        opts["partitionColumn"] = o["scan.partition.column"]
        opts["numPartitions"] = o.get("scan.partition.num", "4")
        opts["lowerBound"] = o.get("scan.partition.lower-bound", "0")
        opts["upperBound"] = o.get("scan.partition.upper-bound", "1000000")
    return opts


def build_batch(spark: SparkSession, table) -> DataFrame:
    return spark.read.format("jdbc").options(**reader_options(table)).load()


def write_batch(df: DataFrame, table, overwrite: bool) -> None:
    (
        df.write.format("jdbc")
        .options(**reader_options(table))
        .mode("overwrite" if overwrite else "append")
        .save()
    )
