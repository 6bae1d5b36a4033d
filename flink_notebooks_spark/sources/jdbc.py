"""JDBC connector adapter (SURVEY.md S5; reference CONNECTORS.md:113-121,
144-152 — Postgres/MySQL source/sink).

Maps Flink JDBC table options onto ``spark.read.jdbc``. Partitioned reads
(scan.partition.*) become Spark's partitionColumn/lowerBound/upperBound/
numPartitions — the parallel-scan path that matters at scale. Integration
evidence runs against the embedded Derby database bundled with Spark
(tests/test_jdbc_derby.py: DDL→INSERT→read-back, 4-way partitioned scan,
streaming lookup join; oracle query ``jdbc_roundtrip``); Postgres/MySQL
swap url/driver options on the same code path.
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
    try:
        return spark.read.format("jdbc").options(**reader_options(table)).load()
    except Exception:
        # a sink table may be declared before it exists in the database
        # (CREATE then INSERT INTO, like the filesystem sink) — surface it
        # as an empty typed relation; the engine re-materializes views after
        # INSERT, at which point the real scan resolves. Tables with no
        # declared columns have no schema to fall back on: re-raise.
        schema = table.spark_schema()
        if not schema.fields:
            raise
        return spark.createDataFrame([], schema)


def write_batch(df: DataFrame, table, overwrite: bool) -> None:
    (
        df.write.format("jdbc")
        .options(**reader_options(table))
        .mode("overwrite" if overwrite else "append")
        .save()
    )
