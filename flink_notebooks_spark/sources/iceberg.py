"""Iceberg connector adapter (SURVEY.md S7; reference CONNECTORS.md:29-59).

The reference wires Iceberg hadoop/Glue catalogs into Flink; the Spark
equivalent is the ``iceberg-spark-runtime`` package registering a
``SparkCatalog``. That jar is not bundled in this environment, so this
module provides (a) the catalog configuration helper a deployment uses and
(b) a clear, early error instead of an opaque classpath failure. With the
jar present, Iceberg tables need nothing else from this engine — they are
ordinary Spark-catalog tables reachable through the same SQL surface
(`USE CATALOG`, `SHOW TABLES`, queries, `INSERT`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

RUNTIME_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def runtime_available(spark: SparkSession) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(RUNTIME_CLASS)  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


def catalog_conf(name: str, warehouse: str, catalog_impl: str = "hadoop") -> dict[str, str]:
    """Spark confs that register an Iceberg catalog (set at session build —
    they are static). ``catalog_impl``: hadoop | hive | glue."""
    base = f"spark.sql.catalog.{name}"
    conf = {base: RUNTIME_CLASS, f"{base}.warehouse": warehouse}
    if catalog_impl == "hadoop":
        conf[f"{base}.type"] = "hadoop"
    elif catalog_impl == "hive":
        conf[f"{base}.type"] = "hive"
    elif catalog_impl == "glue":
        conf[f"{base}.catalog-impl"] = "org.apache.iceberg.aws.glue.GlueCatalog"
    else:
        raise ValueError(f"unknown iceberg catalog impl: {catalog_impl}")
    return conf


def _require(spark: SparkSession) -> None:
    if not runtime_available(spark):
        raise RuntimeError(
            "Iceberg support requires the iceberg-spark-runtime jar on the "
            "session classpath (spark.jars.packages="
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<version>); "
            "not bundled in this environment"
        )


def build_batch(spark: SparkSession, table) -> DataFrame:
    _require(spark)
    return spark.table(table.options.get("table-name", table.name))


def build_stream(spark: SparkSession, table) -> DataFrame:
    _require(spark)
    return (
        spark.readStream.format("iceberg")
        .load(table.options.get("table-name", table.name))
    )
