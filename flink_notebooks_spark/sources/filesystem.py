"""``filesystem`` connector — file scan/write (SURVEY.md S3, S8).

Reference: CONNECTORS.md:75-83 (filesystem + parquet/csv/json formats),
S3 via s3a paths (CONNECTORS.md:64-83). Spark-first: ``spark.read.<fmt>`` /
``df.write.<fmt>`` for batch, ``readStream``/``writeStream`` for unbounded
runtime mode. Formats: parquet (default), csv, json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"parquet", "csv", "json", "orc", "text", "avro"}


def _fmt(table) -> str:
    f = table.options.get("format", "parquet").lower()
    if f not in _FORMATS:
        raise ValueError(f"filesystem: unsupported format {f!r}")
    return f


def _path(table) -> str:
    p = table.options.get("path")
    if not p:
        raise ValueError(f"filesystem table {table.name}: 'path' option required")
    return p


def _reader_opts(table) -> dict[str, str]:
    opts = {}
    if _fmt(table) == "csv":
        opts["header"] = table.options.get("csv.include-header", "true")
        if "csv.field-delimiter" in table.options:
            opts["sep"] = table.options["csv.field-delimiter"]
    return opts


def _exists(spark: SparkSession, path: str) -> bool:
    """Check path existence via the Hadoop FS API (works for local and s3a)."""
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    jsc = spark.sparkContext._jsc  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return fs.exists(hpath)


def build_batch(spark: SparkSession, table) -> DataFrame:
    schema = table.spark_schema()
    # A sink-only table may be declared before its path exists (reference
    # allows CREATE then INSERT INTO); surface it as an empty typed relation.
    if schema.fields and not _exists(spark, _path(table)):
        return spark.createDataFrame([], schema)
    reader = spark.read.format(_fmt(table)).options(**_reader_opts(table))
    if schema.fields:
        reader = reader.schema(schema)
    return reader.load(_path(table))


def build_stream(spark: SparkSession, table) -> DataFrame:
    schema = table.spark_schema()
    if not schema.fields:
        raise ValueError("filesystem streaming source requires a declared schema")
    return (
        spark.readStream.format(_fmt(table))
        .options(**_reader_opts(table))
        .schema(schema)
        .load(_path(table))
    )


def write_batch(df: DataFrame, table, overwrite: bool) -> None:
    (
        df.write.format(_fmt(table))
        .mode("overwrite" if overwrite else "append")
        .save(_path(table))
    )


def write_stream(df: DataFrame, table, checkpoint: str):
    return (
        df.writeStream.format(_fmt(table))
        .option("path", _path(table))
        .option("checkpointLocation", checkpoint)
        .start()
    )
