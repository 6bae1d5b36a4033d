"""``filesystem`` connector — file scan/write (SURVEY.md S3, S8).

Reference: CONNECTORS.md:75-83 (filesystem + parquet/csv/json formats),
S3 via s3a paths (CONNECTORS.md:64-83). Spark-first: ``spark.read.<fmt>`` /
``df.write.<fmt>`` for batch, ``readStream``/``writeStream`` for unbounded
runtime mode. Formats: parquet (default), csv, json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import tune

# avro needs the external spark-avro module (not bundled in this
# environment); listing it without the jar would fail at read time with a
# confusing planner error, so it is gated here with a clear message.
_FORMATS = {"parquet", "csv", "json", "orc", "text"}


def _fmt(table) -> str:
    f = table.options.get("format", "parquet").lower()
    if f == "avro":
        raise ValueError(
            "filesystem: format 'avro' requires the spark-avro module "
            "(add the org.apache.spark:spark-avro jar to the session)"
        )
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
    # engine extension (no Flink filesystem-connector equivalent): bound the
    # files per micro-batch so multi-file replays produce deterministic
    # watermark progressions — maps onto Spark's maxFilesPerTrigger
    if "source.max-files-per-trigger" in table.options:
        opts["maxFilesPerTrigger"] = table.options["source.max-files-per-trigger"]
    return opts


def _exists(spark: SparkSession, path: str) -> bool:
    """Check path existence via the Hadoop FS API (works for local and s3a)."""
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    jsc = spark.sparkContext._jsc  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return fs.exists(hpath)


def _nanos_ts_cols(path: str) -> set[str]:
    """Column names stored as parquet TIMESTAMP(NANOS), read from the footer.

    Spark cannot map nanos to TimestampType (µs); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it reads them as raw-nano longs,
    so a user-declared TIMESTAMP column needs an explicit ns→µs conversion
    (`_align`). Footer sniffing uses pyarrow on one file — local paths only;
    remote stores (s3a://...) skip the probe and fall back to plain casts.
    """
    try:
        import glob
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        if "://" in path and not path.startswith("file:"):
            return set()
        p = path.removeprefix("file:")
        if os.path.isdir(p):
            files = glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
            if not files:
                return set()
            p = files[0]
        sch = pq.read_schema(p)
        return {
            f.name for f in sch if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        }
    except Exception:
        return set()


_TS_TYPES = (T.TimestampType, T.TimestampNTZType)


def _align(df: DataFrame, schema: T.StructType, ns_cols: set[str]) -> DataFrame:
    """Project ``df`` onto the declared schema, casting where types differ.

    Plain column references stay plain (pruning/pushdown reach the scan);
    only mismatched columns get a cast. Raw-nano longs declared as TIMESTAMP
    convert with integer division (µs truncation — same as DuckDB's reader).
    Declared columns missing from the file surface as typed nulls, matching
    the permissiveness of a forced reader schema.
    """
    cols = []
    for f in schema.fields:
        if f.name not in df.columns:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        native = df.schema[f.name].dataType
        c = F.col(f.name)
        if native != f.dataType:
            if (
                f.name in ns_cols
                and isinstance(native, T.LongType)
                and isinstance(f.dataType, _TS_TYPES)
            ):
                c = F.expr(
                    f"timestampadd(MICROSECOND, `{f.name}` div 1000, "
                    f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ).cast(f.dataType)
            else:
                c = c.cast(f.dataType)
        cols.append(c.alias(f.name))
    return df.select(*cols)


# Flink filesystem METADATA keys → Spark's hidden per-file _metadata struct
_FS_META = {
    "file.path": "_metadata.file_path",
    "file.name": "_metadata.file_name",
    "file.size": "_metadata.file_size",
    "file.modification-time": "_metadata.file_modification_time",
}


def _declared_struct(table) -> T.StructType:
    """Full read schema in DECLARED column order — physical + metadata
    columns interleaved exactly as written in the DDL, so SELECT * matches
    Flink (computed columns attach in the engine layer)."""
    fields = []
    for c in table.columns:
        if getattr(c, "computed_expr", None) is not None or c.data_type is None:
            continue
        nullable = True if getattr(c, "metadata_key", None) else c.nullable
        fields.append(T.StructField(c.name, c.data_type, nullable))
    return T.StructType(fields)


def _attach_fs_meta(df: DataFrame, table) -> DataFrame:
    """Final projection in DECLARED column order (same contract as
    kafka._with_meta): payload columns from the scan, METADATA columns from
    the file source's _metadata struct (must be selected before any
    transformation detaches it) — so ``SELECT *`` column order matches the
    Flink declaration even when metadata columns are declared before or
    between physical columns."""
    metas = [c for c in table.columns if getattr(c, "metadata_key", None)]
    if not metas:
        return df
    cols = []
    for c in table.columns:
        if getattr(c, "computed_expr", None) is not None:
            continue  # computed columns attach in the engine layer
        mk = getattr(c, "metadata_key", None)
        if mk is None:
            cols.append(F.col(c.name))
            continue
        src_field = _FS_META.get(mk)
        if src_field is None:
            raise ValueError(
                f"filesystem: unsupported metadata key {mk!r} "
                f"(one of {', '.join(sorted(_FS_META))})"
            )
        cols.append(F.col(src_field).cast(c.data_type).alias(c.name))
    return df.select(*cols)


def build_batch(spark: SparkSession, table) -> DataFrame:
    tune(spark)
    schema = table.spark_schema()
    # A sink-only table may be declared before its path exists (reference
    # allows CREATE then INSERT INTO); surface it as an empty typed relation.
    if schema.fields and not _exists(spark, _path(table)):
        return spark.createDataFrame(
            [], _declared_struct(table)
        )
    reader = spark.read.format(_fmt(table)).options(**_reader_opts(table))
    if not schema.fields:
        return reader.load(_path(table))
    if _fmt(table) == "parquet":
        # Parquet is self-describing: read the file's own schema, then align
        # by cast. Forcing the declared schema onto the reader instead fails
        # on representational mismatches (e.g. TIMESTAMP(NANOS) vs µs).
        raw = _attach_fs_meta(reader.load(_path(table)), table)
        target = _declared_struct(table)
        return _align(raw, target, _nanos_ts_cols(_path(table)))
    return _attach_fs_meta(reader.schema(schema).load(_path(table)), table)


def build_stream(spark: SparkSession, table) -> DataFrame:
    tune(spark)
    schema = table.spark_schema()
    if not schema.fields:
        raise ValueError("filesystem streaming source requires a declared schema")
    ns_cols = _nanos_ts_cols(_path(table)) if _fmt(table) == "parquet" else set()
    read_schema = schema
    if ns_cols:
        # readStream requires an explicit schema; declare nanos columns as
        # long for the scan, then convert to the declared timestamp type.
        read_schema = T.StructType(
            [
                T.StructField(f.name, T.LongType(), f.nullable)
                if f.name in ns_cols and isinstance(f.dataType, _TS_TYPES)
                else f
                for f in schema.fields
            ]
        )
    df = _attach_fs_meta(
        spark.readStream.format(_fmt(table))
        .options(**_reader_opts(table))
        .schema(read_schema)
        .load(_path(table)),
        table,
    )
    if not ns_cols:
        return df
    target = _declared_struct(table)
    return _align(df, target, ns_cols)


def write_batch(df: DataFrame, table, overwrite: bool) -> None:
    w = df.write.format(_fmt(table)).mode("overwrite" if overwrite else "append")
    if getattr(table, "partitioned_by", None):
        # hive-style directory layout: downstream reads get partition
        # pruning for free when filtering on the partition columns
        w = w.partitionBy(*table.partitioned_by)
    w.save(_path(table))


def write_stream(df: DataFrame, table, checkpoint: str):
    w = (
        df.writeStream.format(_fmt(table))
        .option("path", _path(table))
        .option("checkpointLocation", checkpoint)
    )
    if getattr(table, "partitioned_by", None):
        w = w.partitionBy(*table.partitioned_by)
    return w.start()
