"""``datagen`` connector — synthetic table source (SURVEY.md S1/S2).

Reference semantics (examples/01-datagen-streaming.flinknb:12,
examples/02-datagen-batch.flinknb:12):

- streaming: unbounded, ``rows-per-second`` rate, per-field ``min``/``max``/
  ``length`` random generators
- bounded: exactly ``number-of-rows`` rows; per-field ``kind``='sequence'
  with ``start``/``end``, or random

Spark-first mapping: bounded → ``spark.range(n)`` + column transforms
(pure Catalyst, parallel, no driver data); streaming → the ``rate`` source
(micro-batch, honors rows-per-second) + the same transforms keyed off the
rate source's ``value``.

Determinism: Flink's datagen "random" is nondeterministic; we derive values
from ``xxhash64(row_id, field_name)`` instead so results are reproducible
across runs and partitionings at any scale (a property the tests rely on).
Timestamp fields generate event time from a fixed base epoch + row index
spacing (streaming uses the rate-source's real timestamp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_BASE_EPOCH = 1_704_067_200  # 2024-01-01 UTC; override via option


def _u(df_id: Column, name: str) -> Column:
    """Deterministic uniform int64 ≥ 0 from (row id, field name)."""
    return F.abs(F.xxhash64(df_id, F.lit(name)))


def _rand_string(df_id: Column, name: str, length: int) -> Column:
    # hex chain long enough for `length`, cut to size
    parts = [
        F.lower(F.hex(_u(df_id, f"{name}#{i}")))
        for i in range(length // 16 + 1)
    ]
    return F.substring(F.concat(*parts), 1, length)


def _gen_field(
    row_id: Column,
    name: str,
    dt: T.DataType,
    opts: dict[str, str],
    base_epoch: int,
) -> Column:
    kind = opts.get("kind", "random")
    if kind == "sequence":
        start = int(opts.get("start", "1"))
        return (F.lit(start) + row_id).cast(dt)

    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        lo = int(opts.get("min", "0"))
        hi = int(opts.get("max", str(lo + 100)))
        span = max(hi - lo + 1, 1)
        return (F.lit(lo) + _u(row_id, name) % F.lit(span)).cast(dt)
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        lo = float(opts.get("min", "0"))
        hi = float(opts.get("max", str(lo + 100)))
        frac = (_u(row_id, name) % 1_000_000) / 1_000_000.0
        col = F.lit(lo) + frac * (hi - lo)
        if isinstance(dt, T.DecimalType):
            return F.round(col, dt.scale).cast(dt)
        return col.cast(dt)
    if isinstance(dt, T.StringType):
        length = int(opts.get("length", "10"))
        return _rand_string(row_id, name, length)
    if isinstance(dt, T.BooleanType):
        return (_u(row_id, name) % 2 == 0).cast(dt)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # event time advances 1s per row from the base epoch
        us = (F.lit(base_epoch * 1_000_000).cast("long") + row_id.cast("long") * 1_000_000).cast("long")
        col = F.timestamp_micros(us)
        return col.cast(dt) if isinstance(dt, T.TimestampNTZType) else col
    if isinstance(dt, T.DateType):
        return F.date_add(F.lit("2024-01-01").cast("date"), (_u(row_id, name) % 365).cast("int"))
    if isinstance(dt, T.ArrayType):
        n = int(opts.get("length", "3"))
        return F.array(
            *[_gen_field(row_id, f"{name}[{i}]", dt.elementType, {}, base_epoch) for i in range(n)]
        )
    if isinstance(dt, T.StructType):
        return F.struct(
            *[
                _gen_field(row_id, f"{name}.{f.name}", f.dataType, {}, base_epoch).alias(f.name)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.MapType):
        return F.create_map(
            _gen_field(row_id, f"{name}.k", dt.keyType, {}, base_epoch),
            _gen_field(row_id, f"{name}.v", dt.valueType, {}, base_epoch),
        )
    if isinstance(dt, T.BinaryType):
        return _rand_string(row_id, name, int(opts.get("length", "10"))).cast("binary")
    raise ValueError(f"datagen: unsupported field type {dt.simpleString()} for {name}")


def _field_opts(options: dict[str, str], field: str) -> dict[str, str]:
    prefix = f"fields.{field}."
    return {k[len(prefix):]: v for k, v in options.items() if k.startswith(prefix)}


def build_batch(spark: SparkSession, table) -> DataFrame:
    """Bounded datagen: exactly number-of-rows rows via spark.range.

    A ``sequence`` field with ``start``/``end`` also bounds the source
    (Flink's datagen terminates when any sequence is exhausted), so the row
    count is min(number-of-rows, shortest sequence length)."""
    n = int(table.options.get("number-of-rows", "1000"))
    for c in table.columns:
        opts = _field_opts(table.options, c.name)
        if opts.get("kind") == "sequence" and "end" in opts:
            start = int(opts.get("start", "1"))
            n = min(n, int(opts["end"]) - start + 1)
    base_epoch = int(table.options.get("base-epoch", str(DEFAULT_BASE_EPOCH)))
    parallelism = spark.sparkContext.defaultParallelism
    df = spark.range(0, n, 1, min(parallelism, max(n, 1)))
    cols = []
    for c in table.columns:
        if c.computed_expr is not None:
            continue  # applied later by the catalog layer
        cols.append(
            _gen_field(F.col("id"), c.name, c.data_type, _field_opts(table.options, c.name), base_epoch).alias(
                c.name
            )
        )
    return df.select(*cols)


def build_stream(spark: SparkSession, table) -> DataFrame:
    """Streaming datagen: rate source at rows-per-second + transforms."""
    rps = int(float(table.options.get("rows-per-second", "1")))
    base_epoch = int(table.options.get("base-epoch", str(DEFAULT_BASE_EPOCH)))
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(max(rps, 1)))
        .load()
    )  # columns: timestamp, value
    cols = []
    for c in table.columns:
        if c.computed_expr is not None:
            continue
        if isinstance(c.data_type, (T.TimestampType, T.TimestampNTZType)):
            # streaming event time = real arrival time from the rate source
            col = F.col("timestamp").cast(c.data_type).alias(c.name)
        else:
            col = _gen_field(
                F.col("value"), c.name, c.data_type, _field_opts(table.options, c.name), base_epoch
            ).alias(c.name)
        cols.append(col)
    return raw.select(*cols)
