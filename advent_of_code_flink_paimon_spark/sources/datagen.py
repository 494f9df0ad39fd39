"""Datagen sources, Spark-first.

The reference uses Flink's datagen connector two ways (SURVEY.md §2.1):

- unbounded random at a fixed rate (`measurements` source: 1000 rows/s,
  sensor_id ∈ [0,1000], reading DECIMAL(5,1) ∈ [0,45], PROCTIME —
  Readme.md:88-102, tutorial/guide.md:23-32)
- bounded sequence (`sensor_info` source: sensor_id 1..1000 + random
  attributes — Readme.md:132-154)

Spark equivalents: ``rate-micro-batch`` streaming source + column
synthesis for the unbounded case; ``spark.range`` for the bounded case.
Field values are synthesized with seeded 64-bit hashes of the row id —
deterministic for tests, uniform in the declared ranges.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _uniform_long(col, lo: int, hi: int, seed: int):
    """Deterministic uniform integer in [lo, hi] derived from a row id."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(hi - lo + 1)) + lo).cast("long")


def _measurement_columns(df: DataFrame, id_col: str) -> DataFrame:
    """sensor_id ∈ [0,1000] (Readme.md:95-97), reading DECIMAL(5,1) ∈
    [0.0,45.0] (Readme.md:98-100), event_time = processing time
    (tutorial/guide.md:26)."""
    return df.select(
        _uniform_long(F.col(id_col), 0, 1000, seed=1).alias("sensor_id"),
        (_uniform_long(F.col(id_col), 0, 450, seed=2) / 10.0).cast("decimal(5,1)").alias("reading"),
        F.current_timestamp().alias("event_time"),
    )


def measurements_stream(
    spark: SparkSession, rows_per_second: int = 1000, trigger_seconds: int = 20
) -> DataFrame:
    """Unbounded measurements stream at the reference rate (1000 rows/s,
    Readme.md:94). rate-micro-batch emits a deterministic number of rows
    per micro-batch = rate × trigger, matching the ~10k-row files per
    20 s commit observed in tutorial/guide.md:213-221 at 2 buckets."""
    rows_per_batch = rows_per_second * trigger_seconds
    base = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    return _measurement_columns(base, "value")


def measurements_batch(spark: SparkSession, n_rows: int) -> DataFrame:
    """Bounded batch with the same column synthesis (for tests/bench)."""
    return _measurement_columns(spark.range(n_rows), "id")


def sensor_info_static(spark: SparkSession, n_sensors: int = 1000) -> DataFrame:
    """Bounded sensor dimension: sensor_id sequence 1..N
    (Readme.md:140-142), random attributes in the declared ranges
    (Readme.md:143-152)."""
    r = spark.range(1, n_sensors + 1)
    return r.select(
        F.col("id").alias("sensor_id"),
        (_uniform_long(F.col("id"), 0, 180_000, seed=3) / 1000.0 - 90.0).alias("latitude"),
        (_uniform_long(F.col("id"), 0, 360_000, seed=4) / 1000.0 - 180.0).alias("longitude"),
        _uniform_long(F.col("id"), 0, 3, seed=5).cast("int").alias("generation"),
        F.current_timestamp().alias("updated_at"),
    )


def sensor_info_stream(spark: SparkSession, n_sensors: int = 1000, rows_per_batch: int = 250) -> DataFrame:
    """The same dimension as a bounded *stream* (the reference's
    sensor_info source is a bounded datagen that ends, Readme.md:155-157):
    rate-micro-batch capped by filtering ids beyond N to an empty tail."""
    base = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    bounded = base.filter(F.col("value") < n_sensors).select((F.col("value") + 1).alias("id"))
    return bounded.select(
        F.col("id").alias("sensor_id"),
        (_uniform_long(F.col("id"), 0, 180_000, seed=3) / 1000.0 - 90.0).alias("latitude"),
        (_uniform_long(F.col("id"), 0, 360_000, seed=4) / 1000.0 - 180.0).alias("longitude"),
        _uniform_long(F.col("id"), 0, 3, seed=5).cast("int").alias("generation"),
        F.current_timestamp().alias("updated_at"),
    )


def datagen_source(spark: SparkSession, schema, options: dict) -> DataFrame:
    """Generic Flink-datagen-connector equivalent, driven by the DDL's
    WITH options (Readme.md:88-102,132-154):

      'rows-per-second'          unbounded random stream at that rate
      'number-of-rows'           bounded random batch
      'fields.<f>.kind'          random (default) | sequence
      'fields.<f>.min/max'       numeric range for random fields
      'fields.<f>.start/end'     sequence range (bounded source)
      'fields.<f>.max-past'      timestamp staleness ('0' → now)

    A sequence field makes the whole source bounded (spark.range over
    the sequence — Readme.md:155-157); otherwise 'rows-per-second'
    makes it a rate-micro-batch stream. Every random field is a seeded
    hash of the row id — deterministic, uniform in range."""
    from pyspark.sql.types import (
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        TimestampType,
    )

    def fopt(f, key, default=None):
        return options.get(f"fields.{f}.{key}", default)

    seq_fields = [f.name for f in schema.fields if fopt(f.name, "kind") == "sequence"]
    seq_ranges = {
        f: (int(fopt(f, "start", 1)), int(fopt(f, "end", 1000))) for f in seq_fields
    }
    if seq_fields:
        lengths = {end - start + 1 for start, end in seq_ranges.values()}
        if len(lengths) > 1:
            raise ValueError(
                f"sequence fields must share a length (Flink datagen rows are "
                f"generated in lockstep): {seq_ranges}"
            )
        # the row index drives every sequence field from ITS OWN start —
        # reading only the first field's range silently fed its values
        # to every other sequence column
        start0 = seq_ranges[seq_fields[0]][0]
        base = spark.range(lengths.pop()).select((F.col("id") + start0).alias("id"))
    elif "number-of-rows" in options:
        base = spark.range(int(options["number-of-rows"])).select(F.col("id"))
    else:
        rate = int(options.get("rows-per-second", 1000))
        base = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rate)
            .load()
            .select(F.col("value").alias("id"))
        )

    cols = []
    for i, f in enumerate(schema.fields):
        name, dt = f.name, f.dataType
        if name in seq_fields:
            start, _ = seq_ranges[name]
            offset = start - seq_ranges[seq_fields[0]][0]
            cols.append((F.col("id") + F.lit(offset)).cast(dt.simpleString()).alias(name))
        elif isinstance(dt, TimestampType):
            cols.append(F.current_timestamp().alias(name))  # max-past='0' ≈ now
        elif isinstance(dt, DecimalType):
            scale = 10 ** dt.scale
            lo = int(float(fopt(name, "min", 0)) * scale)
            hi = int(float(fopt(name, "max", 100)) * scale)
            cols.append(
                (_uniform_long(F.col("id"), lo, hi, seed=i + 1) / scale)
                .cast(dt.simpleString())
                .alias(name)
            )
        elif isinstance(dt, (DoubleType, FloatType)):
            lo, hi = float(fopt(name, "min", 0)), float(fopt(name, "max", 100))
            cols.append(
                (_uniform_long(F.col("id"), 0, 1_000_000, seed=i + 1) / 1_000_000.0 * (hi - lo) + lo)
                .cast(dt.simpleString())
                .alias(name)
            )
        elif isinstance(dt, (LongType, IntegerType)):
            lo, hi = int(fopt(name, "min", 0)), int(fopt(name, "max", 1000))
            cols.append(_uniform_long(F.col("id"), lo, hi, seed=i + 1).cast(dt.simpleString()).alias(name))
        elif isinstance(dt, StringType):
            cols.append(F.concat(F.lit(f"{name}-"), F.xxhash64("id", F.lit(i)).cast("string")).alias(name))
        else:
            cols.append(F.lit(None).cast(dt.simpleString()).alias(name))
    return base.select(*cols)
