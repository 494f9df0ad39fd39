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
