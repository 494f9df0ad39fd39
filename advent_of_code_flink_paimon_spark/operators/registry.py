"""Tiny registry used by every operator module.

A query is registered with an optional DuckDB oracle SQL string. The
driver (``__spark_entry__.py``) aggregates all registries; queries
without an oracle get a rows-only check (documented per SURVEY.md §2
as non-SQL-expressible).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def fan_out(df: DataFrame) -> DataFrame:
    """Raise parallelism before compute-heavy row-local stages (wide
    projections, Pandas UDFs) when the scan has fewer partitions than
    cores: the local harness reads single-row-group parquet files, so
    every scan is one task and everything fused into it runs on 1 of 32
    cores. At cluster scale scans have file/row-group parallelism and
    this is a no-op; when it does fire it shuffles only the slim input,
    never derived data. Measured 2x on MinHash signatures at sf0.1."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (TESTDATA.md layout).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    default; read it as a long and truncate ns → µs with exact integer
    division (matches DuckDB's µs-precision read of the same file).
    """
    import pyspark.sql.functions as F

    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(path)
