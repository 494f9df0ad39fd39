"""Co-located joins via Spark-native bucketing (charter: "bucketing for
co-located joins").

The lakehouse layer's buckets (lakehouse/table.py) serve *write*
clustering and snapshot-pruned scans; they cannot feed Spark's planner a
distribution guarantee (that needs catalog bucket metadata). For
repeated fact-fact joins at 100 TB the winning move is to materialize
both facts as Spark bucketed tables on the join key: every subsequent
join compiles to SortMergeJoin over the bucketed scans with ZERO
Exchange on either side — the shuffle is paid once at write time,
amortized over every later join (tests/test_plans.py pins the
exchange-free plan).

Bucket-count discipline at scale: both sides must share the bucket
count (Spark requires it to co-locate) and it should be a multiple of
the cluster's parallelism; ~128 MB per bucket-file is the usual target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str | list[str],
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a Spark bucketed (+ optionally sorted) table.

    Sorting within buckets lets the later SortMergeJoin skip its Sort
    nodes too — the join becomes a pure merge of pre-sorted bucket
    files."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def cojoined(spark: SparkSession, left_table: str, right_table: str, on: list[str] | str, how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables — shuffle-free by
    construction when bucket counts match."""
    on = [on] if isinstance(on, str) else on
    return spark.table(left_table).join(spark.table(right_table), on, how)
