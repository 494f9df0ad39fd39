"""Scalar-function bridge tests (functions/scalar.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from advent_of_code_flink_paimon_spark.functions import (
    rewrite_flink_functions,
    time_bucket,
)
from advent_of_code_flink_paimon_spark.plans import Engine


def test_rewrites():
    assert rewrite_flink_functions("SELECT PROCTIME() FROM t") == "SELECT current_timestamp() FROM t"
    assert rewrite_flink_functions("SELECT CHAR_LENGTH(name) FROM t") == "SELECT length(name) FROM t"
    assert (
        rewrite_flink_functions("SELECT LISTAGG(name) FROM t GROUP BY k")
        == "SELECT concat_ws(',', collect_list(name)) FROM t GROUP BY k"
    )
    # identical spellings untouched
    assert rewrite_flink_functions("SELECT ABS(x), COALESCE(y, 0) FROM t") == "SELECT ABS(x), COALESCE(y, 0) FROM t"


def test_time_bucket_floors(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:07:31.500000",), ("2024-01-01 11:59:59",)], "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = [
        (str(r.b5m), str(r.b1h))
        for r in df.select(
            time_bucket("5 minutes", "ts").alias("b5m"), time_bucket("1 hour", "ts").alias("b1h")
        ).collect()
    ]
    assert got == [
        ("2024-01-01 00:05:00", "2024-01-01 00:00:00"),
        ("2024-01-01 11:55:00", "2024-01-01 11:00:00"),
    ]


def test_flink_dialect_through_engine(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE t (name VARCHAR(20), k BIGINT)")
    eng.sql("INSERT INTO t SELECT CAST(id AS STRING) AS name, id % 2 AS k FROM range(4)")
    rows = eng.sql(
        "SELECT k, CHAR_LENGTH(LISTAGG(name)) AS len FROM t GROUP BY k ORDER BY k"
    ).collect()
    assert [(r.k, r.len) for r in rows] == [(0, 3), (1, 3)]  # e.g. '0,2'
