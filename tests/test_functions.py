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


def test_listagg_rewrite_nested_and_two_arg():
    from advent_of_code_flink_paimon_spark.functions import rewrite_flink_functions

    assert (
        rewrite_flink_functions("SELECT LISTAGG(TRIM(name)) FROM t GROUP BY g")
        == "SELECT concat_ws(',', collect_list(TRIM(name))) FROM t GROUP BY g"
    )
    assert (
        rewrite_flink_functions("SELECT LISTAGG(x, ';') FROM t")
        == "SELECT concat_ws(';', collect_list(x)) FROM t"
    )


def test_rewrite_leaves_string_literals_alone():
    from advent_of_code_flink_paimon_spark.functions import rewrite_flink_functions

    sql = "SELECT 'call CHAR_LENGTH(x)' AS note, CHAR_LENGTH(name) AS n FROM t"
    out = rewrite_flink_functions(sql)
    assert "'call CHAR_LENGTH(x)'" in out  # literal preserved byte-for-byte
    assert "length(name)" in out


def test_time_bucket_floors_pre_epoch(spark):
    from advent_of_code_flink_paimon_spark.functions import time_bucket

    df = spark.sql("SELECT TIMESTAMP '1969-12-31 23:59:50' AS ts")
    got = df.select(time_bucket("15 seconds", "ts").alias("b")).collect()[0].b
    assert str(got) == "1969-12-31 23:59:45"


def test_datagen_multiple_sequence_fields(spark):
    from pyspark.sql.types import StructType

    from advent_of_code_flink_paimon_spark.sources.datagen import datagen_source

    schema = StructType.fromDDL("a long, b long")
    df = datagen_source(
        spark, schema,
        {"fields.a.kind": "sequence", "fields.a.start": "1", "fields.a.end": "5",
         "fields.b.kind": "sequence", "fields.b.start": "100", "fields.b.end": "104"},
    )
    rows = sorted((r.a, r.b) for r in df.collect())
    assert rows == [(i, 99 + i) for i in range(1, 6)]
