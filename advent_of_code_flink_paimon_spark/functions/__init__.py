"""Scalar-function surface (SURVEY.md §2.8).

The reference's queries call exactly one scalar function — PROCTIME()
(tutorial/guide.md:26) — and `SHOW FUNCTIONS` (Readme.md:78) implies the
full Flink built-in library. Spark's built-in library is the parity
answer; this package adds only the dialect bridge (Flink spellings →
Spark built-ins, applied as *text rewrites* so everything stays
JVM-side — no UDF wrappers) plus column helpers for the engine's own
fixtures.
"""

from advent_of_code_flink_paimon_spark.functions.scalar import (
    FLINK_FN_REWRITES,
    proctime,
    rewrite_flink_functions,
    time_bucket,
)

__all__ = ["FLINK_FN_REWRITES", "proctime", "rewrite_flink_functions", "time_bucket"]
