"""Driver contract for the spark-graft builder (PySpark target).

Aggregates the operator registries from
``advent_of_code_flink_paimon_spark.operators.*`` — every implemented
operator from SURVEY.md §2 is a ``queries()`` entry; those with a
DuckDB-expressible semantic also have an ``oracle_sql()`` twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registries():
    # Import here so the driver's import of this module stays cheap and
    # any one operator-module failure is visible at call time.
    import advent_of_code_flink_paimon_spark.operators.relational  # noqa: F401

    import advent_of_code_flink_paimon_spark.operators.corpus_pipeline  # noqa: F401
    import advent_of_code_flink_paimon_spark.operators.dedup  # noqa: F401
    import advent_of_code_flink_paimon_spark.operators.multimodal  # noqa: F401
    import advent_of_code_flink_paimon_spark.operators.sampling  # noqa: F401
    import advent_of_code_flink_paimon_spark.operators.similarity  # noqa: F401
    import advent_of_code_flink_paimon_spark.operators.temporal  # noqa: F401
    import advent_of_code_flink_paimon_spark.operators.text  # noqa: F401
    from advent_of_code_flink_paimon_spark.operators.registry import ORACLES, QUERIES

    return QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The pricing-summary rollup over the big fact table — the grouped-agg
    shape the reference's sensor analytics implies (SURVEY.md §2.4).
    """
    queries, _ = _registries()
    return queries["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = _registries()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    _, o = _registries()
    return dict(o)
