"""Float-parity perturbation sweep (VERDICT r11 ask #4) — the x95
protocol generalized to the WHOLE oracled surface.

The hazard class: an unordered aggregation over doubles (SUM/AVG whose
combine order follows the shuffle partitioning) feeding a compared
output column is only ≈-deterministic — a different partition count
reorders the adds and can flip the last ulp, which flips the driver's
value hash even though every engine is "correct". The repo's defense
is design discipline (decimal-first sufficient statistics, ROUND at
exact boundaries, order-independent picks); this sweep is the
EVIDENCE: every oracled query whose output schema carries a
float/double column runs at three shuffle-partition settings and must
return BIT-identical rows.

Queries with no float output are skipped (integer/decimal/string
aggregation order cannot flip a hash). The sweep covers the scored
registry AND the library — the same surface the strict oracle harness
gates.
"""

from __future__ import annotations

import os

import pytest

from advent_of_code_flink_paimon_spark.operators import (  # noqa: F401
    corpus_pipeline,
    dedup,
    multimodal,
    relational,
    sampling,
    similarity,
    temporal,
    text,
)
from advent_of_code_flink_paimon_spark.operators.registry import (
    LIBRARY_QUERIES,
    QUERIES,
)

SF = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.001")
# Round 18 (VERDICT r17 ask #2, suite budget): order-dependence is
# detectable from ANY two distinct partition counts — the extremes
# (min parallelism vs session default) maximize the reorder. The
# middle setting adds a third permutation of the same adds for ~130 s
# of suite wall; it stays in the full sweep (SPARK_GRAFT_FULL_TESTS=1).
SETTINGS = (
    ("3", "17", "32")
    if os.environ.get("SPARK_GRAFT_FULL_TESTS", "") == "1"
    else ("3", "32")
)

ALL = {**LIBRARY_QUERIES, **QUERIES}


def _has_float(df) -> bool:
    from pyspark.sql.types import ArrayType, DoubleType, FloatType

    def floaty(t):
        if isinstance(t, (DoubleType, FloatType)):
            return True
        if isinstance(t, ArrayType):
            return floaty(t.elementType)
        return False

    return any(floaty(f.dataType) for f in df.schema.fields)


@pytest.mark.parametrize("name", sorted(ALL))
def test_partition_order_invariance(name, spark):
    fn = ALL[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", SETTINGS[0])
        df = fn(spark, SF)
        if not _has_float(df):
            pytest.skip("no float output column — aggregation order cannot flip the hash")
        results = [sorted(tuple(str(v) for v in r) for r in df.collect())]
        for n in SETTINGS[1:]:
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(
                sorted(tuple(str(v) for v in r) for r in fn(spark, SF).collect())
            )
        assert all(r == results[0] for r in results[1:]), (
            f"{name}: rows differ across shuffle-partition settings "
            f"{SETTINGS} — an unordered float aggregation leaks combine "
            f"order into a compared column"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
