"""Skew-handling join utilities (SURVEY.md charter: salting for skew).

First line of defense at scale is AQE's skew-join splitting
(spark.sql.adaptive.skewJoin.enabled, on in session.py) — it needs no
code. Manual salting below is for the cases AQE can't fix: a skewed
shuffle join where one side must be replicated (AQE splits partitions
of the SAME join, but a single hot KEY still lands in one task when the
other side isn't splittable), or streaming joins where AQE doesn't run.

Semantics: ``salted_join(left, right, on)`` == ``left.join(right, on)``
for inner/left joins, with the hot left keys spread across ``salt``
tasks and the (smaller) right side replicated ``salt``×.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted into ``salt``
    subkeys and the right side exploded ``salt``× so every subkey finds
    its match. Cost: right side grows salt×(its size) — use when right
    is far smaller than the hot key's row count but too big or too
    dynamic to broadcast.

    The salt is derived from a per-row hash of the left's whole row
    (xxhash64 over all columns) — deterministic for a given row, spread
    uniformly across subkeys regardless of key skew."""
    if isinstance(on, str):
        on = [on]
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")

    l_salted = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    r_exploded = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l_salted.join(r_exploded, on + [SALT_COL], how).drop(SALT_COL)
