"""Oracle-differential tests for every registered query (SURVEY.md §5).

Each queries() entry with an oracle is hash-compared against DuckDB on
the deterministic testdata; entries without an oracle get a rows>=0 +
stable-schema smoke check (matching the driver's weaker check).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duck_con

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# demoted-to-library entries keep full oracle gating here even though
# they yielded their driver-registry slot (registry.demote)
from advent_of_code_flink_paimon_spark.operators.registry import (  # noqa: E402
    LIBRARY_ORACLES,
    LIBRARY_QUERIES,
)


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, con):
    df = QUERIES[name](spark, SF_ORACLE)
    if name in ORACLES:
        problems = compare(df, con, ORACLES[name])
        assert not problems, f"{name}: {problems}"
    else:
        rows = df.collect()
        assert rows is not None and len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(LIBRARY_QUERIES))
def test_library_query(name, spark, con):
    df = LIBRARY_QUERIES[name](spark, SF_ORACLE)
    if name in LIBRARY_ORACLES:
        problems = compare(df, con, LIBRARY_ORACLES[name])
        assert not problems, f"{name}: {problems}"
    else:
        rows = df.collect()
        assert rows is not None and len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
