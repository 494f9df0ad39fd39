"""Property-based tests (SURVEY.md §5): the PK table against a dict
model, and commit idempotence under replay — the two invariants that
guard exactly-once upsert semantics.

hypothesis drives the *batch composition* (which keys, which order,
how many batches); Spark executions per example are expensive, so
max_examples stays small while shrinking still works.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from advent_of_code_flink_paimon_spark.lakehouse import Catalog

DDL = "k long, v long"

# batches of (key, value): keys collide across batches on purpose
batch_strategy = st.lists(
    st.lists(st.tuples(st.integers(0, 9), st.integers(0, 1000)), min_size=1, max_size=8),
    min_size=1,
    max_size=4,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=batch_strategy)
def test_upsert_matches_dict_model(spark, tmp_path_factory, batches):
    """After any sequence of upsert batches, the table equals a dict
    folded batch-by-batch. ACROSS batches, later commits win (sequence
    number, tutorial/guide.md:65,206). WITHIN a batch, the engine's
    documented dedup is deterministic max-by-value-columns (DataFrame
    row order is not a stable ordering; callers with a real sequence
    column pre-sort upstream), so the model takes max(v) per key."""
    wh = tmp_path_factory.mktemp("wh-prop")
    cat = Catalog(str(wh))
    t = cat.create_table("t", DDL, {"primary-key": "k"})

    model: dict[int, int] = {}
    for batch in batches:
        t.upsert(spark.createDataFrame(batch, DDL))
        per_key: dict[int, int] = {}
        for k, v in batch:
            per_key[k] = max(per_key.get(k, v), v)
        model.update(per_key)

    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == model


def test_replayed_commit_identifier_is_noop(spark, tmp_path):
    """Micro-batch replay (same commit_identifier) must not double-write —
    the exactly-once contract of the snapshot log (SURVEY.md §7)."""
    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table("t", DDL)
    df = spark.createDataFrame([(1, 1), (2, 2)], DDL)
    assert t.append(df, commit_identifier=7) is not None
    assert t.append(df, commit_identifier=7) is None  # replay dropped
    assert t.read(spark).count() == 2
    assert t.append(df, commit_identifier=8) is not None
    assert t.read(spark).count() == 4
