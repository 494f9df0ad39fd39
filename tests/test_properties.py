"""Property-based tests (SURVEY.md §5): the PK table against a dict
model, and commit idempotence under replay — the two invariants that
guard exactly-once upsert semantics.

hypothesis drives the *batch composition* (which keys, which order,
how many batches); Spark executions per example are expensive, so
max_examples stays small while shrinking still works.
"""

from __future__ import annotations

from pathlib import Path

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
    number, tutorial/guide.md:65,206). WITHIN a batch, the LAST input
    row per key wins (Paimon sequence semantics — the dedup orders by a
    captured input ordinal, so a later update or delete beats an
    earlier row regardless of values), so the model keeps the last v
    per key."""
    wh = tmp_path_factory.mktemp("wh-prop")
    cat = Catalog(str(wh))
    t = cat.create_table("t", DDL, {"primary-key": "k"})

    model: dict[int, int] = {}
    for batch in batches:
        t.upsert(spark.createDataFrame(batch, DDL))
        per_key: dict[int, int] = {}
        for k, v in batch:
            per_key[k] = v
        model.update(per_key)

    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == model


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=batch_strategy)
def test_first_row_matches_dict_model(spark, tmp_path_factory, batches):
    """merge-engine=first-row against the mirror-image dict model: the
    FIRST value ever seen per key survives any batch sequence (within a
    batch, the first INPUT row; across batches, the earliest commit)."""
    wh = tmp_path_factory.mktemp("wh-fr")
    cat = Catalog(str(wh))
    t = cat.create_table("t", DDL, {"primary-key": "k", "merge-engine": "first-row"})
    model: dict[int, int] = {}
    for batch in batches:
        # single partition → the in-batch input order is the row order
        t.upsert(spark.createDataFrame(batch, DDL).coalesce(1))
        for k, v in batch:
            model.setdefault(k, v)
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == model


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=batch_strategy)
def test_dynamic_bucket_preserves_upsert_semantics(spark, tmp_path_factory, batches):
    """Routing keys through the dynamic-bucket index instead of a fixed
    hash modulus must be INVISIBLE to merge semantics: after any batch
    sequence, a 'bucket'='-1' table equals the same dict model as a
    fixed-bucket table, and every key's rows sit in the single bucket
    its index entry names."""
    wh = tmp_path_factory.mktemp("wh-dyn")
    cat = Catalog(str(wh))
    t = cat.create_table(
        "t", DDL,
        {"primary-key": "k", "bucket": "-1", "dynamic-bucket.target-row-num": "3"},
    )
    model: dict[int, int] = {}
    for batch in batches:
        t.upsert(spark.createDataFrame(batch, DDL))
        for k, v in batch:
            model[k] = v
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == model
    # one index entry per key, and per-bucket key loads respect the target
    idx = t._read_index(spark).collect()
    assert len({r["__khash"] for r in idx}) == len(idx) == len(model)
    from collections import Counter
    assert all(n <= 3 for n in Counter(r["__bucket"] for r in idx).values())


# rows (key, value, seq): seq values are distinct per key by
# construction (the strategy draws unique (k, seq) pairs) so the
# permutation-invariance claim is exact
seqfield_strategy = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 50)), min_size=1, max_size=12, unique=True
).flatmap(
    lambda ks: st.permutations(
        [(k, seq * 7 + k, seq) for k, seq in ks]  # v derived → deterministic
    ).map(lambda perm: (ks, list(perm)))
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=seqfield_strategy)
def test_sequence_field_is_arrival_order_invariant(spark, tmp_path_factory, data):
    """With 'sequence.field', the merged image is a pure function of
    the row SET — any arrival permutation, any batch split — because
    the declared column, not commit order, is the merge key. The model
    keeps max-seq per key."""
    ks, rows = data
    wh = tmp_path_factory.mktemp("wh-seqf")
    cat = Catalog(str(wh))
    t = cat.create_table(
        "t", "k long, v long, seq long", {"primary-key": "k", "sequence.field": "seq"}
    )
    # split the permuted rows into two commits at an arbitrary point
    cut = len(rows) // 2
    for chunk in (rows[:cut], rows[cut:]):
        if chunk:
            t.upsert(spark.createDataFrame(chunk, "k long, v long, seq long"))
    model: dict[int, tuple[int, int]] = {}
    for k, v, seq in rows:
        if k not in model or seq > model[k][1]:
            model[k] = (v, seq)
    got = {r.k: (r.v, r.seq) for r in t.read(spark).collect()}
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


# op stream: ("append", n_rows) | ("tag",) | ("rollback_to_last_tag",)
op_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(1, 20)),
        st.tuples(st.just("tag")),
        st.tuples(st.just("rollback")),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=op_strategy)
def test_tag_rollback_matches_model(spark, tmp_path_factory, ops):
    """Any interleaving of appends, tagging, and rollback-to-last-tag
    keeps the table equal to a row-count model: append adds rows,
    rollback restores the count captured by the most recent tag (tags
    on the initial empty table roll back to empty only when a snapshot
    exists to tag, so model tracking mirrors create_tag's guard)."""
    wh = tmp_path_factory.mktemp("wh-tagprop")
    cat = Catalog(str(wh))
    t = cat.create_table("t", DDL, {})

    count = 0
    tag_stack: list[tuple[str, int]] = []  # (tag name, count at tag time)
    n_tags = 0
    next_k = 0
    for op in ops:
        if op[0] == "append":
            n = op[1]
            rows = [(next_k + i, i) for i in range(n)]
            next_k += n
            t.append(spark.createDataFrame(rows, DDL))
            count += n
        elif op[0] == "tag":
            if t.latest_snapshot_id() is not None:
                name = f"t{n_tags}"
                n_tags += 1
                t.create_tag(name)
                tag_stack.append((name, count))
        else:  # rollback to the most recent tag
            if tag_stack:
                name, tagged_count = tag_stack[-1]
                t.rollback_to(name)
                count = tagged_count
    assert t.read(spark).count() == count
    # every surviving tag still reads its pinned image; tags beyond a
    # rollback target were dropped by rollback_to (never dangling)
    live = t.tags()
    latest = t.latest_snapshot_id() or 0
    assert all(doc["snapshot_id"] <= latest for doc in live.values())
    for name, tagged_count in tag_stack:
        if name in live:
            assert t.read(spark, snapshot_id=name).count() == tagged_count


# MERGE model: target and source as key->value dicts; fixed clause set
# (delete if s.v % 3 == 0, else column-update, insert if s.v % 2 == 0)
# exercising conditional DELETE, column-level SET, and conditional
# INSERT in one statement. hypothesis drives the key/value composition.
merge_strategy = st.tuples(
    st.dictionaries(st.integers(0, 9), st.integers(0, 99), min_size=1, max_size=8),
    st.dictionaries(st.integers(0, 9), st.integers(0, 99), min_size=1, max_size=8),
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=merge_strategy)
def test_merge_matches_dict_model(spark, tmp_path_factory, data):
    from advent_of_code_flink_paimon_spark.plans import Engine

    target0, source = data
    wh = tmp_path_factory.mktemp("wh-merge")
    eng = Engine(spark, str(wh))
    eng.sql("CREATE TABLE t (k BIGINT, v BIGINT, PRIMARY KEY (k) NOT ENFORCED)")
    if target0:
        eng.catalog.get_table("t").upsert(
            spark.createDataFrame(sorted(target0.items()), DDL)
        )
    spark.createDataFrame(sorted(source.items()), DDL).createOrReplaceTempView("msrc")
    eng.register_source("msrc", spark.table("msrc"))
    eng.sql(
        """
        MERGE INTO t AS a USING msrc AS b ON a.k = b.k
        WHEN MATCHED AND b.v % 3 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = a.v + b.v
        WHEN NOT MATCHED AND b.v % 2 = 0 THEN INSERT *
        """
    )

    model = dict(target0)
    for k, v in source.items():
        if k in target0:
            if v % 3 == 0:
                model.pop(k)
            else:
                model[k] = target0[k] + v
        elif v % 2 == 0:
            model[k] = v
    got = {r.k: r.v for r in eng.catalog.get_table("t").read(spark).collect()}
    assert got == model


# Schema-evolution model: a sequence of (insert | add | rename | drop)
# steps against a list-of-dicts model. Column pool is small so renames
# and drops collide with history on purpose (incl. dropped-then-readded
# names, which must null-fill for pre-drop files).
@st.composite
def evolution_steps(draw):
    steps, live, dropped = [], ["c0"], []
    fresh = 1
    n = draw(st.integers(2, 7))
    for _ in range(n):
        kind = draw(st.sampled_from(["insert", "insert", "add", "rename", "drop"]))
        if kind == "insert":
            steps.append(("insert", draw(st.integers(0, 99))))
        elif kind == "add":
            # reuse a previously-dropped name sometimes (exercising the
            # stale-bytes-must-not-resurrect identity check), else fresh
            if dropped and draw(st.booleans()):
                name = dropped.pop()
            else:
                name = f"c{fresh}"
                fresh += 1
            live.append(name)
            steps.append(("add", name))
        elif kind == "rename" and live:
            old = draw(st.sampled_from(live))
            new = f"c{fresh}"
            fresh += 1
            live[live.index(old)] = new
            steps.append(("rename", old, new))
        elif kind == "drop" and len(live) > 1:
            col = draw(st.sampled_from(live))
            live.remove(col)
            dropped.append(col)
            steps.append(("drop", col))
    return steps


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(steps=evolution_steps())
def test_schema_evolution_matches_model(spark, tmp_path_factory, steps):
    """Any interleaving of inserts and ADD/RENAME/DROP COLUMN reads back
    exactly what a row-dict model predicts — old files keep serving
    data through renames, and missing columns null-fill."""
    cat = Catalog(str(tmp_path_factory.mktemp("wh-evo")))
    t = cat.create_table("e", "k long, c0 long")
    cols = ["c0"]
    rows: list[dict] = []  # model: one dict per inserted row, keyed by live colname
    next_k = 0
    for step in steps:
        if step[0] == "insert":
            row = {"k": next_k, **{c: step[1] + i for i, c in enumerate(cols)}}
            df = spark.createDataFrame(
                [tuple(row[c] for c in ["k", *cols])],
                ", ".join(f"{c} long" for c in ["k", *cols]),
            )
            t.append(df)
            rows.append(dict(row))
            next_k += 1
        elif step[0] == "add":
            cat.add_column("e", f"{step[1]} long")
            cols.append(step[1])
            # model: existing rows have NULL for the new column
        elif step[0] == "rename":
            _, old, new = step
            cat.rename_column("e", old, new)
            cols[cols.index(old)] = new
            for r in rows:
                if old in r:
                    r[new] = r.pop(old)
        elif step[0] == "drop":
            cat.drop_column("e", step[1])
            cols.remove(step[1])
            for r in rows:
                r.pop(step[1], None)
    got = sorted(
        tuple(getattr(r, c) for c in ["k", *cols])
        for r in cat.get_table("e").read(spark).collect()
    )
    want = sorted(tuple(r.get(c) for c in ["k", *cols]) for r in rows)
    assert got == want


# Connected components: random edge lists vs a union-find model.
cc_strategy = st.lists(
    st.tuples(st.integers(0, 19), st.integers(0, 19)), min_size=1, max_size=25
).filter(lambda es: any(a != b for a, b in es))


@pytest.mark.parametrize("algorithm", ["min-label", "pointer-doubling"])
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=cc_strategy)
def test_connected_components_matches_union_find(spark, algorithm, edges):
    from advent_of_code_flink_paimon_spark.operators.dedup import connected_components

    pairs = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(pairs, "i long, j long")
    got = {r.node: r.label for r in connected_components(df, algorithm=algorithm).collect()}

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in pairs for n in e}
    want = {n: find(n) for n in nodes}
    # canonicalize union-find roots to min-of-component
    comp: dict[int, list[int]] = {}
    for n, r in want.items():
        comp.setdefault(r, []).append(n)
    want = {n: min(members) for r, members in comp.items() for n in members}
    assert got == want


def test_connected_components_reliable_checkpoint_mode(spark, tmp_path_factory):
    """checkpoint_dir= switches lineage truncation to reliable
    checkpoint() (the fault-tolerant cluster path — localCheckpoint
    blocks die with their executor); results must be identical on a
    multi-round chain graph."""
    from advent_of_code_flink_paimon_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(12)] + [(100, 101), (101, 102)]
    df = spark.createDataFrame(chain, "i long, j long")
    ckpt = str(tmp_path_factory.mktemp("cc-ckpt"))
    got = {r.node: r.label for r in connected_components(df, checkpoint_dir=ckpt).collect()}
    want = {i: 0 for i in range(13)} | {n: 100 for n in (100, 101, 102)}
    assert got == want


def test_pointer_doubling_cc_is_logarithmic_on_deep_chain(spark):
    """The pointer-doubling mode exists FOR deep graphs: on a
    diameter-64 chain it must converge in O(log d) alternations (the
    min-label path would need ~64 rounds), and still produce the
    union-find answer."""
    import math

    from advent_of_code_flink_paimon_spark.operators.dedup import connected_components

    d = 64
    chain = [(i, i + 1) for i in range(d)]
    df = spark.createDataFrame(chain, "i long, j long")
    got = {r.node: r.label for r in connected_components(df, algorithm="pointer-doubling").collect()}
    assert got == {i: 0 for i in range(d + 1)}
    rounds = connected_components.last_rounds
    # each alternation at least halves every node's distance to the
    # component min (+1 fixed-point detection round, + slack for the
    # two-phase interleave)
    assert rounds <= math.ceil(math.log2(d)) + 3, rounds


def test_pointer_doubling_cc_labels_self_pair_only_nodes(spark):
    """A node whose ONLY pair is a self-pair must still get a label
    (node, node) — the min-label path emits it, and the star path's
    i != j pre-filter used to drop it (round-4 advice, low)."""
    from advent_of_code_flink_paimon_spark.operators.dedup import connected_components

    df = spark.createDataFrame([(5, 5), (1, 2)], "i long, j long")
    got = {
        r.node: r.label
        for r in connected_components(df, algorithm="pointer-doubling").collect()
    }
    assert got == {5: 5, 1: 1, 2: 1}


def test_scoring_order_covers_registry_exactly():
    """__spark_entry__._ORDER must list every registered query exactly
    once — a typo or a new query missing from the list silently lands
    outside the driver's scoring window."""
    import __spark_entry__ as entrymod

    registered = set(entrymod.queries())
    ordered = entrymod._ORDER
    assert len(ordered) == len(set(ordered)), "duplicate names in _ORDER"
    assert set(ordered) == registered, (
        f"missing from _ORDER: {registered - set(ordered)}; "
        f"stale in _ORDER: {set(ordered) - registered}"
    )


def test_scoring_window_overflow_not_stale():
    """Driver-evidence freshness guard (round-3 verdict ask #7).

    The driver scores only the first 50 ``_ORDER`` entries each round,
    so anything past position 50 keeps its old CORRECTNESS row as its
    evidence. That is acceptable for exactly one round: every overflow
    entry must be fully green (rows+schema+hash) in one of the TWO most
    recent CORRECTNESS_r*.json files. Two, not one, because the newest
    file is the one the driver writes for the *rotated* window — by
    design it excludes this round's overflow, whose freshest possible
    evidence is the previous round's file (round-4 verdict, What's
    wrong #1: checking only the latest file makes the guard fail by
    construction the moment the driver lands the new round's scores).
    """
    import glob
    import json
    import re

    import __spark_entry__ as entrymod

    files = sorted(
        glob.glob(str(Path(__file__).resolve().parent.parent / "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", Path(p).name).group(1)),
    )
    if not files:  # first round: no driver evidence exists yet
        return

    def green(row):
        return bool(
            row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
        )

    recent = [json.loads(Path(p).read_text()) for p in files[-2:]]
    overflow = entrymod._ORDER[50:]
    stale = [
        k for k in overflow
        if not any(k in scores and green(scores[k]) for scores in recent)
    ]
    assert not stale, (
        "_ORDER overflow entries lack a green row in the two most recent "
        f"CORRECTNESS files ({[Path(p).name for p in files[-2:]]}) — driver "
        f"evidence would be >1 round old: {stale}"
    )


# rows (key, value-or-None, seq-or-None): the fold model is sequential,
# so the strategy just draws arbitrary rows and a batch cut point
seqgroup_row = st.tuples(
    st.integers(0, 3),
    st.one_of(st.none(), st.integers(0, 9)),
    st.one_of(st.none(), st.integers(0, 9)),
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(seqgroup_row, min_size=1, max_size=12),
    cut=st.integers(0, 12),
)
def test_sequence_group_matches_sequential_fold_model(spark, tmp_path_factory, rows, cut):
    """partial-update + fields.g.sequence-group against the sequential
    Python fold Paimon's merge function performs: in write order, a row
    applies its group (value update under the non-null rule, sequence
    advance) iff its g is non-NULL and >= the current group sequence —
    and the result must not depend on where the batch boundary falls."""
    wh = tmp_path_factory.mktemp("wh-sg")
    cat = Catalog(str(wh))
    t = cat.create_table(
        "t", "k long, v long, g long",
        {"primary-key": "k", "merge-engine": "partial-update",
         "fields.g.sequence-group": "v"},
    )
    cut = min(cut, len(rows))
    for chunk in (rows[:cut], rows[cut:]):
        if chunk:
            # single partition → in-batch input order == row order
            t.upsert(spark.createDataFrame(chunk, "k long, v long, g long").coalesce(1))
    model: dict[int, tuple[int | None, int | None]] = {}
    for k, v, g in rows:
        cur_v, cur_g = model.get(k, (None, None))
        if g is not None and (cur_g is None or g >= cur_g):
            cur_v = v if v is not None else cur_v
            cur_g = g
        model[k] = (cur_v, cur_g)
    got = {r.k: (r.v, r.g) for r in t.read(spark).collect()}
    assert got == model


# (key, value, seq) rows; seq drawn small so cross-commit losing rows,
# ties, and re-wins all occur
replay_row = st.tuples(st.integers(0, 3), st.integers(0, 9), st.integers(0, 5))


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(st.lists(replay_row, min_size=1, max_size=5), min_size=1, max_size=4),
    row_dedup=st.booleans(),
    use_seq=st.booleans(),
)
def test_changelog_replay_reproduces_merged_image(
    spark, tmp_path_factory, batches, row_dedup, use_seq
):
    """THE changelog invariant: folding the stored +I/-U/+U/-D events
    commit-by-commit through a keyed state machine reproduces exactly
    the merged table image — under any batch sequence, with and without
    row-deduplicate suppression, with and without sequence.field
    (whose losing late rows must emit nothing; the round-6 fix)."""
    wh = tmp_path_factory.mktemp("wh-replay")
    cat = Catalog(str(wh))
    opts = {"primary-key": "k", "changelog-producer": "lookup"}
    if row_dedup:
        opts["changelog-producer.row-deduplicate"] = "true"
    if use_seq:
        opts["sequence.field"] = "seq"
    t = cat.create_table("t", "k long, v long, seq long", opts)
    for batch in batches:
        t.upsert(spark.createDataFrame(batch, "k long, v long, seq long").coalesce(1))

    state: dict[int, tuple] = {}
    latest = t.latest_snapshot_id()
    for sid in range(1, latest + 1):
        events = t.read_changelog(spark, from_seq=sid - 1, to_seq=sid).collect()
        # within a commit a key has at most one post-image event; apply
        # -D deletes and +I/+U post-images, ignore -U pre-images
        for r in events:
            if r._change_type == "-D":
                state.pop(r.k, None)
            elif r._change_type in ("+I", "+U"):
                state[r.k] = (r.v, r.seq)
    merged = {r.k: (r.v, r.seq) for r in t.read(spark).collect()}
    assert state == merged


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize("table", ["embeddings", "documents", "orders"])
def test_footer_row_count_matches_scan(sf_dir, table):
    """footer_row_count (the plan-time metadata COUNT(*) that sizes the
    x90/x111 LSH band width — VERDICT r14 asks #7/#8) must equal the
    scan-derived count exactly, so the metadata fast path can never
    change a band width (and therefore never change banding output)."""
    import duckdb

    from advent_of_code_flink_paimon_spark.operators.registry import footer_row_count
    from advent_of_code_flink_paimon_spark.operators.similarity import _x90_band_bits

    scanned = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/{table}.parquet')"
    ).fetchone()[0]
    meta = footer_row_count(sf_dir, table)
    assert meta == scanned
    assert _x90_band_bits(meta) == _x90_band_bits(scanned)


def test_footer_row_count_missing_table_raises():
    """A typo'd table name must fail loudly (VERDICT r15 advice #3) —
    never size a band width from 0 rows."""
    import pytest as _pytest

    from advent_of_code_flink_paimon_spark.operators.registry import footer_row_count

    with _pytest.raises(FileNotFoundError):
        footer_row_count("/root/testdata/sf0.001", "no_such_table")


def test_lakehouse_band_width_metadata_path(spark, tmp_path):
    """VERDICT r15 ask #8: when the LSH corpus is a lakehouse table,
    band-width sizing reads the manifest's record_count
    (Table.metadata_count — zero I/O) instead of scanning; the width
    must equal the scan-derived width EXACTLY, and a PK corpus (where
    merge-on-read makes manifest sums inexact) must refuse the fast
    path so the fallback scan keeps the width honest."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.registry import T
    from advent_of_code_flink_paimon_spark.operators.similarity import _x90_band_bits

    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table("vecs_meta", "vec_id long, embedding array<float>", {})
    src = T(spark, "/root/testdata/sf0.001", "embeddings").select("vec_id", "embedding")
    t.append(src.filter("vec_id % 2 = 0"))
    t.append(src.filter("vec_id % 2 = 1"))  # two snapshots: sums manifests
    meta_n = t.metadata_count()
    scan_n = t.read(spark).count()
    assert meta_n == scan_n
    assert _x90_band_bits(meta_n) == _x90_band_bits(scan_n)
    # PK table: exact-or-refuse — the sizing fallback scans instead
    pk = cat.create_table(
        "vecs_pk", "vec_id long, embedding array<float>", {"primary-key": "vec_id"}
    )
    pk.upsert(src)
    assert pk.metadata_count() is None


def test_promotion_queue_consistent_with_library():
    """VERDICT r16 stretch #6: the round-N+1 promotion queue documented
    in ``_ORDER``'s overflow comment was previously enforced only by
    discipline + judge audit. Parse the queue card tokens (xNNN) out of
    the overflow comment block and assert each one (a) resolves to
    exactly one LIBRARY query (awaiting promotion — not already in the
    scored registry, not unknown), so a promotion, rename, or deletion
    that forgets to update the documented queue fails CI instead of
    drifting."""
    import re

    import __spark_entry__ as entrymod
    from advent_of_code_flink_paimon_spark.operators.registry import (
        LIBRARY_QUERIES,
        QUERIES,
    )

    entrymod.queries()  # force operator-module imports that fill both dicts
    src = Path(entrymod.__file__).read_text()
    m = re.search(
        r"overflow past the 50-entry cap.*?rotation plan(?P<q>.*?)established pattern",
        src,
        re.S,
    )
    assert m, "_ORDER overflow comment lost its documented rotation-plan block"
    tokens = sorted(set(re.findall(r"\bx\d{2,3}\b", m.group("q"))))
    assert tokens, "rotation-plan block names no queue cards"
    for tok in tokens:
        in_lib = [n for n in LIBRARY_QUERIES if n.startswith(tok + "_")]
        in_reg = [n for n in QUERIES if n.startswith(tok + "_")]
        assert len(in_lib) == 1 and not in_reg, (
            f"queued card {tok}: library matches {in_lib}, registry "
            f"matches {in_reg} — the documented promotion queue has "
            "drifted from LIBRARY_QUERIES (update the _ORDER overflow "
            "comment when promoting/renaming)"
        )
