"""Named continuous pipelines: readStream → transform → lakehouse sink.

The Spark expression of the reference's `INSERT INTO … SELECT` streaming
jobs (tutorial/guide.md:36-40,78-81: `pipeline.name`, 20 s checkpoint →
one snapshot per trigger). ``foreachBatch`` plays the Writer role on
executors; the table layer's snapshot commit is the Global Committer on
the driver (assets/output1.png DAG); ``commit_identifier=batch_id``
makes replayed batches no-ops → exactly-once end to end.
"""

from __future__ import annotations

import contextlib
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import LongType

from advent_of_code_flink_paimon_spark.lakehouse.table import Table

# ---------------------------------------------------------------------------
# Round 17 (optimization; guide §2.2): shuffle fan-out for a WHOLE
# micro-batch streaming run. A trigger's topology is bounded and small
# by construction (the trigger carves the stream into batch-sized
# pieces), so the corpus-scale session default (32 locally, 2-3× total
# cores on a cluster) over-fans every stateful exchange AND fixes an
# oversized state-store instance count: stateful operators pin
# `spark.sql.shuffle.partitions` into the checkpoint's offset-log
# metadata at query START, and every later trigger pays one state-store
# task per partition. Sizing: rows-per-trigger / a few hundred k rows
# per task — `SPARK_GRAFT_STREAM_SHUFFLE` (default 8) parameterizes it;
# on a 100 TB deployment with large triggers raise it accordingly.
# Measured locally (sf0.1, quiet, 3-repeat medians): the 14 streaming
# lifecycle cards 44.5 s → 32.8 s (see OPTIMIZATION_r17.md).
#
# The lock guards only the save/restore bookkeeping and is NEVER held
# across the run — a foreachBatch body taking micro_batch_confs on the
# stream execution thread can therefore not deadlock against the
# driver thread sitting in awaitTermination. Nested/concurrent runs
# save once and restore at the outermost exit.
# ---------------------------------------------------------------------------
_STREAM_CONF_LOCK = threading.Lock()
_STREAM_CONF_DEPTH = 0
_STREAM_CONF_PREV: str | None = None


@contextlib.contextmanager
def stream_confs(spark: SparkSession, partitions: int | None = None):
    """Scoped `spark.sql.shuffle.partitions` for one streaming run
    (start → awaitTermination), sized to trigger volume (see above).

    ``partitions`` overrides the env default for pipelines whose
    stateful operator is PYTHON-COMPUTE-BOUND rather than
    overhead-bound (e.g. a per-key applyInPandasWithState fold over
    hundreds of thousands of keys per trigger): there the fold wants
    one partition per core, not the trigger-sized minimum — measured
    on x140 (changelog_normalize over the full x128 DML sequence):
    8 partitions 65.3 s vs defaultParallelism 22 s at sf0.1."""
    global _STREAM_CONF_DEPTH, _STREAM_CONF_PREV
    parts = str(partitions) if partitions else os.environ.get(
        "SPARK_GRAFT_STREAM_SHUFFLE", "8"
    )
    with _STREAM_CONF_LOCK:
        if _STREAM_CONF_DEPTH == 0:
            _STREAM_CONF_PREV = spark.conf.get("spark.sql.shuffle.partitions", "32")
            spark.conf.set("spark.sql.shuffle.partitions", parts)
        _STREAM_CONF_DEPTH += 1
    try:
        yield
    finally:
        with _STREAM_CONF_LOCK:
            _STREAM_CONF_DEPTH -= 1
            if _STREAM_CONF_DEPTH == 0:
                spark.conf.set("spark.sql.shuffle.partitions", _STREAM_CONF_PREV)


class Pipeline:
    """`INSERT INTO <table> SELECT … FROM <source>` as a named streaming
    job (mode='append' | 'upsert' | 'overwrite')."""

    def __init__(
        self,
        name: str,
        source: DataFrame,
        target: Table,
        mode: str = "append",
        trigger_seconds: int | None = 20,
        checkpoint_dir: str | None = None,
        available_now: bool = False,
        transform=None,
        output_mode: str | None = None,
        shuffle_partitions: int | None = None,
    ):
        self.name, self.source, self.target, self.mode = name, source, target, mode
        self.trigger_seconds = trigger_seconds
        self.available_now = available_now
        self.transform = transform
        # stream-run shuffle fan-out override for Python-compute-bound
        # stateful folds (see stream_confs); None = trigger-sized default
        self.shuffle_partitions = shuffle_partitions
        # Spark OUTPUT mode (None = Spark's default, append). An
        # upsert-MATERIALIZED rollup (continuous aggregate into a PK
        # table, Paimon's aggregation-downstream pattern) sets
        # 'update': every trigger re-emits the windows it touched —
        # open windows included — and the PK sink's last-write-wins
        # merge keeps exactly the newest image per key. Append-mode
        # aggregates instead emit a window once, on watermark close
        # (the x135 cutoff semantics).
        self.output_mode = output_mode
        self.checkpoint_dir = checkpoint_dir or os.path.join(
            target.paths.root, f".checkpoint-{name}"
        )

    def _sink(self, batch_df: DataFrame, batch_id: int) -> None:
        from advent_of_code_flink_paimon_spark.lakehouse.table import CommitConflictError
        from advent_of_code_flink_paimon_spark.operators.registry import micro_batch_confs

        if self.transform is not None:
            batch_df = self.transform(batch_df)
        commit = {
            "append": self.target.append,
            "upsert": self.target.upsert,
            "overwrite": self.target.overwrite,
        }[self.mode]
        # Concurrent-writer resilience: plain appends rebase inside
        # _commit; upsert/overwrite losers raise CommitConflictError and
        # are RETRIED here against the new snapshot — safe because the
        # whole micro-batch re-runs under the same commit_identifier, so
        # a half-replayed batch can never double-commit. A real Paimon
        # deployment resolves the same race with commit retries in the
        # committer operator.
        #
        # micro_batch_confs (r17 optimization, guide §2.2): the commit's
        # shuffle/write topology is batch-sized — same scoped AQE-off +
        # trigger-sized fan-out the ingest-pipeline sinks already use
        # (the 32→8 / AQE measurements in operators/registry.py).
        with micro_batch_confs(batch_df.sparkSession):
            for attempt in range(4):
                try:
                    commit(batch_df, commit_identifier=batch_id)
                    return
                except CommitConflictError:
                    if attempt == 3:
                        raise

    def start(self) -> StreamingQuery:
        writer = (
            self.source.writeStream.queryName(self.name)
            .foreachBatch(self._sink)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.output_mode:
            writer = writer.outputMode(self.output_mode)
        if self.available_now:
            writer = writer.trigger(availableNow=True)
        elif self.trigger_seconds:
            writer = writer.trigger(processingTime=f"{self.trigger_seconds} seconds")
        return writer.start()

    def run(self) -> StreamingQuery:
        """start() + awaitTermination() under ``stream_confs`` — the
        synchronous (availableNow) way the lifecycle cards drive a
        pipeline. Returns the terminated query so callers can read its
        progress metrics (e.g. numRowsDroppedByWatermark)."""
        with stream_confs(self.source.sparkSession, self.shuffle_partitions):
            q = self.start()
            q.awaitTermination()
        return q


def resolve_scan_start(
    table: Table,
    scan_mode: str | None = None,
    from_snapshot: int | str | None = None,
    from_timestamp: int | str | None = None,
) -> int | None:
    """Paimon streaming 'scan.mode' start positions (round-6 VERDICT ask
    #3) → the FIRST snapshot id whose changes the subscriber sees, or
    None for 'replay everything' (the from-genesis default, which is
    what the reference's continuous pipelines — always started on empty
    tables, tutorial/guide.md:119-141 — implicitly used):

    - 'latest': only commits made AFTER subscription (Paimon's
      latest: "changes from now on").
    - 'from-snapshot' + scan.snapshot-id=N: commits ≥ N (Paimon
      includes snapshot N's delta; a subscriber holding N's image
      passes N+1).
    - 'from-timestamp' + scan.timestamp-millis=T: commits made AFTER
      wall-clock T (snapshot-granular, same resolution rules as
      incremental_read_between_timestamps — malformed T raises).
    - 'compacted-full': open with the full-compaction BASELINE and
      follow with later changes. Changelog streams require
      'changelog-producer'='full-compaction': that producer stores NO
      per-commit changelog, so the stream opens at the first
      baseline-bearing compaction and the compaction deltas that follow
      reconstruct exactly the latest compacted image — per-commit
      history is never replayed because none is stored. (The batch
      replay path in plans.frontend assembles the literal
      latest-image + post-compaction-changes union instead, which works
      for the 'input' producer too.)
    """
    if scan_mode in (None, "default", "full"):
        return None
    if scan_mode == "latest":
        return (table.latest_snapshot_id() or 0) + 1
    if scan_mode == "from-snapshot":
        if from_snapshot is None:
            raise ValueError("'scan.mode'='from-snapshot' needs 'scan.snapshot-id'")
        return int(table.resolve_ref(from_snapshot))
    if scan_mode == "from-timestamp":
        if from_timestamp is None:
            raise ValueError("'scan.mode'='from-timestamp' needs 'scan.timestamp-millis'")
        ms = table._ts_to_millis(from_timestamp)  # malformed ts raises here
        ids = [s["id"] for s in table.snapshots() if s["timestamp_ms"] <= ms]
        return (max(ids) + 1) if ids else None
    if scan_mode == "compacted-full":
        baselines = [
            s["id"]
            for s in table.snapshots()
            if s.get("commit_kind") == "COMPACT"
            and os.path.isdir(
                table.paths.changelog_dir(s.get("sequence_number", s["id"]))
            )
        ]
        if not baselines:
            return None  # no compaction baseline yet → full history
        return min(baselines)
    raise ValueError(
        f"unknown scan.mode {scan_mode!r} (expected latest / from-snapshot / "
        "from-timestamp / compacted-full)"
    )


def _filter_from_start(df: DataFrame, start: int | None, keep_sid: bool = False) -> DataFrame:
    """Apply a snapshot start position to a file-source stream whose
    file PATHS carry the committing snapshot id (changelog/snapshot-N/
    dirs; stream/snapshot-NNNNNN__* mirror links): one metadata-column
    regexp per file path, no data-side predicate — files below the
    start still get listed once but their rows never leave the scan
    projection. (A manifest-planned source would skip the listing too;
    file-path filtering is the file-source equivalent.)
    ``keep_sid`` surfaces the id as a ``snapshot_id`` column so a
    consumer can advance its bookmark per processed batch."""
    from pyspark.sql import functions as F

    if start is None and not keep_sid:
        return df
    sid = F.regexp_extract(
        F.col("_metadata.file_path"), r"snapshot-0*(\d+)", 1
    ).cast("long")
    df = df.withColumn("__sid", sid)
    if start is not None:
        df = df.filter(F.col("__sid") >= start)
    return df.withColumnRenamed("__sid", "snapshot_id") if keep_sid else df.drop("__sid")


def stream_table_files(
    spark: SparkSession,
    table: Table,
    max_files_per_trigger: int | None = None,
    scan_mode: str | None = None,
    from_snapshot: int | str | None = None,
    from_timestamp: int | str | None = None,
) -> DataFrame:
    """Streaming scan of an append lakehouse table: Spark's file source
    watches the table's ``stream/`` append-log mirror (hard-links made
    at APPEND-commit time) and emits newly committed data files as
    micro-batches — the 'each new snapshot = one micro-batch' semantic
    of SURVEY.md §2.1. Watching bucket dirs directly would re-emit every
    row a COMPACT/OVERWRITE rewrite produces; the mirror receives only
    APPEND files, so rewrites are invisible to subscribers (Paimon's
    streaming reads skip compaction snapshots the same way). Hard links
    keep already-subscribed bytes readable even after expiry unlinks the
    canonical file. (PK tables stream via stream_table_changelog.)
    """
    if scan_mode == "compacted-full":
        raise ValueError(
            "scan.mode='compacted-full' needs a merged baseline image — append "
            "streams have none; use a changelog table with "
            "'changelog-producer'='full-compaction'"
        )
    start = resolve_scan_start(table, scan_mode, from_snapshot, from_timestamp)
    reader = spark.readStream.schema(table.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdir = os.path.join(table.paths.root, "stream")
    os.makedirs(sdir, exist_ok=True)
    return _filter_from_start(reader.parquet(sdir), start)


def stream_table_upsert(
    spark: SparkSession,
    table: Table,
    scan_mode: str | None = None,
    from_snapshot: int | str | None = None,
    from_timestamp: int | str | None = None,
    include_seq: bool = False,
) -> DataFrame:
    """Streaming read of a PK table WITHOUT a stored changelog
    (Paimon's changelog-producer=none): each upsert commit's POST-IMAGE
    rows arrive as a micro-batch with ``op`` ∈ {'+U', '-D'} — no
    pre-images, so a downstream consumer keeps its own keyed state to
    normalize (exactly the reference's 'changelog normalize' operator
    the stored-changelog fast path skips, tutorial/guide.md:69-74).
    SURVEY.md §7 watch-list closure: snapshot-diff fallback for upsert
    tables, as a live stream.

    Scale shape: upsert commits already hard-link their staged files
    into the ``stream/`` append-log mirror (COMPACT rewrites are never
    linked), so this is the same O(new files per trigger) file-source
    scan as stream_table_files — no snapshot diffing, no O(table)
    reads.

    'sequence.field' caveat: the stream carries every WRITTEN row,
    including late arrivals that lose to the stored image at
    merge-on-read — that is the changelog-less contract (what was
    written, not what won). A consumer normalizing this stream must
    compare the sequence column in its own keyed state
    (changelog_normalize's arrival-order fold is only correct for
    tables merging by commit order); for merge-correct events, use a
    changelog producer, whose stored rows suppress losing writes."""
    if not table.primary_key:
        raise ValueError(f"table {table.name} has no primary key — use stream_table_files")
    if table.merge_engine != "deduplicate":
        # Under partial-update/aggregation the staged rows are
        # batch-local PARTIAL images (e.g. per-batch sums), not
        # post-images; surfacing them as '+U' would feed a downstream
        # keyed-state normalizer wrong values. Mirrors delete_where's
        # merge-engine guard.
        raise ValueError(
            f"table {table.name} uses merge-engine={table.merge_engine!r}: staged "
            "rows are per-batch partial images, not post-images — "
            "stream_table_upsert would mislabel them '+U'. Read the merged "
            "snapshot, or use changelog-producer=full-compaction with "
            "stream_table_changelog."
        )
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    # staged PK files carry the merge metadata columns; read them and
    # map __op onto the public op column
    schema = StructType(
        list(table.schema.fields)
        + [StructField("__op", StringType()), StructField("__seq", LongType())]
    )
    if scan_mode == "compacted-full":
        raise ValueError(
            "scan.mode='compacted-full' needs a stored baseline image — use "
            "'changelog-producer'='full-compaction' with stream_table_changelog"
        )
    start = resolve_scan_start(table, scan_mode, from_snapshot, from_timestamp)
    sdir = os.path.join(table.paths.root, "stream")
    os.makedirs(sdir, exist_ok=True)
    raw = _filter_from_start(spark.readStream.schema(schema).parquet(sdir), start)
    cols = [f.name for f in table.schema.fields]
    out = [
        *cols,
        F.when(F.col("__op") == "D", "-D").otherwise("+U").alias("op"),
    ]
    if include_seq:
        # commit order for downstream normalizers (changelog_normalize
        # sorts each micro-batch group by it so two commits landing in
        # one trigger fold in the right order)
        out.append(F.col("__seq").alias("seq"))
    return raw.select(*out)


def stream_table_changelog(
    spark: SparkSession,
    table: Table,
    consumer_id: str | None = None,
    scan_mode: str | None = None,
    from_snapshot: int | str | None = None,
    from_timestamp: int | str | None = None,
    include_snapshot_id: bool = False,
) -> DataFrame:
    """Streaming changelog read of a PK table with
    ``changelog-producer=input`` (tutorial/guide.md:69-74): every upsert
    commit's +I/-U/+U/-D rows arrive as a micro-batch, so downstream
    queries consume retractions directly instead of diffing snapshots —
    the reference's 'skip changelog-normalize' fast path as a live
    stream. Schema = table schema + ``_change_type`` string.

    ``consumer_id`` registers the subscriber table-side (Paimon
    consumer-id): from this point on, expire_snapshots keeps the
    reader's unconsumed window alive even under the reference's 20 s
    retention, and a KNOWN consumer reattaching RESUMES from its
    recorded bookmark (Paimon semantics — scan.mode applies only on
    first attach; an explicit earlier start re-reads and widens the
    pin). Advancing the bookmark (``advance_consumer`` /
    ``table.register_consumer``) is the subscriber's act of releasing
    consumed snapshots for expiry; an existing Spark checkpoint
    additionally skips files it already processed.

    ``scan_mode`` (Paimon 'scan.mode', round-6 ask #3) picks the start
    position for a subscriber attaching to an EXISTING table: 'latest'
    (post-subscription commits only), 'from-snapshot' /
    'from-timestamp' (resume at a known position), 'compacted-full'
    (open with the last full-compaction's stored baseline image, which
    for 'changelog-producer'='full-compaction' is that compaction's
    changelog, then its followers). Default replays the whole stored
    changelog, the old behavior."""
    if table.options.get("changelog-producer") not in ("input", "lookup", "full-compaction"):
        raise ValueError(
            f"table {table.name} has no stored changelog (set "
            "'changelog-producer'='input'/'lookup'/'full-compaction' at CREATE TABLE)"
        )
    if (
        scan_mode == "compacted-full"
        and table.options.get("changelog-producer") != "full-compaction"
    ):
        raise ValueError(
            "scan.mode='compacted-full' needs the stored baseline a "
            "'changelog-producer'='full-compaction' table writes at each full "
            "compaction"
        )
    start = resolve_scan_start(table, scan_mode, from_snapshot, from_timestamp)
    if consumer_id is not None:
        existing = table.consumers().get(consumer_id, {}).get("next_snapshot_id")
        if existing is None:
            # first attach: protect everything from the start position
            # onward — the subscriber hasn't consumed anything yet as
            # far as the table knows; it advances the bookmark as its
            # batches commit
            if start is None:
                # genesis replay: NOTHING is consumed yet, so the
                # bookmark must sit at the earliest stored snapshot —
                # registering at latest would leave the whole unread
                # history (and its changelog dirs) expirable mid-replay
                snaps = table.snapshots()
                nxt = snaps[0]["id"] if snaps else 1
            else:
                nxt = max(1, min(start, (table.latest_snapshot_id() or 0) + 1))
            table.register_consumer(consumer_id, next_snapshot_id=nxt)
        elif start is not None and start < existing:
            # explicit restart BEFORE the recorded bookmark: widen the
            # pinned window backward to cover the re-read
            table.register_consumer(consumer_id, next_snapshot_id=start)
        else:
            # KEEP the recorded bookmark (round-6 ADVICE #1) AND resume
            # the read position from it (round-7 ADVICE #5): Paimon's
            # consumer-id resumes a known consumer from its stored
            # progress, ignoring scan.mode — so a reattach with a fresh
            # checkpoint must not re-read consumed snapshots (duplicate
            # processing) nor move the pin forward (scan_mode='latest'
            # would release the subscriber's unread snapshots for
            # expiry). Only an explicit EARLIER start (the branch above)
            # overrides the bookmark. An existing Spark checkpoint
            # still skips files it already processed on top of this.
            start = existing
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(list(table.schema.fields) + [StructField("_change_type", StringType())])
    raw = spark.readStream.schema(schema).parquet(
        os.path.join(table.paths.root, "changelog", "snapshot-*")
    )
    return _filter_from_start(raw, start, keep_sid=include_snapshot_id)


def advance_consumer(table: Table, consumer_id: str, batch_df: DataFrame) -> int | None:
    """The subscriber's half of the consumer protocol: after a
    micro-batch is durably processed, advance the table-side bookmark
    past the highest snapshot the batch carried (requires the stream
    built with ``include_snapshot_id=True``), releasing the consumed
    window for expiry while everything unread stays pinned. Bounded
    driver traffic: one MAX scalar per batch. Returns the new
    next-snapshot id, or None for an empty batch."""
    from pyspark.sql import functions as F

    row = batch_df.agg(F.max("snapshot_id").alias("m")).collect()[0]
    if row.m is None:
        return None
    nxt = int(row.m) + 1
    cur = table.consumers().get(consumer_id, {}).get("next_snapshot_id", 0)
    if nxt > cur:
        table.register_consumer(consumer_id, next_snapshot_id=nxt)
        return nxt
    return cur
