"""Named continuous pipelines: readStream → transform → lakehouse sink.

The Spark expression of the reference's `INSERT INTO … SELECT` streaming
jobs (tutorial/guide.md:36-40,78-81: `pipeline.name`, 20 s checkpoint →
one snapshot per trigger). ``foreachBatch`` plays the Writer role on
executors; the table layer's snapshot commit is the Global Committer on
the driver (assets/output1.png DAG); ``commit_identifier=batch_id``
makes replayed batches no-ops → exactly-once end to end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import LongType

from advent_of_code_flink_paimon_spark.lakehouse.table import Table


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
    ):
        self.name, self.source, self.target, self.mode = name, source, target, mode
        self.trigger_seconds = trigger_seconds
        self.available_now = available_now
        self.transform = transform
        self.checkpoint_dir = checkpoint_dir or os.path.join(
            target.paths.root, f".checkpoint-{name}"
        )

    def _sink(self, batch_df: DataFrame, batch_id: int) -> None:
        from advent_of_code_flink_paimon_spark.lakehouse.table import CommitConflictError

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
        if self.available_now:
            writer = writer.trigger(availableNow=True)
        elif self.trigger_seconds:
            writer = writer.trigger(processingTime=f"{self.trigger_seconds} seconds")
        return writer.start()


def stream_table_files(spark: SparkSession, table: Table, max_files_per_trigger: int | None = None) -> DataFrame:
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
    reader = spark.readStream.schema(table.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdir = os.path.join(table.paths.root, "stream")
    os.makedirs(sdir, exist_ok=True)
    return reader.parquet(sdir)


def stream_table_upsert(spark: SparkSession, table: Table) -> DataFrame:
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
    reads."""
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
    sdir = os.path.join(table.paths.root, "stream")
    os.makedirs(sdir, exist_ok=True)
    raw = spark.readStream.schema(schema).parquet(sdir)
    cols = [f.name for f in table.schema.fields]
    return raw.select(
        *cols,
        F.when(F.col("__op") == "D", "-D").otherwise("+U").alias("op"),
    )


def stream_table_changelog(
    spark: SparkSession, table: Table, consumer_id: str | None = None
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
    retention. Spark's checkpoint still owns RESUME position; advancing
    the table-side bookmark (``table.register_consumer``) is the
    subscriber's act of releasing consumed snapshots for expiry."""
    if consumer_id is not None:
        # protect everything from the current LATEST onward — the
        # subscriber hasn't consumed anything yet as far as the table
        # knows; it advances the bookmark as its batches commit
        table.register_consumer(
            consumer_id, next_snapshot_id=table.latest_snapshot_id() or 1
        )
    if table.options.get("changelog-producer") not in ("input", "lookup", "full-compaction"):
        raise ValueError(
            f"table {table.name} has no stored changelog (set "
            "'changelog-producer'='input'/'lookup'/'full-compaction' at CREATE TABLE)"
        )
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(list(table.schema.fields) + [StructField("_change_type", StringType())])
    return spark.readStream.schema(schema).parquet(
        os.path.join(table.paths.root, "changelog", "snapshot-*")
    )
