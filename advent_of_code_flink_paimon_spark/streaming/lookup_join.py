"""Processing-time temporal (lookup) join pipeline.

Reference semantics (tutorial/guide.md:119-141): each measurement joins
the sensor_info row current *at processing time*; on lookup miss, retry
up to max-attempts (`retry-predicate=lookup_miss`, `max-attempts=50`,
tutorial/guide.md:122-129); output order unconstrained
(`allow_unordered`).

Micro-batch Spark equivalent (SURVEY.md §3 EP3): per batch,

1. candidates = new stream rows ∪ retry queue
2. re-read the dimension's LATEST snapshot (merged-on-read) → broadcast
3. left join on the key: matches → append to the enriched table;
   misses with attempts < max → back to the retry queue (attempts+1);
   misses at max attempts → dropped (dead-lettered in the stats)
4. one snapshot commit per trigger on the enriched table

The async/thread-count hints (lookup.async*, tutorial/guide.md:138) are
moot here — the batch join is set-oriented; they are accepted and
ignored, as SURVEY.md §2.3 documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from advent_of_code_flink_paimon_spark.lakehouse.catalog import Catalog
from advent_of_code_flink_paimon_spark.lakehouse.table import Table


class LookupJoinPipeline:
    def __init__(
        self,
        name: str,
        catalog: Catalog,
        source: DataFrame,
        dim_table: Table,
        target_table: Table,
        on: str,
        max_attempts: int = 50,
        trigger_seconds: int | None = None,
        available_now: bool = False,
        checkpoint_dir: str | None = None,
    ):
        self.name, self.catalog = name, catalog
        self.source, self.dim, self.target, self.on = source, dim_table, target_table, on
        self.max_attempts = max_attempts
        self.trigger_seconds, self.available_now = trigger_seconds, available_now
        self.checkpoint_dir = checkpoint_dir or f"{target_table.paths.root}/.checkpoint-{name}"
        self.retry = self._retry_table()

    def _retry_table(self) -> Table:
        """Persistent retry queue: stream schema + attempts counter."""
        name = f"{self.target.name}_retry"
        stream_schema = StructType([f for f in self.source.schema.fields])
        try:
            return self.catalog.get_table(name)
        except KeyError:
            retry_schema = StructType(
                stream_schema.fields + StructType.fromDDL("__attempts int").fields
            )
            return self.catalog.create_table(name, retry_schema)

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from advent_of_code_flink_paimon_spark.operators.registry import micro_batch_confs

        spark = batch_df.sparkSession
        # r17 optimization (guide §2.2/§3.1): the whole body — retry-queue
        # read, broadcast lookup join, two batch-sized commits — is
        # trigger-sized work; run it under the same scoped AQE-off +
        # batch-sized shuffle fan-out the ingest-pipeline sinks use.
        with micro_batch_confs(spark):
            self._process_batch_inner(batch_df, batch_id)

    def _process_batch_inner(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # NO early return on a replayed batch id: exactly-once spans TWO
        # commits (target append + queue overwrite). After a crash
        # between them, the target's own identifier check makes its
        # append a no-op while the queue overwrite still runs — an early
        # return here would leave matched rows in the queue to be
        # re-joined and double-appended under the NEXT batch id.
        # (Residual window: if the dimension changed between the
        # original run and the replay, rows matching only at replay time
        # leave the queue without an append — the inherent limit of
        # non-atomic two-table commits; Paimon closes it with a single
        # transactional commit spanning both tables.)
        stream_cols = [f.name for f in self.source.schema.fields]

        new_rows = batch_df.select(*stream_cols).withColumn("__attempts", F.lit(0))
        pending = self.retry.read(spark)
        candidates = new_rows.unionByName(pending)

        # the temporal aspect: dimension re-read at *this* batch's
        # processing time — merged-on-read LATEST snapshot
        dim = self.dim.read(spark).withColumn("__matched", F.lit(True))
        dim_cols = [c for c in dim.columns if c not in (self.on, "__matched")]

        # TWO consumers (target append + queue overwrite): persist the
        # joined batch so the micro-batch scan ∪ queue read ∪ broadcast
        # join runs once per trigger, not once per commit (r18, guide
        # §5 — the same two-consumer pin upsert() uses for changelogs)
        joined = candidates.join(F.broadcast(dim), on=self.on, how="left").persist()
        try:
            miss = F.col("__matched").isNull()  # explicit marker: dim NULLs ≠ miss

            matched = joined.filter(~miss).select(*stream_cols, *dim_cols)
            self.target.append(matched, commit_identifier=batch_id)

            retry_next = (
                joined.filter(miss)
                .filter(F.col("__attempts") + 1 < F.lit(self.max_attempts))
                .select(*stream_cols, (F.col("__attempts") + 1).alias("__attempts"))
            )
            # OVERWRITE commit: the queue is replaced wholesale each batch
            self.retry.overwrite(retry_next, commit_identifier=batch_id)
        finally:
            joined.unpersist()

    def start(self) -> StreamingQuery:
        writer = (
            self.source.writeStream.queryName(self.name)
            .foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.available_now:
            writer = writer.trigger(availableNow=True)
        elif self.trigger_seconds:
            writer = writer.trigger(processingTime=f"{self.trigger_seconds} seconds")
        return writer.start()

    def run(self) -> StreamingQuery:
        """start() + awaitTermination() under ``stream_confs`` (see
        streaming/pipelines.py): trigger-sized shuffle fan-out for the
        whole run."""
        from advent_of_code_flink_paimon_spark.streaming.pipelines import stream_confs

        with stream_confs(self.source.sparkSession):
            q = self.start()
            q.awaitTermination()
        return q
