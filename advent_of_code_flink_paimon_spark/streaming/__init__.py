"""Continuous pipelines over lakehouse tables (reference:
tutorial/guide.md:36-141) plus the event-time window layer."""

from advent_of_code_flink_paimon_spark.streaming.lookup_join import LookupJoinPipeline
from advent_of_code_flink_paimon_spark.streaming.pipelines import (
    Pipeline,
    advance_consumer,
    stream_table_changelog,
    stream_table_files,
    stream_table_upsert,
)
from advent_of_code_flink_paimon_spark.streaming.windows import (
    changelog_normalize,
    stream_stream_join,
    dedup_within_watermark,
    session_agg,
    sliding_agg,
    stateful_ewma,
    tumbling_agg,
)

__all__ = [
    "Pipeline",
    "LookupJoinPipeline",
    "stream_table_files",
    "stream_table_changelog",
    "stream_table_upsert",
    "advance_consumer",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "dedup_within_watermark",
    "stateful_ewma",
    "changelog_normalize",
    "stream_stream_join",
]
