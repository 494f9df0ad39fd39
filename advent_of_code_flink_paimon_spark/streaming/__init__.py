"""Continuous pipelines over lakehouse tables (reference:
tutorial/guide.md:36-141)."""

from advent_of_code_flink_paimon_spark.streaming.pipelines import (
    Pipeline,
    stream_table_files,
)
from advent_of_code_flink_paimon_spark.streaming.lookup_join import LookupJoinPipeline

__all__ = ["Pipeline", "LookupJoinPipeline", "stream_table_files"]
