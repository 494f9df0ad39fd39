"""Datagen-equivalent sources (reference: Readme.md:88-157)."""

from advent_of_code_flink_paimon_spark.sources.datagen import (
    datagen_source,
    measurements_batch,
    measurements_stream,
    sensor_info_static,
    sensor_info_stream,
)

__all__ = [
    "datagen_source",
    "measurements_batch",
    "measurements_stream",
    "sensor_info_static",
    "sensor_info_stream",
]
