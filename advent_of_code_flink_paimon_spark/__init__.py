"""PySpark-native analytics engine with the capabilities of the
reference streaming-lakehouse workload (polyzos/advent-of-code-flink-paimon).

The reference exercises Flink SQL + Paimon (see SURVEY.md); this package
re-expresses that surface Spark-first:

- ``session``    — tuned SparkSession builder (AQE, shuffle partitions).
- ``operators``  — relational query pack + LLM-data-pipeline operators
                   (dedup, similarity search, text analysis, multimodal).
- ``sources``    — datagen-equivalent bounded/unbounded sources
                   (reference: Readme.md:88-157).
- ``functions``  — scalar/vector helper functions (pure pyspark.sql.functions
                   compositions; JVM-side, codegen-friendly).
- ``lakehouse``  — the custom table layer: catalog, snapshot log, bucketed
                   parquet storage, manifests + file pruning, system tables,
                   compaction, retention (reference: Paimon's role, SURVEY §1.2).
- ``streaming``  — continuous pipelines, append/upsert sinks, lookup join
                   (reference: tutorial/guide.md:36-141).
- ``plans``      — SQL entry point with ``table$files`` system-table rewrite
                   and plan-audit helpers.
"""

from advent_of_code_flink_paimon_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
