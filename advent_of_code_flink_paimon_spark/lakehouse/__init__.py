"""Lakehouse table layer — the engine's custom component (SURVEY.md §1.2, §4).

Plays the role Paimon plays for Flink in the reference: a persistent,
file-backed catalog of tables (parquet data files + JSON snapshot log +
versioned schemas + manifests with file stats), supporting:

- append tables and primary-key upsert tables (last-write-wins,
  merge-on-read) — tutorial/guide.md:23-32, 59-81
- bucketed writes ("shuffle by bucket", assets/output1.png)
- MVCC snapshots with atomic-rename commits, EARLIEST/LATEST pointers
  (assets/output2.png), time travel, and idempotent commit identifiers
  for exactly-once streaming sinks
- manifest min/max file stats + scan-time file pruning
  (tutorial/guide.md:200-208)
- $files / $snapshots system tables (tutorial/guide.md:200-234)
- compaction and snapshot expiry (tutorial/guide.md:172-185, 236-272)
- changelog-producer=input with _change_type rows
  (tutorial/guide.md:69-74)

Everything sits ABOVE Catalyst: this layer resolves a table name to a
concrete, pruned parquet file list and hands it to Spark; all query
execution is stock Catalyst/Tungsten (SURVEY.md §4).
"""

from advent_of_code_flink_paimon_spark.lakehouse.catalog import Catalog
from advent_of_code_flink_paimon_spark.lakehouse.table import CommitConflictError, Table

__all__ = ["Catalog", "CommitConflictError", "Table"]
