"""Catalog: persistent, file-backed table registry.

The Spark-side equivalent of `CREATE CATALOG ... type=paimon,
warehouse=...` + `USE CATALOG` (tutorial/guide.md:11-17): a warehouse
directory holding databases holding tables; each table carries a
versioned schema + options log (schema-0, schema-1, ... —
assets/output5.png) where ALTER TABLE SET writes a new version
(tutorial/guide.md:180-185).
"""

from __future__ import annotations

import glob
import os
import re
import shutil

from pyspark.sql import SparkSession
from pyspark.sql.types import StructField, StructType

from advent_of_code_flink_paimon_spark.lakehouse.meta import (
    exclusive_write_json,
    TablePaths,
    atomic_write_json,
    now_millis,
    read_json,
)
from advent_of_code_flink_paimon_spark.lakehouse.table import Table


class Catalog:
    def __init__(self, warehouse: str, db: str = "default"):
        self.warehouse, self.db = warehouse, db
        os.makedirs(os.path.join(warehouse, f"{db}.db"), exist_ok=True)

    # -- DDL ------------------------------------------------------------
    def create_table(
        self, name: str, schema: StructType | str, options: dict | None = None
    ) -> Table:
        """CREATE TABLE ... WITH (options). Recognized options mirror the
        reference DDL (tutorial/guide.md:23-32,59-75): 'bucket',
        'bucket-key', 'primary-key' (list or csv), 'file.format',
        'changelog-producer', 'full-compaction.delta-commits',
        'snapshot.num-retained.min/max'."""
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        opts = dict(options or {})
        if isinstance(opts.get("primary-key"), str):
            opts["primary-key"] = [c.strip() for c in opts["primary-key"].split(",")]
        self._validate_options(opts, field_names={f.name for f in schema.fields})
        paths = TablePaths(self.warehouse, self.db, name)
        # create-if-absent on schema-0 is the existence arbiter: two
        # racing CREATEs get exactly one winner (same primitive as the
        # snapshot commit), never an interleaved half-created table
        if not exclusive_write_json(
            paths.schema_path(0),
            {"version": 0, "schema": schema.jsonValue(), "options": opts, "created_ms": now_millis()},
        ):
            raise ValueError(f"table {name} already exists")
        return Table(self.warehouse, self.db, name)

    @staticmethod
    def _validate_options(opts: dict, field_names: set[str] | None = None) -> None:
        """Option-set invariants shared by CREATE TABLE and ALTER TABLE
        SET — ALTER merges into the existing options, so the merged set
        must satisfy the same rules or an illegal combination (e.g.
        merge-engine=aggregation + changelog-producer=input) could be
        introduced post-create."""
        fmt = opts.get("file.format", "parquet")
        if fmt not in ("parquet", "orc"):
            # silently ignoring an unsupported format would write
            # parquet under a false label — refuse instead (Paimon 0.5
            # supports orc/parquet/avro; avro has no Spark-native
            # schema-pinned reader here)
            raise ValueError(f"unsupported file.format {fmt!r} (parquet or orc)")
        if int(opts.get("bucket", "1")) == -1:
            # Paimon dynamic bucket mode: keys are routed by a persisted
            # key→bucket index, so it needs a PK to index on, and an
            # explicit bucket-key is meaningless (routing is not a hash)
            if not opts.get("primary-key"):
                raise ValueError("dynamic bucket mode ('bucket'='-1') requires a primary key")
            if opts.get("bucket-key"):
                raise ValueError(
                    "dynamic bucket mode ('bucket'='-1') routes by the key index; "
                    "'bucket-key' cannot be set"
                )
        if str(opts.get("deletion-vectors.enabled", "false")).lower() == "true":
            # DV scope: append-only DELETE merge-on-read. PK tables
            # already have O(matching rows) deletes (retraction
            # upserts); layering positional vectors over key-merged
            # reads would double-account positions across compactions
            if opts.get("primary-key"):
                raise ValueError(
                    "deletion-vectors.enabled applies to append-only tables "
                    "(primary-key tables delete via retraction upserts)"
                )
            # DV position capture reads Spark's _metadata.row_index,
            # which the ORC file source does not expose (parquet-only
            # metadata field) — without this guard the first DV-mode
            # DELETE/UPDATE fails deep in the scan with an
            # AnalysisException instead of at CREATE TABLE (ADVICE r13
            # #5).
            if fmt == "orc":
                raise ValueError(
                    "deletion-vectors.enabled requires 'file.format'='parquet' "
                    "(_metadata.row_index is not exposed by the ORC source)"
                )
        engine = opts.get("merge-engine", "deduplicate")
        if engine not in ("deduplicate", "partial-update", "aggregation", "first-row"):
            raise ValueError(f"unknown merge-engine {engine!r}")
        if engine != "deduplicate":
            if not opts.get("primary-key"):
                raise ValueError(f"merge-engine '{engine}' requires a primary key")
            if engine != "first-row" and opts.get("changelog-producer") in ("input", "lookup"):
                # per-commit pre-image derivation assumes last-write-wins
                # rows; these engines combine columns across commits —
                # Paimon 0.5 has the same restriction (use
                # 'full-compaction', which diffs merged images).
                # first-row is EXEMPT: its changelog is insert-only
                # (first write per key → +I, later writes → nothing),
                # which the per-commit derivation expresses exactly —
                # Paimon in fact REQUIRES lookup for first-row streams
                raise ValueError(
                    f"merge-engine '{engine}' cannot produce a per-commit "
                    "changelog; use changelog-producer='full-compaction'"
                )
        sf = opts.get("sequence.field")
        if sf:
            if not opts.get("primary-key"):
                raise ValueError("sequence.field requires a primary key")
            if engine != "deduplicate":
                # the per-column combine engines fold in write order;
                # reordering them by a data column is undefined (Paimon
                # 0.5 scopes sequence.field to deduplicate as well)
                raise ValueError(
                    "sequence.field is only supported with merge-engine=deduplicate"
                )
            if sf in (opts.get("primary-key") or []):
                raise ValueError("sequence.field cannot be a primary-key column")
            if field_names is not None and sf not in field_names:
                raise ValueError(f"sequence.field {sf!r} is not a table column")
        # Paimon partial-update sequence groups:
        # 'fields.<seq-col>.sequence-group'='colA,colB' — colA/colB only
        # accept an update whose <seq-col> value is >= every previously
        # seen one (per key); <seq-col> itself advances with its group.
        groups: dict[str, str] = {}
        pk_cols = set(opts.get("primary-key") or [])
        for k, v in opts.items():
            m = re.fullmatch(r"fields\.(.+)\.sequence-group", k)
            if not m:
                continue
            if opts.get("merge-engine") != "partial-update":
                raise ValueError(
                    "fields.*.sequence-group requires merge-engine='partial-update'"
                )
            seq_col = m.group(1)
            members = [c.strip() for c in str(v).split(",") if c.strip()]
            if not members:
                raise ValueError(f"{k} lists no columns")
            for c in members + [seq_col]:
                if field_names is not None and c not in field_names:
                    raise ValueError(f"sequence-group column {c!r} is not a table column")
                if c in pk_cols:
                    raise ValueError(
                        f"sequence-group column {c!r} cannot be a primary-key column"
                    )
            for c in members:
                if c in groups and groups[c] != seq_col:
                    raise ValueError(
                        f"column {c!r} appears in two sequence groups "
                        f"({groups[c]!r} and {seq_col!r})"
                    )
                if c != seq_col and f"fields.{c}.sequence-group" in opts:
                    raise ValueError(
                        f"column {c!r} is both a sequence column and a group member"
                    )
                groups[c] = seq_col
        if (
            str(opts.get("partial-update.ignore-delete", "false")).lower() == "true"
            and opts.get("merge-engine") != "partial-update"
        ):
            raise ValueError(
                "partial-update.ignore-delete requires merge-engine='partial-update'"
            )
        producer = opts.get("changelog-producer")
        if str(opts.get("changelog-producer.row-deduplicate", "false")).lower() == "true":
            # Paimon scopes row-deduplicate to the producers that derive
            # the changelog from a pre-image ('input' trusts the source
            # stream verbatim, so there is nothing to compare against)
            if producer not in ("lookup", "full-compaction"):
                raise ValueError(
                    "changelog-producer.row-deduplicate requires "
                    "changelog-producer='lookup' or 'full-compaction'"
                )

    def alter_table(self, name: str, set_options: dict) -> Table:
        """ALTER TABLE SET (props) → new schema version
        (tutorial/guide.md:180-185,265-272; schema-1 in assets/output5.png)."""
        t = self.get_table(name)
        doc = t.schema_doc()
        new_opts = dict(doc["options"])
        new_opts.update(set_options)
        if isinstance(new_opts.get("primary-key"), str):
            new_opts["primary-key"] = [c.strip() for c in new_opts["primary-key"].split(",")]
        # Paimon treats these as immutable: rows already on disk were
        # written (and batch-deduped) under the declared semantics, so
        # switching re-interprets them undefinedly
        for immutable, default in (
            ("merge-engine", "deduplicate"),
            ("sequence.field", None),
            # changing the data format mid-life would mix orc and
            # parquet files under one table; a format migration is a
            # rewrite, not an option flip
            ("file.format", "parquet"),
        ):
            old_v = doc["options"].get(immutable, default)
            new_v = new_opts.get(immutable, default)
            if new_v != old_v:
                raise ValueError(
                    f"{immutable} is immutable after CREATE TABLE "
                    f"(table has {old_v!r}, ALTER sets {new_v!r})"
                )
        # fixed→fixed bucket rescale is allowed (guarded table-side until
        # the rewrite); crossing between fixed and dynamic is not — the
        # key index only exists/means anything in dynamic mode
        old_dyn = int(doc["options"].get("bucket", "1")) == -1
        new_dyn = int(new_opts.get("bucket", "1")) == -1
        if old_dyn != new_dyn:
            raise ValueError(
                "cannot ALTER between fixed and dynamic bucket modes "
                f"(table has bucket={doc['options'].get('bucket', '1')!r}, "
                f"ALTER sets {new_opts.get('bucket', '1')!r})"
            )
        self._validate_options(
            new_opts,
            field_names={f.name for f in StructType.fromJson(doc["schema"]).fields},
        )
        v = t.schema_version + 1
        atomic_write_json(
            t.paths.schema_path(v),
            {"version": v, "schema": doc["schema"], "options": new_opts, "created_ms": now_millis()},
        )
        return t

    def add_column(self, name: str, col_ddl: str) -> Table:
        """ALTER TABLE ADD COLUMN — schema evolution (schema-N+1, the
        versioned-schema mechanism of assets/output5.png). Old data
        files simply lack the column; the read path supplies the latest
        schema to the parquet reader, which null-fills missing columns —
        no rewrite of existing files."""
        t = self.get_table(name)
        doc = t.schema_doc()
        new_fields = StructType.fromDDL(col_ddl).fields
        schema = StructType(StructType.fromJson(doc["schema"]).fields + new_fields)
        v = t.schema_version + 1
        atomic_write_json(
            t.paths.schema_path(v),
            {"version": v, "schema": schema.jsonValue(), "options": doc["options"], "created_ms": now_millis()},
        )
        return t

    # lossless numeric widenings Paimon's schema evolution permits; the
    # key is (from.simpleString, to.simpleString)
    _WIDENINGS = {
        ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
        ("smallint", "int"), ("smallint", "bigint"),
        ("int", "bigint"),
        ("float", "double"),
    }

    def alter_column_type(self, name: str, col: str, new_type: str) -> Table:
        """ALTER TABLE … MODIFY (col TYPE) — type WIDENING only
        (INT→BIGINT, FLOAT→DOUBLE, …): schema-N+1 carries the wider
        type; existing files keep their written encoding and the read
        path casts per file group (Table._read_entries reads each group
        with its write-time dtype, then casts to the current one), so
        no data file is rewritten.

        Key columns (primary-key / bucket-key / partition-by) cannot be
        widened: Spark's xxhash64 hashes INT and BIGINT representations
        of the same value differently, so a widened key would scatter
        identical keys across different buckets than their old rows."""
        t = self.get_table(name)
        doc = t.schema_doc()
        protected = set(t.primary_key) | set(t.bucket_key) | set(t.partition_keys)
        if col in protected:
            raise ValueError(f"cannot widen key/partition column {col}")
        target = StructType.fromDDL(f"__c {new_type}").fields[0].dataType
        fields, found = [], False
        for f in StructType.fromJson(doc["schema"]).fields:
            if f.name != col:
                fields.append(f)
                continue
            found = True
            frm, to = f.dataType.simpleString(), target.simpleString()
            if frm != to and (frm, to) not in self._WIDENINGS:
                raise ValueError(
                    f"cannot change column {col} from {frm} to {to}: "
                    "only lossless numeric widening is supported"
                )
            fields.append(StructField(f.name, target, f.nullable))
        if not found:
            raise ValueError(f"no such column: {col}")
        v = t.schema_version + 1
        atomic_write_json(
            t.paths.schema_path(v),
            {"version": v, "schema": StructType(fields).jsonValue(),
             "options": doc["options"], "created_ms": now_millis()},
        )
        return t

    def drop_column(self, name: str, col: str) -> Table:
        """ALTER TABLE DROP COLUMN — metadata-only: schema-N+1 omits the
        field; existing files keep the bytes but the projection never
        reads them (Table._read_entries). Key/partition/bucket columns
        cannot be dropped."""
        t = self.get_table(name)
        doc = t.schema_doc()
        protected = set(t.primary_key) | set(t.bucket_key) | set(t.partition_keys)
        if col in protected:
            raise ValueError(f"cannot drop key/partition column {col}")
        if col == t.sequence_field:
            raise ValueError(f"cannot drop sequence.field column {col}")
        fields = [f for f in StructType.fromJson(doc["schema"]).fields if f.name != col]
        if len(fields) == len(doc["schema"]["fields"]):
            raise ValueError(f"no such column: {col}")
        opts = dict(doc["options"])
        # a dropped column must also leave the sort-by hint, or every
        # later write crashes resolving it against the written frame
        if opts.get("sort-by"):
            sb = opts["sort-by"]
            lst = sb.split(",") if isinstance(sb, str) else list(sb)
            kept = [c.strip() for c in lst if c.strip() != col]
            if kept:
                opts["sort-by"] = ",".join(kept)
            else:
                opts.pop("sort-by")
        v = t.schema_version + 1
        atomic_write_json(
            t.paths.schema_path(v),
            {"version": v, "schema": StructType(fields).jsonValue(),
             "options": opts, "created_ms": now_millis()},
        )
        return t

    def rename_column(self, name: str, old: str, new: str) -> Table:
        """ALTER TABLE RENAME COLUMN — metadata-only: schema-N+1 carries
        the new name plus a ``renames`` log entry ({new: old}); readers
        map each file group's write-time physical name to the current
        name (Table._physical_name), so no data file is rewritten. Key
        option lists (primary-key/bucket-key/partition-by/sort-by) that
        referenced the old name follow the rename."""
        t = self.get_table(name)
        doc = t.schema_doc()
        fields = StructType.fromJson(doc["schema"]).fields
        names = [f.name for f in fields]
        if old not in names:
            raise ValueError(f"no such column: {old}")
        if new in names:
            raise ValueError(f"column {new} already exists")
        new_fields = [
            StructField(new, f.dataType, f.nullable) if f.name == old else f for f in fields
        ]
        opts = dict(doc["options"])
        for key in ("primary-key", "bucket-key", "partition-by"):
            val = opts.get(key)
            if val:
                lst = val.split(",") if isinstance(val, str) else list(val)
                opts[key] = [new if c.strip() == old else c.strip() for c in lst]
        if opts.get("sort-by"):
            sb = opts["sort-by"]
            lst = sb.split(",") if isinstance(sb, str) else list(sb)
            opts["sort-by"] = ",".join(new if c.strip() == old else c.strip() for c in lst)
        if opts.get("sequence.field") == old:
            opts["sequence.field"] = new
        v = t.schema_version + 1
        atomic_write_json(
            t.paths.schema_path(v),
            {"version": v, "schema": StructType(new_fields).jsonValue(),
             "options": opts, "renames": {new: old}, "created_ms": now_millis()},
        )
        return t

    def drop_table(self, name: str) -> None:
        paths = TablePaths(self.warehouse, self.db, name)
        shutil.rmtree(paths.root, ignore_errors=True)

    def rename_table(self, old: str, new: str) -> Table:
        """ALTER TABLE … RENAME TO … — one directory rename (all table
        state lives under the table root, so snapshots/tags/consumers
        ride along); refuses to clobber an existing table."""
        src = TablePaths(self.warehouse, self.db, old)
        if not os.path.exists(src.schema_path(0)):
            raise KeyError(f"table {old} does not exist")
        dst = TablePaths(self.warehouse, self.db, new)
        if os.path.exists(dst.root):
            raise ValueError(f"table {new} already exists")
        os.rename(src.root, dst.root)
        return Table(self.warehouse, self.db, new)

    def get_table(self, name: str) -> Table:
        paths = TablePaths(self.warehouse, self.db, name)
        if not os.path.exists(paths.schema_path(0)):
            raise KeyError(f"table {name} does not exist in {self.warehouse}/{self.db}.db")
        return Table(self.warehouse, self.db, name)

    def has_table(self, name: str) -> bool:
        return os.path.exists(TablePaths(self.warehouse, self.db, name).schema_path(0))

    def list_tables(self) -> list[str]:
        base = os.path.join(self.warehouse, f"{self.db}.db")
        return sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(base, "*"))
            if os.path.isdir(p) and os.path.exists(os.path.join(p, "schema", "schema-0"))
        )

    # -- SQL over the catalog (system-table rewrite, SURVEY.md §4) ------
    def register_views(self, spark: SparkSession, only: set[str] | None = None) -> None:
        """Expose tables (merged-on-read LATEST) plus their $files /
        $snapshots / $schemas system tables as temp views. `$` is not
        legal in a view name, so system tables register with `__`
        (measurements$files → measurements__files); Catalog.sql()
        rewrites the `$` syntax. ``only`` limits registration to the
        named tables — re-materializing every view per statement costs
        a snapshot read + window-plan build per table."""
        for name in self.list_tables():
            if only is not None and name not in only:
                continue
            t = self.get_table(name)
            t.read(spark).createOrReplaceTempView(name)
            t.files_table(spark).createOrReplaceTempView(f"{name}__files")
            t.snapshots_table(spark).createOrReplaceTempView(f"{name}__snapshots")
            t.schemas_table(spark).createOrReplaceTempView(f"{name}__schemas")
            t.tags_table(spark).createOrReplaceTempView(f"{name}__tags")
            t.partitions_table(spark).createOrReplaceTempView(f"{name}__partitions")
            t.manifests_table(spark).createOrReplaceTempView(f"{name}__manifests")
            t.consumers_table(spark).createOrReplaceTempView(f"{name}__consumers")
            t.options_table(spark).createOrReplaceTempView(f"{name}__options")
            t.audit_log_table(spark).createOrReplaceTempView(f"{name}__audit_log")
            t.branches_table(spark).createOrReplaceTempView(f"{name}__branches")

    def sql(self, spark: SparkSession, query: str):
        """Run SQL against the catalog; supports the reference's
        `table$files` system-table syntax (tutorial/guide.md:208) and
        time travel (`FROM t VERSION AS OF n` over the MVCC snapshot
        log) by view registration + rewrite before Catalyst sees the
        query. Only tables whose names appear in the statement are
        (re-)registered."""
        import re

        # Aggregate pushdown (Paimon/Iceberg metadata aggregates): a
        # bare COUNT(*) / MIN(col) / MAX(col) over one append-only
        # table — optionally filtered on partition columns — is
        # answered from manifest metadata (record_count sums / footer
        # stats), no file scan. The Table methods return None for
        # every case metadata cannot decide exactly (PK tables,
        # non-partition predicates, string stats, unparseable shapes)
        # and the statement falls through to the normal Catalyst path.
        m_agg = re.match(
            r"(?is)^\s*SELECT\s+(?:COUNT\(\s*\*\s*\)|(?P<f>MIN|MAX)\(\s*(?P<c>\w+)\s*\))"
            r"(?:\s+AS\s+(?P<a>\w+))?"
            r"\s+FROM\s+(?P<t>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)"
            r"\s*(?:WHERE\s+(?P<w>.+?))?\s*;?\s*$",
            query,
        )
        if m_agg:
            alias, qual, wpred = m_agg.group("a"), m_agg.group("t"), m_agg.group("w")
            func, coln = m_agg.group("f"), m_agg.group("c")
            parts = qual.split(".")
            try:
                cat = (
                    Catalog(self.warehouse, parts[-2])
                    if len(parts) > 1 and parts[-2] != self.db
                    else self
                )
                t = cat.get_table(parts[-1])
                if func is None:
                    n = t.metadata_count(where=wpred)
                    answer = None if n is None else (n, "long", f"count(1)")
                else:
                    mm = t.metadata_min_max(func.lower(), coln, where=wpred)
                    if mm is None:
                        answer = None
                    else:
                        ftype = next(
                            (f.dataType.simpleString() for f in t.schema.fields
                             if f.name == coln), "double",
                        )
                        answer = (mm[1], ftype, f"{func.lower()}({coln})")
            except (KeyError, FileNotFoundError, ValueError):
                answer = None
            if answer is not None:
                from pyspark.sql import functions as _F

                val, typ, default_name = answer
                # same result shape as the scanned plan (Spark names
                # bare aggregates 'count(1)' / 'min(col)' / 'max(col)')
                return spark.range(1).select(
                    _F.lit(val).cast(typ).alias(alias or default_name)
                )

        idents = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", query))
        self.register_views(spark, only=idents)
        # branch reads: `FROM t$branch_<name>` registers the branch's
        # merged read as a view on demand (Paimon's branch scan syntax)
        def branch_view(m):
            tname, bname = m.group(1), m.group(2)
            view = f"{tname}__branch__{bname}"
            self.get_table(tname).use_branch(bname).read(spark).createOrReplaceTempView(view)
            return view

        query = re.sub(r"(\w+)\$branch_(\w+)", branch_view, query)
        rewritten = re.sub(
            r"(\w+)\$(files|snapshots|schemas|tags|partitions|manifests|consumers|options|audit_log|branches)",
            r"\1__\2",
            query,
        )

        def opts_hint(m):
            # Flink/Paimon dynamic-table scan hints:
            #   FROM t /*+ OPTIONS('incremental-between'='3,5') */
            # Supported keys map to the table API (ids/tags, wall-clock
            # bounds, pinned snapshot); anything else is advisory and
            # tolerated, matching Flink's treatment of unknown options.
            qual, body = m.group(1), m.group(2)
            parts = qual.split(".")
            name = parts[-1]
            # db-qualified refs resolve through the NAMED db, never the
            # current one (round-6 ADVICE fix: the advisory branch used
            # to strip the qualifier, silently hitting a same-named
            # current-db view)
            foreign = len(parts) > 1 and parts[-2] != self.db
            cat = Catalog(self.warehouse, parts[-2]) if foreign else self
            kv = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", body))
            supported = {
                "incremental-between",
                "incremental-between-timestamp",
                "incremental-between-scan-mode",
                "scan.snapshot-id",
                "scan.mode",
                "scan.tag-name",
            }
            if not supported & kv.keys():
                # advisory-only hint: only the hint is removed. An
                # unqualified / current-db ref keeps its registered temp
                # view; a foreign-db ref registers a dedicated view from
                # that db's merged read (temp views aren't
                # db-addressable in Spark's session catalog)
                if not foreign:
                    return name
                view = f"{parts[-2]}__db__{name}"
                cat.get_table(name).read(spark).createOrReplaceTempView(view)
                return view
            t = cat.get_table(name)
            changelog_mode = kv.get("incremental-between-scan-mode") == "changelog"
            batch_mode = kv.get("scan.mode")
            if batch_mode is not None and "incremental-between" not in kv:
                # Paimon BATCH scan.mode (the streaming spellings live in
                # plans.frontend's streaming-runtime SELECT): pin the read
                # at the position the mode names. 'latest'/'latest-full'
                # are the default merged read; 'compacted-full' pins at
                # the newest COMPACT commit (full image, no post-compact
                # writes); 'from-snapshot[-full]' is time travel by id;
                # 'from-timestamp' resolves through the snapshot log.
                if batch_mode in ("default", "latest", "latest-full"):
                    df = t.read(spark)
                elif batch_mode == "compacted-full":
                    compacts = [
                        s["id"] for s in t.snapshots()
                        if s.get("commit_kind") == "COMPACT"
                    ]
                    df = t.read(spark, snapshot_id=max(compacts) if compacts else None)
                elif batch_mode in ("from-snapshot", "from-snapshot-full"):
                    if "scan.snapshot-id" not in kv:
                        raise ValueError(
                            f"'scan.mode'='{batch_mode}' needs 'scan.snapshot-id'"
                        )
                    df = t.read(spark, snapshot_id=int(kv["scan.snapshot-id"]))
                elif batch_mode == "from-timestamp":
                    if "scan.timestamp-millis" not in kv:
                        raise ValueError(
                            "'scan.mode'='from-timestamp' needs 'scan.timestamp-millis'"
                        )
                    df = t.read(
                        spark,
                        snapshot_id=t.snapshot_as_of_timestamp(kv["scan.timestamp-millis"]),
                    )
                else:
                    raise ValueError(f"unknown batch scan.mode {batch_mode!r}")
            elif "incremental-between" in kv:
                a, b = [x.strip() for x in kv["incremental-between"].split(",")]
                if changelog_mode:
                    # 'incremental-between-scan-mode'='changelog': the
                    # STORED changelog rows (with rowkind) between the
                    # snapshots, not the merged delta
                    df = t.incremental_changelog(spark, a, b)
                else:
                    # Paimon's batch incremental read returns the MERGED
                    # delta per changed key — deletes filtered,
                    # duplicates collapsed — never raw tombstones
                    # (merge_raw also drops __op/__seq)
                    df = t.merge_raw(t.incremental_read(spark, a, b))
            elif "incremental-between-timestamp" in kv:
                a, b = [x.strip() for x in kv["incremental-between-timestamp"].split(",")]
                df = t.merge_raw(t.incremental_read_between_timestamps(spark, a, b))
            elif "scan.snapshot-id" in kv:
                df = t.merge_raw(t.read(spark, snapshot_id=int(kv["scan.snapshot-id"])))
            elif "scan.tag-name" in kv:
                # Paimon 'scan.tag-name': batch read pinned at a tag —
                # the hint spelling of VERSION AS OF '<tag>'. Resolved
                # through tags() EXPLICITLY (round-6 ADVICE #3): the
                # id-or-tag resolve_ref path would silently time-travel
                # a tag literally named '3' to snapshot 3.
                tag_doc = t.tags().get(kv["scan.tag-name"])
                if tag_doc is None:
                    raise ValueError(
                        f"{name}: no tag {kv['scan.tag-name']!r} "
                        "(scan.tag-name resolves tag names only, never "
                        "snapshot ids)"
                    )
                df = t.read(spark, snapshot_id=tag_doc["snapshot_id"])
            else:
                return qual  # unreachable (supported-key check above)
            # keys AND values name the view: two hints with equal values
            # but different keys must not collide on one temp view
            tag = re.sub(
                r"[^A-Za-z0-9]", "_",
                "_".join(f"{k}_{v}" for k, v in sorted(kv.items())),
            )
            prefix = f"{parts[-2]}__db__{name}" if foreign else name
            view = f"{prefix}__hint_{tag}"
            df.createOrReplaceTempView(view)
            return view

        rewritten = re.sub(
            r"([\w.]+)\s*/\*\+\s*OPTIONS\s*\(([^)]*)\)\s*\*/",
            opts_hint,
            rewritten,
            flags=re.I,
        )

        def tt(m):
            name, ref = m.group(1), m.group(2).strip("'\"")
            t = self.get_table(name)
            sid = t.resolve_ref(ref)
            view = f"{name}__v{sid}"
            t.read(spark, snapshot_id=sid).createOrReplaceTempView(view)
            return view

        # VERSION AS OF <n> (snapshot id) or VERSION AS OF '<tag>'
        rewritten = re.sub(
            r"(\w+)\s+VERSION\s+AS\s+OF\s+(\d+|'[^']+'|\"[^\"]+\")", tt, rewritten, flags=re.I
        )

        def tt_ts(m):
            name, raw = m.group(1), m.group(2).strip("'\"")
            t = self.get_table(name)
            sid = t.snapshot_as_of_timestamp(raw)
            view = f"{name}__v{sid}"
            t.read(spark, snapshot_id=sid).createOrReplaceTempView(view)
            return view

        # TIMESTAMP AS OF <epoch-millis> | '<iso wall clock, UTC>'
        rewritten = re.sub(
            r"(\w+)\s+TIMESTAMP\s+AS\s+OF\s+(\d+|'[^']+'|\"[^\"]+\")",
            tt_ts,
            rewritten,
            flags=re.I,
        )
        return spark.sql(rewritten)
