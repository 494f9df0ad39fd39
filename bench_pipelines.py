"""Sustained-throughput bench for the three continuous LLM-ingestion
pipelines (VERDICT.md r9 ask #5): DedupIngestPipeline (Gopher
quality_filter + storage-pruned near-dedup), SearchIngestPipeline
(BM25 inverted index kept current), VectorIngestPipeline (PQ + IVF
indexes kept current). BASELINE.md's reference rate (3,529 rec/s at
parallelism 1) is a PLAIN APPEND — the tutorial's ingest does no
per-record curation work at all — so the artifact records each
pipeline's absolute rec/s AND its ratio to that baseline: the honest
statement of what filter→dedup→index curation costs per record over
raw ingestion at this SF.

Feeds each pipeline B sequential micro-batches of the testdata source
table through its ``sink`` (the exact foreachBatch body the streaming
wiring calls) in one Spark session and measures wall over ALL batches
— first-batch index builds are part of sustained ingest, not warmup.

Usage: python bench_pipelines.py  → writes PIPELINE_BENCH.json and
prints one JSON line. $SPARK_GRAFT_SF_DIR picks the SF (default
sf0.1); tests/test_throughput.py enforces regression floors at
sf0.001 via the same harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_REC_S = 3529
N_BATCHES = 4
TRIGGER_CADENCE_S = 20  # the reference's checkpoint/trigger interval


SOAK_TOLERANCE = 1.5  # tail-batch median ≤ early-batch median × this


def _flatness(walls: list[float]) -> dict:
    """Soak verdict over a per-batch wall series (VERDICT r11 ask #3):
    batch 0 carries the index build, so the early window starts at
    batch 1; the tail window is the last quarter, where the corpus
    (and every persisted index) is at its largest. A hidden O(corpus)
    term in probe/refresh/write-through would grow the tail roughly
    linearly in the batch number — far past the tolerance."""
    import statistics

    q = max(3, len(walls) // 4)
    early = statistics.median(walls[1 : 1 + q])
    tail = statistics.median(walls[-q:])
    return {
        "early_median_s": round(early, 3),
        "tail_median_s": round(tail, 3),
        "flatness_ratio": round(tail / early, 3),
        "flat": tail <= early * SOAK_TOLERANCE,
    }


def run_pipelines(spark, sf_dir: str, scratch: str, n_batches: int = N_BATCHES,
                  quality: bool = True) -> dict:
    """Drive all three pipelines' sinks over ``n_batches`` splits of the
    testdata source tables; return {name: {rows, wall_s, rec_s}}.

    ``n_batches`` is also the soak knob: each batch is a fresh slice of
    the source table, so the lakehouse table AND its persisted indexes
    grow monotonically batch over batch — at 20+ batches the tail runs
    against a corpus ~n_batches× the first batch's, which is exactly
    the condition that exposes any hidden O(corpus) per-batch term.
    ``quality=False`` skips the O(inputs²) exact-ground-truth reports
    (rate/flatness runs)."""
    import pyspark.sql.functions as F

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import DedupIngestPipeline
    from advent_of_code_flink_paimon_spark.operators.registry import T
    from advent_of_code_flink_paimon_spark.operators.similarity import (
        VectorIngestPipeline,
    )
    from advent_of_code_flink_paimon_spark.operators.text import SearchIngestPipeline

    docs = T(spark, sf_dir, "documents").select("doc_id", "text").persist()
    vecs = T(spark, sf_dir, "embeddings").select("vec_id", "embedding").persist()
    n_docs, n_vecs = docs.count(), vecs.count()  # materialize outside timing

    def batches(df, key, bid):
        return df.filter(F.pmod(F.col(key), F.lit(n_batches)) == bid)

    def drive(name, pipeline, src, key, n_rows):
        walls = []
        t0 = time.perf_counter()
        for bid in range(n_batches):
            tb = time.perf_counter()
            pipeline.sink(batches(src, key, bid), bid)
            walls.append(round(time.perf_counter() - tb, 3))
        wall = time.perf_counter() - t0
        # cadence headroom vs the reference's 20 s trigger (guide.md:3):
        # every batch must finish inside the trigger interval or the
        # pipeline falls behind its own source
        out = {
            "rows": n_rows,
            "wall_s": round(wall, 3),
            "rec_s": round(n_rows / wall, 1),
            "batch_rows": n_rows // n_batches,
            "batch_walls_s": walls,
            "batch_wall_max_s": max(walls),
            "fits_20s_trigger": max(walls) < TRIGGER_CADENCE_S,
        }
        if n_batches >= 10:
            out["soak"] = _flatness(walls)
        return out

    out = {}
    cat = Catalog(os.path.join(scratch, "wh-dedup"))
    out["dedup_ingest"] = drive(
        "dedup",
        DedupIngestPipeline(
            spark, cat, "docs", os.path.join(scratch, "ck-dedup"),
            verify_from_storage=True, quality_filter=True,
        ),
        docs, "doc_id", n_docs,
    )
    if quality:
        # text dedup quality for the run just driven (r10 ask #8's twin):
        # inputs = the rows offered to the DEDUP stage, i.e. post-Gopher
        # (quality drops are a different contract than dedup drops)
        from advent_of_code_flink_paimon_spark.operators.dedup import (
            dedup_ingest_recall_report,
        )
        from advent_of_code_flink_paimon_spark.operators.text import gopher_keep_col

        rep = dedup_ingest_recall_report(
            spark, cat, "docs",
            docs.filter(gopher_keep_col()).withColumn(
                "batch_id", F.pmod(F.col("doc_id"), F.lit(n_batches)).cast("int")
            ),
        ).collect()[0]
        out["dedup_ingest"]["quality"] = {
            "true_drops": rep.true_drops,
            "false_drops": rep.false_drops,
            "missed_dups": rep.missed_dups,
            "drop_recall": rep.drop_recall,
            "drop_precision": rep.drop_precision,
        }
    cat = Catalog(os.path.join(scratch, "wh-search"))
    out["search_ingest"] = drive(
        "search",
        SearchIngestPipeline(spark, cat, "docs", os.path.join(scratch, "ck-search")),
        docs, "doc_id", n_docs,
    )
    cat = Catalog(os.path.join(scratch, "wh-vector"))
    out["vector_ingest"] = drive(
        "vector",
        VectorIngestPipeline(spark, cat, "vecs", os.path.join(scratch, "ck-vector")),
        vecs, "vec_id", n_vecs,
    )
    from advent_of_code_flink_paimon_spark.operators.similarity import (
        VectorDedupIngestPipeline,
    )

    cat = Catalog(os.path.join(scratch, "wh-vdedup"))
    out["vector_dedup_ingest"] = drive(
        "vector_dedup",
        VectorDedupIngestPipeline(
            spark, cat, "vecs", os.path.join(scratch, "ck-vdedup")
        ),
        vecs, "vec_id", n_vecs,
    )
    if quality:
        # dedup QUALITY over the run just driven (VERDICT r10 ask #8): the
        # testdata's REAL near-dups graded against the exact-cosine ground
        # truth under the pipeline's own greedy visibility rule — recorded
        # alongside the rate so throughput never hides a recall regression.
        # Outside the timed window; O(inputs²) exact is the declared
        # ground-truth cost (sample-bound it at production scale, x68-style).
        from advent_of_code_flink_paimon_spark.operators.similarity import (
            vector_dedup_ingest_recall_report,
        )

        rep = vector_dedup_ingest_recall_report(
            spark, cat, "vecs",
            vecs.withColumn(
                "batch_id", F.pmod(F.col("vec_id"), F.lit(n_batches)).cast("int")
            ),
        ).collect()[0]
        out["vector_dedup_ingest"]["quality"] = {
            "true_drops": rep.true_drops,
            "false_drops": rep.false_drops,
            "missed_dups": rep.missed_dups,
            "drop_recall": rep.drop_recall,
            "drop_precision": rep.drop_precision,
        }
    # higher-recall vector dedup (VERDICT r12 ask #4): the SAME stream
    # through multi_probe=1 (every single-bit band-key neighbor probed
    # too — the knob that recovers the banding misses the default run's
    # quality block honestly reports), on its own warehouse so both
    # settings are measured side by side and the probe-cost delta is
    # quoted by the artifact itself.
    cat = Catalog(os.path.join(scratch, "wh-vdedup-hr"))
    out["vector_dedup_ingest_hi_recall"] = drive(
        "vector_dedup_hi_recall",
        VectorDedupIngestPipeline(
            spark, cat, "vecs", os.path.join(scratch, "ck-vdedup-hr"),
            multi_probe=1,
        ),
        vecs, "vec_id", n_vecs,
    )
    if quality:
        rep = vector_dedup_ingest_recall_report(
            spark, cat, "vecs",
            vecs.withColumn(
                "batch_id", F.pmod(F.col("vec_id"), F.lit(n_batches)).cast("int")
            ),
        ).collect()[0]
        out["vector_dedup_ingest_hi_recall"]["quality"] = {
            "true_drops": rep.true_drops,
            "false_drops": rep.false_drops,
            "missed_dups": rep.missed_dups,
            "drop_recall": rep.drop_recall,
            "drop_precision": rep.drop_precision,
        }
    # media perceptual dedup over a perceptually DIVERSE corpus with a
    # controlled planted-duplicate fraction (VERDICT r12 ask #3): N
    # distinct block-pattern base images through the real BMP/PNG/JPEG
    # encoders plus 1-in-4 planted re-encode/resize/re-mux/byte-copy
    # variants, featured by the real-decode 36-dim grid aHash — so the
    # quality block measures DISCRIMINATION (true_drops ≈ planted
    # variants ≪ rows, false_drops = 0) instead of the saturation the
    # old documents-as-media corpus produced.
    from advent_of_code_flink_paimon_spark.operators.multimodal import (
        MediaDedupIngestPipeline,
        media_dedup_ingest_recall_report,
        media_grid_features,
        synthetic_media_corpus,
    )

    DUP_EVERY = 4
    media = synthetic_media_corpus(spark, n_docs, dup_every=DUP_EVERY).persist()
    media.count()  # materialize (encode once) outside timing
    cat = Catalog(os.path.join(scratch, "wh-media"))
    out["media_dedup_ingest"] = drive(
        "media_dedup",
        MediaDedupIngestPipeline(
            spark, cat, "media", os.path.join(scratch, "ck-media"),
            features_fn=media_grid_features,
        ),
        media, "doc_id", n_docs,
    )
    out["media_dedup_ingest"]["planted_variants"] = (
        n_docs // DUP_EVERY - 1 if n_docs >= DUP_EVERY else 0
    )
    if quality:
        rep = media_dedup_ingest_recall_report(
            spark, cat, "media",
            media.withColumn(
                "batch_id", F.pmod(F.col("doc_id"), F.lit(n_batches)).cast("int")
            ),
            features_fn=media_grid_features,
        ).collect()[0]
        out["media_dedup_ingest"]["quality"] = {
            "true_drops": rep.true_drops,
            "false_drops": rep.false_drops,
            "missed_dups": rep.missed_dups,
            "drop_recall": rep.drop_recall,
            "drop_precision": rep.drop_precision,
        }
    media.unpersist()
    docs.unpersist()
    vecs.unpersist()
    return out


def refresh_cost_series(spark, sf_dir: str, scratch: str, n_batches: int = 20) -> dict:
    """Refresh-cost-vs-index-size series (VERDICT r12 ask #7): isolate
    the incremental index REFRESH path from probe cost by committing
    fresh source slices as plain appends and timing the explicit
    refresh after each — the growing-index condition the pipelines'
    write-through normally hides (their sinks keep the index current,
    so the in-pipeline refresh is pointer-gated to a no-op). A hidden
    O(index) term in the refresh (re-banding the corpus, rescanning
    old snapshots) would grow the wall roughly linearly in the batch
    number; O(batch) refresh stays flat. Records, per batch: refresh
    wall, rows indexed by that refresh, and the TOTAL index size it
    left behind — plus the soak flatness verdict over the walls."""
    import pyspark.sql.functions as F

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import (
        minhash_index_name,
        refresh_minhash_index,
    )
    from advent_of_code_flink_paimon_spark.operators.registry import T
    from advent_of_code_flink_paimon_spark.operators.similarity import (
        build_lsh_band_index,
        lsh_bands_name,
        refresh_lsh_band_index,
    )

    from advent_of_code_flink_paimon_spark.operators.multimodal import (
        MEDIA_DDL,
        build_phash_index,
        media_grid_features,
        phash_index_name,
        refresh_phash_index,
        synthetic_media_corpus,
    )
    from advent_of_code_flink_paimon_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_name,
        refresh_ivfpq_index,
    )
    from advent_of_code_flink_paimon_spark.operators.text import (
        inverted_index_name,
        refresh_inverted_index,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text").persist()
    vecs = T(spark, sf_dir, "embeddings").select("vec_id", "embedding").persist()
    n_docs, _ = docs.count(), vecs.count()
    media = synthetic_media_corpus(spark, n_docs).persist()
    media.count()  # encode once, outside timing

    def series(name, table_ddl, src, key, refresh, index_name,
               prebuild=None, build=None):
        """``prebuild`` runs on the EMPTY table (freeze parameters that
        must not drift with data, e.g. the LSH band width); ``build``
        replaces the batch-0 refresh (codebooks/thresholds need data to
        train on). _flatness starts at batch 1, so the build cost never
        skews the flatness verdict."""
        cat = Catalog(os.path.join(scratch, f"wh-refresh-{name}"))
        t = cat.create_table("src_t", table_ddl, {})
        if prebuild is not None:
            prebuild(spark, cat, "src_t")
        rows = []
        for bid in range(n_batches):
            t.append(src.filter(F.pmod(F.col(key), F.lit(n_batches)) == bid))
            t0 = time.perf_counter()
            if bid == 0 and build is not None:
                n = build(spark, cat, "src_t")
            else:
                n = refresh(spark, cat, "src_t")
            wall = round(time.perf_counter() - t0, 3)
            rows.append({
                "batch": bid,
                "refreshed_rows": int(n),
                "index_rows": cat.get_table(index_name("src_t")).read(spark).count(),
                "refresh_wall_s": wall,
            })
        walls = [r["refresh_wall_s"] for r in rows]
        return {"series": rows, "soak": _flatness(walls)}

    # VERDICT r13 ask #6: one series per persisted index family — the
    # O(batch) refresh claim is measured for all five, not just the
    # text/vector dedup pair.
    out = {
        "minhash_index": series(
            "minhash", "doc_id long, text string", docs, "doc_id",
            refresh_minhash_index, minhash_index_name,
        ),
        "lsh_band_index": series(
            "lsh_band_index", "vec_id long, embedding array<float>", vecs, "vec_id",
            refresh_lsh_band_index, lsh_bands_name,
            prebuild=build_lsh_band_index,  # freeze the band width
        ),
        "inverted_index": series(
            "inverted", "doc_id long, text string", docs, "doc_id",
            refresh_inverted_index, inverted_index_name,
        ),
        "ivfpq_index": series(
            "ivfpq", "vec_id long, embedding array<float>", vecs, "vec_id",
            refresh_ivfpq_index, ivfpq_name,
            build=build_ivfpq_index,  # centroids+codebook train on batch 0
        ),
        "phash_index": series(
            "phash", MEDIA_DDL, media, "doc_id",
            lambda s, c, t: refresh_phash_index(s, c, t, features_fn=media_grid_features),
            phash_index_name,
            build=lambda s, c, t: build_phash_index(s, c, t, features_fn=media_grid_features),
        ),
    }
    media.unpersist()
    docs.unpersist()
    vecs.unpersist()
    return out


def bloom_index_benefit(spark, sf_dir: str, scratch: str, slices: int = 16,
                        n_keys: int = 5) -> dict:
    """Measured benefit of the bloom-filter file index (VERDICT r13 ask
    #4): a point predicate on an UNSORTED high-cardinality key, where
    footer min/max stats prune nothing (every file's range spans the
    whole key space because the appends are interleaved slices), so
    only the sidecar can skip files. Records files scanned under
    stats-only vs stats+bloom pruning and the wall delta over the same
    point reads on twin tables (identical data, option on/off)."""
    import pyspark.sql.functions as F

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.lakehouse.table import prune_entries
    from advent_of_code_flink_paimon_spark.operators.registry import T

    docs = T(spark, sf_dir, "documents").select("doc_id", "text").persist()
    docs.count()
    cat = Catalog(os.path.join(scratch, "wh-bloom-bench"))
    t_plain = cat.create_table("docs_plain", "doc_id long, text string", {"bucket": "1"})
    t_bloom = cat.create_table(
        "docs_bloom", "doc_id long, text string",
        {"bucket": "1", "file-index.bloom-filter.columns": "doc_id"},
    )
    for bid in range(slices):
        sl = docs.filter(F.pmod(F.col("doc_id"), F.lit(slices)) == bid)
        t_plain.append(sl)
        t_bloom.append(sl)
    # mid-range keys: extreme ids sit outside most files' [min,max] and
    # would let stats prune by accident — the scenario under test is a
    # key INSIDE every file's range, where only the bloom bits help
    median = docs.approxQuantile("doc_id", [0.5], 0.01)[0]
    keys = [
        r.doc_id
        for r in docs.filter(F.col("doc_id") >= median)
        .orderBy("doc_id").limit(n_keys).collect()
    ]
    docs.unpersist()

    entries = t_bloom.manifest()
    stats_kept = [len(prune_entries(entries, f"doc_id = {k}")) for k in keys]
    bloom_kept = [
        len(prune_entries(entries, f"doc_id = {k}", root=t_bloom.paths.root))
        for k in keys
    ]

    def timed(t):
        t0 = time.perf_counter()
        for k in keys:
            t.read(spark, where=f"doc_id = {k}").count()
        return round(time.perf_counter() - t0, 3)

    timed(t_plain), timed(t_bloom)  # warm both paths (footer cache, codegen)
    wall_stats = timed(t_plain)
    wall_bloom = timed(t_bloom)
    return {
        "files_total": len(entries),
        "point_lookups": len(keys),
        "files_scanned_stats_only_avg": round(sum(stats_kept) / len(keys), 2),
        "files_scanned_with_bloom_avg": round(sum(bloom_kept) / len(keys), 2),
        "wall_stats_only_s": wall_stats,
        "wall_with_bloom_s": wall_bloom,
        "speedup": round(wall_stats / wall_bloom, 2) if wall_bloom else None,
    }


def _tree_files(root: str) -> dict[str, int]:
    """{relpath: bytes} of every data file under a table root (data
    dirs only — metadata/ dv/ stream/ excluded)."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        if rel.split(os.sep)[0] in ("metadata", "stream", "changelog", "index", "dv"):
            continue
        for f in files:
            if f.endswith((".parquet", ".orc")):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = os.path.getsize(p)
    return out


def partition_drop_benefit(spark, sf_dir: str, scratch: str) -> dict:
    """Measured benefit of metadata partition drop (round 15, the x119
    claim quantified): DELETE a whole partition on twin tables —
    partitioned (the partition value decides every file: pure manifest
    shrink, zero files written) vs unpartitioned (the same predicate
    straddles every file: copy-on-write rewrite). At 100 TB the first
    is a metadata commit; the second rewrites the surviving majority
    of every touched file."""
    import pyspark.sql.functions as F  # noqa: F401

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.registry import T

    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cat = Catalog(os.path.join(scratch, "wh-pdrop"))
    ddl = "o_orderkey long, o_orderstatus string, o_totalprice double"
    t_part = cat.create_table(
        "o_part", ddl,
        {"bucket": "2", "bucket-key": "o_orderkey", "partition-by": "o_orderstatus"},
    )
    t_flat = cat.create_table(
        "o_flat", ddl, {"bucket": "2", "bucket-key": "o_orderkey"}
    )
    t_part.append(src)
    t_flat.append(src)
    out = {}
    for tag, t in (("partitioned_metadata_drop", t_part), ("unpartitioned_rewrite", t_flat)):
        before = _tree_files(t.paths.root)
        t0 = time.perf_counter()
        t.delete_where(spark, "o_orderstatus = 'P'")
        wall = round(time.perf_counter() - t0, 3)
        after = _tree_files(t.paths.root)
        new = {p: b for p, b in after.items() if p not in before}
        out[tag] = {
            "wall_s": wall,
            "files_written": len(new),
            "bytes_written": sum(new.values()),
        }
    w_m = out["partitioned_metadata_drop"]["wall_s"]
    w_r = out["unpartitioned_rewrite"]["wall_s"]
    out["speedup"] = round(w_r / w_m, 2) if w_m else None
    return out


def dv_delete_benefit(spark, sf_dir: str, scratch: str) -> dict:
    """Measured benefit of deletion vectors (round 15, the x109 apply
    path quantified): a sparse DELETE (~1% of rows, straddling every
    file) on twin tables — DV-enabled (writes only the position
    vectors) vs plain copy-on-write (rewrites every touched file's
    surviving 99%). The bytes-written ratio IS the write-amplification
    the DV surface exists to kill."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.registry import T

    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cat = Catalog(os.path.join(scratch, "wh-dvbench"))
    ddl = "o_orderkey long, o_orderstatus string, o_totalprice double"
    t_dv = cat.create_table(
        "o_dv", ddl,
        {"bucket": "2", "bucket-key": "o_orderkey", "deletion-vectors.enabled": "true"},
    )
    t_cow = cat.create_table(
        "o_cow", ddl, {"bucket": "2", "bucket-key": "o_orderkey"}
    )
    t_dv.append(src)
    t_cow.append(src)
    out = {}
    for tag, t in (("deletion_vectors", t_dv), ("copy_on_write", t_cow)):
        before = _tree_files(t.paths.root)
        # dv/ parquet must COUNT as written bytes for the DV side —
        # walk the dv dir explicitly (excluded dirs above don't list it)
        dv_dir = os.path.join(t.paths.root, "dv")
        before_dv = _tree_files(dv_dir) if os.path.isdir(dv_dir) else {}
        t0 = time.perf_counter()
        t.delete_where(spark, "o_orderkey % 97 = 0")
        wall = round(time.perf_counter() - t0, 3)
        after = _tree_files(t.paths.root)
        after_dv = _tree_files(dv_dir) if os.path.isdir(dv_dir) else {}
        new = {p: b for p, b in after.items() if p not in before}
        new_dv = {p: b for p, b in after_dv.items() if p not in before_dv}
        out[tag] = {
            "wall_s": wall,
            "files_written": len(new) + len(new_dv),
            "bytes_written": sum(new.values()) + sum(new_dv.values()),
        }
    b_dv = out["deletion_vectors"]["bytes_written"]
    b_cw = out["copy_on_write"]["bytes_written"]
    out["write_amplification_ratio"] = round(b_cw / b_dv, 1) if b_dv else None
    return out


def stateful_operator_soak(spark, scratch: str, n_batches: int = 20) -> dict:
    """VERDICT r16 ask #5: soak the two heaviest windows.py stateful
    operators the way the ingest pipelines are soaked — n_batches
    micro-batches (one file per trigger, mtime-pinned order) through a
    REAL streaming query, recording per-batch trigger walls from
    ``query.recentProgress`` plus the state-store row series, so both
    claims are measured, not asserted:

    - ``stream_stream_join``: event times advance one minute per
      batch; with a 1-minute watermark and a ±30 s join interval the
      state the store retains is bounded by the horizon — the row
      series must PLATEAU (the eviction claim in x139's docstring),
      and batch walls must stay flat while total rows processed grows
      n_batches×.
    - ``changelog_normalize``: a fixed 500-key universe upserted every
      batch; state is one remembered row per live key BY DESIGN
      (NoTimeout), so the row series must plateau at ≤ the key
      universe while the processed volume grows n_batches×.

    Flatness uses the same early-vs-tail windows as the pipelines
    (_flatness); state boundedness compares the tail-quarter max to
    the post-warmup max."""
    import pyspark.sql.functions as F  # noqa: F401

    from advent_of_code_flink_paimon_spark.streaming.windows import (
        changelog_normalize,
        stream_stream_join,
    )

    def write_batches(subdir, make_rows, schema):
        src = os.path.join(scratch, subdir)
        os.makedirs(src, exist_ok=True)
        for b in range(n_batches):
            part = os.path.join(src, f"b{b:03d}")
            spark.createDataFrame(make_rows(b), schema).coalesce(1).write.parquet(part)
            # one FILE per batch dir; flatten so the file source sees a
            # flat glob with ascending mtimes (trigger order == batch
            # order, the x144 mtime protocol)
            for f in os.listdir(part):
                if f.endswith(".parquet"):
                    dst = os.path.join(src, f"batch-{b:03d}.parquet")
                    os.rename(os.path.join(part, f), dst)
                    os.utime(dst, (1_000_000_000 + b, 1_000_000_000 + b))
            import shutil as _sh

            _sh.rmtree(part)
        return src

    def drive(name, stream_df):
        q = (
            stream_df.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(scratch, f"ckpt-{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
        walls = [round(p["durationMs"]["triggerExecution"] / 1000.0, 3) for p in prog]
        state_rows = [
            sum(op["numRowsTotal"] for op in p["stateOperators"]) for p in prog
        ]
        rows_in = [p["numInputRows"] for p in prog]
        tailq = max(3, len(state_rows) // 4)
        warm = state_rows[1:] or state_rows  # batch 0 is startup
        bounded = max(state_rows[-tailq:]) <= max(warm[: len(warm) // 2]) * SOAK_TOLERANCE
        return {
            "n_triggers": len(prog),
            "rows_processed": sum(rows_in),
            "batch_walls_s": walls,
            "state_rows_series": state_rows,
            "state_rows_max": max(state_rows),
            "state_bounded": bool(bounded),
            "soak": _flatness(walls),
        }

    out = {}

    # --- stream-stream interval join: advancing clock, watermark evicts ---
    per_batch, n_users = 240, 40

    def side_rows(b, salt):
        return [
            (
                i % n_users,
                f"2024-01-01 00:{b:02d}:{(i * salt) % 60:02d}",
                float(i),
            )
            for i in range(per_batch)
        ]

    ldir = write_batches(
        "ssj-left", lambda b: side_rows(b, 7), "user_id long, ts string, lval double"
    )
    rdir = write_batches(
        "ssj-right", lambda b: side_rows(b, 11), "user_id long, ts string, rval double"
    )
    ls = (
        spark.readStream.schema("user_id long, ts string, lval double")
        .option("maxFilesPerTrigger", "1").parquet(ldir)
        .withColumn("lts", F.col("ts").cast("timestamp")).drop("ts")
    )
    rs = (
        spark.readStream.schema("user_id long, ts string, rval double")
        .option("maxFilesPerTrigger", "1").parquet(rdir)
        .withColumn("rts", F.col("ts").cast("timestamp")).drop("ts")
    )
    joined = stream_stream_join(
        ls, rs, on="user_id", left_ts="lts", right_ts="rts",
        watermark="1 minute", within="30 seconds",
    )
    out["stream_stream_join"] = drive("ssj", joined)

    # --- changelog normalize: fixed key universe, state = live keys ---
    n_keys = 500

    def upsert_rows(b):
        return [
            (k, f"v{b}-{k}", "+U", b * n_keys + k) for k in range(n_keys)
        ]

    cdir = write_batches(
        "cln-src", upsert_rows, "k long, v string, op string, seq long"
    )
    cs = (
        spark.readStream.schema("k long, v string, op string, seq long")
        .option("maxFilesPerTrigger", "1").parquet(cdir)
    )
    normalized = changelog_normalize(
        cs, key_cols=["k"], value_cols=["v"], order_col="seq"
    )
    res = drive("cln", normalized)
    res["key_universe"] = n_keys
    res["state_at_most_live_keys"] = res["state_rows_max"] <= n_keys
    out["changelog_normalize"] = res
    return out


def main() -> None:
    import shutil
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # soak mode (VERDICT r11 ask #3): ≥20 fresh-slice micro-batches so
    # the corpus and every persisted index grow ~n_batches× over the
    # run; the artifact records the full per-batch wall series plus the
    # early-vs-tail flatness verdict per pipeline, and lands in
    # PIPELINE_SOAK.json (PIPELINE_BENCH.json stays the 4-batch rate
    # artifact). Usage: python bench_pipelines.py soak [n_batches]
    soak = len(sys.argv) > 1 and sys.argv[1] == "soak"
    n_batches = int(sys.argv[2]) if soak and len(sys.argv) > 2 else (
        20 if soak else N_BATCHES
    )

    from advent_of_code_flink_paimon_spark.session import get_spark

    spark = get_spark("aocfp-pipeline-bench", extra_conf={"spark.ui.enabled": "false"})
    scratch = tempfile.mkdtemp(prefix="spark-graft-plbench-")
    refresh = None
    bloom = None
    pdrop = None
    dvben = None
    try:
        results = run_pipelines(spark, sf_dir, scratch,
                                n_batches=n_batches, quality=not soak)
        if soak:
            # ask r12 #7: the isolated refresh-vs-index-size series
            # rides the soak artifact (same growing-corpus condition)
            refresh = refresh_cost_series(spark, sf_dir, scratch,
                                          n_batches=n_batches)
            # ask r16 #5: the windows.py stateful operators soaked as
            # real streaming queries (walls + state-row series)
            results.update(stateful_operator_soak(spark, scratch,
                                                  n_batches=n_batches))
        else:
            # ask r13 #4: the bloom file index's measured benefit rides
            # the rate artifact
            bloom = bloom_index_benefit(spark, sf_dir, scratch)
            # round 15: the partition-drop and DV write-amplification
            # benefits ride the rate artifact too
            pdrop = partition_drop_benefit(spark, sf_dir, scratch)
            dvben = dv_delete_benefit(spark, sf_dir, scratch)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()
    for v in results.values():
        if "rec_s" in v:  # stateful-operator soak rows carry walls, not rates
            v["vs_plain_append_baseline"] = round(v["rec_s"] / BASELINE_REC_S, 4)
    artifact = {
        "metric": "ingest_pipeline_soak_flatness" if soak
        else "ingest_pipeline_sustained_rate",
        "unit": "rec_s",
        "baseline_plain_append_rec_s": BASELINE_REC_S,
        "trigger_cadence_s": TRIGGER_CADENCE_S,
        "n_batches": n_batches,
        "soak_tolerance": SOAK_TOLERANCE,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pipelines": results,
    }
    if refresh is not None:
        artifact["refresh_cost_series"] = refresh
    if bloom is not None:
        artifact["bloom_file_index"] = bloom
    if pdrop is not None:
        artifact["partition_drop"] = pdrop
    if dvben is not None:
        artifact["dv_delete"] = dvben
    here = os.path.dirname(os.path.abspath(__file__))
    name = "PIPELINE_SOAK.json" if soak else "PIPELINE_BENCH.json"
    with open(os.path.join(here, name), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
