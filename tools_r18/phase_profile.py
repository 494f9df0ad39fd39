"""Phase-level profiler (OPTIMIZATION r18, guide §1).

Times every monkeypatched driver action (collect/count/toPandas/
save/parquet/createDataFrame/awaitTermination) AND, separately, the
gaps between them (pure driver-side work: plan building, py4j, file
I/O, Catalyst analysis), for the named queries. Prints a per-query
timeline so the fixed-cost structure of lifecycle cards is visible.

Usage: python tools_r18/phase_profile.py x66_ivfpq_adc_topk ...
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG: list[tuple[str, float, float]] = []  # (site, t_start, t_end)


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "/repo/" in fn and "tools_r18" not in fn and "pyspark" not in fn:
            return f"{os.path.relpath(fn, '/root/repo')}:{fr.lineno}"
    return "?"


def _wrap(cls, meth):
    orig = getattr(cls, meth)

    def patched(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **k)
        finally:
            LOG.append((f"{meth}@{_site()}", t0, time.perf_counter()))

    setattr(cls, meth, patched)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter
    from pyspark.sql.session import SparkSession as _S
    from pyspark.sql.streaming.query import StreamingQuery

    for m in ("collect", "count", "toPandas"):
        _wrap(DataFrame, m)
    for m in ("save", "parquet"):
        _wrap(DataFrameWriter, m)
    _wrap(_S, "createDataFrame")
    for m in ("awaitTermination", "processAllAvailable"):
        try:
            _wrap(StreamingQuery, m)
        except AttributeError:
            pass

    import __spark_entry__ as entrymod
    from advent_of_code_flink_paimon_spark.operators.registry import LIBRARY_QUERIES
    from advent_of_code_flink_paimon_spark.session import get_spark

    spark = get_spark("aocfp-phase-profile", extra_conf={"spark.ui.enabled": "false"})
    qs = dict(entrymod.queries())
    for name, fn in LIBRARY_QUERIES.items():
        qs.setdefault(name, fn)

    # warmup
    qs["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in sys.argv[1:]:
        LOG.clear()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        print(f"\n=== {name}: {total:.2f}s total, {len(LOG)} actions ===")
        prev_end = t0
        gap_total = act_total = 0.0
        for site, s, e in LOG:
            gap = s - prev_end
            if gap > 0.005:
                print(f"  gap   {gap:6.2f}s   (driver-side before next action)")
            gap_total += max(gap, 0.0)
            print(f"  act   {e - s:6.2f}s   {site}")
            act_total += e - s
            prev_end = max(prev_end, e)
        tail = t0 + total - prev_end
        if tail > 0.005:
            print(f"  gap   {tail:6.2f}s   (driver-side tail)")
        print(f"  -- actions {act_total:.2f}s, driver gaps {total - act_total:.2f}s")


if __name__ == "__main__":
    main()
