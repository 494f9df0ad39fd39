"""Action-level profiler (OPTIMIZATION r18, guide §1).

Monkeypatches the PySpark driver actions (collect, count, toPandas,
DataFrameWriter.save/parquet, StreamingQuery.awaitTermination /
processAllAvailable) to log wall seconds plus the repo source line that
invoked them, then runs the named queries once each with the noop sink.
Output: per-query total + a ranked table of action sites.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG: list[tuple[str, str, float]] = []  # (query, site, secs)
CURRENT = ["-"]


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
            LOG.append((CURRENT[0], f"{meth}@{_site()}", time.perf_counter() - t0))

    setattr(cls, meth, patched)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    try:
        from pyspark.sql.classic.dataframe import DataFrame  # Spark 4 classic impl
    except ImportError:
        from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    for m in ("collect", "count", "toPandas"):
        _wrap(DataFrame, m)
    for m in ("save", "parquet"):
        _wrap(DataFrameWriter, m)
    # driver-side plan/metadata work hides in _jdf round-trips; sample the
    # biggest known one (createDataFrame) too
    from pyspark.sql.session import SparkSession as _S

    _wrap(_S, "createDataFrame")
    try:
        from pyspark.sql.streaming.query import StreamingQuery

        for m in ("awaitTermination", "processAllAvailable"):
            _wrap(StreamingQuery, m)
    except Exception:
        pass

    import __spark_entry__ as entrymod
    from advent_of_code_flink_paimon_spark.operators.registry import LIBRARY_QUERIES
    from advent_of_code_flink_paimon_spark.session import get_spark

    spark = get_spark("aocfp-profile", extra_conf={"spark.ui.enabled": "false"})
    qs = dict(entrymod.queries())
    for name, fn in LIBRARY_QUERIES.items():
        qs.setdefault(name, fn)

    totals = {}
    for name in sys.argv[1:]:
        CURRENT[0] = name
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        totals[name] = round(time.perf_counter() - t0, 3)
        print(f"TOTAL {name} {totals[name]}s", flush=True)
    spark.stop()

    agg: dict[tuple[str, str], list[float]] = {}
    for q, site, s in LOG:
        agg.setdefault((q, site), []).append(s)
    print("\n=== per-site breakdown (sum secs, n calls) ===")
    for (q, site), ss in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
        print(f"{sum(ss):7.2f}s  n={len(ss):3d}  {q:34s} {site}")
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
