"""Targeted bench (OPTIMIZATION r18): times the named queries with the
exact bench.py methodology — noop sink, q01 warmup, round-robin
repeats, median — so per-family before/after numbers are comparable
with BENCH_clean_r18.json without paying a full 58-query run.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

    import __spark_entry__ as entrymod
    from advent_of_code_flink_paimon_spark.operators.registry import (
        LIBRARY_QUERIES,
        set_auto_release,
    )
    from advent_of_code_flink_paimon_spark.session import get_spark

    spark = get_spark("aocfp-minibench", extra_conf={"spark.ui.enabled": "false"})
    set_auto_release(False)
    qs = dict(entrymod.queries())
    for name, fn in LIBRARY_QUERIES.items():
        qs.setdefault(name, fn)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q01_pricing_summary")  # warmup
    names = [n for n in sys.argv[1:] if n in qs]
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for n in names:
            samples[n].append(run(n))
    spark.stop()
    out = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    print(json.dumps({"queries": out, "total": round(sum(out.values()), 3),
                      "spread": {n: [round(min(s), 3), round(max(s), 3)] for n, s in samples.items()},
                      "repeats": repeats, "load": [round(x, 2) for x in os.getloadavg()]}))


if __name__ == "__main__":
    main()
