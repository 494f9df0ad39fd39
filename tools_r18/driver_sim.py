"""Driver simulation (OPTIMIZATION r18) — BARE session, strict oracle.

The r17 lesson: a driver-sim that builds its session through
``get_spark()`` cannot catch bugs that only exist under the driver's
vanilla session (registry.py's conf-read crash took out 15/50 scored
queries while the repo's own sim reported 100/100). This sim therefore
builds a plain ``SparkSession.builder.master(...)`` with NONE of the
repo's DEFAULT_CONF — exactly the driver contract — and compares every
``queries()`` entry (plus the library) against the DuckDB oracle with
the strict harness.

Usage: python tools_r18/driver_sim.py [query ...]
Env:   SPARK_GRAFT_SIM_DIR (default /root/testdata/sf0.01)
       SPARK_GRAFT_SIM_SCOPE = window|registry|all (default registry)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SIM_DIR", "/root/testdata/sf0.01")
    scope = os.environ.get("SPARK_GRAFT_SIM_SCOPE", "registry")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("driver-sim-r18")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )

    import __spark_entry__ as entrymod
    from advent_of_code_flink_paimon_spark.operators.registry import (
        LIBRARY_ORACLES,
        LIBRARY_QUERIES,
    )
    from tests.oracle_harness import compare, duck_con

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    if scope == "all":
        for name, fn in LIBRARY_QUERIES.items():
            qs.setdefault(name, fn)
        oracles.update({k: v for k, v in LIBRARY_ORACLES.items() if k not in oracles})

    if sys.argv[1:]:
        names = sys.argv[1:]
    elif scope == "window":
        names = list(qs)[:50]
    else:
        names = list(qs)

    con = duck_con(sf_dir)
    n_ok = n_bad = n_err = 0
    t_start = time.time()
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            if name in oracles:
                problems = compare(sdf, con, oracles[name])
                ok, msg = (not problems), "; ".join(problems)
            else:
                ok, msg = sdf.count() >= 0, "rows-only"
            dt = time.time() - t0
            if ok:
                n_ok += 1
                print(f"OK   {name} ({dt:.1f}s)", flush=True)
            else:
                n_bad += 1
                print(f"BAD  {name} ({dt:.1f}s): {msg[:300]}", flush=True)
        except Exception:
            n_err += 1
            tb = traceback.format_exc(limit=4)
            print(f"ERR  {name}: {tb[-500:]}", flush=True)
    print(
        f"TOTAL ok={n_ok} bad={n_bad} err={n_err} of {len(names)} "
        f"in {time.time() - t_start:.0f}s (sf={sf_dir}, scope={scope}, bare session)",
        flush=True,
    )
    sys.exit(0 if (n_bad == 0 and n_err == 0) else 1)


if __name__ == "__main__":
    main()
