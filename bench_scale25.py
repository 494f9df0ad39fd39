"""One-off 25x growth spot-check (VERDICT r15 ask #6): the three
steepest BENCH_scale rows at 5x rows — x65_gopher_rules (3.69x),
x71_bigram_lm_score (3.09x), q16_agg_approx_distinct (2.83x) — re-timed
at a 25x row multiple to distinguish log-linear fixed-cost amortization
from the onset of a super-linear curve. Pass bar (the ask's wording):
growth <= multiple x 1.25 = 31.25x; a genuinely quadratic operator
would land near 625x.

Reuses bench_scale.py's generators with M/SCALE_DIR patched (same
per-replica key-offset construction, same fresh-seeded documents shape,
so per-key cardinalities and dedup density scale exactly 25x).

Usage: python bench_scale25.py  -> writes BENCH_scale25.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

import bench_scale as bs  # noqa: E402

M25 = 25
# r15 ask #6 trio, then the round-17 successors (VERDICT r16 ask #2):
# x140/x143 are the two steepest non-control 5x rows on the board
# (4.52x / 2.72x) — the same protocol decides log-linear vs onset.
TARGETS = ["x65_gopher_rules", "x71_bigram_lm_score", "q16_agg_approx_distinct",
           "x140_changelog_normalize", "x143_source_template_shingles"]
REPEATS = 3


def main() -> None:
    import duckdb

    bs.M = M25
    bs.SCALE_DIR = os.path.join(ROOT, ".scale-data", "sf2.5")
    done = os.path.join(bs.SCALE_DIR, ".complete25")
    if not os.path.exists(done):
        os.makedirs(bs.SCALE_DIR, exist_ok=True)
        con = duckdb.connect()
        bs._gen_relational(con)  # q16's lineitem at 25x
        bs._gen_documents(con)  # x65/x71's documents at 25x
        with open(done, "w") as f:
            f.write("ok")

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench-scale25")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    qs = entrymod.queries()
    from advent_of_code_flink_paimon_spark.operators.registry import LIBRARY_QUERIES

    qs = {**LIBRARY_QUERIES, **qs}
    out = {"sf_base": 0.1, "sf_scale": 2.5, "row_multiple": M25, "queries": {}}
    # merge-don't-overwrite: later rounds add targets one at a time
    # (SPARK_GRAFT_SCALE25_ONLY=<prefix>) without re-timing the rest
    prior = os.path.join(ROOT, "BENCH_scale25.json")
    if os.path.exists(prior):
        with open(prior) as f:
            out["queries"].update(json.load(f).get("queries", {}))
    targets = TARGETS
    only = os.environ.get("SPARK_GRAFT_SCALE25_ONLY")
    if only:
        prefixes = only.split(",")
        targets = [n for n in TARGETS if any(n.startswith(p) for p in prefixes)]
    for name in targets:
        fn = qs[name]
        med = {}
        for tag, sf_dir in (("base", bs.BASE), ("scale", bs.SCALE_DIR)):
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
            times = []
            for _ in range(REPEATS):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
            med[tag] = round(statistics.median(times), 3)
        growth = round(med["scale"] / med["base"], 2)
        out["queries"][name] = {**med, "growth": growth}
        print(f"{name}: base={med['base']}s scale25={med['scale']}s growth={growth}x",
              file=sys.stderr, flush=True)
    out["max_growth"] = max(q["growth"] for q in out["queries"].values())
    out["pass_bar"] = M25 * 1.25
    out["log_linear"] = out["max_growth"] <= out["pass_bar"]
    with open(os.path.join(ROOT, "BENCH_scale25.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
