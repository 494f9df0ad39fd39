"""Capture .explain("formatted") for declared queries (OPTIMIZATION r18).

Writes plans/r18/<query>_<tag>.txt for each query named on argv (or all
registry queries when none given). Tag comes from $PLAN_TAG (default
"before"). Lifecycle side effects (tmp warehouses) execute as usual —
the captured plan is the final returned DataFrame's physical plan.
"""

from __future__ import annotations

import io
import os
import sys
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = os.environ.get("PLAN_TAG", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from advent_of_code_flink_paimon_spark.operators.registry import LIBRARY_QUERIES
    from advent_of_code_flink_paimon_spark.session import get_spark

    spark = get_spark("aocfp-plans", extra_conf={"spark.ui.enabled": "false"})
    qs = dict(entrymod.queries())
    for name, fn in LIBRARY_QUERIES.items():
        qs.setdefault(name, fn)

    names = sys.argv[1:] or list(qs)
    for name in names:
        if name not in qs:
            print(f"SKIP unknown {name}", flush=True)
            continue
        try:
            spark.sparkContext.setJobDescription(f"plan:{name}")
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"OK {name}", flush=True)
        except Exception:
            print(f"ERR {name}\n{traceback.format_exc()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
