"""Regression test for the r17 driver-contract crash (VERDICT r17 #1).

The external driver passes its OWN plain SparkSession into
``queries()[name](spark, sf_dir)`` — none of the repo's DEFAULT_CONF is
applied. In r17, ``fan_out`` read ``spark.sql.files.minPartitionNum``
with the sentinel fallback "0"; pyspark validates the supplied fallback
when a registered conf is unset, "0" fails the positive-int requirement,
and 15/50 scored queries crashed with INVALID_CONF_VALUE.

This test runs fan_out-heavy scored queries in a SUBPROCESS on a bare
``SparkSession.builder.master("local[2]").getOrCreate()`` with zero repo
confs — `get_spark()` must never execute, otherwise the session under
test silently inherits the tuned defaults and the test proves nothing
(exactly the r17 verification blind spot).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# Bare session: the driver contract. No repo confs, no get_spark().
spark = (
    SparkSession.builder.appName("vanilla-contract")
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as entry

qs = entry.queries()
for name in {names!r}:
    df = qs[name](spark, {sf!r})
    n = df.count()
    assert n >= 0
    print(f"OK {{name}} rows={{n}}", flush=True)
"""


@pytest.mark.parametrize(
    "names",
    [
        # one fan_out(heavy=True) on documents (x45), one on embeddings
        # reached via _pq_vecs/build_* (x96), one composing x03 (x07)
        ["x45_substr_dedup", "x07_dup_clusters", "x96_lsh_index_health"],
    ],
)
def test_fan_out_queries_on_vanilla_session(names):
    script = _SCRIPT.format(repo=REPO, names=names, sf=SF)
    env = dict(os.environ)
    # make sure nothing repo-specific leaks into the child session
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"vanilla-session run failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    for name in names:
        assert f"OK {name}" in proc.stdout
