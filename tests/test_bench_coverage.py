"""BENCH_scale coverage is STRUCTURAL (VERDICT r12 ask #2, third
recurrence of the gap): every query that has ever cost >= 1 s on the
headline bench must have a growth row in bench_scale.py's battery AND
measured base/scale medians in BENCH_scale.json — so a promotion into
the scored window can never again leak an unmeasured-at-scale operator
(x88's first growth row caught a real 7.5 s plan pathology; this test
makes that catch automatic).

Scope (VERDICT r12 ask #8): the >= 1 s set is computed from the FULL
BENCH_r* history, not the current headline list — an entry that was
hot and later demoted to the library or retired from the bench still
needs its scale row, so demotion can't hide a scaling pathology.

The one standing exemption is x06_dedup_embedding_cosine, which HAS a
scale row by design: it is the deliberately retained O(n^2) exact
ground-truth control (its super-linear growth is the documented
baseline the sub-quadratic x90/x11 paths are judged against).

Round 16 (VERDICT r15 ask #5): the code now implements the written
"EVER >= 1 s" rule — the hot set is the per-query MAX median over the
full BENCH_r* history, not the latest observation — and the four
rounds-1-2-only hot queries (q19, q25, q34, x10) have recorded growth
rows, so prose and logic agree.
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HOT_SECONDS = 1.0


def _bench_observations() -> dict[str, list[float]]:
    """Every per-query median ever recorded across the BENCH_r*
    history (retired entries keep their old observations)."""
    obs: dict[str, list[float]] = {}
    for path in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        tail = json.load(open(path)).get("tail", "")
        m = re.search(r'\{"metric".*', tail)
        if not m:
            continue
        try:
            queries = json.loads(m.group(0).splitlines()[0])["queries"]
        except (ValueError, KeyError):
            continue  # a truncated tail (the r10 lesson) — skip that round
        for name, sec in queries.items():
            obs.setdefault(name, []).append(float(sec))
    return obs


def _ever_hot_medians() -> dict[str, float]:
    """Per-query MAX median over the full BENCH_r* history — the
    round-16 fix for the VERDICT r15 docstring/code divergence: the
    written rule is "ever cost >= 1 s", so a query that was hot in
    round 1 and cheap ever since (q19, q25, q34, x10) still needs its
    growth row; a contention spike is the only way a never-actually-
    hot query lands here, and its scale row is then cheap insurance,
    not a false positive."""
    return {name: max(secs) for name, secs in _bench_observations().items()}


def test_bench_scale_coverage_is_structural():
    import bench
    import bench_scale

    hot = {n for n, sec in _ever_hot_medians().items() if sec >= HOT_SECONDS}
    assert hot, "no BENCH_r* history parsed — the coverage base is gone"

    battery = set(bench_scale.QUERIES)
    missing_from_battery = sorted(hot - battery)
    assert not missing_from_battery, (
        f"headline queries >= {HOT_SECONDS} s with NO bench_scale.py growth "
        f"row: {missing_from_battery} — add them to bench_scale.QUERIES and "
        "run SPARK_GRAFT_SCALE_ONLY to record their rows"
    )

    recorded = json.load(open(os.path.join(ROOT, "BENCH_scale.json")))["queries"]
    missing_rows = sorted(n for n in hot if n not in recorded)
    assert not missing_rows, (
        f"growth rows declared but never measured for: {missing_rows} — run "
        "SPARK_GRAFT_SCALE_ONLY='" + ",".join(missing_rows) + "' python bench_scale.py"
    )
    errored = sorted(n for n in hot if "error" in recorded.get(n, {}))
    assert not errored, f"BENCH_scale rows recorded an error for: {errored}"

    # every current headline entry is either measured-at-scale or has
    # never yet crossed the hot bar in any round (new promotions get
    # their first BENCH_r row next round; adding their growth row at
    # promotion time, as r13 did for x99/x100, keeps this vacuous)
    unknown_hot = sorted(
        n for n in bench.HEADLINE
        if n not in recorded and _ever_hot_medians().get(n, 0.0) >= HOT_SECONDS
    )
    assert not unknown_hot, unknown_hot


def test_bench_scale_rows_stay_subquadratic():
    """No measured operator may grow super-linearly past the row
    multiple (with a 25% fixed-cost/noise allowance) except the
    documented exact control x06."""
    data = json.load(open(os.path.join(ROOT, "BENCH_scale.json")))
    m = data["row_multiple"]
    offenders = {
        n: row["growth"]
        for n, row in data["queries"].items()
        if "growth" in row and row["growth"] > m * 1.25
        and n != "x06_dedup_embedding_cosine"
    }
    assert not offenders, (
        f"super-linear growth at {m}x rows: {offenders} — a scale-killer "
        "is hiding in these plans"
    )


def test_history_marker_separates_clean_from_contended():
    """The ratio-to-best history marker (VERDICT r16 ask #4) must keep
    discriminating on the recorded artifacts: the clean r15/r16 reruns
    score well under the 1.25 load flag, the r15 driver window (the
    contended artifact the marker exists for) scores over it. If a
    threshold tweak or a history-glob regression breaks either side,
    this pins it."""
    import bench

    def timings(name):
        art = json.load(open(os.path.join(ROOT, name)))
        if isinstance(art.get("parsed"), dict):
            art = art["parsed"]
        return art["queries"], str(art["sf"])

    for clean in ("BENCH_clean_r15.json", "BENCH_clean_r16.json"):
        t, sf = timings(clean)
        m = bench._history_markers(t, sf)
        assert m["hist_n"] > 40 and not m["loaded_vs_history"], (clean, m)
    t, sf = timings("BENCH_r15.json")
    m = bench._history_markers(t, sf)
    assert m["loaded_vs_history"], ("contended r15 run not flagged", m)
