"""Temporal & analytical operator pack (SURVEY.md §2.3/2.5/2.6 extensions).

Operators the reference's SQL surface implies but never exercises, plus
the time-series shapes a sensor/event workload needs at scale: event-time
as-of join, banded range join, time-bucket (hypertable-style) rollup,
cube with grouping ids, exact percentiles, and gap-based sessionization.

Scale notes (100 TB):
- The as-of join is a SINGLE shuffle on the partition key (union + one
  window pass) — never a per-row range probe and never a join explosion;
  this is the merge-as-of pattern (SURVEY.md §2.3 "event-time as-of").
- Sessionization is the same single-window-pass shape (lag + running sum).
- The range join broadcasts the (tiny) band table; at scale a banded
  equi-join (floor(value/width)) replaces the nested-loop entirely.
- Rollup/cube/percentile are Catalyst built-ins: partial+final agg.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from advent_of_code_flink_paimon_spark.operators.registry import T, pin, query


@query(
    "q29_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, MAX(c.ts) AS last_click_ts
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def q29_asof_join(spark, sf_dir):
    """Event-time AS-OF join: for every purchase, the most recent click
    by the same user at-or-before the purchase time.

    Implemented as union + one running-max window (merge-as-of): tag the
    two event kinds, sort per user by (ts, clicks-first-on-ties), and
    take the running max of click timestamps. One shuffle on user_id,
    zero joins — the scalable form; a range join here would re-shuffle
    and risk quadratic per-user blowup on hot keys."""
    e = T(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    # clicks sort before purchases at equal ts so `c.ts <= p.ts` is inclusive
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_ts", F.max("click_ts").over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


@query(
    "q30_range_join",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
        VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 500.0)
    )
    SELECT b.band_name, e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_name, e.event_type
    """,
)
def q30_range_join(spark, sf_dir):
    """Banded range join: events bucketed into value bands via an
    interval predicate against a broadcast dimension.

    The band table is tiny → broadcast nested-loop, which Catalyst picks
    automatically for a broadcast side with a non-equi condition; the
    fact side streams through with no shuffle. At 100 TB this stays a
    single scan; if the band table grew, the rewrite is
    floor(value/width) equi-join."""
    e = T(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 500.0)],
        "band_name string, lo double, hi double",
    )
    return (
        e.join(F.broadcast(bands), (e.value >= bands.lo) & (e.value < bands.hi))
        .groupBy("band_name", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


@query(
    "q31_time_bucket_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP), event_type
    """,
)
def q31_time_bucket_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate shape: per-(time bucket,
    type) rollup of the event stream. date_trunc is a pure projection →
    the groupBy shuffles pre-reduced partial aggregates only.

    The per-bucket mean is emitted as exact-decimal SUM + COUNT (the
    consumer divides): any engine-side division lands on round-half
    ties (e.g. 307.03/8 = 38.37875 exactly) where Spark rounds the
    decimal string HALF_UP and DuckDB rounds the binary double — sum
    and count are tie-free and exact."""
    e = T(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("day", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "q32_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q32_cube(spark, sf_dir):
    """CUBE over (returnflag, linestatus) with a grouping id — the
    multi-dimensional rollup surface (SURVEY.md §2.4 'grouping sets').
    Spark expands the cube before the partial agg; 4 grouping sets over
    2 low-cardinality keys stay tiny at any scale.

    gid encodes which columns are aggregated away, bit 0 = returnflag,
    bit 1 = linestatus (Spark's GROUPING() and DuckDB's agree: 1 when
    the column is rolled up)."""
    l = T(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus").agg(
            (F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")).alias("gid"),
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    ).select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")


@query(
    "q33_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def q33_percentiles(spark, sf_dir):
    """Exact linear-interpolated percentiles per group (Spark
    `percentile` == DuckDB `quantile_cont`). The exact form sorts within
    the agg; the declared scale path is `approx_percentile` (t-digest,
    mergeable, one pass) — kept exact here for the oracle gate."""
    e = T(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


# q33 declared approx_percentile as its 100 TB path; x91 EXERCISES it
# (VERDICT.md r9 ask #4 — the one sketch the design leaned on with no
# evidence). Spark's percentile_approx is a Greenwald–Khanna summary:
# mergeable (map-side partials combine), single-pass, O(accuracy)
# state per group, guaranteed rank error ≤ n/accuracy. At the gate's
# accuracy the error bound is < 1 rank, so the sketch answers the
# EXACT discrete quantile (element at rank ceil(q·n) — DuckDB's
# quantile_disc) and the driver can hash-match it; at 100 TB the same
# query dials accuracy to the executor-memory budget and inherits the
# published bound (tests/test_extensions.py asserts the rank-error
# tolerance empirically at accuracy=100).
_X91_ACCURACY = 1_000_000  # rank error ≤ n/accuracy < 1 at every test SF


@query(
    "x91_approx_percentiles",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.9) AS p90,
           quantile_disc(value, 0.99) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def x91_approx_percentiles(spark, sf_dir):
    """Per-group approximate percentiles via the GK sketch — the
    mergeable one-pass scale path q33 declares. percentile_approx's
    result is the dataset element at rank ceil(q·n) once the rank
    error n/accuracy drops below 1, which is exactly DuckDB's
    quantile_disc — no interpolation on either engine, so the values
    hash-match bit-for-bit. The plan is one partial-aggregable pass:
    sketches combine map-side, only per-group summaries shuffle."""
    e = T(spark, sf_dir, "events")
    a = _X91_ACCURACY
    return e.groupBy("event_type").agg(
        F.expr(f"percentile_approx(value, 0.5, {a})").alias("p50"),
        F.expr(f"percentile_approx(value, 0.9, {a})").alias("p90"),
        F.expr(f"percentile_approx(value, 0.99, {a})").alias("p99"),
        F.count("*").cast("long").alias("n"),
    )


@query(
    "q48_time_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_30m,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_30m
    FROM events
    """,
)
def q48_time_range_frame(spark, sf_dir):
    """Time-interval RANGE frame (rolling 30-minute per-user sum/count)
    — the event-time sliding aggregate as a WINDOW rather than a
    bucketed groupBy, completing the frame family beyond q41's numeric
    RANGE. ts ties are frame PEERS (all included), so the result is
    deterministic without a tiebreak; the decimal-cast sum keeps both
    engines exact before the final double cast. One exchange + one sort
    on user_id serves both window functions."""
    e = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-30 * 60 * 1_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("rolling_30m"),
        F.count("*").over(w).alias("n_30m"),
    )


@query(
    "q34_sessionize",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM gaps
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def q34_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min idle timeout): lag + running sum
    assigns session ids in one window pass, then per-session rollup.
    One shuffle on user_id shared by both windows and the final agg
    (same partitioning → Catalyst reuses the exchange). The streaming
    twin is `session_window` (tests/test_streaming.py)."""
    e = T(spark, sf_dir, "events")
    # tiebreak on event_id: ts alone is not unique per user; gap compared
    # in µs (cast-to-long would truncate and disagree with the oracle's
    # exact INTERVAL comparison on sub-second gaps)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ----------------------------------------------------------------------
# x86: staged funnel analysis — the standard product-analytics query
# over an event stream: per user, the first signup, the first click
# within 3 days AFTER that signup, and the first purchase within 3
# days AFTER that click; the funnel stage counts how deep the ordered
# sequence got (the deadline makes every stage non-vacuous on this
# data: 22/39/89 users at stages 1/2/3, sf0.01 — the x52 lesson). Strict
# event-time ordering between stages (not mere presence) is what makes
# this a funnel rather than three filters.
# ----------------------------------------------------------------------

_SQL_FUNNEL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
c1 AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.signup_ts
    AND e.ts <= s1.signup_ts + INTERVAL 3 DAY
  GROUP BY e.user_id
),
p1 AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c1 ON c1.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c1.click_ts
    AND e.ts <= c1.click_ts + INTERVAL 3 DAY
  GROUP BY e.user_id
),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id, s1.signup_ts, c1.click_ts, p1.purchase_ts,
       CAST(CASE WHEN p1.user_id IS NOT NULL THEN 3
                 WHEN c1.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage
FROM u
LEFT JOIN s1 USING (user_id)
LEFT JOIN c1 USING (user_id)
LEFT JOIN p1 USING (user_id)
"""


@query("x86_funnel_stages", oracle=_SQL_FUNNEL)
def x86_funnel_stages(spark, sf_dir):
    """signup → click → purchase funnel per user with strict event-time
    ordering AND a 3-day deadline between consecutive stages;
    funnel_stage ∈ 0..3.

    Scale shape: three conditional MIN aggregations chained by
    user_id-keyed joins — every join and agg co-partitions on user_id,
    so AQE reuses one exchange of the slim (user_id, ts, type)
    projection; no window over the raw event stream and no self-join
    on time ranges. Timestamps compare exactly (µs integers on both
    engines), so stage boundaries are engine-identical."""
    e = T(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c1 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("signup_ts"))
            & (F.col("ts") <= F.col("signup_ts") + F.expr("INTERVAL 3 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p1 = (
        e.filter(F.col("event_type") == "purchase")
        .join(c1, "user_id")
        .filter(
            (F.col("ts") > F.col("click_ts"))
            & (F.col("ts") <= F.col("click_ts") + F.expr("INTERVAL 3 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    u = e.select("user_id").distinct()
    stage = (
        F.when(F.col("purchase_ts").isNotNull(), 3)
        .when(F.col("click_ts").isNotNull(), 2)
        .when(F.col("signup_ts").isNotNull(), 1)
        .otherwise(0)
    ).cast("long")
    return (
        u.join(s1, "user_id", "left")
        .join(c1, "user_id", "left")
        .join(p1, "user_id", "left")
        .select(
            "user_id", "signup_ts", "click_ts", "purchase_ts",
            stage.alias("funnel_stage"),
        )
    )


# Window and registry are at cap this round; x86 ships library-gated.
# x86_funnel_stages PROMOTED to the scored registry in round 11 (VERDICT r10
# ask #1): its library-era demote call is retired; the entry takes a
# window slot freed by a long-stable relational demotion.


# ----------------------------------------------------------------------
# x87: cohort retention — the other canonical product-analytics query:
# users grouped by the DAY of their first event (the cohort), and for
# each later day-offset, how many of that cohort made a PURCHASE that
# day. Day granularity + purchase-only activity keep the matrix
# non-degenerate on this data (the synthetic users are active with
# some event nearly every week, so weekly any-event retention is a
# constant ~1.0 — the x52 vacuity lesson): 59 cells with n_active
# ranging 1-62 at sf0.01.
# ----------------------------------------------------------------------

_SQL_COHORT_RETENTION = """
WITH firsts AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
),
cohorts AS (
  SELECT user_id, date_trunc('day', first_ts) AS cohort_day FROM firsts
),
activity AS (
  SELECT DISTINCT e.user_id, c.cohort_day,
         CAST(date_diff('day', c.cohort_day, date_trunc('day', e.ts)) AS BIGINT) AS day_offset
  FROM events e JOIN cohorts c USING (user_id)
  WHERE e.event_type = 'purchase'
),
sizes AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM cohorts GROUP BY cohort_day
)
SELECT a.cohort_day, a.day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       s.cohort_size,
       CAST(COUNT(*) AS BIGINT) * 1.0 / s.cohort_size AS retention
FROM activity a JOIN sizes s USING (cohort_day)
GROUP BY a.cohort_day, a.day_offset, s.cohort_size
"""


@query("x87_cohort_retention", oracle=_SQL_COHORT_RETENTION)
def x87_cohort_retention(spark, sf_dir):
    """Daily purchase-retention matrix: per (cohort day, day offset),
    the count and fraction of the cohort purchasing that day.
    date_diff('day') between day-truncated timestamps equals Spark's
    datediff on the corresponding DATEs — exact integer day gaps.

    Scale shape: first-event per user is one agg; the activity matrix
    is one distinct over (user, cohort, offset) co-partitioned with
    the cohort join on user_id; cohort sizes broadcast back. Ratios
    divide exact BIGINTs."""
    e = T(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohorts = firsts.select(
        "user_id", F.date_trunc("day", "first_ts").alias("cohort_day")
    )
    activity = (
        e.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(
                F.to_date(F.date_trunc("day", F.col("ts"))),
                F.to_date(F.col("cohort_day")),
            ).cast("long").alias("day_offset"),
        )
        .distinct()
    )
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active") * F.lit(1.0) / F.col("cohort_size")).alias("retention"),
        )
    )


# Window and registry are at cap this round; x87 ships library-gated.
# x87_cohort_retention PROMOTED to the scored registry in round 11 (VERDICT r10
# ask #1): its library-era demote call is retired; the entry takes a
# window slot freed by a long-stable relational demotion.


# ---------------------------------------------------------------------------
# x105: robust (MAD-based) outlier card over event telemetry — the
# data-quality monitor a continuously-ingesting pipeline runs per batch
# or per partition to catch upstream regressions (a stuck sensor, a
# unit change, a fat-fingered backfill) BEFORE the data reaches
# training. Mean/stddev z-scores break down exactly when needed most —
# a single 1e9 outlier drags the mean — so the card uses the classic
# robust pair: median + MAD (median absolute deviation), flagging
# |value − med| > 3·1.4826·MAD (1.4826 = 1/Φ⁻¹(3/4) makes MAD a
# consistent σ estimator under normality; Hampel 1974, Leys et al.
# 2013).
# ---------------------------------------------------------------------------

_SQL_MAD_OUTLIERS = """
WITH m AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
),
d AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
  FROM events e JOIN m USING (event_type)
),
mm AS (SELECT event_type, median(ad) AS mad FROM d GROUP BY event_type)
SELECT d.event_type,
       COUNT(*) AS n_events,
       ROUND(ANY_VALUE(d.med), 6) AS med,
       ROUND(ANY_VALUE(mm.mad), 6) AS mad,
       COUNT(*) FILTER (d.ad > 3 * 1.4826 * mm.mad) AS n_outliers,
       ROUND(COUNT(*) FILTER (d.ad > 3 * 1.4826 * mm.mad) * 1.0
             / COUNT(*), 6) AS outlier_rate
FROM d JOIN mm ON d.event_type = mm.event_type
GROUP BY d.event_type
"""


@query("x105_mad_outliers", oracle=_SQL_MAD_OUTLIERS)
def x105_mad_outliers(spark, sf_dir):
    """Per-event-type robust outlier card: exact median, exact MAD, and
    the count/rate of values beyond 3·1.4826·MAD (see module comment).

    Scale shape: two grouped EXACT percentile passes (median of value,
    then median of |value − med| after a broadcast join of the 5-row
    median table) and one final map-side-combinable count aggregation —
    three exchanges total, each keyed on the low-cardinality
    event_type. Exact ``percentile`` buffers a group's values in one
    task, so this library card is sized for telemetry-table audits
    (millions of rows per type); on a 100 TB corpus the same card swaps
    ``percentile`` → ``approx_percentile`` (GK sketch, mergeable
    partials — the q33/x91 pairing already measures that swap's error)
    with no other plan change. The driver-facing semantic is exact so
    DuckDB's ``median`` oracles it bit-for-bit (both engines
    interpolate the even-count midpoint; outputs round to 6 dp and the
    3·1.4826·MAD comparison operates on values whose margin is ~1e-1,
    9 orders above any interpolation ulp)."""
    e = T(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    d = e.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = d.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    out = F.col("ad") > 3 * 1.4826 * F.col("mad")
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(out.cast("long")).cast("long").alias("n_outliers"),
            F.round(
                F.sum(out.cast("long")).cast("double") / F.count("*"), 6
            ).alias("outlier_rate"),
        )
    )



# x-demoted round 16: x105_mad_outliers yields its driver-registry slot to the
# streaming-card promotions (x132-x136); telemetry stays driver-scored via x107 (scored window).
# Full strict-oracle gating continues via tests/test_relational_oracle.py.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r16e  # noqa: E402

_demote_r16e("x105_mad_outliers")
del _demote_r16e

# ---------------------------------------------------------------------------
# x107: event-RATE anomaly card — x105 flags anomalous VALUES; this
# flags anomalous ARRIVAL RATES (an hour where a type's event count
# sits > 2σ from that type's hourly mean: a stuck producer, a burst, a
# dead upstream). The telemetry pair every ingest pipeline wants on a
# dashboard. Moments are computed from EXACT integer sums (Σc, Σc²
# over bigint counts) with one IEEE division/sqrt spelled identically
# on both engines — never engine-native AVG/STDDEV over doubles, whose
# summation orders differ (the x32/x103 parity analysis).
# ---------------------------------------------------------------------------

_SQL_RATE_ANOMALY = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM b GROUP BY 1
),
m AS (
  SELECT event_type, n_buckets,
         CAST(s1 AS DOUBLE) / n_buckets AS mu,
         sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_buckets)
              / (n_buckets - 1)) AS sd
  FROM s WHERE n_buckets > 1
),
pk AS (
  SELECT event_type, h AS peak_hour, c AS peak_count FROM (
    SELECT b.*, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY c DESC, h) AS rn
    FROM b
  ) WHERE rn = 1
)
SELECT b.event_type,
       ANY_VALUE(m.n_buckets) AS n_buckets,
       ROUND(ANY_VALUE(m.mu), 6) AS mean_hourly,
       ROUND(ANY_VALUE(m.sd), 6) AS sd_hourly,
       CAST(COUNT(*) FILTER (abs(b.c - m.mu) > 2 * m.sd) AS BIGINT)
           AS n_anomalous,
       ANY_VALUE(pk.peak_hour) AS peak_hour,
       ANY_VALUE(pk.peak_count) AS peak_count
FROM b JOIN m USING (event_type) JOIN pk USING (event_type)
GROUP BY b.event_type
"""


@query("x107_event_rate_anomaly", oracle=_SQL_RATE_ANOMALY)
def x107_event_rate_anomaly(spark, sf_dir):
    """Per-type hourly-rate anomaly card (see block comment): bucket
    counts, exact-sum mean/σ, 2σ anomaly count, and the deterministic
    peak bucket (count DESC, hour ASC).

    Scale shape: ONE map-side-combinable count exchange to the
    (type, hour) bucket relation — after that every window and join
    runs over buckets (types × hours, corpus-size-independent for a
    bounded time range), and the per-type moment table broadcasts.
    At 100 TB the bucket relation is the only corpus-order exchange,
    identical to the x31/q31 time-bucket rollup class."""
    e = T(spark, sf_dir, "events")
    b = (
        e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    b = pin(b)  # bucket relation feeds moments, peak AND the final join
    s = b.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    m = s.filter(F.col("n_buckets") > 1).select(
        "event_type",
        "n_buckets",
        (F.col("s1").cast("double") / F.col("n_buckets")).alias("mu"),
        F.sqrt(
            (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n_buckets"))
            / (F.col("n_buckets") - 1)
        ).alias("sd"),
    )
    peak_win = Window.partitionBy("event_type").orderBy(F.col("c").desc(), F.col("h").asc())
    pk = (
        b.withColumn("rn", F.row_number().over(peak_win))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("h").alias("peak_hour"), F.col("c").alias("peak_count"))
    )
    anom = F.abs(F.col("c") - F.col("mu")) > 2 * F.col("sd")
    out = (
        b.join(F.broadcast(m), "event_type")
        .join(F.broadcast(pk), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n_buckets").alias("n_buckets"),
            F.round(F.first("mu"), 6).alias("mean_hourly"),
            F.round(F.first("sd"), 6).alias("sd_hourly"),
            F.sum(anom.cast("long")).cast("long").alias("n_anomalous"),
            F.first("peak_hour").alias("peak_hour"),
            F.first("peak_count").alias("peak_count"),
        )
    )
    return out


# x105/x107 PROMOTED into the scored registry at the round-14 rotation
# (VERDICT r13 ask #1); x91 demoted to free one of their slots — the
# approx-percentile class stays driver-scored via q33 (GK sketch),
# and x91 remains strict-oracle-gated by the library harness.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r14t  # noqa: E402

_demote_r14t("x91_approx_percentiles")
del _demote_r14t


# Round-17 demotion (temporal.py's share of the 13 slots freed for the
# VERDICT r16 ask #1 promotions): x86 funnel stages (funnel/cohort
# class driver-evidenced by x87 cohort retention, staying scored).
# Remains strict-oracle gated by the local harness.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r17d  # noqa: E402

_demote_r17d("x86_funnel_stages")
del _demote_r17d
