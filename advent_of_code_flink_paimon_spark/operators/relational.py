"""Relational [Q] operator inventory (SURVEY.md §2.2-2.8).

Each query is the Spark-first expression of a capability the reference
exercises (or declares for surface parity) — projections
(tutorial/guide.md:130-136), aliasing (tutorial/guide.md:90), the
relational core of the lookup join (tutorial/guide.md:137-140),
global COUNT(*) (tutorial/guide.md:53,90-96), the PK-upsert merge
semantic as a ranking window (tutorial/guide.md:65 + min_sequence_number
ordering tutorial/guide.md:206), LIMIT (Readme.md:112,160), plus the
declared-for-parity filter/join/agg/set/scalar surface.

Value-parity rules with the DuckDB oracle (SURVEY.md §5), as hardened
after round 1 (VERDICT.md: 16 hash-fails were all representation drift):
- Money columns hold exact 2-decimal values stored as doubles → cast to
  DECIMAL *before* any arithmetic. Decimal multiply/sum is exact in both
  engines, so neither aggregation order nor double→decimal rounding (where
  Spark uses the double's shortest-repr and DuckDB the exact binary value)
  can diverge. Never downcast a decimal to fewer fraction digits: Spark
  rounds ties HALF_UP, DuckDB HALF_EVEN — only widen (exact).
- **Final outputs never carry DecimalType**: the driver's comparison is
  pandas-shaped, where DuckDB DECIMAL becomes float64 but Spark decimal
  stays object(Decimal) → guaranteed hash-fail. Cast every decimal
  aggregate to DOUBLE on BOTH sides as the last step. The exact decimal
  value converts to its nearest double identically in both engines (one
  correctly-rounded conversion; unscaled sums stay < 2^53 at driver SF,
  so DuckDB's scale-division introduces no second rounding).
- **DuckDB SUM over integers returns HUGEINT** (float64 in pandas) while
  Spark returns bigint → CAST(SUM(...) AS BIGINT) in every oracle.
- AVG over raw doubles is order-dependent in the last ulp → compute it
  as CAST(exact-decimal SUM AS DOUBLE) / COUNT(*) on both sides: same
  numerator bits, same denominator, same IEEE division → bit-identical.
- Every computed column aliased identically in both dialects (driver
  hashes by sorted column name). int widths don't matter (value-level
  compare); float values must be bit-identical.

Scale notes (100 TB): every query below is pure DataFrame API — filters
and projections push into the parquet scan, small dimensions are
explicitly broadcast, aggregations run partial+final, and nothing
collects to the driver. No Python UDFs in this module.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from advent_of_code_flink_paimon_spark.operators.registry import T, query

_DEC = "decimal(18,2)"


def _dp(price: str, disc: str):
    """Exact discounted price: DECIMAL(12,2) * (1 - DECIMAL(4,2)) → scale 4."""
    return F.col(price).cast("decimal(12,2)") * (F.lit(1) - F.col(disc).cast("decimal(4,2)"))


def _charge(price: str, disc: str, tax: str):
    """Exact charge: discounted price * (1 + tax) → scale 6."""
    return _dp(price, disc) * (F.lit(1) + F.col(tax).cast("decimal(4,2)"))


# DuckDB-side twins of _dp/_charge (same exact-decimal pipeline).
_SQL_DP = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
_SQL_CHARGE = f"{_SQL_DP} * (1 + CAST(l_tax AS DECIMAL(4,2)))"


# ---------------------------------------------------------------------------
# Flagship: pricing summary (grouped agg over the big fact — the shape the
# reference's sensor analytics implies; TPC-H Q1 dialect on our star schema).
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_SQL_DP}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_SQL_CHARGE}) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base_price"),
            F.sum(_dp("l_extendedprice", "l_discount")).cast("double").alias("sum_disc_price"),
            F.sum(_charge("l_extendedprice", "l_discount", "l_tax")).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(8,2)")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projections (reference: SELECT * Readme.md:112; qualified reorder
# tutorial/guide.md:130-136; alias tutorial/guide.md:90).
# ---------------------------------------------------------------------------
@query("q02_project_all", oracle="SELECT * FROM region")
def q02_project_all(spark, sf_dir):
    return T(spark, sf_dir, "region").select("*")


@query(
    "q03_project_reorder",
    oracle="""
    SELECT l.l_orderkey AS orderkey, l.l_linenumber AS linenumber,
           s.s_name AS supp_name, l.l_quantity AS quantity, s.s_nationkey AS supp_nation
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE l.l_linenumber = 1
    """,
)
def q03_project_reorder(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").alias("l")
    s = T(spark, sf_dir, "supplier").alias("s")
    # Qualified refs + reorder across the join, as tutorial/guide.md:130-136.
    return (
        l.filter(F.col("l_linenumber") == 1)
        .join(F.broadcast(s), F.col("l.l_suppkey") == F.col("s.s_suppkey"))
        .select(
            F.col("l.l_orderkey").alias("orderkey"),
            F.col("l.l_linenumber").alias("linenumber"),
            F.col("s.s_name").alias("supp_name"),
            F.col("l.l_quantity").alias("quantity"),
            F.col("s.s_nationkey").alias("supp_nation"),
        )
    )


@query("q04_count_alias", oracle="SELECT COUNT(*) AS total_suppliers FROM supplier")
def q04_count_alias(spark, sf_dir):
    # tutorial/guide.md:90: COUNT(*) AS total_sensor_information
    return T(spark, sf_dir, "supplier").agg(F.count("*").alias("total_suppliers"))


# ---------------------------------------------------------------------------
# Filters / predicates (declared surface — SURVEY.md §2.2).
# ---------------------------------------------------------------------------
@query(
    "q05_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity < 25
    """,
)
def q05_filter_range(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_quantity") < 25)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "q06_filter_in_or",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND (o_orderpriority = '1-URGENT' OR o_totalprice > 150000.0)
    """,
)
def q06_filter_in_or(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & ((F.col("o_orderpriority") == "1-URGENT") | (F.col("o_totalprice") > 150000.0))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q07_computed_column",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_SQL_DP} AS DOUBLE) AS disc_price,
           CAST({_SQL_CHARGE} AS DOUBLE) AS charge
    FROM lineitem WHERE l_quantity >= 49
    """,
)
def q07_computed_column(spark, sf_dir):
    # Generated-column analog of event_time AS PROCTIME() (tutorial/guide.md:26),
    # using deterministic arithmetic instead of a clock.
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        _dp("l_extendedprice", "l_discount").cast("double").alias("disc_price"),
        _charge("l_extendedprice", "l_discount", "l_tax").cast("double").alias("charge"),
    )


# ---------------------------------------------------------------------------
# Joins (reference: inner equi-join core of the lookup join,
# tutorial/guide.md:137-140; left/semi/anti declared — they express the
# lookup_miss retry semantics, tutorial/guide.md:124).
# ---------------------------------------------------------------------------
@query(
    "q08_join_inner_broadcast",
    oracle="""
    SELECT s.s_name AS supp_name,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
)
def q08_join_inner_broadcast(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    # The 10-row (1000 at reference scale) dim is a natural broadcast:
    # no shuffle of the big fact side, exactly like Flink's lookup join
    # keeps the stream side unshuffled (tutorial/guide.md:119-141).
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("revenue"),
        )
    )


@query(
    "q09_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q09_join_left(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(_DEC)), F.lit(0).cast(_DEC)).cast("double").alias("total_spend"),
        )
    )


@query(
    "q10_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def q10_join_semi(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q11_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def q11_join_anti(spark, sf_dir):
    # Identifies "lookup misses" — the rows the reference's retry
    # predicate targets (tutorial/guide.md:124). Filtered to urgent
    # orders so the result is non-empty at every sf (a 0-row result
    # would make the oracle comparison vacuous).
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q12_join_multi_chain",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q12_join_multi_chain(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (reference: global COUNT(*) tutorial/guide.md:53,90-96;
# grouped/distinct declared — SURVEY.md §2.4).
# ---------------------------------------------------------------------------
@query(
    "q13_agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def q13_agg_global(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return l.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("total_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@query(
    "q14_agg_grouped",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q14_agg_grouped(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
        (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.count("*")).alias("avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "q15_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def q15_agg_distinct(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "q16_agg_approx_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS orders_within_bound,
           TRUE AS parts_within_bound
    FROM lineitem
    """,
)
def q16_agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct — declared in SURVEY.md §2.4. The raw HLL
    sketch estimate differs across engines by design, so the ORACLED
    output is (exact counts, |approx − exact| ≤ 0.05·exact booleans):
    DuckDB computes the exact side and literal TRUEs, making the entry
    hash-checkable without pretending sketch internals match (round-4
    verdict ask #2; rsd=0.02 → the 5% bound is ±2.5 sigma). The approx
    values themselves stay bounded by
    tests/test_extensions.py::test_q16_approx_distinct_within_error_bound."""
    l = T(spark, sf_dir, "lineitem")
    agg = l.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("__approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("__approx_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.lit(0.05) * F.col(e)
    )
    return agg.select(
        "exact_orders",
        "exact_parts",
        within("__approx_orders", "exact_orders").alias("orders_within_bound"),
        within("__approx_parts", "exact_parts").alias("parts_within_bound"),
    )


@query(
    "q17_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q17_rollup(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k / ranking windows (SURVEY.md §2.5-2.6;
# LIMIT Readme.md:112,160; row_number = the PK-upsert merge semantic,
# tutorial/guide.md:65 + min_sequence_number tutorial/guide.md:206).
# ---------------------------------------------------------------------------
@query(
    "q18_topk_orderby",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def q18_topk_orderby(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    # TakeOrderedAndProject: per-partition top-k then driver merge of k
    # candidates — no global sort shuffle even at 100 TB.
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q19_window_rank_merge",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
    WHERE rn = 1
    """,
)
def q19_window_rank_merge(spark, sf_dir):
    """The engine's PK-upsert merge-on-read: latest row per key, ordered
    by (sequence, tiebreak) — exactly how sensor_info's last-write-wins
    merge works (tutorial/guide.md:65,206)."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@query(
    "q20_window_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
    FROM orders
    """,
)
def q20_window_lag(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


# ---------------------------------------------------------------------------
# Set operations (UNION ALL — multi-source ingestion composition,
# SURVEY.md §2.7).
# ---------------------------------------------------------------------------
@query(
    "q21_union_all",
    oracle="""
    SELECT o_orderkey AS k, 'high' AS bucket FROM orders WHERE o_totalprice > 200000.0
    UNION ALL
    SELECT o_orderkey AS k, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q21_union_all(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") > 200000.0).select(
        F.col("o_orderkey").alias("k"), F.lit("high").alias("bucket")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k"), F.lit("urgent").alias("bucket")
    )
    return high.unionByName(urgent)


# ---------------------------------------------------------------------------
# Scalar function pack (SURVEY.md §2.8) + JSON extension surface (§2.11).
# ---------------------------------------------------------------------------
@query(
    "q22_scalar_string",
    oracle="""
    SELECT c_custkey,
           LOWER(c_name) AS name_lower,
           UPPER(c_mktsegment) AS seg_upper,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           CONCAT(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS tagged
    FROM customer
    """,
)
def q22_scalar_string(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")).alias("tagged"),
    )


@query(
    "q23_scalar_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS qty_class,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def q23_scalar_conditional(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_class"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("flag_or_none"),
    )


@query(
    "q24_scalar_datetime",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def q24_scalar_datetime(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("revenue"),
        )
    )


@query(
    "q25_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q25_json_extract(spark, sf_dir):
    # §2.11 JSON surface: events.props is a JSON string (TESTDATA.md).
    # JSON parsing is the row-local hot loop; fan_out is cost-gated
    # (fires only when the single-task input is large enough that the
    # parse outweighs a shuffle — VERDICT r2 #3), and the projection is
    # slimmed FIRST so a firing shuffle moves only the two live columns.
    from advent_of_code_flink_paimon_spark.operators.registry import fan_out

    e = fan_out(T(spark, sf_dir, "events").select("event_type", "props"))
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q26_distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q26_distinct_rows(spark, sf_dir):
    return T(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "q27_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def q27_having(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "q28_enrichment_join",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS order_year,
           CAST(SUM({_SQL_DP}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT)
    """,
)
def q28_enrichment_join(spark, sf_dir):
    """The tutorial's enrichment pipeline shape (tutorial/guide.md:119-141)
    as a batch query: fact stream enriched through a dimension chain,
    then rolled up.

    lineitem is PRE-AGGREGATED to (orderkey, revenue) before the join —
    a partial-agg pushdown Catalyst won't do itself. At 100 TB neither
    fact table broadcasts, so the l⋈o shuffle is the bottleneck; the
    pre-agg cuts its left side to two slim pre-reduced columns (~4×
    fewer rows, ~10× fewer bytes). Small dims still broadcast."""
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    lrev = l.groupBy("l_orderkey").agg(F.sum(_dp("l_extendedprice", "l_discount")).alias("rev"))
    return (
        lrev.join(o, lrev.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"), F.year("o_orderdate").alias("order_year"))
        .agg(F.sum("rev").cast("double").alias("revenue"))
    )


@query(
    "q35_scalar_subquery",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice AS retail
    FROM part
    WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM part)
    ORDER BY p_partkey
    """,
)
def q35_scalar_subquery(spark, sf_dir):
    """Scalar-subquery filter (price above global mean). The subquery
    aggregates to ONE row → broadcast as a literal-like join: Catalyst
    plans a 1-row broadcast, the fact scan streams once. The threshold
    avg is computed as exact-decimal SUM cast to double over COUNT so
    both engines compare against the identical double; `retail` is the
    raw parquet double (bit-identical passthrough)."""
    p = T(spark, sf_dir, "part")
    gavg = p.agg(
        (F.sum(F.col("p_retailprice").cast(_DEC)).cast("double") / F.count("*")).alias("__avg")
    )
    return (
        p.join(F.broadcast(gavg))
        .filter(F.col("p_retailprice") > F.col("__avg"))
        .select("p_partkey", "p_name", F.col("p_retailprice").alias("retail"))
        .orderBy("p_partkey")
    )


@query(
    "q36_correlated_exists",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    ORDER BY o.o_orderkey
    """,
)
def q36_correlated_exists(spark, sf_dir):
    """Correlated EXISTS with an inner predicate → left-semi join with the
    predicate pushed below the join (filter before shuffle: only
    qualifying lineitems move)."""
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "q37_below_group_avg",
    oracle="""
    WITH pa AS (
        SELECT l_partkey, AVG(l_quantity) AS aq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey, COUNT(*) AS n_small,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.5 * pa.aq
    GROUP BY l.l_partkey
    """,
)
def q37_below_group_avg(spark, sf_dir):
    """TPC-H Q17 shape: rows below half their group's average — the
    decorrelated per-group-aggregate compare. One window pass over a
    single hash partitioning (no self-join): the same exchange serves
    the avg window, the filter, and the final agg. The 0.5·avg threshold
    never ties (quantities are integral halves at worst), so double avg
    is safe."""
    l = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        l.withColumn("__aq", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("__aq"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
    )


@query(
    "q38_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q38_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics) — SURVEY.md §2.7 set-op surface.
    Nations that have both customers and suppliers. Catalyst plans this
    as a left-semi join over distinct keys; both sides aggregate to
    ~25 rows before the join, so at 100 TB the exchange carries only
    distinct nationkeys (partial agg pushes below the shuffle)."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q39_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q39_except(spark, sf_dir):
    """EXCEPT (distinct semantics) — customers with an urgent order but
    no finished order. Left-anti join over pre-aggregated distinct keys;
    both filters push into the parquet scan of the same file."""
    o = T(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.subtract(finished)


@query(
    "q40_pivot",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
           COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
    FROM orders GROUP BY o_orderstatus
    """,
)
def q40_pivot(spark, sf_dir):
    """PIVOT: order counts by status × priority, compiled directly to
    conditional aggregates. Equivalent to
    ``groupBy(status).pivot(priority, values).count()`` but one pass:
    ``.pivot`` plans a two-phase aggregate (pre-agg on (status,
    priority) → exchange → pivotfirst → second exchange); conditional
    counts need a single partial+final agg and one exchange. Explicit
    value list either way — value discovery would scan the fact table
    twice at 100 TB."""
    o = T(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return o.groupBy("o_orderstatus").agg(
        *[
            F.count(F.when(F.col("o_orderpriority") == p, F.lit(1))).alias(p)
            for p in prios
        ]
    )


@query(
    "q47_not_in_null_aware",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_nationkey NOT IN (
        SELECT s_nationkey FROM supplier WHERE s_acctbal > 9700.0
    )
    ORDER BY c_custkey
    """,
)
def q47_not_in_null_aware(spark, sf_dir):
    """NOT IN over a subquery — ANSI null-aware anti-join semantics
    (distinct from q11's NOT EXISTS → plain left-anti): if the subquery
    produced any NULL, NOT IN yields no rows at all, so Catalyst plans
    a null-aware anti join that must check the whole build side for
    NULLs before rejecting probe rows. Expressed through Spark SQL (the
    DataFrame API has no null-aware anti join operator)."""
    T(spark, sf_dir, "customer").createOrReplaceTempView("__q47_customer")
    T(spark, sf_dir, "supplier").createOrReplaceTempView("__q47_supplier")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey
        FROM __q47_customer
        WHERE c_nationkey NOT IN (
            SELECT s_nationkey FROM __q47_supplier WHERE s_acctbal > 9700.0
        )
        ORDER BY c_custkey
        """
    )


_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

@query(
    "q46_unpivot",
    oracle=f"""
    WITH p AS (
        SELECT o_orderstatus,
               {', '.join(f'''COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS "{p}"''' for p in _PRIOS)}
        FROM orders GROUP BY o_orderstatus
    )
    {' UNION ALL '.join(f'''SELECT o_orderstatus, '{p}' AS priority, "{p}" AS n FROM p''' for p in _PRIOS)}
    """,
)
def q46_unpivot(spark, sf_dir):
    """UNPIVOT (melt) — the inverse of q40's pivot, completing the
    reshaping pair (SURVEY.md §2.5): wide per-priority count columns
    back to (status, priority, n) rows. Spark's native `unpivot`
    compiles to a generate/expand over the 3-row pivoted frame — the
    expensive part remains the single partial+final agg that built it;
    the reshape itself is row-local and free at any scale."""
    o = T(spark, sf_dir, "orders")
    pivoted = o.groupBy("o_orderstatus").agg(
        *[
            F.count(F.when(F.col("o_orderpriority") == p, F.lit(1))).alias(p)
            for p in _PRIOS
        ]
    )
    return pivoted.unpivot(["o_orderstatus"], _PRIOS, "priority", "n")


@query(
    "q41_window_frames",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity,
                        l_extendedprice, l_discount, l_tax, l_returnflag,
                        l_linestatus, l_shipdate
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_suppkey ORDER BY l_orderkey
               RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_qty
    FROM lineitem
    """,
)
def q41_window_frames(spark, sf_dir):
    """Explicit ROWS + RANGE frames (moving sums per supplier) —
    SURVEY.md §2.5 analytic-window surface. (l_orderkey, l_linenumber)
    is NOT unique in the synthetic data, so the ROWS frame orders by the
    full column tuple: exact-duplicate rows are interchangeable and the
    output multiset is deterministic. The RANGE frame includes all order
    peers, so a single sort key suffices. Decimal cast before the frame
    sum keeps both engines exact; one hash exchange on l_suppkey serves
    both windows (two sorts, same partitioning)."""
    l = T(spark, sf_dir, "lineitem")
    w_rows = (
        Window.partitionBy("l_suppkey")
        .orderBy(
            "l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        )
        .rowsBetween(-3, Window.currentRow)
    )
    w_range = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey")
        .rangeBetween(-10, Window.currentRow)
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.sum(F.col("l_quantity").cast(_DEC)).over(w_rows).cast("double").alias("mov_qty"),
        F.sum(F.col("l_quantity").cast(_DEC)).over(w_range).cast("double").alias("range_qty"),
    )


@query(
    "q42_listagg",
    oracle="""
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q42_listagg(spark, sf_dir):
    """LISTAGG/STRING_AGG (the Flink spelling the dialect bridge maps,
    functions/scalar.py) — deterministic via explicit element sort.
    collect_list is partial-aggregated per partition; the sort happens
    on the ~5 grouped rows, not the input."""
    n = T(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "q43_ntile_rank_stats",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey), 6) AS pr,
           ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey), 6) AS cd
    FROM customer
    """,
)
def q43_ntile_rank_stats(spark, sf_dir):
    """ntile / percent_rank / cume_dist over a deterministic unique
    ordering — completes the ranking-window family beyond row_number
    (q19). All three share one exchange + one sort on c_mktsegment."""
    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q44_value_windows",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           FIRST_VALUE(c_acctbal) OVER w AS seg_first,
           LAST_VALUE(c_acctbal) OVER
               (PARTITION BY c_mktsegment ORDER BY c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS seg_last,
           NTH_VALUE(c_acctbal, 2) OVER
               (PARTITION BY c_mktsegment ORDER BY c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS seg_second
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey)
    """,
)
def q44_value_windows(spark, sf_dir):
    """first_value / last_value / nth_value over a deterministic unique
    ordering (c_custkey) — the value-picking window family. last/nth use
    the full-partition frame (the default running frame would make
    last_value ≡ current row). All three share one exchange + sort on
    c_mktsegment."""
    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.first("c_acctbal").over(w).alias("seg_first"),
        F.last("c_acctbal").over(w_full).alias("seg_last"),
        F.nth_value("c_acctbal", 2).over(w_full).alias("seg_second"),
    )


@query(
    "q45_posexplode",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 100
    """,
)
def q45_posexplode(spark, sf_dir):
    """Lateral array explode with ordinality (posexplode) — the
    table-function surface (UNNEST WITH ORDINALITY / Flink's CROSS JOIN
    UNNEST). Generate semantics: one scan task explodes row-locally, no
    shuffle at all; the doc_id predicate pushes into the parquet scan."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


# ---------------------------------------------------------------------------
# Driver-window policy (round 8; policy introduced round 7): the scored
# registry is capped at 100 entries by the 50-per-round window ×
# ≤1-round evidence freshness. q02/q03/q04 (demoted round 7) stay in
# the library; q20/q21/q22/q26 — single-function analytic-lag,
# UNION ALL, scalar-string and row-distinct queries whose operator
# classes remain driver-evidenced by q41/q43/q44 (windows), q38/q39
# (set ops), q23 (scalar pack) and q15 (distinct aggregation) — yield
# their slots this round to x49/x63 (code on their paths changed, must
# re-score) and the new x64/x65/x66 (persisted IVF-index lifecycle,
# Gopher rule report, IVF-ADC composition over both stored indexes).
# All demoted entries remain full oracle-gated operators through the
# local strict harness, which iterates LIBRARY_QUERIES too.
# ---------------------------------------------------------------------------
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote

for _name in (
    "q02_project_all", "q03_project_reorder", "q04_count_alias",
    "q20_window_lag", "q21_union_all", "q22_scalar_string",
    "q26_distinct_rows", "q45_posexplode", "q46_unpivot",
):
    _demote(_name)
del _demote, _name


# ---------------------------------------------------------------------------
# q49: GROUPING SETS — the general form rollup (q17) and cube (q32) are
# sugar for: an explicit, non-hierarchical list of grouping combinations
# in ONE pass (here: by-returnflag, by-linestatus, and the grand total —
# a set no ROLLUP/CUBE nesting produces). grouping_id() disambiguates
# the null-as-aggregated rows exactly as in q17/q32.
# ---------------------------------------------------------------------------
@query(
    "q49_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q49_grouping_sets(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return (
        l.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.count("*").alias("n_rows"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


# q49 ships library-gated: the round's 50-entry scored window is full;
# the strict local harness oracles it and it swaps into the registry
# when a slot opens (the x62/x69/x70 path).
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote2  # noqa: E402

_demote2("q49_grouping_sets")
del _demote2


# ----------------------------------------------------------------------
# q50: forward-fill via IGNORE NULLS value windows — the gap-filling
# idiom (carry the last observed value forward): here, "the most
# recent purchase amount as of each event, per user". Exercises the
# IGNORE NULLS window modifier q44's value windows don't.
# ----------------------------------------------------------------------


@query(
    "q50_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
    FROM events
    """,
)
def q50_forward_fill(spark, sf_dir):
    """Per-user forward fill: the last non-null purchase amount as of
    each event (NULL until the user's first purchase). One exchange on
    user_id; the fill is a running last_value(ignorenulls) frame —
    no self-join, no correlated subquery. The nullable expression is
    derived in-query (purchases carry their value, other events NULL),
    so the IGNORE NULLS semantics are genuinely exercised."""
    e = T(spark, sf_dir, "events")
    x = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.last(x, ignorenulls=True).over(w).alias("last_purchase"),
    )


# ----------------------------------------------------------------------
# q51: arg-max aggregation (max_by) — top-1-per-group WITHOUT a window
# sort: the single-pass partial-aggregable form (Spark's max_by /
# DuckDB's arg_max), with an integer-exact composite ordering key so
# acctbal ties can't make the winner engine-dependent.
# ----------------------------------------------------------------------


@query(
    "q51_argmax_per_group",
    oracle="""
    SELECT c_nationkey,
           arg_max(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS top_customer,
           CAST(MAX(CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS BIGINT) AS ord_key
    FROM customer GROUP BY c_nationkey
    """,
)
def q51_argmax_per_group(spark, sf_dir):
    """Richest customer per nation via max_by — the aggregation-form
    top-1 that partial-aggregates map-side (each partition keeps one
    candidate per group) instead of window-sorting every row. The
    ordering key is exact integer arithmetic (cents · 1e6 + custkey),
    so ties are impossible and both engines pick the same winner."""
    c = T(spark, sf_dir, "customer")
    key = F.round(F.col("c_acctbal") * 100, 0).cast("long") * 1000000 + F.col("c_custkey")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", key).alias("top_customer"),
        F.max(key).cast("long").alias("ord_key"),
    )


# q50/q51 ship library-gated like q49 (window and registry at cap).
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote3  # noqa: E402

_demote3("q50_forward_fill")
_demote3("q51_argmax_per_group")
del _demote3


# ----------------------------------------------------------------------
# q52: correlation from sufficient statistics — the stats-aggregate
# surface (CORR / COVAR_POP) done the engine-portable way: built-in
# CORR implementations differ across engines (Welford vs naive
# accumulation ⇒ different last-ulp results), so the query aggregates
# the EXACT decimal sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
# and evaluates the closed form in identical IEEE steps on both sides.
# This is also the partial-aggregable form a 100 TB corr actually
# uses: six map-side-combinable sums, one final scalar expression.
# ----------------------------------------------------------------------


@query(
    "q52_corr_stats",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy) / (n * (n - 1)), 4) AS covar_samp,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr
    FROM s
    """,
)
def q52_corr_stats(spark, sf_dir):
    """Per-returnflag sample covariance and Pearson correlation of
    (quantity, extendedprice) from exact decimal sufficient statistics
    — six partial-aggregable sums, identical closed-form IEEE
    evaluation on both engines, rounded before output."""
    l = T(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(_DEC)
    y = F.col("l_extendedprice").cast(_DEC)
    s = l.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "l_returnflag",
        "n",
        F.round(num / (F.col("n") * (F.col("n") - 1)), 4).alias("covar_samp"),
        F.round(
            num
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("corr"),
    )


# q52 ships library-gated like q49-q51 (window and registry at cap).
# (q52 promoted to the scored registry in round 12 — VERDICT r11 ask #1)


# ----------------------------------------------------------------------
# q53: equi-width histogram — binning via explicit floor arithmetic
# (width_bucket is not portable: DuckDB lacks it): two-pass shape — an
# exact-decimal min/max subquery broadcast into a map-side bin
# projection, then one count agg on the bin id. The standard
# distribution-profiling query.
# ----------------------------------------------------------------------

_HIST_BINS = 20


@query(
    "q53_histogram",
    oracle=f"""
    WITH b AS (
        SELECT CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
               CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
        FROM lineitem
    ),
    binned AS (
        SELECT LEAST(CAST(floor((CAST(l_extendedprice AS DECIMAL(18,2)) - b.lo)
                                * {_HIST_BINS} / (b.hi - b.lo)) AS BIGINT),
                     {_HIST_BINS - 1}) AS bin,
               b.lo, b.hi
        FROM lineitem CROSS JOIN b
    )
    SELECT bin,
           ROUND(lo + bin * (hi - lo) / {_HIST_BINS}, 4) AS bin_lo,
           ROUND(lo + (bin + 1) * (hi - lo) / {_HIST_BINS}, 4) AS bin_hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM binned GROUP BY bin, lo, hi
    """,
)
def q53_histogram(spark, sf_dir):
    """20-bin equi-width histogram of extended price: exact decimal
    min/max (1-row broadcast), map-side floor binning with the top
    edge clamped into the last bin, one count agg. Bin boundaries and
    the bin id derive from identical doubles on both engines (decimal
    min/max cast once), so the histogram is engine-identical."""
    l = T(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast(_DEC)
    b = l.agg(
        F.min(x).cast("double").alias("lo"), F.max(x).cast("double").alias("hi")
    )
    binned = l.crossJoin(F.broadcast(b)).select(
        F.least(
            F.floor(
                (x.cast("double") - F.col("lo"))
                * _HIST_BINS
                / (F.col("hi") - F.col("lo"))
            ).cast("long"),
            F.lit(_HIST_BINS - 1),
        ).alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("bin", "lo", "hi").agg(
        F.count("*").cast("long").alias("n")
    ).select(
        "bin",
        F.round(F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo")) / _HIST_BINS, 4).alias("bin_lo"),
        F.round(F.col("lo") + (F.col("bin") + 1) * (F.col("hi") - F.col("lo")) / _HIST_BINS, 4).alias("bin_hi"),
        "n",
    )


# q53 ships library-gated like q49-q52.
# (q53 promoted to the scored registry in round 12 — VERDICT r11 ask #1)


# ----------------------------------------------------------------------
# Round-10 window rotation (VERDICT.md r9 ask #1): the registry is
# capped at 100 entries by the ≤1-round driver-evidence freshness
# budget. Five long-stable relational entries (driver-green every
# round since round 3, code untouched since) yield their slots to the
# promoted round-9 library operators (x81/x82/x84/x85) and the two
# new round-10 entries (x90 candidate-restricted embedding dedup,
# x91 approx-percentiles). They stay strict-oracle-gated by the local
# harness (tests/test_relational_oracle.py iterates the library dicts
# too) and can rotate back whenever a slot opens.
# ----------------------------------------------------------------------
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote6  # noqa: E402

for _name in (
    "q23_scalar_conditional",
    "q25_json_extract",
    "q38_intersect",
    "q39_except",
    "q40_pivot",
):
    _demote6(_name)
del _demote6, _name


# ----------------------------------------------------------------------
# q54: linear-regression aggregate family (VERDICT.md r9 ask #8) —
# regr_slope / regr_intercept / regr_r2 / stddev_samp re-expressed from
# the SAME exact decimal sufficient statistics q52 established
# (n, Σx, Σy, Σxy, Σx², Σy²): native regr_* would evaluate in
# engine-specific accumulation orders (Spark's Welford-style updates vs
# DuckDB's), so the portable form aggregates exact decimals and runs
# ONE closed-form IEEE evaluation per group on both engines. Still a
# single partial-aggregable pass — the 100 TB shape is identical to
# any grouped SUM.
# ----------------------------------------------------------------------


@query(
    "q54_regr_stats",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS regr_slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS regr_intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS regr_r2,
           ROUND(sqrt((n * sxx - sx * sx) / (n * (n - 1.0))), 4) AS stddev_x,
           ROUND(sqrt((n * syy - sy * sy) / (n * (n - 1.0))), 4) AS stddev_y
    FROM s
    """,
)
def q54_regr_stats(spark, sf_dir):
    """Per-returnflag OLS fit of extendedprice on quantity plus sample
    standard deviations — slope, intercept, R², stddev_samp — all from
    the q52 six-sum sufficient statistics, identical closed-form IEEE
    evaluation on both engines, rounded before output."""
    l = T(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(_DEC)
    y = F.col("l_extendedprice").cast(_DEC)
    s = l.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = n * sxy - sx * sy
    vxx = n * sxx - sx * sx
    vyy = n * syy - sy * sy
    slope = num / vxx
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("regr_slope"),
        F.round((sy - slope * sx) / n, 4).alias("regr_intercept"),
        F.round((num * num) / (vxx * vyy), 6).alias("regr_r2"),
        F.round(F.sqrt(vxx / (n * (n - F.lit(1.0)))), 4).alias("stddev_x"),
        F.round(F.sqrt(vyy / (n * (n - F.lit(1.0)))), 4).alias("stddev_y"),
    )


# q54 ships library-gated like q49-q53 (the scored window is full).
# (q54 promoted to the scored registry in round 12 — VERDICT r11 ask #1)


# ----------------------------------------------------------------------
# Round-11 window rotation (VERDICT r10 ask #1): fifteen long-stable
# relational entries — simple filters, the join ladder, the grouped-agg
# ladder, rollup, one scalar battery and HAVING — yield their driver
# slots to the promoted library operators (x73/x74/x76–x80, x86–x89,
# x92, x94, x95) and the new x96 LSH-index health report. All fifteen
# remain full oracle-gated operators through the strict local harness
# (tests/test_relational_oracle.py iterates the library dicts) and can
# rotate back whenever a slot opens; their driver evidence is green in
# CORRECTNESS_r09 (scored) and they were unchanged since.
# ----------------------------------------------------------------------
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote8  # noqa: E402

for _name in (
    "q05_filter_range", "q06_filter_in_or", "q07_computed_column",
    "q08_join_inner_broadcast", "q09_join_left", "q10_join_semi",
    "q11_join_anti", "q12_join_multi_chain", "q13_agg_global",
    "q14_agg_grouped", "q15_agg_distinct", "q16_agg_approx_distinct",
    "q17_rollup", "q24_scalar_datetime", "q27_having",
):
    _demote8(_name)
del _demote8, _name


# ----------------------------------------------------------------------
# Round-12 window rotation (VERDICT r11 ask #1): five long-stable
# sort/window entries — top-k ORDER BY, frames, LISTAGG, ntile/rank
# stats, value windows (driver-green in CORRECTNESS_r10, unchanged
# since) — yield their driver slots to the promoted stats pack
# (q52–q54), x83 dedup-method-agreement, and the new x98 IVF list
# health report. The windows family keeps q19 (ranking PK-merge) and
# q48 (time-range frame) in the scored window; all five demoted
# entries remain full oracle-gated operators through the strict local
# harness and rotate back whenever a slot opens.
# ----------------------------------------------------------------------
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote12  # noqa: E402

for _name in (
    "q18_topk_orderby", "q41_window_frames", "q42_listagg",
    "q43_ntile_rank_stats", "q44_value_windows",
):
    _demote12(_name)
del _demote12, _name


# ----------------------------------------------------------------------
# x100: join-key skew card — the salting / AQE-skew-join decision input
# for §2.3's join family: the hottest keys of a join column, their
# corpus share, and their occupancy-vs-mean ratio. A key whose
# skew_ratio runs far above 1 is the partition a shuffle join
# serializes on at cluster scale (the classic straggler); the card is
# what you read BEFORE choosing a salting factor or trusting
# spark.sql.adaptive.skewJoin thresholds. One map-side-combinable
# count exchange + a 1-row total broadcast + top-k
# (TakeOrderedAndProject — never a full sort); exact integer
# arithmetic throughout, ties broken by key.
# ----------------------------------------------------------------------


@query(
    "x100_join_key_skew",
    oracle="""
    WITH c AS (
        SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM c
    )
    SELECT c.key, c.cnt,
           ROUND(CAST(c.cnt AS DOUBLE) / tot.total, 6) AS share,
           ROUND(CAST(c.cnt * tot.n_keys AS DOUBLE) / tot.total, 6) AS skew_ratio
    FROM c, tot
    ORDER BY c.cnt DESC, c.key ASC
    LIMIT 10
    """,
)
def x100_join_key_skew(spark, sf_dir):
    """Top-10 hottest l_partkey values (the lineitem↔part join key)
    with share and occupancy-vs-mean skew ratio."""
    l = T(spark, sf_dir, "lineitem")
    c = l.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    tot = c.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_keys"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias("share"),
            F.round(
                (F.col("cnt") * F.col("n_keys")).cast("double") / F.col("total"), 6
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(10)
    )


# Round-13 rotation (VERDICT r12 ask #1): x100 (and x99 in text.py)
# promote from the library into the driver registry; q35 scalar
# subquery yields its slot — the subquery operator class stays
# driver-evidenced by q36 (correlated EXISTS), q37 (below-group-avg
# correlated scalar) and q47 (NOT IN null-aware), and q35 remains full
# oracle-gated through the strict local harness like every demoted
# entry. x42 yields the second slot (sampling.py).
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote13  # noqa: E402

_demote13("q35_scalar_subquery")
del _demote13


# Round-14 rotation (VERDICT r13 ask #1): q53 yields its registry slot
# to a promoted round-13 library card — the stats-aggregate class
# stays driver-scored via q52 (corr/cov/stddev) and q54 (regression),
# and q53 remains full oracle-gated through the strict local harness.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r14r  # noqa: E402

_demote_r14r("q53_histogram")
del _demote_r14r


# ---------------------------------------------------------------------------
# x109: deletion-vector DML lifecycle as an oracled query (VERDICT r13
# ask #8 — the DV/metadata paths were [S]-only; this card gives the
# driver a DuckDB-replayable relation produced by the REAL lakehouse
# DV machinery, the x49/x63 lifecycle-query pattern).
# ---------------------------------------------------------------------------

_SQL_DV_LIFECYCLE = """
WITH live AS (
  SELECT o_orderstatus, o_orderkey, o_totalprice
  FROM orders
  WHERE (o_orderkey % 7 < 2) IS NOT TRUE
    AND (o_orderkey % 7 = 2) IS NOT TRUE
)
SELECT o_orderstatus,
       COUNT(*) AS n_live,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       (SELECT COUNT(*) FROM live) AS meta_count,
       TRUE AS meta_minmax_refused
FROM live
GROUP BY o_orderstatus
"""


@query("x109_dv_delete_lifecycle", oracle=_SQL_DV_LIFECYCLE)
def x109_dv_delete_lifecycle(spark, sf_dir):
    """Deletion-vector merge-on-read lifecycle, oracled end to end:
    orders lands in a DV-enabled lakehouse table as two INTERLEAVED
    appends (every file's o_orderkey range spans the key space, so a
    modulus DELETE can never drop a whole file — both deletes must go
    through positional vectors), two DELETEs STACK vectors on the same
    files, and the returned relation aggregates the MoR read. Two
    metadata claims ride the result where DuckDB can check them:
    ``meta_count`` is metadata_count() — exact through DVs because
    entries re-publish with live record_count — and
    ``meta_minmax_refused`` pins the round-14 refusal (footer stats
    predate the vectors; MIN/MAX from metadata would answer from
    deleted rows, so it must fall through to the scan).

    Scale shape: the DV apply is ONE anti-join bounded by total deleted
    rows (size-gated broadcast — lakehouse/table.py); the aggregate is
    a single partial-aggregated exchange on o_orderstatus. Reference
    parity: Paimon 0.9 deletion-vectors surface (SURVEY §2.1)."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("dvlife109", sf_dir), "default")
    t = catalog.create_table(
        "orders_dv",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "deletion-vectors.enabled": "true"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    for r in (0, 1):
        t.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == r))
    t.delete_where(spark, "o_orderkey % 7 < 2")  # vectors on straddling files
    t.delete_where(spark, "o_orderkey % 7 = 2")  # second vector STACKS
    meta = t.metadata_count()
    refused = t.metadata_min_max("min", "o_orderkey") is None
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("meta_count", F.lit(meta).cast("long"))
        .withColumn("meta_minmax_refused", F.lit(bool(refused)))
    )


# x109 ships library-gated (the x101-x108 path): the round-14 scored
# window and the 100-entry registry are full; the strict local harness
# oracles it at every run and it is registry-eligible at the round-15
# rotation.
#
# Round 15: PROMOTED into the scored registry (VERDICT r14 ask #2) —
# the demote call below was removed; x36_chunk_dedup yielded its slot
# (chunk-hash dedup stays driver-scored via x45_substr_dedup and the
# x01/x02 exact-dedup family).


# ---------------------------------------------------------------------------
# x112: bloom-filter file-index lifecycle as an oracled query (VERDICT
# r14 ask #5 — the bloom surface was [S]-only + a PIPELINE_BENCH row;
# this card gives the driver a DuckDB-replayable relation whose point
# reads go through the REAL sidecar machinery, the x109 pattern).
# ---------------------------------------------------------------------------

_SQL_BLOOM_LIFECYCLE = """
WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
ks AS (SELECT DISTINCT (m * i) // 9 AS k FROM mx, range(1, 9) r(i))
SELECT o_orderkey AS probe_key,
       o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS price,
       TRUE AS bloom_effective,
       TRUE AS bloom_scans_minority
FROM orders JOIN ks ON o_orderkey = ks.k
"""


@query("x112_bloom_index_lifecycle", oracle=_SQL_BLOOM_LIFECYCLE)
def x112_bloom_index_lifecycle(spark, sf_dir):
    """Bloom-filter file-index lifecycle, oracled end to end: orders
    lands in a 16-bucket table bucketed BY KEY HASH with
    'file-index.bloom-filter.columns' set, so every data file's
    o_orderkey footer range spans nearly the whole key space — min/max
    stats prune NOTHING for a point predicate, the exact workload the
    sidecar index exists for (lakehouse/table.py bloom block;
    Paimon's file-index.bloom-filter.* surface, SURVEY §2.1).

    Eight deterministic point probes (max_key * i // 9 — the oracle
    recomputes the same set in SQL) each read through ``where=`` so
    the REAL two-phase pruner runs: stats first, bloom sidecars on the
    survivors. Two pruning claims ride every row where DuckDB can
    check them: ``bloom_effective`` pins that the sidecars dropped at
    least one stats-surviving file (a key lives in exactly ONE bucket
    file; the other 15 pass only as fpp=0.05 false positives — failure
    probability 0.05^15) and ``bloom_scans_minority`` that at most
    half the candidates survived (P ~ 2.5e-7). The probe-key max comes
    from metadata_min_max — the metadata fast path, exact on an
    append-only DV-free table.

    Scale shape: each probe scans ONLY bloom-surviving files (~1 of
    16); sidecar evaluation is driver-side here (8 candidates << the
    _BLOOM_DRIVER_PROBE_MAX gate) and moves executor-side above it —
    at 100 TB a point lookup is O(manifest) + one-file I/O, never a
    table scan."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.lakehouse.table import prune_entries
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("bloomlife112", sf_dir), "default")
    t = catalog.create_table(
        "orders_bfx",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {
            "bucket": "16",
            "bucket-key": "o_orderkey",
            "file-index.bloom-filter.columns": "o_orderkey",
        },
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.append(src)
    meta_max = t.metadata_min_max("max", "o_orderkey")
    max_key = (
        int(meta_max[1])
        if meta_max is not None and meta_max[1] is not None
        else int(src.agg(F.max("o_orderkey")).first()[0])  # defensive fall-through
    )
    entries = t.manifest()
    parts = []
    for k in sorted({max_key * i // 9 for i in range(1, 9)}):
        where = f"o_orderkey = {k}"
        n_stats = len(prune_entries(entries, where))
        n_bloom = len(prune_entries(entries, where, root=t.paths.root))
        parts.append(
            t.read(spark, where=where).select(
                F.col("o_orderkey").alias("probe_key"),
                "o_orderstatus",
                F.col("o_totalprice").cast("double").alias("price"),
                F.lit(bool(n_bloom < n_stats)).alias("bloom_effective"),
                F.lit(bool(2 * n_bloom <= n_stats)).alias("bloom_scans_minority"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# x113: branch lifecycle as an oracled query (VERDICT r14 ask #6 —
# create_branch -> branch-only writes -> fast_forward -> main read,
# with the round-14 stream-mirror invariant pinned as a metadata
# column the oracle can check; the x109 metadata-claim trick).
# ---------------------------------------------------------------------------

_SQL_BRANCH_LIFECYCLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       (SELECT COUNT(*) FROM orders) AS mirror_rows,
       TRUE AS divergent_dropped
FROM orders
GROUP BY o_orderstatus
"""


@query("x113_branch_lifecycle", oracle=_SQL_BRANCH_LIFECYCLE)
def x113_branch_lifecycle(spark, sf_dir):
    """Branch lifecycle, oracled end to end: a third of orders lands on
    main, a branch anchors there and takes the other two thirds as two
    branch-only appends, main takes a DIVERGENT append (sentinel
    status 'ZZ'), and fast_forward adopts the branch — rolling the
    divergent commit back and copying the branch chain into main
    (lakehouse/table.py fast_forward; Paimon's fast_forward procedure,
    SURVEY §2.1). The returned relation aggregates the post-adoption
    main read; DuckDB replays it as a plain GROUP BY over ALL of
    orders because the three residue slices exactly tile the table.

    Two invariants ride the result: ``mirror_rows`` counts the rows in
    the stream/ append-log mirror — equal to the full table iff
    fast_forward hard-linked every adopted APPEND file (the round-14
    ADVICE #4 fix) AND the rollback unlinked the divergent commit's
    files; ``divergent_dropped`` pins that no sentinel row survived
    adoption. Scale shape: branching and adoption are O(metadata)
    (files shared by path, snapshot/manifest copies); the final
    aggregate is one partial-aggregated exchange on o_orderstatus."""
    import glob as _glob
    import os as _os

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("branchlife113", sf_dir), "default")
    t = catalog.create_table(
        "orders_br",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "4", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == 0))
    t.create_branch("dev")
    bt = t.use_branch("dev")
    bt.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == 1))
    bt.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == 2))
    # divergent main commit the adoption must roll back
    t.append(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == 1)
        .withColumn("o_orderstatus", F.lit("ZZ"))
    )
    t.fast_forward("dev")
    mirror = sorted(_glob.glob(_os.path.join(t.paths.root, "stream", "*")))
    mirror_rows = spark.read.parquet(*mirror).count() if mirror else 0
    live = t.read(spark)
    divergent_dropped = live.filter(F.col("o_orderstatus") == "ZZ").count() == 0
    return (
        live.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("mirror_rows", F.lit(mirror_rows).cast("long"))
        .withColumn("divergent_dropped", F.lit(bool(divergent_dropped)))
    )


# x112/x113 ship library-gated (the x101-x111 path): the round-15
# scored window and the 100-entry registry are full; the strict local
# harness oracles them at every run and they are first in line at the
# round-16 rotation.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r15  # noqa: E402

_demote_r15("x112_bloom_index_lifecycle")
_demote_r15("x113_branch_lifecycle")
del _demote_r15


# ---------------------------------------------------------------------------
# x114-x118 (round 15): the lifecycle-card family extended to the five
# remaining big [S] lakehouse surfaces — schema evolution, full
# compaction, tags/time-travel/expiry, PK last-write-wins upsert, and
# the aggregation merge engine. Same x109 protocol: the relation is
# produced by the REAL lakehouse machinery and DuckDB replays it from
# the raw table, with metadata claims riding as oracle-checkable
# columns.
# ---------------------------------------------------------------------------

_SQL_SCHEMA_EVOLUTION = """
WITH r AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS status,
         o_totalprice AS price_usd
  FROM orders
)
SELECT COALESCE(status, '<pre-evolution>') AS status,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(price_usd AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS old_files_untouched
FROM r
GROUP BY 1
"""


@query("x114_schema_evolution_lifecycle", oracle=_SQL_SCHEMA_EVOLUTION)
def x114_schema_evolution_lifecycle(spark, sf_dir):
    """Schema evolution end to end, oracled: even orders keys land
    under schema v0 (key, price); ADD COLUMN twice (status + a junk
    column), odd keys land under schema v2; RENAME price -> price_usd;
    DROP the junk column. The read merges all file groups under the
    LATEST schema: v0 files null-fill status (surfaced as
    '<pre-evolution>'), the physical price column resolves through the
    rename log, and the dropped column vanishes from the relation even
    though half the files still carry its bytes
    (lakehouse/catalog.py add/rename/drop_column; Paimon schema-N
    evolution, SURVEY §2.1). ``old_files_untouched`` pins the
    no-rewrite contract: every v0 data file is still live after three
    schema commits — evolution is metadata-only at any table size.

    Scale shape: one grouped exchange; schema mapping is per-file-group
    projection, no data movement."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("schemaevo114", sf_dir), "default")
    catalog.create_table(
        "orders_se",
        "o_orderkey long, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders")
    t = catalog.get_table("orders_se")
    t.append(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0)
        .select("o_orderkey", "o_totalprice")
    )
    files_v0 = {e["file_path"] for e in t.manifest()}
    catalog.add_column("orders_se", "o_orderstatus string")
    catalog.add_column("orders_se", "junk long")
    t = catalog.get_table("orders_se")
    t.append(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .withColumn("junk", F.lit(1).cast("long"))
    )
    catalog.rename_column("orders_se", "o_totalprice", "price_usd")
    catalog.drop_column("orders_se", "junk")
    t = catalog.get_table("orders_se")
    untouched = files_v0 <= {e["file_path"] for e in t.manifest()}
    return (
        t.read(spark)
        .groupBy(
            F.coalesce(F.col("o_orderstatus"), F.lit("<pre-evolution>")).alias("status")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("price_usd").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("old_files_untouched", F.lit(bool(untouched)))
    )


_SQL_COMPACTION_LIFECYCLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS compact_reduced_files,
       TRUE AS one_file_per_bucket,
       TRUE AS time_travel_intact
FROM orders
GROUP BY o_orderstatus
"""


@query("x115_compaction_lifecycle", oracle=_SQL_COMPACTION_LIFECYCLE)
def x115_compaction_lifecycle(spark, sf_dir):
    """Full compaction end to end, oracled: orders lands as EIGHT
    separate appends (key % 8 slices) into a 2-bucket table — 16 small
    live files — then ``compact()`` rewrites them to one file per
    bucket in a single COMPACT commit (lakehouse/table.py compact;
    tutorial/guide.md:212-231 full-compaction surface). The relation
    aggregates the post-compaction read; DuckDB replays it over raw
    orders because append-table compaction preserves exact content.
    Three claims ride the result: ``compact_reduced_files`` (live file
    count strictly fell), ``one_file_per_bucket`` (the full-compaction
    contract), and ``time_travel_intact`` — metadata_count at the
    pre-compaction snapshot equals the post-compaction count (both
    metadata-only folds: time travel survives the rewrite because
    COMPACT replaces the manifest, never deletes replaced files while
    their snapshots live).

    Scale shape: compaction is the scan+rewrite it claims to be
    (bounded by live bytes, not history); the aggregate is one
    partial-aggregated exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("compactlife115", sf_dir), "default")
    t = catalog.create_table(
        "orders_ct",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    for r in range(8):
        t.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(8)) == r))
    pre_sid = t.latest_snapshot_id()
    files_before = len(t.manifest())
    t.compact()
    files_after = len(t.manifest())
    tt_intact = t.metadata_count(snapshot_id=pre_sid) == t.metadata_count()
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("compact_reduced_files", F.lit(bool(files_after < files_before)))
        .withColumn("one_file_per_bucket", F.lit(bool(files_after == t.num_buckets)))
        .withColumn("time_travel_intact", F.lit(bool(tt_intact)))
    )


_SQL_TIME_TRAVEL_LIFECYCLE = """
WITH base AS (
  SELECT o_orderstatus, COUNT(*) AS n_base
  FROM orders WHERE o_orderkey % 3 IN (0, 1)
  GROUP BY 1
),
lat AS (
  SELECT o_orderstatus,
         COUNT(*) AS n_latest,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price_latest
  FROM orders WHERE (o_orderkey % 3 = 1) IS NOT TRUE
  GROUP BY 1
)
SELECT b.o_orderstatus, n_base, n_latest, sum_price_latest,
       TRUE AS intermediates_expired
FROM base b JOIN lat l USING (o_orderstatus)
"""


@query("x116_time_travel_lifecycle", oracle=_SQL_TIME_TRAVEL_LIFECYCLE)
def x116_time_travel_lifecycle(spark, sf_dir):
    """Tags + time travel + snapshot expiry end to end, oracled: two
    appends build the base image (key % 3 in (0,1)), tag 'base' pins
    it, a third append and a row-level DELETE move the table on, then
    ``expire_snapshots(retain_max=1)`` drops every snapshot EXCEPT the
    latest and the tagged one (tags are a promise the snapshot stays
    readable — lakehouse/table.py expire_snapshots; Paimon tag
    semantics, SURVEY §2.1). The relation joins the AS-OF-'base' read
    against the latest read per status; DuckDB replays both slices
    from raw orders. ``intermediates_expired`` pins that expiry
    actually ran: exactly two snapshots remain, yet both reads still
    answer — the tagged snapshot's files survived the sweep.

    Scale shape: expiry is a manifest fold + unreferenced-file sweep;
    both reads prune to their snapshot's file lists; one grouped
    exchange each + a tiny status-keyed join."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("ttlife116", sf_dir), "default")
    t = catalog.create_table(
        "orders_tt",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == 0))
    t.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == 1))
    t.create_tag("base")
    t.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == 2))
    t.delete_where(spark, "o_orderkey % 3 = 1")
    t.expire_snapshots(retain_min=1, retain_max=1)
    expired_ok = len(t.snapshots()) == 2
    base = (
        t.read(spark, "base")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_base"))
    )
    lat = (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_latest"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price_latest"),
        )
    )
    return base.join(lat, "o_orderstatus").withColumn(
        "intermediates_expired", F.lit(bool(expired_ok))
    )


_SQL_PK_UPSERT_LWW = """
WITH merged AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 < 2 THEN 'UPD' ELSE o_orderstatus END AS status,
         CASE WHEN o_orderkey % 5 < 2 THEN o_totalprice * 2 ELSE o_totalprice END AS price
  FROM orders
)
SELECT status,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS meta_count_refused
FROM merged
GROUP BY status
"""


@query("x117_pk_upsert_lww", oracle=_SQL_PK_UPSERT_LWW)
def x117_pk_upsert_lww(spark, sf_dir):
    """Primary-key last-write-wins upsert end to end, oracled: all of
    orders lands in a PK table, then a second upsert rewrites the
    key % 5 < 2 slice with doubled price and a sentinel status — the
    merge-on-read image must show EXACTLY the second write for those
    keys and the first for the rest (merge-engine 'deduplicate',
    lakehouse/table.py _merged; the reference's primary-key upsert
    surface, tutorial/guide.md). ``meta_count_refused`` pins the
    companion metadata contract: metadata_count returns None on PK
    tables (per-file record_count over-counts under merge-on-read —
    exact-or-refuse, never guess).

    Scale shape: the upsert shuffles once on the key-hash bucket; the
    merged read is per-bucket ranking over key groups, no global
    exchange; final aggregate is one status-keyed exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("pklww117", sf_dir), "default")
    t = catalog.create_table(
        "orders_pk",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"primary-key": "o_orderkey", "bucket": "4"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.upsert(src)
    t.upsert(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(5)) < 2)
        .withColumn("o_orderstatus", F.lit("UPD"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    refused = t.metadata_count() is None
    return (
        t.read(spark)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("meta_count_refused", F.lit(bool(refused)))
    )


_SQL_AGG_MERGE_ENGINE = """
WITH per_key AS (
  SELECT l_orderkey AS k,
         CAST(SUM(l_quantity) AS DOUBLE) AS qty,
         COUNT(*) AS n
  FROM lineitem
  GROUP BY 1
)
SELECT n AS lines_per_order,
       COUNT(*) AS n_orders,
       CAST(SUM(qty) AS DOUBLE) AS sum_qty
FROM per_key
GROUP BY 1
"""


@query("x118_agg_merge_engine", oracle=_SQL_AGG_MERGE_ENGINE)
def x118_agg_merge_engine(spark, sf_dir):
    """Aggregation merge engine end to end, oracled: lineitem rows
    stream into a PK table keyed on l_orderkey with
    fields.qty.aggregate-function = sum and fields.n.aggregate-function
    = sum, split across two upserts (even/odd l_linenumber) — the
    merged image must hold the PER-KEY running sums folded across
    BOTH commits and within each commit's duplicate keys
    (lakehouse/table.py merge engines; Paimon 'aggregation' merge
    engine, SURVEY §2.1). DuckDB replays the image as a plain GROUP BY
    over raw lineitem (l_quantity is integer-valued, so double
    summation is exact in any order); the returned relation is the
    lines-per-order histogram over the merged table — sensitive to
    every per-key count AND every per-key sum.

    Scale shape: each upsert shuffles once on the key hash; the
    aggregate fold is per-bucket; the histogram is one tiny
    n-keyed exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("aggme118", sf_dir), "default")
    t = catalog.create_table(
        "line_sums",
        "k long, qty double, n long",
        {
            "primary-key": "k",
            "bucket": "4",
            "merge-engine": "aggregation",
            "fields.qty.aggregate-function": "sum",
            "fields.n.aggregate-function": "sum",
        },
    )
    src = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_quantity").cast("double").alias("qty"),
        F.lit(1).cast("long").alias("n"),
        F.col("l_linenumber").alias("ln"),
    )
    for r in (0, 1):
        t.upsert(src.filter(F.pmod(F.col("ln"), F.lit(2)) == r).drop("ln"))
    return (
        t.read(spark)
        .groupBy(F.col("n").alias("lines_per_order"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("qty")).cast("double").alias("sum_qty"),
        )
    )


# x114-x116 ship library-gated (the x101-x113 path): the scored window
# and the 100-entry registry are full; the strict local harness oracles
# them at every run and they queue for the round-18 rotation. x117/x118
# (PK LWW + aggregation merge engine) were PROMOTED into the round-17
# scored window per VERDICT r16 ask #1 — their first driver rows.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r15b  # noqa: E402

for _n in (
    "x114_schema_evolution_lifecycle",
    "x115_compaction_lifecycle",
    "x116_time_travel_lifecycle",
):
    _demote_r15b(_n)
del _demote_r15b, _n


# ---------------------------------------------------------------------------
# x119-x125 (round 15, continuation): lifecycle cards for the rest of
# the §2.1 [S] rows — partitioned tables + metadata partition drop,
# incremental read, the partial-update / first-row merge engines,
# sequence.field ordering, dynamic buckets, and the Flink-dialect SQL
# frontend driven end to end.
# ---------------------------------------------------------------------------

_SQL_PARTITION_LIFECYCLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O') AS meta_count_o,
       TRUE AS drop_was_metadata_only
FROM orders
WHERE o_orderstatus <> 'P'
GROUP BY o_orderstatus
"""


@query("x119_partition_lifecycle", oracle=_SQL_PARTITION_LIFECYCLE)
def x119_partition_lifecycle(spark, sf_dir):
    """Partitioned table end to end, oracled: orders lands partitioned
    by o_orderstatus (Hive-style dirs above the buckets), then the
    whole 'P' partition is DELETEd — a file-level metadata delete: the
    partition value decides every row of every file, so the commit
    drops manifest entries without reading or rewriting anything
    (lakehouse/table.py delete_where split; Paimon drop-partition
    semantics, SURVEY §2.1). Claims riding the relation:
    ``meta_count_o`` answers a partition-predicate COUNT from manifest
    metadata alone (partition values decide whole files — exact), and
    ``drop_was_metadata_only`` pins that the delete created NO new
    files (pure manifest shrink). At 100 TB, dropping a partition or
    counting one is a metadata operation.

    Scale shape: partition pruning at the manifest, one grouped
    exchange for the aggregate."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("partlife119", sf_dir), "default")
    t = catalog.create_table(
        "orders_part",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey", "partition-by": "o_orderstatus"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.append(src)
    files_before = {e["file_path"] for e in t.manifest()}
    t.delete_where(spark, "o_orderstatus = 'P'")
    files_after = {e["file_path"] for e in t.manifest()}
    metadata_only = files_after <= files_before
    meta_o = t.metadata_count(where="o_orderstatus = 'O'")
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("meta_count_o", F.lit(int(meta_o)).cast("long"))
        .withColumn("drop_was_metadata_only", F.lit(bool(metadata_only)))
    )


_SQL_INCREMENTAL_READ = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS delta_manifest_only
FROM orders
WHERE o_orderkey % 2 = 1
GROUP BY o_orderstatus
"""


@query("x120_incremental_read", oracle=_SQL_INCREMENTAL_READ)
def x120_incremental_read(spark, sf_dir):
    """Incremental (between-snapshots) read, oracled: two appends split
    orders by key parity; ``incremental_read(s1, s2)`` must return
    EXACTLY the second batch — the batch equivalent of one streaming
    micro-batch over the snapshot log (lakehouse/table.py
    incremental_read; Paimon's incremental-between surface, SURVEY
    §2.1). ``delta_manifest_only`` pins the hot-path claim: a
    pure-append range is answered from the delta manifests alone —
    O(commits in range) metadata, never an O(table) manifest diff
    (the per-trigger cost model at 100 TB).

    Scale shape: the read lists only the files the range added; one
    grouped exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("incread120", sf_dir), "default")
    t = catalog.create_table(
        "orders_inc",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0))
    s1 = t.latest_snapshot_id()
    t.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1))
    s2 = t.latest_snapshot_id()
    delta_only = t._delta_added_paths(s1, s2) is not None
    return (
        t.incremental_read(spark, s1, s2)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("delta_manifest_only", F.lit(bool(delta_only)))
    )


_SQL_PARTIAL_UPDATE = """
SELECT o_orderkey % 2 AS key_par,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_a,
       CAST(SUM(CASE WHEN o_orderkey % 2 = 0
                     THEN CAST(o_totalprice * 2 AS DECIMAL(18,2)) END)
            AS DOUBLE) AS sum_b
FROM orders
GROUP BY 1
"""


@query("x121_partial_update_merge", oracle=_SQL_PARTIAL_UPDATE)
def x121_partial_update_merge(spark, sf_dir):
    """Partial-update merge engine, oracled: the first upsert writes
    every key with column a = price and b = NULL; the second writes
    ONLY even keys with a = NULL and b = 2*price. Per-column last
    NON-NULL wins (lakehouse/table.py merge engines; Paimon
    'partial-update', SURVEY §2.1): the merged image must keep a from
    write 1 for EVERY key (the second write's NULL a must not clobber
    it) and fill b only for even keys. The parity rollup is sensitive
    to both directions of the rule.

    Scale shape: two key-hash shuffles + per-bucket column fold; one
    tiny parity-keyed exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("partial121", sf_dir), "default")
    t = catalog.create_table(
        "orders_pu",
        "k long, a double, b double",
        {"primary-key": "k", "bucket": "4", "merge-engine": "partial-update"},
    )
    src = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    t.upsert(
        src.select("k", F.col("p").alias("a"), F.lit(None).cast("double").alias("b"))
    )
    t.upsert(
        src.filter(F.pmod(F.col("k"), F.lit(2)) == 0).select(
            "k",
            F.lit(None).cast("double").alias("a"),
            (F.col("p") * 2).alias("b"),
        )
    )
    return (
        t.read(spark)
        .groupBy(F.pmod(F.col("k"), F.lit(2)).alias("key_par"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("a").cast("decimal(18,2)")).cast("double").alias("sum_a"),
            F.sum(F.col("b").cast("decimal(18,2)")).cast("double").alias("sum_b"),
        )
    )


_SQL_FIRST_ROW = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS later_writes_ignored
FROM orders
GROUP BY o_orderstatus
"""


@query("x122_first_row_merge", oracle=_SQL_FIRST_ROW)
def x122_first_row_merge(spark, sf_dir):
    """First-row merge engine, oracled: orders lands once, then a
    second full upsert tries to overwrite every key with a sentinel
    status and doubled price — first write wins, so the merged image
    must be bit-identical to write 1 (lakehouse/table.py merge
    engines; Paimon 'first-row' — the dedup-at-ingest engine for
    exactly-once-ish sources, SURVEY §2.1). ``later_writes_ignored``
    pins that zero sentinel rows survived; the status grouping would
    also surface any leak as an extra group.

    Scale shape: same PK shuffles as x117; the first-row fold keeps
    the minimum sequence per key."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("firstrow122", sf_dir), "default")
    t = catalog.create_table(
        "orders_fr",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"primary-key": "o_orderkey", "bucket": "4", "merge-engine": "first-row"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.upsert(src)
    t.upsert(
        src.withColumn("o_orderstatus", F.lit("ZZZ"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    live = t.read(spark)
    ignored = live.filter(F.col("o_orderstatus") == "ZZZ").count() == 0
    return (
        live.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("later_writes_ignored", F.lit(bool(ignored)))
    )


_SQL_SEQUENCE_FIELD = """
WITH merged AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 3
              ELSE o_totalprice END AS price,
         CASE WHEN o_orderkey % 2 = 0 THEN 2 ELSE 1 END AS seq
  FROM orders
)
SELECT o_orderkey % 2 AS key_par,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(seq) AS BIGINT) AS sum_seq
FROM merged
GROUP BY 1
"""


@query("x123_sequence_field_ordering", oracle=_SQL_SEQUENCE_FIELD)
def x123_sequence_field_ordering(spark, sf_dir):
    """sequence.field ordering, oracled: the FIRST commit writes even
    keys with seq = 2 (and tripled price); the SECOND commit writes
    EVERY key with seq = 1. Event-time ordering must beat commit
    order: the later, lower-seq write LOSES for even keys (their
    merged row keeps seq 2 / price*3) and wins only where it is the
    sole row (odd keys — seq 1 / plain price)
    (lakehouse/table.py sequence.field; Paimon sequence-field
    last-value-by-event-time, SURVEY §2.1). ``sum_seq`` makes the
    per-key winning sequence itself part of the oracle check.

    Scale shape: two key-hash shuffles + per-bucket max-seq fold; one
    parity-keyed exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("seqfield123", sf_dir), "default")
    t = catalog.create_table(
        "orders_sq",
        "o_orderkey long, price double, seq long",
        {"primary-key": "o_orderkey", "bucket": "4", "sequence.field": "seq"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("p")
    )
    t.upsert(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0).select(
            "o_orderkey",
            (F.col("p") * 3).alias("price"),
            F.lit(2).cast("long").alias("seq"),
        )
    )
    t.upsert(
        src.select(
            "o_orderkey",
            F.col("p").alias("price"),
            F.lit(1).cast("long").alias("seq"),
        )
    )
    return (
        t.read(spark)
        .groupBy(F.pmod(F.col("o_orderkey"), F.lit(2)).alias("key_par"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("price").cast("decimal(18,2)")).cast("double").alias("sum_price"),
            F.sum("seq").cast("long").alias("sum_seq"),
        )
    )


_SQL_DYNAMIC_BUCKET = """
WITH merged AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 < 2 THEN 'UPD' ELSE o_orderstatus END AS status,
         CASE WHEN o_orderkey % 5 < 2 THEN o_totalprice * 2 ELSE o_totalprice END AS price
  FROM orders
)
SELECT status,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS index_covers_all_keys
FROM merged
GROUP BY status
"""


@query("x124_dynamic_bucket_upsert", oracle=_SQL_DYNAMIC_BUCKET)
def x124_dynamic_bucket_upsert(spark, sf_dir):
    """Dynamic buckets ('bucket' = '-1'), oracled: the x117 LWW flow
    rerun through the HashBucketAssigner path — keys get buckets from
    the persisted key->bucket index (assigner task t = hash % A owns
    buckets {t, t+A, ...}, filling each to
    dynamic-bucket.target-row-num keys), so the SECOND upsert must
    route every updated key to the bucket the index assigned it in
    write 1, or merge-on-read would see two images in different
    buckets and resurrect the old row (lakehouse/table.py
    _assign_dynamic_buckets; Paimon dynamic bucket mode, SURVEY
    §2.1). ``index_covers_all_keys`` pins the index invariant: one
    index row per distinct key after both writes.

    Scale shape: index routing is a broadcast-or-shuffle join against
    the key index (O(keys) data, never driver state); the merged read
    and aggregate are per-bucket."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("dynbucket124", sf_dir), "default")
    t = catalog.create_table(
        "orders_dyn",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {
            "primary-key": "o_orderkey",
            "bucket": "-1",
            "dynamic-bucket.target-row-num": "4000",
        },
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.upsert(src)
    t.upsert(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(5)) < 2)
        .withColumn("o_orderstatus", F.lit("UPD"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    n_keys = src.select("o_orderkey").distinct().count()
    idx_rows = t._read_index(spark).count()
    return (
        t.read(spark)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("index_covers_all_keys", F.lit(bool(idx_rows == n_keys)))
    )


_SQL_SQL_FRONTEND = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderkey % 4 <> 0
GROUP BY o_orderstatus
"""


@query("x125_sql_frontend_lifecycle", oracle=_SQL_SQL_FRONTEND)
def x125_sql_frontend_lifecycle(spark, sf_dir):
    """The Flink-dialect SQL frontend driven end to end, oracled:
    CREATE TABLE ... WITH (Flink connector-options spelling) ->
    INSERT INTO ... SELECT from a registered source -> row-level
    DELETE -> SELECT aggregate, every statement through ``Engine.sql``
    (plans/frontend.py — the SQL-client role of the reference,
    Readme.md:38-46; statements in the tutorial's own dialect). The
    returned relation is the frontend's SELECT result; DuckDB replays
    the whole statement sequence as one filtered aggregate.

    Scale shape: identical to the underlying table ops — the frontend
    is a statement router, not an execution layer; the SELECT plans
    through the same snapshot read + grouped exchange."""
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.plans import Engine

    eng = Engine(spark, _mhidx_warehouse("sqlfront125", sf_dir), "default")
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    eng.register_source("orders_src", src)
    eng.sql(
        """
        CREATE TABLE orders_sql (
          o_orderkey BIGINT,
          o_orderstatus STRING,
          o_totalprice DOUBLE
        ) WITH ('bucket' = '2', 'bucket-key' = 'o_orderkey')
        """
    )
    eng.sql(
        "INSERT INTO orders_sql "
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_src"
    )
    eng.sql("DELETE FROM orders_sql WHERE o_orderkey % 4 = 0")
    return eng.sql(
        "SELECT o_orderstatus, COUNT(*) AS n_rows, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price "
        "FROM orders_sql GROUP BY o_orderstatus"
    )


# x119/x120/x124/x125 ship library-gated (the x101-x118 path): the
# scored window and the 100-entry registry are full; the strict local
# harness oracles them at every run and they queue for the round-18
# rotation. x121/x122/x123 (partial-update + first-row merge engines,
# sequence.field ordering) were PROMOTED into the round-17 scored
# window per VERDICT r16 ask #1 — their first driver rows.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r15c  # noqa: E402

for _n in (
    "x119_partition_lifecycle",
    "x120_incremental_read",
    "x124_dynamic_bucket_upsert",
    "x125_sql_frontend_lifecycle",
):
    _demote_r15c(_n)
del _demote_r15c, _n


# ---------------------------------------------------------------------------
# x126-x128 (round 15, continuation): ORC format round-trip, consumer
# bookmark lifecycle, and the stored changelog itself as an oracled
# relation.
# ---------------------------------------------------------------------------

_SQL_ORC_ROUNDTRIP = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS format_is_orc
FROM orders
WHERE (o_orderkey % 6 = 3) IS NOT TRUE
GROUP BY o_orderstatus
"""


@query("x126_orc_format_roundtrip", oracle=_SQL_ORC_ROUNDTRIP)
def x126_orc_format_roundtrip(spark, sf_dir):
    """ORC data format end to end, oracled: orders lands in a table
    with 'file.format' = 'orc', takes a row-level DELETE (copy-on-write
    rewrite THROUGH the ORC read/write path — ORC has no footer-stats
    pruning here, so the rewrite must scan-and-split correctly), and
    the aggregate reads back through the same format
    (lakehouse/table.py data_format; tutorial/guide.md:30 'file.format'
    WITH option, SURVEY §2.1). ``format_is_orc`` pins that every live
    data file is actually .orc — the DELETE rewrite may not silently
    fall back to parquet.

    Scale shape: identical plan to the parquet path (format is a scan/
    sink codec choice); one grouped exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("orc126", sf_dir), "default")
    t = catalog.create_table(
        "orders_orc",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey", "file.format": "orc"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.append(src)
    t.delete_where(spark, "o_orderkey % 6 = 3")
    all_orc = all(e["file_path"].endswith(".orc") for e in t.manifest())
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("format_is_orc", F.lit(bool(all_orc)))
    )


_SQL_CONSUMER_LIFECYCLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS consumer_pinned,
       TRUE AS pin_released
FROM orders
WHERE o_orderkey % 3 IN (1, 2)
GROUP BY o_orderstatus
"""


@query("x127_consumer_lifecycle", oracle=_SQL_CONSUMER_LIFECYCLE)
def x127_consumer_lifecycle(spark, sf_dir):
    """Consumer bookmarks end to end, oracled: three appends build the
    table; a registered consumer still needing snapshot 2 PINS
    snapshots {2,3} through an aggressive ``retain_max=1`` expiry
    (``consumer_pinned``: exactly two snapshots survive, snapshot 1
    expires), so the consumer's unread window —
    ``incremental_read(1, 3)``, batches 2+3 — still answers and IS the
    returned relation. The consumer then catches up (re-register
    advances the bookmark — mutable, unlike tags) and the SAME expiry
    now collapses the chain to latest-only (``pin_released``)
    (lakehouse/table.py register_consumer/expire_snapshots; Paimon
    consumer-id surface, tutorial/guide.md scan resume; SURVEY §2.1).
    A stalled subscriber can never lose unread data; a caught-up one
    never blocks retention.

    Scale shape: bookmark ops are O(1) metadata; the ranged read lists
    only the range's files; one grouped exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("consumer127", sf_dir), "default")
    t = catalog.create_table(
        "orders_cons",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    for r in range(3):
        t.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == r))
    t.register_consumer("sub", next_snapshot_id=2)
    t.expire_snapshots(retain_min=1, retain_max=1)
    pinned = len(t.snapshots()) == 2
    out = (
        t.incremental_read(spark, 1, 3)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
    )
    t.register_consumer("sub")  # caught up: bookmark advances past LATEST
    t.expire_snapshots(retain_min=1, retain_max=1)
    released = len(t.snapshots()) == 1
    return out.withColumn("consumer_pinned", F.lit(bool(pinned))).withColumn(
        "pin_released", F.lit(bool(released))
    )


_SQL_CHANGELOG_RELATION = """
SELECT '+I' AS change_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
FROM orders
UNION ALL
SELECT '-U', COUNT(*),
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM orders WHERE o_orderkey % 4 = 0
UNION ALL
SELECT '+U', COUNT(*),
       CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(18,2))) AS DOUBLE)
FROM orders WHERE o_orderkey % 4 = 0
UNION ALL
SELECT '-D', COUNT(*),
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM orders WHERE o_orderkey % 4 = 1
"""


@query("x128_changelog_relation", oracle=_SQL_CHANGELOG_RELATION)
def x128_changelog_relation(spark, sf_dir):
    """The stored changelog itself as an oracled relation
    (changelog-producer=input): upsert all of orders (+I per key),
    re-upsert the key%4==0 slice with doubled price (an exact -U
    pre-image + +U post-image pair per key), then DELETE the key%4==1
    slice (-D carrying the deleted image). The relation aggregates the
    FULL stored changelog by change type; DuckDB replays every
    event-class count AND value sum from raw orders — the changelog
    contract (each event carries the right image) checked end to end,
    not just row kinds (lakehouse/table.py changelog emission +
    read_changelog; tutorial/guide.md:69-74 changelog-producer=input,
    SURVEY §2.9).

    Scale shape: changelog derivation joins each batch against only
    its PK pre-images (per-bucket); the readback is a scan of the
    changelog files + one change-type exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("changelog128", sf_dir), "default")
    t = catalog.create_table(
        "orders_cl",
        "o_orderkey long, o_totalprice double",
        {"primary-key": "o_orderkey", "bucket": "4", "changelog-producer": "input"},
    )
    src = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t.upsert(src)
    t.upsert(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(4)) == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    t.delete_where(spark, "o_orderkey % 4 = 1")
    return (
        t.read_changelog(spark)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_v"),
        )
    )


# x126-x128 ship library-gated (the x101-x125 path): the scored window
# and registry are full; the strict local harness oracles them at
# every run and they queue for future rotations.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r15d  # noqa: E402

for _n in (
    "x126_orc_format_roundtrip",
    "x127_consumer_lifecycle",
    "x128_changelog_relation",
):
    _demote_r15d(_n)
del _demote_r15d, _n


# ---------------------------------------------------------------------------
# x129-x131 (round 15, continuation): orphan-file sweep with the
# cross-chain guard, bucket rescale with the mixed-modulus write
# refusal, and INSERT OVERWRITE with pre-overwrite time travel.
# ---------------------------------------------------------------------------

_SQL_ORPHAN_SWEEP = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS guard_protected_branch,
       TRUE AS orphans_swept
FROM orders
WHERE o_orderkey % 2 = 0
GROUP BY o_orderstatus
"""


@query("x129_orphan_sweep_lifecycle", oracle=_SQL_ORPHAN_SWEEP)
def x129_orphan_sweep_lifecycle(spark, sf_dir):
    """Orphan-file sweep end to end, oracled: even orders keys land on
    main, a branch takes the odd keys as a branch-only append, and two
    sweeps bracket the branch's deletion. ``guard_protected_branch``
    pins the cross-chain reference guard: while the branch lives, a
    sweep (with a future cutoff — everything is old enough) removes
    NOTHING, because 'safe to delete?' unions every other chain's
    references. After ``delete_branch``, its files are true orphans
    and ``orphans_swept`` pins that the second sweep actually removed
    them — while the main read (the returned relation) is bit-intact
    (lakehouse/table.py remove_orphan_files /
    _external_referenced_files; Paimon remove_orphan_files action,
    SURVEY §2.1).

    Scale shape: the sweep is a directory walk diffed against the
    manifest union — O(files) metadata, no data I/O; the aggregate is
    one grouped exchange."""
    import time as _time

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("orphan129", sf_dir), "default")
    t = catalog.create_table(
        "orders_orph",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0))
    t.create_branch("tmp")
    t.use_branch("tmp").append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1))
    future = int(_time.time() * 1000) + 3_600_000
    guarded = t.remove_orphan_files(older_than_ms=future) == []
    t.delete_branch("tmp")
    swept = len(t.remove_orphan_files(older_than_ms=future)) > 0
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("guard_protected_branch", F.lit(bool(guarded)))
        .withColumn("orphans_swept", F.lit(bool(swept)))
    )


_SQL_BUCKET_RESCALE = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS write_refused_before_rescale,
       TRUE AS rescaled_to_new_modulus
FROM orders
GROUP BY o_orderstatus
"""


@query("x130_bucket_rescale", oracle=_SQL_BUCKET_RESCALE)
def x130_bucket_rescale(spark, sf_dir):
    """Bucket rescale end to end, oracled: even keys land under
    bucket=2, ALTER SET ('bucket'='8') changes the declared count, and
    the mixed-modulus contract takes over:
    ``write_refused_before_rescale`` pins that an incremental append
    is REFUSED while live files still carry the old modulus (routing a
    key's new rows to a bucket its old rows aren't in would break
    bucket-pruned pre-image lookups — Paimon's rescale contract), a
    full ``compact()`` rewrite rescales
    (``rescaled_to_new_modulus``: every live file now carries
    total_buckets=8), and the previously-refused append of the odd
    keys then succeeds — the relation aggregates the complete table
    (lakehouse/table.py _check_bucket_rescale; SURVEY §2.1 rescale
    row).

    Scale shape: the refusal is an O(manifest) metadata check; the
    rescale pays exactly one full rewrite (the documented cost); the
    aggregate is one grouped exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("rescale130", sf_dir), "default")
    catalog.create_table(
        "orders_rs",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    odd = src.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1)
    catalog.get_table("orders_rs").append(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0)
    )
    catalog.alter_table("orders_rs", {"bucket": "8"})
    t = catalog.get_table("orders_rs")
    try:
        t.append(odd)
        refused = False
    except ValueError:
        refused = True
    t.compact()  # the rescaling rewrite
    rescaled = {e.get("total_buckets") for e in t.manifest()} == {8}
    t.append(odd)  # now legal
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("write_refused_before_rescale", F.lit(bool(refused)))
        .withColumn("rescaled_to_new_modulus", F.lit(bool(rescaled)))
    )


_SQL_INSERT_OVERWRITE = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       (SELECT COUNT(*) FROM orders) AS meta_pre_rows
FROM orders
WHERE o_orderkey % 3 = 0
GROUP BY o_orderstatus
"""


@query("x131_insert_overwrite", oracle=_SQL_INSERT_OVERWRITE)
def x131_insert_overwrite(spark, sf_dir):
    """INSERT OVERWRITE end to end, oracled: all of orders lands, then
    one OVERWRITE commit replaces the whole image with the key%3==0
    slice at doubled price — the read must show ONLY the new image
    (lakehouse/table.py overwrite; the reference's INSERT OVERWRITE
    surface, SURVEY §2.1). ``meta_pre_rows`` pins that the replaced
    image is NOT gone: metadata_count at the pre-overwrite snapshot
    still answers the full original row count from manifest metadata
    alone — OVERWRITE replaces the live manifest, it never deletes
    replaced files while their snapshots live (time travel across an
    overwrite).

    Scale shape: OVERWRITE stages the new image once and commits
    O(metadata); the aggregate is one grouped exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse

    catalog = Catalog(_mhidx_warehouse("overwrite131", sf_dir), "default")
    t = catalog.create_table(
        "orders_ow",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.append(src)
    pre = t.latest_snapshot_id()
    t.overwrite(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    meta_pre = t.metadata_count(snapshot_id=pre)
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("meta_pre_rows", F.lit(int(meta_pre)).cast("long"))
    )


# x129-x131 ship library-gated (the x101-x128 path): the scored window
# and registry are full; the strict local harness oracles them at
# every run and they queue for future rotations.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r15e  # noqa: E402

for _n in (
    "x129_orphan_sweep_lifecycle",
    "x130_bucket_rescale",
    "x131_insert_overwrite",
):
    _demote_r15e(_n)
del _demote_r15e, _n


# ---------------------------------------------------------------------------
# x132/x133 (round 15): the FIRST streaming [Q] cards — a real
# Structured Streaming job runs to completion inside the card
# (availableNow) and the END STATE is DuckDB-replayed. The continuous
# semantics stay [S] (DuckDB cannot express a trigger), but the
# bounded-run end state is exactly oracle-checkable.
# ---------------------------------------------------------------------------

_SQL_STREAMING_INGEST = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS multi_batch_commits,
       TRUE AS replay_noop
FROM orders
GROUP BY o_orderstatus
"""


@query("x132_streaming_ingest_lifecycle", oracle=_SQL_STREAMING_INGEST)
def x132_streaming_ingest_lifecycle(spark, sf_dir):
    """Streaming ingest end to end, oracled: orders lands in a source
    directory as four parquet files, a REAL Structured Streaming job
    (file source, maxFilesPerTrigger=1, availableNow) drives the
    ``Pipeline`` append sink micro-batch by micro-batch into a
    lakehouse table, and the final table is DuckDB-replayed
    (streaming/pipelines.py Pipeline; the reference's INSERT INTO
    streaming job, tutorial/guide.md; SURVEY §2.9).
    ``multi_batch_commits`` pins that the ingest really was
    incremental (one snapshot per micro-batch, >= 2); ``replay_noop``
    pins checkpoint-aligned exactly-once: a SECOND identical run over
    the same checkpoint commits NOTHING (the batch-id
    commit_identifier replay guard + Spark's checkpoint both hold).

    Scale shape: per-trigger work is O(batch); the end-state aggregate
    is one grouped exchange."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import Pipeline

    wh = _mhidx_warehouse("streaming132", sf_dir)
    catalog = Catalog(wh, "default")
    t = catalog.create_table(
        "orders_stream",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src_dir = _os.path.join(wh, "source")
    _shutil.rmtree(src_dir, ignore_errors=True)
    T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).repartition(4).write.parquet(src_dir)

    def run():
        stream = (
            spark.readStream.schema(t.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = Pipeline(
            "ingest132", stream, t, mode="append", available_now=True
        ).run()

    run()
    committed = t.latest_snapshot_id() or 0
    run()  # identical rerun over the same checkpoint: must be a no-op
    replay_noop = (t.latest_snapshot_id() or 0) == committed
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("multi_batch_commits", F.lit(bool(committed >= 2)))
        .withColumn("replay_noop", F.lit(bool(replay_noop)))
    )


_SQL_STREAM_SUBSCRIBE = """
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       TRUE AS compact_ran_upstream
FROM orders
GROUP BY o_orderstatus
"""


@query("x133_stream_subscribe_lifecycle", oracle=_SQL_STREAM_SUBSCRIBE)
def x133_stream_subscribe_lifecycle(spark, sf_dir):
    """Table-to-table streaming subscription, oracled: orders lands in
    an upstream lakehouse table as three appends, the table is then
    FULLY COMPACTED (a rewrite of every live file), and a subscriber
    (``stream_table_files``, availableNow, one file per trigger)
    replays the table from genesis into a downstream table. The
    downstream aggregate must equal orders EXACTLY ONCE — the
    subscriber watches the stream/ append-log mirror, which receives
    only APPEND files, so the compaction's rewritten files are
    invisible and no row is delivered twice
    (streaming/pipelines.py stream_table_files; Paimon streaming reads
    skip compaction snapshots; SURVEY §2.1/§2.9).
    ``compact_ran_upstream`` pins that the hazard was actually present
    (a COMPACT snapshot exists upstream); the row counts then prove it
    did not leak into the stream.

    Scale shape: the subscription lists O(new files per trigger) from
    the mirror — never a snapshot diff; one grouped exchange."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import (
        Pipeline,
        stream_table_files,
    )

    wh = _mhidx_warehouse("subscribe133", sf_dir)
    catalog = Catalog(wh, "default")
    up = catalog.create_table(
        "orders_up",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    down = catalog.create_table(
        "orders_down",
        "o_orderkey long, o_orderstatus string, o_totalprice double",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    for r in range(3):
        up.append(src.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == r))
    up.compact()  # rewrite every live file — must NOT reach subscribers
    compacted = any(
        up.snapshot(s["id"]).get("commit_kind") == "COMPACT" for s in up.snapshots()
    )
    q = Pipeline(
        "subscribe133",
        stream_table_files(spark, up, max_files_per_trigger=1),
        down,
        mode="append",
        available_now=True,
    ).run()
    return (
        down.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_price"),
        )
        .withColumn("compact_ran_upstream", F.lit(bool(compacted)))
    )


# x132/x133 PROMOTED to the scored registry in round 16 (VERDICT r15
# ask #1: the streaming cards are the newest operator class with zero
# driver history — they take the slots freed by demoting five
# long-stable, class-covered entries; see __spark_entry__._ORDER).


# ---------------------------------------------------------------------------
# x134 (round 15): streaming changelog subscription — the stored
# +I/-U/+U/-D stream delivered BY Structured Streaming into a
# downstream table, end state oracled (x128's arithmetic, arriving via
# the live stream instead of a batch read).
# ---------------------------------------------------------------------------

_SQL_STREAM_CHANGELOG = """
WITH ev AS (
  SELECT '+I' AS change_type, COUNT(*) AS n_rows,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
  FROM orders
  UNION ALL
  SELECT '-U', COUNT(*),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
  FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT '+U', COUNT(*),
         CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(18,2))) AS DOUBLE)
  FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT '-D', COUNT(*),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
  FROM orders WHERE o_orderkey % 4 = 1
)
SELECT change_type, n_rows, sum_v,
       TRUE AS consumer_registered,
       TRUE AS replay_noop
FROM ev
"""


@query("x134_stream_changelog_subscribe", oracle=_SQL_STREAM_CHANGELOG)
def x134_stream_changelog_subscribe(spark, sf_dir):
    """Streaming changelog subscription end to end, oracled: the x128
    DML sequence (upsert all, re-upsert the key%4==0 slice doubled,
    DELETE the key%4==1 slice) writes a stored changelog, and a
    Structured Streaming subscriber (``stream_table_changelog`` with a
    consumer-id, availableNow) delivers every +I/-U/+U/-D event into a
    downstream table. The downstream aggregate by change type must
    reproduce x128's event arithmetic exactly — each class's count AND
    value sum — proving the live stream delivers the same events as
    the batch changelog read, exactly once
    (streaming/pipelines.py stream_table_changelog;
    tutorial/guide.md:69-74; SURVEY §2.9). ``consumer_registered``
    pins the table-side bookmark (the subscriber is expiry-protected
    from first attach); ``replay_noop`` pins exactly-once across an
    identical rerun over the same checkpoint.

    Scale shape: the subscription scans only changelog files; one
    change-type exchange downstream."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import (
        Pipeline,
        stream_table_changelog,
    )

    wh = _mhidx_warehouse("streamcl134", sf_dir)
    catalog = Catalog(wh, "default")
    up = catalog.create_table(
        "orders_clu",
        "o_orderkey long, o_totalprice double",
        {"primary-key": "o_orderkey", "bucket": "4", "changelog-producer": "input"},
    )
    down = catalog.create_table(
        "orders_cld",
        "o_orderkey long, o_totalprice double, _change_type string",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    up.upsert(src)
    up.upsert(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(4)) == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    up.delete_where(spark, "o_orderkey % 4 = 1")

    def run():
        q = Pipeline(
            "subscribe134",
            stream_table_changelog(spark, up, consumer_id="sub"),
            down,
            mode="append",
            available_now=True,
        ).run()

    run()
    committed = down.latest_snapshot_id() or 0
    run()  # identical rerun over the same checkpoint: must be a no-op
    replay_noop = (down.latest_snapshot_id() or 0) == committed
    registered = "sub" in up.consumers()
    return (
        down.read(spark)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_v"),
        )
        .withColumn("consumer_registered", F.lit(bool(registered)))
        .withColumn("replay_noop", F.lit(bool(replay_noop)))
    )


# x134 PROMOTED to the scored registry in round 16 (with x132/x133).


# ---------------------------------------------------------------------------
# x135 (round 15): watermarked tumbling-window streaming aggregate —
# the end state of a real windowed Structured Streaming job, oracled,
# INCLUDING the watermark semantics: the still-open final window must
# be held back (append mode emits only closed windows), and the oracle
# replays exactly that cutoff.
# ---------------------------------------------------------------------------

_SQL_STREAM_TUMBLING = """
WITH mx AS (SELECT MAX(ts) AS m FROM events),
agg AS (
  SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
         time_bucket(INTERVAL 1 DAY, ts) + INTERVAL 1 DAY AS window_end,
         event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS sv
  FROM events
  GROUP BY 1, 2, 3
)
SELECT window_start, window_end, event_type, n,
       CAST(sv AS DOUBLE) AS sum_value,
       TRUE AS open_window_held_back
FROM agg, mx
WHERE window_end <= m
"""


@query("x135_stream_tumbling_window", oracle=_SQL_STREAM_TUMBLING)
def x135_stream_tumbling_window(spark, sf_dir):
    """Watermarked tumbling windows end to end, oracled WITH the
    watermark semantics: events stream through ``tumbling_agg``
    (1-day windows, watermark 0 s, append mode) into a lakehouse sink
    via a real availableNow run. Append mode emits a window only once
    the watermark passes its end — so the final, still-open day (the
    one containing max(ts)) must be ABSENT from the sink, and the
    oracle replays exactly that cutoff (`window_end <= max(ts)`).
    ``open_window_held_back`` pins that the held-back window really
    existed (the source has more distinct windows than the sink
    emitted). The source is a single file so every row is on time —
    the cutoff, not racing file order, decides emission
    (streaming/windows.py tumbling_agg; the reference's windowed
    streaming aggregates, SURVEY §2.9; Flink TVF tumble semantics).

    Scale shape: windowed agg state is per (window, key); emission is
    append-only; the end-state read is one grouped-window exchange.
    Value sums fold in DECIMAL so emission order cannot change a
    float result."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import Pipeline
    from advent_of_code_flink_paimon_spark.streaming.windows import tumbling_agg

    wh = _mhidx_warehouse("tumbling135", sf_dir)
    catalog = Catalog(wh, "default")
    sink = catalog.create_table(
        "daily_counts",
        "window_start timestamp, window_end timestamp, event_type string, "
        "n long, sum_value decimal(28,6)",  # SUM over decimal(18,6) widens by 10
        {"bucket": "1"},
    )
    src_dir = _os.path.join(wh, "events-src")
    _shutil.rmtree(src_dir, ignore_errors=True)
    ev = T(spark, sf_dir, "events").select(
        "ts", "event_type", F.col("value").cast("decimal(18,6)").alias("value")
    )
    ev.coalesce(1).write.parquet(src_dir)
    n_windows_total = ev.select(F.window("ts", "1 day")).distinct().count()
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value decimal(18,6)"
    ).parquet(src_dir)
    q = Pipeline(
        "tumbling135",
        tumbling_agg(stream, "ts", ["event_type"], window="1 day",
                     watermark="0 seconds"),
        sink,
        mode="append",
        available_now=True,
    ).run()
    emitted = sink.read(spark)
    held_back = (
        emitted.select("window_start").distinct().count() < n_windows_total
    )
    return emitted.select(
        "window_start",
        "window_end",
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.lit(bool(held_back)).alias("open_window_held_back"),
    )


# x135 PROMOTED to the scored registry in round 16 (VERDICT r15 ask #1
# named it explicitly — first watermarked-window card the driver sees).


# ---------------------------------------------------------------------------
# x136 (round 15): the processing-time LOOKUP JOIN pipeline, end state
# oracled — matches enrich the target, permanent misses stay in the
# persistent retry queue, never silently dropped into the output.
# ---------------------------------------------------------------------------

_SQL_LOOKUP_JOIN = """
SELECT s.s_name AS supp_name,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       TRUE AS misses_queued
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE s.s_suppkey % 2 = 0
GROUP BY s.s_name
"""


@query("x136_lookup_join_lifecycle", oracle=_SQL_LOOKUP_JOIN)
def x136_lookup_join_lifecycle(spark, sf_dir):
    """Processing-time lookup join end to end, oracled: lineitem
    streams (two files, one per trigger) through the
    ``LookupJoinPipeline`` against a dimension holding ONLY the
    even-keyed suppliers. Matches join the dimension's latest snapshot
    and append to the enriched target; odd-suppkey rows MISS and land
    in the persistent retry queue with an attempt counter — the
    `retry-predicate=lookup_miss` semantic
    (tutorial/guide.md:119-141; streaming/lookup_join.py; SURVEY
    §2.3). The end-state aggregate must equal the plain inner join
    against the even dimension — a missed row may never leak into the
    output — and ``misses_queued`` pins that the misses are actually
    QUEUED (retry table non-empty), not silently dropped.

    Scale shape: per trigger, one broadcast of the dimension's merged
    snapshot against batch-sized candidates; the queue is overwritten
    wholesale per batch (bounded by live misses)."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.lookup_join import (
        LookupJoinPipeline,
    )

    wh = _mhidx_warehouse("lookup136", sf_dir)
    catalog = Catalog(wh, "default")
    dim = catalog.create_table(
        "supplier_dim",
        "l_suppkey long, s_name string",
        {"primary-key": "l_suppkey", "bucket": "2"},
    )
    sup = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("l_suppkey"), "s_name"
    )
    dim.upsert(sup.filter(F.pmod(F.col("l_suppkey"), F.lit(2)) == 0))
    target = catalog.create_table(
        "lineitem_enriched",
        "l_orderkey long, l_linenumber long, l_suppkey long, "
        "l_extendedprice double, s_name string",
        {"bucket": "2", "bucket-key": "l_orderkey"},
    )
    src_dir = _os.path.join(wh, "lineitem-src")
    _shutil.rmtree(src_dir, ignore_errors=True)
    T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_suppkey",
        "l_extendedprice",
    ).repartition(2).write.parquet(src_dir)
    stream = spark.readStream.schema(
        "l_orderkey long, l_linenumber long, l_suppkey long, l_extendedprice double"
    ).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = LookupJoinPipeline(
        "lookup136",
        catalog,
        stream,
        dim,
        target,
        on="l_suppkey",
        available_now=True,
    ).run()
    retry = catalog.get_table("lineitem_enriched_retry")
    misses_queued = retry.read(spark).count() > 0
    return (
        target.read(spark)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").alias("revenue"),
        )
        .withColumn("misses_queued", F.lit(bool(misses_queued)))
    )


# x136 PROMOTED to the scored registry in round 16 (VERDICT r15 ask #1
# named it explicitly — the lookup-join retry-queue card).


# ---------------------------------------------------------------------------
# x137/x138 (round 15): sliding and session windows — the remaining
# two streaming window shapes, end states oracled with their watermark
# cutoffs (the x135 protocol).
# ---------------------------------------------------------------------------

_SQL_STREAM_SLIDING = """
WITH mx AS (SELECT MAX(ts) AS m FROM events),
exp AS (
  SELECT time_bucket(INTERVAL 1 DAY, ts) - k * INTERVAL 1 DAY AS ws, event_type
  FROM events, (SELECT UNNEST([0, 1]) AS k)
),
agg AS (
  SELECT ws AS window_start, ws + 2 * INTERVAL 1 DAY AS window_end,
         event_type, COUNT(*) AS n
  FROM exp GROUP BY 1, 2, 3
)
SELECT window_start, window_end, event_type, n,
       TRUE AS open_windows_held_back
FROM agg, mx WHERE window_end <= m
"""


@query("x137_stream_sliding_window", oracle=_SQL_STREAM_SLIDING)
def x137_stream_sliding_window(spark, sf_dir):
    """Watermarked SLIDING windows end to end, oracled: events stream
    through ``sliding_agg`` (2-day windows sliding by 1 day — every
    event lands in exactly two windows) into a lakehouse sink via
    availableNow; append mode emits a window only once the watermark
    passes its end, so the LAST TWO still-open windows are absent and
    the oracle replays exactly that cutoff by expanding each event
    into its two slide-aligned windows and filtering
    `window_end <= max(ts)` (streaming/windows.py sliding_agg; Flink
    HOP windows, SURVEY §2.9).

    Scale shape: state is per (window, key) — 2x the tumbling state
    for slide = window/2; emission append-only; counts only, so no
    float-order concern."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import Pipeline
    from advent_of_code_flink_paimon_spark.streaming.windows import sliding_agg

    wh = _mhidx_warehouse("sliding137", sf_dir)
    catalog = Catalog(wh, "default")
    sink = catalog.create_table(
        "sliding_counts",
        "window_start timestamp, window_end timestamp, event_type string, n long",
        {"bucket": "1"},
    )
    src_dir = _os.path.join(wh, "events-src")
    _shutil.rmtree(src_dir, ignore_errors=True)
    ev = T(spark, sf_dir, "events").select("ts", "event_type")
    ev.coalesce(1).write.parquet(src_dir)
    # batch-derived ground truth: every slide-aligned window any event
    # lands in; append mode must emit strictly fewer (the open tail).
    n_windows_total = ev.select(F.window("ts", "2 days", "1 day")).distinct().count()
    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src_dir)
    q = Pipeline(
        "sliding137",
        sliding_agg(stream, "ts", ["event_type"], window="2 days",
                    slide="1 day", watermark="0 seconds"),
        sink,
        mode="append",
        available_now=True,
    ).run()
    emitted = sink.read(spark)
    # computed, not asserted (the x135 protocol; VERDICT r15 advice):
    # the oracle pins TRUE, so a leak of the open windows into the
    # append-mode output flips this to False and fails the hash.
    held_back = (
        emitted.select("window_start").distinct().count() < n_windows_total
    )
    return emitted.withColumn(
        "open_windows_held_back", F.lit(bool(held_back))
    )


_SQL_STREAM_SESSION = """
WITH mx AS (SELECT MAX(ts) AS m FROM events),
marked AS (
  SELECT event_type, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 2 HOUR
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts)
),
sess AS (
  SELECT event_type, ts,
         SUM(new_sess) OVER (PARTITION BY event_type ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
agg AS (
  SELECT MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 2 HOUR AS session_end,
         event_type,
         COUNT(*) AS n_events
  FROM sess GROUP BY event_type, sid
)
SELECT session_start, session_end, event_type, n_events,
       TRUE AS open_sessions_held_back
FROM agg, mx WHERE session_end <= m
"""


@query("x138_stream_session_window", oracle=_SQL_STREAM_SESSION)
def x138_stream_session_window(spark, sf_dir):
    """Watermarked SESSION windows end to end, oracled: events stream
    through ``session_agg`` (2-hour idle gap per event_type) into a
    lakehouse sink via availableNow. A session's end is its last
    event + gap; append mode emits a session only once the watermark
    passes that end, so any session still idle-open at max(ts) is
    held back — the oracle replays the gap-merge per type with window
    functions (the q34_sessionize pattern as SQL) and applies exactly
    the `session_end <= max(ts)` cutoff (streaming/windows.py
    session_agg; Flink SESSION windows / the reference's
    sessionization, SURVEY §2.9).

    Scale shape: session state is per (key, open session); the
    gap-merge happens inside Spark's session-window state store, never
    a global sort; emission append-only."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import Pipeline
    from advent_of_code_flink_paimon_spark.streaming.windows import session_agg

    wh = _mhidx_warehouse("session138", sf_dir)
    catalog = Catalog(wh, "default")
    sink = catalog.create_table(
        "session_counts",
        "session_start timestamp, session_end timestamp, event_type string, "
        "n_events long",
        {"bucket": "1"},
    )
    src_dir = _os.path.join(wh, "events-src")
    _shutil.rmtree(src_dir, ignore_errors=True)
    ev = T(spark, sf_dir, "events").select("ts", "event_type")
    ev.coalesce(1).write.parquet(src_dir)
    # batch-derived ground truth: total gap-merged sessions per key via
    # Spark's own session_window; append mode must emit strictly fewer
    # (each key's final session is still idle-open at max(ts)).
    n_sessions_total = (
        ev.groupBy("event_type", F.session_window("ts", "2 hours"))
        .count()
        .count()
    )
    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src_dir)
    q = Pipeline(
        "session138",
        session_agg(stream, "ts", ["event_type"], gap="2 hours",
                    watermark="0 seconds"),
        sink,
        mode="append",
        available_now=True,
    ).run()
    emitted = sink.read(spark)
    # computed, not asserted (the x135 protocol; VERDICT r15 advice):
    # a leak of still-open sessions into the append output flips this
    # to False and fails the oracle hash.
    held_back = emitted.count() < n_sessions_total
    return emitted.withColumn(
        "open_sessions_held_back", F.lit(bool(held_back))
    )


# x137/x138 (sliding/session windows, held-back flags computed) were
# PROMOTED into the round-17 scored window per VERDICT r16 ask #1 —
# their first driver rows.


# ---------------------------------------------------------------------------
# x139 (round 16, VERDICT r15 ask #3): the stream-stream INTERVAL JOIN
# end to end, oracled — the last watermarked stateful operator that was
# behavioral-only. Two real event streams (clicks / purchases split
# from the events table) flow through ``stream_stream_join`` (±30 min
# per user, availableNow) into a lakehouse sink; DuckDB replays the
# equivalent batch interval join. Both sources arrive in one trigger so
# every row is on time — the emitted pair set must EQUAL the batch
# join (inner stream-stream joins emit on match; the watermark bounds
# state, not emission), and ``all_on_time_emitted`` pins exactly that
# equality Spark-side so a dropped or duplicated pair fails the oracle
# twice (hash and flag).
# ---------------------------------------------------------------------------

_SQL_STREAM_STREAM_JOIN = """
WITH pairs AS (
  SELECT l.user_id, l.value AS cval, r.value AS pval
  FROM events l JOIN events r
    ON l.user_id = r.user_id
   AND l.event_type = 'click' AND r.event_type = 'purchase'
   AND r.ts >= l.ts - INTERVAL 30 MINUTE
   AND r.ts <= l.ts + INTERVAL 30 MINUTE
)
SELECT user_id, COUNT(*) AS n_pairs,
       CAST(SUM(CAST(cval AS DECIMAL(18,6))) AS DOUBLE) AS sum_click_value,
       CAST(SUM(CAST(pval AS DECIMAL(18,6))) AS DOUBLE) AS sum_purchase_value,
       TRUE AS all_on_time_emitted
FROM pairs GROUP BY user_id
"""


@query("x139_stream_stream_join", oracle=_SQL_STREAM_STREAM_JOIN)
def x139_stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream interval join end to end, oracled:
    clicks and purchases stream through ``stream_stream_join``
    (match when the same user's events are within ±30 min) into a
    lakehouse sink via availableNow; the oracle replays the identical
    batch interval join + per-user aggregate in DuckDB
    (streaming/windows.py stream_stream_join; Flink interval join,
    SURVEY §2.9 — the x135 end-state protocol applied to the last
    [S]-only join operator).

    Scale shape: both sides shuffle on the join key; keyed state is
    bounded by the watermark + the ±interval (state holds only rows
    whose event time can still match — at 100 TB the buffer is
    O(interval x rate), never O(stream)). Value sums fold in DECIMAL
    so emission order cannot change a float result."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import Pipeline
    from advent_of_code_flink_paimon_spark.streaming.windows import stream_stream_join

    wh = _mhidx_warehouse("ssjoin139", sf_dir)
    catalog = Catalog(wh, "default")
    sink = catalog.create_table(
        "click_purchase_pairs",
        "user_id long, cval double, pval double",
        {"bucket": "1"},
    )
    ev = T(spark, sf_dir, "events").select("ts", "user_id", "event_type", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("value").alias("cval")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("value").alias("pval")
    )
    c_dir = _os.path.join(wh, "clicks-src")
    p_dir = _os.path.join(wh, "purchases-src")
    for d, df in ((c_dir, clicks), (p_dir, purchases)):
        _shutil.rmtree(d, ignore_errors=True)
        df.coalesce(1).write.parquet(d)
    cs = spark.readStream.schema(
        "user_id long, cts timestamp, cval double"
    ).parquet(c_dir)
    ps = spark.readStream.schema(
        "user_id long, pts timestamp, pval double"
    ).parquet(p_dir)
    joined = stream_stream_join(
        cs, ps, on="user_id", left_ts="cts", right_ts="pts",
        watermark="0 seconds", within="30 minutes",
    ).select(cs.user_id, "cval", "pval")
    q = Pipeline(
        "ssjoin139", joined, sink, mode="append", available_now=True
    ).run()
    # batch-derived ground truth (computed, not asserted — the x135
    # protocol): the same interval join as a plain DataFrame join
    iv = F.expr("interval 30 minutes")
    n_batch_pairs = clicks.join(
        purchases,
        (clicks.user_id == purchases.user_id)
        & (purchases.pts >= clicks.cts - iv)
        & (purchases.pts <= clicks.cts + iv),
    ).count()
    emitted = sink.read(spark)
    all_on_time = emitted.count() == n_batch_pairs
    return (
        emitted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("cval").cast("decimal(18,6)"))
            .cast("double").alias("sum_click_value"),
            F.sum(F.col("pval").cast("decimal(18,6)"))
            .cast("double").alias("sum_purchase_value"),
        )
        .withColumn("all_on_time_emitted", F.lit(bool(all_on_time)))
    )


# ---------------------------------------------------------------------------
# x140 (round 16, VERDICT r15 ask #3): CHANGELOG NORMALIZE end to end,
# oracled — the post-image upsert stream of a changelog-LESS PK table
# (+U/-D, no pre-images) normalized to a full +I/-U/+U/-D changelog by
# the keyed-state operator, sunk to a table, and the per-class counts
# AND value sums replayed from raw orders: exactly x128's stored-
# changelog arithmetic, but produced by ChangelogNormalize state
# instead of a stored producer.
# ---------------------------------------------------------------------------

_SQL_CHANGELOG_NORMALIZE = """
WITH ev AS (
  SELECT '+I' AS change_type, COUNT(*) AS n_rows,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
  FROM orders
  UNION ALL
  SELECT '-U', COUNT(*),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
  FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT '+U', COUNT(*),
         CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(18,2))) AS DOUBLE)
  FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT '-D', COUNT(*),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
  FROM orders WHERE o_orderkey % 4 = 1
)
SELECT change_type, n_rows, sum_v, TRUE AS replay_noop FROM ev
"""


@query("x140_changelog_normalize", oracle=_SQL_CHANGELOG_NORMALIZE)
def x140_changelog_normalize(spark, sf_dir):
    """ChangelogNormalize end to end, oracled: the x128 DML sequence
    (upsert all of orders, re-upsert the key%4==0 slice doubled,
    DELETE the key%4==1 slice) runs against a changelog-LESS PK table,
    whose upsert stream carries only post-images (+U/-D). A real
    availableNow job pipes it through ``changelog_normalize`` (one
    remembered-row state per key, commit-ordered by the seq column)
    into a downstream table; the aggregate by change type must
    reproduce the stored-changelog arithmetic exactly — the -U rows
    carry the REMEMBERED original price and the -D rows the deleted
    image, both recovered from state, not from the stream
    (streaming/windows.py changelog_normalize; the reference planner's
    ChangelogNormalize node, tutorial/guide.md:69-74; SURVEY §2.9).
    ``replay_noop`` pins exactly-once across an identical rerun over
    the same checkpoint.

    Scale shape: state is O(live keys), sharded by the groupBy key
    hash; each trigger folds only its new post-images (the stream/
    mirror is O(new files)); one change-type exchange downstream."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import (
        Pipeline,
        stream_table_upsert,
    )
    from advent_of_code_flink_paimon_spark.streaming.windows import changelog_normalize

    wh = _mhidx_warehouse("clnorm140", sf_dir)
    catalog = Catalog(wh, "default")
    up = catalog.create_table(
        "orders_nocl",
        "o_orderkey long, o_totalprice double",
        {"primary-key": "o_orderkey", "bucket": "4"},  # NO changelog producer
    )
    down = catalog.create_table(
        "orders_norm",
        "o_orderkey long, o_totalprice double, _change_type string",
        {"bucket": "2", "bucket-key": "o_orderkey"},
    )
    src = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    up.upsert(src)
    up.upsert(
        src.filter(F.pmod(F.col("o_orderkey"), F.lit(4)) == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    up.delete_where(spark, "o_orderkey % 4 = 1")

    def run():
        normalized = changelog_normalize(
            stream_table_upsert(spark, up, include_seq=True),
            key_cols=["o_orderkey"],
            value_cols=["o_totalprice"],
            order_col="seq",
        )
        q = Pipeline(
            "clnorm140", normalized, down, mode="append", available_now=True,
            # Python-compute-bound stateful fold: one state per order key
            # (~150k keys/trigger) — fan the fold to the cores, not the
            # trigger-sized stream default (see stream_confs; measured
            # 65.3 s at 8 partitions vs 22 s at defaultParallelism)
            shuffle_partitions=spark.sparkContext.defaultParallelism,
        ).run()

    run()
    committed = down.latest_snapshot_id() or 0
    run()  # identical rerun over the same checkpoint: must be a no-op
    replay_noop = (down.latest_snapshot_id() or 0) == committed
    return (
        down.read(spark)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("sum_v"),
        )
        .withColumn("replay_noop", F.lit(bool(replay_noop)))
    )


# x139/x140 (stream-stream interval join + ChangelogNormalize end
# states) were PROMOTED into the round-17 scored window per VERDICT
# r16 ask #1 — their first driver rows.


# ---------------------------------------------------------------------------
# x141 (round 16): streaming DEDUP end to end, oracled — the stateful
# first-occurrence-wins operator (dropDuplicatesWithinWatermark) was
# behavioral-only. Events plus an exact-duplicate slice stream through
# it across TWO triggers; state keyed by event_id must drop every
# duplicate (including cross-trigger re-arrivals), so the sink equals
# the original corpus exactly.
# ---------------------------------------------------------------------------

_SQL_STREAM_DEDUP = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       TRUE AS dupes_dropped
FROM events GROUP BY event_type
"""


@query("x141_stream_dedup", oracle=_SQL_STREAM_DEDUP)
def x141_stream_dedup(spark, sf_dir):
    """Stateful streaming dedup end to end, oracled: the events table
    plus an EXACT duplicate of its event_id%5==0 slice stream through
    ``dedup_within_watermark`` (keyed by event_id) in two
    maxFilesPerTrigger=1 micro-batches — originals in trigger 1, the
    duplicate slice re-arriving in trigger 2 — into a lakehouse sink.
    Keyed state survives the trigger boundary, so every duplicate is
    dropped and the per-type counts AND value sums equal raw events
    exactly; ``dupes_dropped`` is computed from the fed-vs-emitted row
    counts (streaming/windows.py dedup_within_watermark; the streaming
    form of exact dedup, SURVEY §2.11/§2.9).

    The watermark horizon is set past the corpus time span so the
    bounded replay is deterministic (no dedup-state eviction mid-run);
    a production stream uses a real horizon and holds O(keys-within-
    horizon) state — the bounded-memory contract this card's operator
    exists for.

    Scale shape: one key-hash exchange into the dedup state store;
    state O(live keys within the horizon); append-only emission."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import Pipeline
    from advent_of_code_flink_paimon_spark.streaming.windows import dedup_within_watermark

    wh = _mhidx_warehouse("sdedup141", sf_dir)
    catalog = Catalog(wh, "default")
    sink = catalog.create_table(
        "events_deduped",
        "event_id long, ts timestamp, event_type string, value double",
        {"bucket": "2", "bucket-key": "event_id"},
    )
    ev = T(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    src_dir = _os.path.join(wh, "events-src")
    _shutil.rmtree(src_dir, ignore_errors=True)
    ev.coalesce(1).write.parquet(src_dir)  # trigger 1: the originals
    originals = [
        _os.path.join(src_dir, f)
        for f in _os.listdir(src_dir)
        if f.endswith(".parquet")
    ]
    dup_slice = ev.filter(F.pmod(F.col("event_id"), F.lit(5)) == 0)
    dup_slice.coalesce(1).write.mode("append").parquet(src_dir)  # trigger 2: exact dupes
    # FileStreamSource orders files by mtime; both writes can land in
    # the same mtime second, which would let the duplicate slice run
    # FIRST and silently invert the documented cross-trigger
    # re-arrival scenario (the oracle passes either way — dupes are
    # exact copies — but the exercised scenario must match the
    # docstring). Backdate the originals so trigger order is pinned
    # (the x144 protocol; round-16 ADVICE #3).
    for f in originals:
        _os.utime(f, (1_000_000_000, 1_000_000_000))
    n_original = ev.count()
    n_fed = n_original + dup_slice.count()
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = Pipeline(
        "sdedup141",
        dedup_within_watermark(stream, ["event_id"], "ts", watermark="40 days"),
        sink,
        mode="append",
        available_now=True,
    ).run()
    emitted = sink.read(spark)
    n_emitted = emitted.count()
    dupes_dropped = n_emitted == n_original and n_fed > n_emitted
    return (
        emitted.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").alias("sum_value"),
        )
        .withColumn("dupes_dropped", F.lit(bool(dupes_dropped)))
    )


# ---------------------------------------------------------------------------
# x142 (round 16): the CONTINUOUS AGGREGATE materialized into a PK
# table (upsert rollup), oracled — the update-mode complement of
# x135's append-mode cutoff: every trigger re-emits the windows it
# touched (open windows INCLUDED) and the PK sink's last-write-wins
# merge converges on exactly the full batch aggregate.
# ---------------------------------------------------------------------------

_SQL_CONTINUOUS_ROLLUP = """
SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       TRUE AS multi_commit, TRUE AS pk_unique
FROM events GROUP BY 1, 2
"""


@query("x142_continuous_rollup_upsert", oracle=_SQL_CONTINUOUS_ROLLUP)
def x142_continuous_rollup_upsert(spark, sf_dir):
    """Upsert-materialized continuous aggregate end to end, oracled:
    events stream in two maxFilesPerTrigger=1 micro-batches (split by
    event_id parity, so most windows are touched TWICE) through
    ``tumbling_agg`` in UPDATE output mode into a PK lakehouse table
    keyed (window_start, event_type). Each trigger upserts the windows
    it revised — open windows included — and last-write-wins keeps the
    newest image, so the end state equals the FULL batch aggregate
    with no held-back window (the exact complement of x135's
    append-mode cutoff). ``multi_commit`` pins one upsert commit per
    trigger (snapshot count >= 2); ``pk_unique`` pins the LWW
    invariant (one row per key) (streaming/pipelines.py Pipeline
    output_mode + lakehouse PK upsert; Paimon's aggregation-downstream
    rollup pattern, SURVEY §2.9).

    The watermark horizon is set past the corpus span so the
    event_id-parity replay is deterministic (neither file's rows are
    ever late); production uses a real horizon — update mode's
    emission does not depend on it.

    Scale shape: windowed-agg state per (window, key); each upsert
    commit shuffles only the touched windows into the PK buckets."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import Pipeline
    from advent_of_code_flink_paimon_spark.streaming.windows import tumbling_agg

    wh = _mhidx_warehouse("rollup142", sf_dir)
    catalog = Catalog(wh, "default")
    sink = catalog.create_table(
        "daily_rollup",
        "window_start timestamp, window_end timestamp, event_type string, "
        "n long, sum_value decimal(28,6)",
        {"primary-key": ["window_start", "event_type"], "bucket": "2"},
    )
    ev = T(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type",
        F.col("value").cast("decimal(18,6)").alias("value"),
    )
    src_dir = _os.path.join(wh, "events-src")
    _shutil.rmtree(src_dir, ignore_errors=True)
    ev.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0).coalesce(1).write.parquet(src_dir)
    ev.filter(F.pmod(F.col("event_id"), F.lit(2)) == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value decimal(18,6)"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = Pipeline(
        "rollup142",
        tumbling_agg(stream.drop("event_id"), "ts", ["event_type"],
                     window="1 day", watermark="40 days"),
        sink,
        mode="upsert",
        available_now=True,
        output_mode="update",
    ).run()
    multi_commit = (sink.latest_snapshot_id() or 0) >= 2
    emitted = sink.read(spark)
    pk_unique = (
        emitted.count()
        == emitted.select("window_start", "event_type").distinct().count()
    )
    return emitted.select(
        "window_start",
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.lit(bool(multi_commit)).alias("multi_commit"),
        F.lit(bool(pk_unique)).alias("pk_unique"),
    )


# x141/x142 (streaming dedup + upsert-materialized continuous rollup
# end states) were PROMOTED into the round-17 scored window per
# VERDICT r16 ask #1 — their first driver rows.


# ---------------------------------------------------------------------------
# x144 (round 16): the custom stateful EWMA — the LAST [S]-only custom
# stateful operator — oracled BIT-EXACTLY. The sequential float fold
# (ewma = a*v + (1-a)*ewma) was assumed oracle-unreachable; it is not:
# with alpha = 0.5 every coefficient is a power of two and DuckDB's
# list_reduce replays the identical IEEE-double recurrence in the
# identical order, so the Python state fold and the SQL replay agree
# to the last bit (prototyped: 500-element folds bit-equal).
# ---------------------------------------------------------------------------

_SQL_STATEFUL_EWMA = """
WITH collapsed AS (
  SELECT user_id, ts, MAX(value) AS value
  FROM events GROUP BY user_id, ts
),
seq AS (
  SELECT user_id, list(value ORDER BY ts) AS vs, COUNT(*) AS n
  FROM collapsed GROUP BY user_id
)
SELECT user_id,
       list_reduce(vs, (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma,
       CAST(n AS BIGINT) AS n_seen,
       TRUE AS multi_commit, TRUE AS state_carried
FROM seq
"""


@query("x144_stateful_ewma", oracle=_SQL_STATEFUL_EWMA)
def x144_stateful_ewma(spark, sf_dir):
    """Custom stateful EWMA end to end, oracled bit-exactly: events
    stream in two time-ordered maxFilesPerTrigger=1 micro-batches
    through ``stateful_ewma`` (applyInPandasWithState, one (ewma, n)
    state per user, alpha=0.5) into a PK lakehouse sink in update
    output mode. Alpha 0.5 makes every fold coefficient a power of
    two, so DuckDB's ``list_reduce`` over the ts-ordered value list
    replays the exact IEEE recurrence — the per-key Python state fold
    and the SQL replay agree to the last bit, no rounding tolerance
    anywhere (streaming/windows.py stateful_ewma; the engine's custom
    stateful escape hatch, SURVEY §2.9/§2.10).

    Determinism: (user_id, ts) is unique in the corpus and the card
    still pre-collapses to MAX(value) per (user_id, ts) on BOTH sides
    so hypothetical ties cannot make the fold order ambiguous; the
    time-split files are mtime-ordered (the early file is backdated)
    so trigger order equals event-time order. ``state_carried`` is
    computed: total n_seen across users equals the corpus row count
    only if trigger-2 folds CONTINUED from trigger-1 state rather
    than restarting. ``multi_commit`` pins one upsert commit per
    trigger.

    Scale shape: state is one (double, long) per key, sharded by the
    groupBy hash; each trigger folds only its new rows."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import Pipeline
    from advent_of_code_flink_paimon_spark.streaming.windows import stateful_ewma

    wh = _mhidx_warehouse("ewma144", sf_dir)
    catalog = Catalog(wh, "default")
    sink = catalog.create_table(
        "user_ewma",
        "user_id long, ewma double, n_seen long",
        {"primary-key": "user_id", "bucket": "2"},
    )
    # one aggregation pass, not three: count + both split writes read
    # the persisted collapse (r18 optimization, guide §5 — the unpinned
    # form re-ran the (user_id, ts) aggregation per consumer); released
    # before the streaming run so nothing stays resident
    ev = (
        T(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .persist()
    )
    n_rows_total = ev.count()
    split_ts = "2024-01-16 00:00:00"
    src_dir = _os.path.join(wh, "events-src")
    _shutil.rmtree(src_dir, ignore_errors=True)
    ev.filter(F.col("ts") < split_ts).coalesce(1).write.parquet(src_dir)
    early = [
        _os.path.join(src_dir, f)
        for f in _os.listdir(src_dir)
        if f.endswith(".parquet")
    ]
    ev.filter(F.col("ts") >= split_ts).coalesce(1).write.mode("append").parquet(src_dir)
    ev.unpersist()
    for f in early:  # backdate so mtime order == event-time order
        _os.utime(f, (1_000_000_000, 1_000_000_000))
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = Pipeline(
        "ewma144",
        stateful_ewma(stream, key_col="user_id", value_col="value",
                      ts_col="ts", alpha=0.5, watermark="40 days"),
        sink,
        mode="upsert",
        available_now=True,
        output_mode="update",
    ).run()
    multi_commit = (sink.latest_snapshot_id() or 0) >= 2
    emitted = sink.read(spark)
    carried = (emitted.agg(F.sum("n_seen")).collect()[0][0] or 0) == n_rows_total
    return emitted.select(
        "user_id",
        "ewma",
        "n_seen",
        F.lit(bool(multi_commit)).alias("multi_commit"),
        F.lit(bool(carried)).alias("state_carried"),
    )


# x144 (the bit-exactly-oracled custom stateful EWMA) was PROMOTED
# into the round-17 scored window per VERDICT r16 ask #1 — its first
# driver row.


# Round-17 demotion (relational.py's share of the 13 slots freed for
# the VERDICT r16 ask #1 promotions): x100 join-key skew report
# (telemetry class driver-evidenced by x107 event-rate anomaly, r16
# row). Remains strict-oracle gated by the local harness.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r17f  # noqa: E402

_demote_r17f("x100_join_key_skew")
del _demote_r17f


# ---------------------------------------------------------------------------
# x145 (round 17): LEFT-OUTER stream-stream interval join end to end,
# oracled — x139 closed the inner case; the outer case adds the
# watermark-gated NULL emission (an unmatched left row may only be
# emitted once the watermark proves no matching right row can still
# arrive), which is the semantically hard half of Flink/Spark outer
# interval joins. Clicks LEFT OUTER JOIN purchases within ±30 min:
# matches emit on match (same as inner); unmatched clicks emit
# null-padded exactly when cts + 30 min falls below the final global
# watermark = LEAST(max click ts, max purchase ts) (zero-delay
# watermarks, availableNow's trailing zero-data batch advances the
# watermark over the last file — the x135 cutoff protocol applied to
# outer-join emission). DuckDB replays both populations.
# ---------------------------------------------------------------------------

_SQL_STREAM_OUTER_JOIN = """
WITH clicks AS (
  SELECT user_id, ts AS cts, value AS cval FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, ts AS pts, value AS pval FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT LEAST((SELECT MAX(cts) FROM clicks), (SELECT MAX(pts) FROM purch)) AS w
),
pairs AS (
  SELECT c.user_id, c.cval, p.pval
  FROM clicks c JOIN purch p
    ON c.user_id = p.user_id
   AND p.pts >= c.cts - INTERVAL 30 MINUTE
   AND p.pts <= c.cts + INTERVAL 30 MINUTE
),
unmatched AS (
  SELECT c.user_id, c.cval, CAST(NULL AS DOUBLE) AS pval
  FROM clicks c, wm
  WHERE c.cts + INTERVAL 30 MINUTE < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM purch p
      WHERE p.user_id = c.user_id
        AND p.pts >= c.cts - INTERVAL 30 MINUTE
        AND p.pts <= c.cts + INTERVAL 30 MINUTE
    )
)
SELECT user_id, COUNT(*) AS n_rows,
       CAST(COUNT(pval) AS BIGINT) AS n_matched,
       CAST(SUM(CAST(cval AS DECIMAL(18,6))) AS DOUBLE) AS sum_click_value,
       CAST(SUM(CAST(pval AS DECIMAL(18,6))) AS DOUBLE) AS sum_purchase_value,
       TRUE AS outer_complete
FROM (SELECT * FROM pairs UNION ALL SELECT * FROM unmatched)
GROUP BY user_id
"""


@query("x145_stream_outer_join", oracle=_SQL_STREAM_OUTER_JOIN)
def x145_stream_outer_join(spark, sf_dir):
    """Watermarked LEFT-OUTER stream-stream interval join end to end,
    oracled: clicks and purchases stream in two mtime-pinned files per
    side (ts-split, so keyed join state crosses a real trigger
    boundary) through ``stream_stream_join(..., how="left_outer")``
    into a lakehouse sink via availableNow. Matched pairs emit on
    match; an unmatched click emits (cval, NULL) only when the global
    watermark passes cts + 30 min — clicks whose no-match status the
    watermark cannot yet prove are HELD BACK in state, and the oracle
    replays exactly that split: the final watermark is
    LEAST(max click ts, max purchase ts) under the zero-delay
    watermark, so DuckDB emits null rows solely for globally
    unmatched clicks with cts + 30 min below it
    (streaming/windows.py stream_stream_join; Flink outer interval
    join semantics; the x135/x139 end-state protocol — SURVEY §2.9).

    ``outer_complete`` is computed, not asserted: emitted rows must
    equal batch pairs + watermark-eligible unmatched clicks exactly.

    Scale shape: identical to x139 (both sides shuffle on user_id,
    state bounded by watermark + interval); the null path adds no
    exchange — eviction emits from the same keyed store."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import Pipeline
    from advent_of_code_flink_paimon_spark.streaming.windows import stream_stream_join

    wh = _mhidx_warehouse("ssouter145", sf_dir)
    catalog = Catalog(wh, "default")
    sink = catalog.create_table(
        "click_purchase_outer",
        "user_id long, cval double, pval double",
        {"bucket": "1"},
    )
    ev = T(spark, sf_dir, "events").select("ts", "user_id", "event_type", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("value").alias("cval")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("value").alias("pval")
    )
    split_ts = "2024-01-16 00:00:00"
    c_dir = _os.path.join(wh, "clicks-src")
    p_dir = _os.path.join(wh, "purchases-src")
    for d, df, ts_col in ((c_dir, clicks, "cts"), (p_dir, purchases, "pts")):
        _shutil.rmtree(d, ignore_errors=True)
        df.filter(F.col(ts_col) < split_ts).coalesce(1).write.parquet(d)
        early = [
            _os.path.join(d, f) for f in _os.listdir(d) if f.endswith(".parquet")
        ]
        df.filter(F.col(ts_col) >= split_ts).coalesce(1).write.mode("append").parquet(d)
        for f in early:  # backdate: trigger order == event-time order
            _os.utime(f, (1_000_000_000, 1_000_000_000))
    cs = (
        spark.readStream.schema("user_id long, cts timestamp, cval double")
        .option("maxFilesPerTrigger", "1").parquet(c_dir)
    )
    ps = (
        spark.readStream.schema("user_id long, pts timestamp, pval double")
        .option("maxFilesPerTrigger", "1").parquet(p_dir)
    )
    joined = stream_stream_join(
        cs, ps, on="user_id", left_ts="cts", right_ts="pts",
        watermark="0 seconds", within="30 minutes", how="left_outer",
    ).select(cs.user_id, "cval", "pval")
    q = Pipeline(
        "ssouter145", joined, sink, mode="append", available_now=True
    ).run()
    # batch-derived ground truth (computed, not asserted): pair count +
    # watermark-eligible unmatched count must equal the emitted rows
    iv = F.expr("interval 30 minutes")
    match_cond = (
        (clicks.user_id == purchases.user_id)
        & (purchases.pts >= clicks.cts - iv)
        & (purchases.pts <= clicks.cts + iv)
    )
    n_pairs = clicks.join(purchases, match_cond).count()
    wm_row = clicks.agg(F.max("cts").alias("mc")).crossJoin(
        purchases.agg(F.max("pts").alias("mp"))
    ).select(F.least("mc", "mp").alias("w")).collect()[0]
    eligible_nulls = (
        clicks.join(purchases, match_cond, "left_anti")
        .filter(F.col("cts") + iv < F.lit(wm_row.w))
        .count()
    )
    emitted = sink.read(spark)
    outer_complete = emitted.count() == n_pairs + eligible_nulls
    return (
        emitted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.col("pval")).cast("long").alias("n_matched"),
            F.sum(F.col("cval").cast("decimal(18,6)"))
            .cast("double").alias("sum_click_value"),
            F.sum(F.col("pval").cast("decimal(18,6)"))
            .cast("double").alias("sum_purchase_value"),
        )
        .withColumn("outer_complete", F.lit(bool(outer_complete)))
    )


# x145 ships library-gated (the established path for mid-round
# additions: the scored window and the 100-entry registry are full);
# the strict local harness oracles it every run and it queues for the
# round-18 rotation behind the x112-x131 lifecycle cards.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r17h  # noqa: E402

_demote_r17h("x145_stream_outer_join")
del _demote_r17h


# ---------------------------------------------------------------------------
# x147 (round 17): LATE-DATA ACCOUNTING, oracled — the third leg of
# the watermark contract. x135 oracles what append mode EMITS (the
# window_end <= watermark cutoff) and x137/x138 its sliding/session
# forms, but nothing yet pins what the watermark DROPS: a row arriving
# after the watermark passed its window is discarded at the operator,
# silently. Here the drop set is made deterministic (an old slice
# re-arrives in trigger 2, after trigger 1 established the global-max
# watermark), the sink must aggregate the ON-TIME slice only, and the
# state store's own drop counter must equal the late slice exactly.
# ---------------------------------------------------------------------------

_SQL_LATE_DATA = """
WITH on_time AS (
  SELECT ts, event_type, value FROM events WHERE ts >= TIMESTAMP '2024-01-10'
),
mx AS (SELECT MAX(ts) AS m FROM on_time),
agg AS (
  SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
         event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS sv
  FROM on_time GROUP BY 1, 2
)
SELECT window_start, event_type, n,
       CAST(sv AS DOUBLE) AS sum_value,
       TRUE AS late_rows_dropped_exactly
FROM agg, mx
WHERE window_start + INTERVAL 1 DAY <= m
"""


@query("x147_late_data_accounting", oracle=_SQL_LATE_DATA)
def x147_late_data_accounting(spark, sf_dir):
    """Watermark late-data drop semantics end to end, oracled: events
    stream through ``tumbling_agg`` (1-day windows, zero-delay
    watermark, append mode) in three mtime-pinned files — the RECENT
    slice (ts >= 2024-01-10) split across triggers 1-2, the OLD slice
    re-arriving LAST. Triggers 1-2 advance the late-filter watermark
    past every old window (see the in-body comment on the
    late-events/eviction watermark lag), so every trigger-3 row's
    window is provably closed and the operator must drop ALL of
    them: the sink equals the on-time aggregate alone
    (with x135's window_end <= watermark emission cutoff), and
    ``late_rows_dropped_exactly`` pins the state store's own
    numRowsDroppedByWatermark counter (summed over recentProgress)
    against the DISTINCT late (window, key) group count — the
    stateful exchange receives map-side partial aggregates, one per
    (window, key) per upstream partition (a single-file trigger = one
    partition), so the counter counts dropped PARTIALS, not raw rows
    — the drop is counted at the operator, not inferred from the
    output
    (streaming/windows.py tumbling_agg; Spark/Flink allowed-lateness
    contract, SURVEY §2.9 — completes x135/x137/x138's emission-side
    oracles with the drop side).

    Scale shape: identical to x135 (per-(window,key) state, append
    emission); late rows cost one watermark comparison each and never
    touch state."""
    import os as _os
    import shutil as _shutil

    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.operators.dedup import _mhidx_warehouse
    from advent_of_code_flink_paimon_spark.streaming.pipelines import Pipeline
    from advent_of_code_flink_paimon_spark.streaming.windows import tumbling_agg

    wh = _mhidx_warehouse("latedrop147", sf_dir)
    catalog = Catalog(wh, "default")
    sink = catalog.create_table(
        "ontime_daily_counts",
        "window_start timestamp, event_type string, n long, "
        "sum_value decimal(28,6)",
        {"bucket": "1"},
    )
    split_ts = "2024-01-10 00:00:00"
    mid_ts = "2024-01-25 00:00:00"
    ev = T(spark, sf_dir, "events").select(
        "ts", "event_type", F.col("value").cast("decimal(18,6)").alias("value")
    )
    src_dir = _os.path.join(wh, "events-src")
    _shutil.rmtree(src_dir, ignore_errors=True)
    # THREE mtime-ordered triggers, because Spark's stateful operators
    # filter late records against the PREVIOUS batch's eviction
    # watermark (the one-batch lag of SPARK-40925's
    # late-events/eviction watermark split): with only two files the
    # late slice would arrive while the late-filter watermark is still
    # at epoch and be absorbed into not-yet-evicted windows. Trigger 1
    # ([Jan 10, Jan 25)) establishes the max; trigger 2 ([Jan 25, ..))
    # advances BOTH watermarks past every late window and contributes
    # only to windows the trigger-1 eviction cannot have closed; so by
    # trigger 3 the old slice is provably late under either lag
    # semantics and must be dropped at the operator, counted.
    ev.filter((F.col("ts") >= split_ts) & (F.col("ts") < mid_ts)).coalesce(1).write.parquet(src_dir)
    part1 = {
        f for f in _os.listdir(src_dir) if f.endswith(".parquet")
    }
    ev.filter(F.col("ts") >= mid_ts).coalesce(1).write.mode("append").parquet(src_dir)
    part2 = {
        f for f in _os.listdir(src_dir) if f.endswith(".parquet")
    } - part1
    ev.filter(F.col("ts") < split_ts).coalesce(1).write.mode("append").parquet(src_dir)
    for f in part1:
        _os.utime(_os.path.join(src_dir, f), (1_000_000_000, 1_000_000_000))
    for f in part2:
        _os.utime(_os.path.join(src_dir, f), (1_000_000_060, 1_000_000_060))
    n_late_groups = (
        ev.filter(F.col("ts") < split_ts)
        .select(F.window("ts", "1 day"), "event_type")
        .distinct()
        .count()
    )
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value decimal(18,6)")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    agg = tumbling_agg(stream, "ts", ["event_type"], window="1 day",
                       watermark="0 seconds").select(
        "window_start", "event_type", "n", "sum_value"
    )
    q = Pipeline(
        "latedrop147", agg, sink, mode="append", available_now=True
    ).run()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    emitted = sink.read(spark)
    dropped_exactly = dropped == n_late_groups
    return emitted.select(
        "window_start",
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.lit(bool(dropped_exactly)).alias("late_rows_dropped_exactly"),
    )


# x147 ships library-gated (the established path for mid-round
# additions: the scored window and the 100-entry registry are full);
# the strict local harness oracles it every run and it queues for the
# round-18 rotation behind the x112-x131 lifecycle cards.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r17i  # noqa: E402

_demote_r17i("x147_late_data_accounting")
del _demote_r17i
