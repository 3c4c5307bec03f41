"""Query catalog — every SURVEY §2 capability bound to the driver's
testdata tables, each with a DuckDB oracle (the driver's correctness
gate, __spark_entry__.py contract).

Conventions that keep the Spark/DuckDB hash comparison stable:
- money-style sums ROUND(..., 2); ratios/averages ROUND(..., 6)
- counts as BIGINT on both sides (DuckDB SUMs cast ::BIGINT)
- timestamps rendered as 'yyyy-MM-dd HH:mm:ss' strings
- arrays rendered as comma-joined strings (operators work on real
  arrays; the serialization is only for engine-agnostic hashing)
- every computed column aliased identically on both sides

SURVEY §2 operator ids are cited per query (S/P/J/A/W/O/U/T families).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.arrays import ordered_collect
from ..functions.datelist import (
    datelist_int,
    utc_date,
    utc_date_of_ts,
    utc_ts_str,
)
from ..functions.text import (
    LANG_MARKERS,
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id_heuristic,
    quality_score,
    token_count,
)
from ..operators.dedup import dedup_keep_first, dedup_minhash_lsh, dedup_simhash
from ..operators.funnel import funnel_conversion
from ..operators.graph import build_edges_pairs_grouped
from ..operators.growth import growth_accounting, retention_curve
from ..operators.scd import scd_from_snapshots
from ..operators.similarity import cosine_topk_bruteforce, cosine_topk_lsh
from ..sources.readers import load_table

GROWTH_DS = "2024-01-15"
DATELIST_REF = "2024-01-31"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _arr_str(arr):
    """Comma-joined string rendering of an array column (both engines
    stringify longs/dates identically)."""
    return F.concat_ws(",", F.transform(arr, lambda x: x.cast("string")))


# ---------------------------------------------------------------------------
# TPC-H-style relational core
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: scan+filter+groupBy/agg (S1, P3, A1-A3, O1).

    TPC-H Q1 shape over lineitem: pushdown-able date filter, partial+
    final hash aggregation (A17) on low-cardinality keys.
    """
    from ..functions.datelist import utc_ts_lit

    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        # utc_ts_lit, NOT lit(...).cast("timestamp"): the string cast
        # parses in session TZ, and the r12 Kolkata probe showed it
        # dropping the 26 rows AT the cutoff instant under a +05:30
        # session (midnight-valued shipdates sit exactly on the bound)
        li.where(F.col("l_shipdate") <= utc_ts_lit("2001-06-30"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-30'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by aggregate (A15, O1, O2) + broadcast inner join (J3/J13)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "total_revenue", "n_orders")
        .orderBy(F.desc("total_revenue"), F.asc("c_custkey"))
        .limit(10)
    )


ORACLE_TOP_CUSTOMERS = """
SELECT c_custkey, c_name,
       ROUND(SUM(o_totalprice), 2) AS total_revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_revenue DESC, c_custkey
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-dim join chain (J3, J13): orders→customer→nation→region."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ORACLE_REGION_REVENUE = """
SELECT r_name, ROUND(SUM(o_totalprice), 2) AS total_revenue, COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS + GROUPING() discriminator (A9,
    M4A/lecture-lab/grouping_sets.sql:13-33)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT CASE
                 WHEN GROUPING(o_orderstatus) = 0 AND GROUPING(o_orderpriority) = 0
                   THEN 'status_priority'
                 WHEN GROUPING(o_orderstatus) = 0 THEN 'status'
                 WHEN GROUPING(o_orderpriority) = 0 THEN 'priority'
                 ELSE 'overall'
               END AS aggregation_level,
               COALESCE(o_orderstatus, '(overall)') AS o_orderstatus,
               COALESCE(o_orderpriority, '(overall)') AS o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS (
            (o_orderstatus, o_orderpriority), (o_orderstatus),
            (o_orderpriority), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT CASE
         WHEN GROUPING(o_orderstatus) = 0 AND GROUPING(o_orderpriority) = 0
           THEN 'status_priority'
         WHEN GROUPING(o_orderstatus) = 0 THEN 'status'
         WHEN GROUPING(o_orderpriority) = 0 THEN 'priority'
         ELSE 'overall'
       END AS aggregation_level,
       COALESCE(o_orderstatus, '(overall)') AS o_orderstatus,
       COALESCE(o_orderpriority, '(overall)') AS o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS (
    (o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority), ())
"""


def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling/offset/whole-partition window frames (W5, W6, W7, W11,
    M4A/lecture-lab/window_based_analysis.sql:30-53)."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        utc_date(orders, "o_orderdate").alias("order_date")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("order_date")
    # trunc() on a DATE stays DateType (TZ-free); date_trunc() would
    # return a session-TZ-rendered midnight TIMESTAMP
    month = F.trunc(F.col("order_date"), "month")
    wm = Window.partitionBy(month).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return daily.select(
        "order_date",
        F.round("rev", 2).alias("daily_rev"),
        F.round(F.sum("rev").over(w.rowsBetween(-6, 0)), 2).alias("rolling_7d"),
        F.round(F.sum("rev").over(w.rowsBetween(-13, -7)), 2).alias("prior_7d"),
        F.round(F.sum("rev").over(wm), 2).alias("month_total"),
    )


ORACLE_ROLLING = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date, SUM(o_totalprice) AS rev
  FROM orders GROUP BY 1)
SELECT order_date,
       ROUND(rev, 2) AS daily_rev,
       ROUND(SUM(rev) OVER (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rolling_7d,
       ROUND(SUM(rev) OVER (ORDER BY order_date ROWS BETWEEN 13 PRECEDING AND 7 PRECEDING), 2) AS prior_7d,
       ROUND(SUM(rev) OVER (PARTITION BY date_trunc('month', order_date)
                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS month_total
FROM daily
"""


def q_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-1 via window (A15 + W3) with broadcast dim (J13)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    joined = rev.join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("rev"), F.asc("s_suppkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "s_nationkey",
            "s_suppkey",
            F.round("rev", 2).alias("revenue"),
        )
    )


ORACLE_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem GROUP BY 1),
ranked AS (
  SELECT s_nationkey, s_suppkey, rev,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY rev DESC, s_suppkey) AS rn
  FROM rev JOIN supplier ON l_suppkey = s_suppkey)
SELECT s_nationkey, s_suppkey, ROUND(rev, 2) AS revenue
FROM ranked WHERE rn = 1
"""


def q_customer_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity year spine: explode(sequence(min,max)) — the scalable
    rewrite of the reference's range join + lateral generate_series
    (J10, J11, J12)."""
    orders = _t(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        "o_custkey",
        F.year(utc_date(orders, "o_orderdate")).cast("long").alias(
            "order_year"
        ),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bounds = yearly.groupBy("o_custkey").agg(
        F.min("order_year").alias("y0"), F.max("order_year").alias("y1")
    )
    spine = bounds.select(
        "o_custkey",
        F.explode(F.sequence(F.col("y0"), F.col("y1"))).alias("order_year"),
    )
    return (
        spine.join(yearly, ["o_custkey", "order_year"], "left")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "order_year",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
        )
    )


ORACLE_SPINE = """
WITH yearly AS (
  SELECT o_custkey, EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2),
bounds AS (
  SELECT o_custkey, MIN(order_year) AS y0, MAX(order_year) AS y1
  FROM yearly GROUP BY 1),
spine AS (
  SELECT b.o_custkey, s.order_year
  FROM bounds b, LATERAL (SELECT UNNEST(range(b.y0, b.y1 + 1)) AS order_year) s)
SELECT s.o_custkey AS c_custkey, s.order_year,
       COALESCE(y.cnt, 0)::BIGINT AS n_orders
FROM spine s LEFT JOIN yearly y
  ON s.o_custkey = y.o_custkey AND s.order_year = y.order_year
"""


def q_part_pair_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair generation with inequality dedup (J9,
    M1/lecture-lab/player_player_edges.sql:22-26): parts co-occurring in
    the same order.

    Computed join-free (build_edges_pairs_grouped): collect the sorted
    part set per order, expand pairs with array expressions, count —
    two shuffles total versus four for the equivalent self-join, and no
    |order|² join-row materialization. The join form remains available
    as graph.build_edges_pairs (the reference's literal shape)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return build_edges_pairs_grouped(li, "l_orderkey", "l_partkey").select(
        F.col("id_a").alias("part_a"),
        F.col("id_b").alias("part_b"),
        F.col("n_groups").alias("n_orders"),
    )


ORACLE_PART_PAIRS = """
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
FROM lp a JOIN lp b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
"""


def q_part_type_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-pattern classification + CASE tiering (P5, P6)."""
    part = _t(spark, sf_dir, "part")
    tier = (
        F.when(F.col("p_type").like("%PROMO%"), "promo")
        .when(F.col("p_type").like("%ECONOMY%"), "economy")
        .when(F.col("p_size") >= 40, "large")
        .when(F.col("p_size") >= 20, "medium")
        .otherwise("small")
    )
    return (
        part.withColumn("tier", tier)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_retail"),
        )
    )


ORACLE_PART_TIERS = """
SELECT CASE
         WHEN p_type LIKE '%PROMO%' THEN 'promo'
         WHEN p_type LIKE '%ECONOMY%' THEN 'economy'
         WHEN p_size >= 40 THEN 'large'
         WHEN p_size >= 20 THEN 'medium'
         ELSE 'small'
       END AS tier,
       COUNT(*) AS n_parts,
       ROUND(AVG(p_retailprice), 6) AS avg_retail
FROM part GROUP BY 1
"""


def q_acctbal_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE value tiering (P6, M1/lecture-lab/pipeline_query.sql:29-36)."""
    cust = _t(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        cust.withColumn("tier", tier)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
    )


ORACLE_ACCTBAL = """
SELECT CASE
         WHEN c_acctbal < 0 THEN 'debt'
         WHEN c_acctbal < 1000 THEN 'low'
         WHEN c_acctbal < 5000 THEN 'mid'
         ELSE 'high'
       END AS tier,
       COUNT(*) AS n_customers,
       ROUND(AVG(c_acctbal), 6) AS avg_acctbal
FROM customer GROUP BY 1
"""


def q_union_order_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL assembly (U1, incremental_scd_query.sql:92-110 shape)."""
    orders = _t(spark, sf_dir, "orders")
    high = orders.where(F.col("o_totalprice") >= 200000).select(
        F.lit("high").alias("tier"), "o_totalprice"
    )
    low = orders.where(F.col("o_totalprice") < 200000).select(
        F.lit("low").alias("tier"), "o_totalprice"
    )
    return (
        high.unionByName(low)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


ORACLE_UNION_TIERS = """
WITH u AS (
  SELECT 'high' AS tier, o_totalprice FROM orders WHERE o_totalprice >= 200000
  UNION ALL
  SELECT 'low' AS tier, o_totalprice FROM orders WHERE o_totalprice < 200000)
SELECT tier, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
FROM u GROUP BY tier
"""


def q_filter_by_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter on a top-1-derived scalar (P8, O6 — expressed as a
    broadcast semi-join instead of a driver-side collect)."""
    ev = _t(spark, sf_dir, "events")
    top = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .limit(1)
        .select("event_type")
    )
    return (
        ev.join(F.broadcast(top), "event_type")
        .groupBy(utc_date_of_ts("ts").alias("event_date"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


ORACLE_FILTER_TOP1 = """
WITH top AS (
  SELECT event_type FROM events GROUP BY 1
  ORDER BY COUNT(*) DESC, event_type LIMIT 1)
SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events
FROM events JOIN top USING (event_type)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# fact modeling / analytical patterns over events
# ---------------------------------------------------------------------------

def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion (A14 dedup + J8 self theta-join + P7 HAVING)."""
    ev = _t(spark, sf_dir, "events")
    return funnel_conversion(ev, "view", "purchase")


ORACLE_FUNNEL = """
WITH dedup AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS event_date, ts, event_type
  FROM events WHERE user_id IS NOT NULL),
a AS (SELECT * FROM dedup WHERE event_type = 'view'),
b AS (SELECT * FROM dedup WHERE event_type = 'purchase'),
per_user AS (
  SELECT a.event_date, a.user_id,
         MAX(CASE WHEN b.ts IS NOT NULL THEN 1 ELSE 0 END) AS converted
  FROM a LEFT JOIN b
    ON a.user_id = b.user_id AND a.event_date = b.event_date AND b.ts > a.ts
  GROUP BY 1, 2)
SELECT event_date,
       COUNT(*) AS n_users,
       SUM(converted)::BIGINT AS n_converted,
       ROUND(SUM(converted)::DOUBLE / COUNT(*), 6) AS conversion_rate
FROM per_user
GROUP BY event_date
HAVING ROUND(SUM(converted)::DOUBLE / COUNT(*), 6) > 0 AND COUNT(*) > 0
"""


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention curve (M4A/lecture-lab/retention_analysis.sql shape)."""
    ev = _t(spark, sf_dir, "events")
    out = retention_curve(ev)
    return out.select(
        F.col("days_since_first").cast("long").alias("days_since_first"),
        "active_users",
    )


ORACLE_RETENTION = """
WITH daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE user_id IS NOT NULL),
firsts AS (SELECT user_id, MIN(d) AS first_d FROM daily GROUP BY 1)
SELECT date_diff('day', f.first_d, d.d)::BIGINT AS days_since_first,
       COUNT(*) AS active_users
FROM daily d JOIN firsts f ON d.user_id = f.user_id
GROUP BY 1
"""


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting daily state machine (J1 + §7 hard-part 5,
    M4A/lecture-lab/growth_accounting.sql:19-46) for ds=GROWTH_DS.

    Builds yesterday's snapshot from history, then runs the
    `growth_accounting` operator for one daily advance.
    """
    ev = _t(spark, sf_dir, "events")
    ds = GROWTH_DS
    daily = (
        ev.where(F.col("user_id").isNotNull())
        .select("user_id", utc_date_of_ts("ts").alias("d"))
        .distinct()
    )
    hist = daily.where(F.col("d") < ds)
    yesterday = hist.groupBy("user_id").agg(
        F.min("d").alias("first_active_date"),
        F.max("d").alias("last_active_date"),
        F.sort_array(F.collect_set("d"), asc=False).alias("dates_active"),
    )
    today = ev.where(
        F.col("user_id").isNotNull() & (utc_date_of_ts("ts") == F.lit(ds))
    ).withColumn("date_active", utc_date_of_ts("ts"))
    out = growth_accounting(yesterday, today, ds)
    return out.select(
        "user_id",
        "first_active_date",
        "last_active_date",
        "daily_active_state",
        _arr_str(F.col("dates_active")).alias("dates_active"),
    )


ORACLE_GROWTH = f"""
WITH daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE user_id IS NOT NULL AND CAST(ts AS DATE) <= DATE '{GROWTH_DS}'),
agg AS (
  SELECT user_id,
         MIN(d) AS first_active_date,
         MAX(CASE WHEN d < DATE '{GROWTH_DS}' THEN d END) AS last_before,
         MAX(CASE WHEN d = DATE '{GROWTH_DS}' THEN 1 ELSE 0 END) AS active_today,
         array_to_string(list_transform(
           array_agg(DISTINCT d ORDER BY d DESC), x -> CAST(x AS VARCHAR)), ',')
           AS dates_active
  FROM daily GROUP BY user_id)
SELECT user_id, first_active_date,
       CASE WHEN active_today = 1 THEN DATE '{GROWTH_DS}' ELSE last_before END
         AS last_active_date,
       CASE
         WHEN active_today = 1 AND last_before IS NULL THEN 'New'
         WHEN active_today = 1
              AND date_diff('day', last_before, DATE '{GROWTH_DS}') = 1 THEN 'Retained'
         WHEN active_today = 1
              AND date_diff('day', last_before, DATE '{GROWTH_DS}') > 1 THEN 'Resurrected'
         WHEN active_today = 0
              AND date_diff('day', last_before, DATE '{GROWTH_DS}') = 1 THEN 'Churned'
         ELSE 'Stale'
       END AS daily_active_state,
       dates_active
FROM agg
"""


def q_scd_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 backfill (W1 LAG change detection + W2 streak sum +
    A1 min/max, M1/lecture-lab/scd_generation_query.sql:1-35): collapse
    each user's daily dominant event_type into validity ranges."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id", utc_date_of_ts("ts").alias("d"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dominant = dedup_keep_first(
        daily, ["user_id", "d"], [F.desc("c"), F.asc("event_type")]
    ).select("user_id", "d", F.col("event_type").alias("dominant"))
    scd = scd_from_snapshots(dominant, "user_id", "d", ["dominant"])
    return scd.select(
        "user_id",
        F.col("dominant").alias("event_type"),
        F.col("start_d").alias("start_date"),
        F.col("end_d").alias("end_date"),
    )


ORACLE_SCD = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, event_type, COUNT(*) AS c
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2, 3),
dom AS (
  SELECT user_id, d, event_type FROM (
    SELECT user_id, d, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, d
                              ORDER BY c DESC, event_type) AS rn
    FROM daily) WHERE rn = 1),
flagged AS (
  SELECT user_id, d, event_type,
         CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY d)
                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS did_change
  FROM dom),
streaks AS (
  SELECT *, SUM(did_change) OVER (PARTITION BY user_id ORDER BY d
                                  ROWS UNBOUNDED PRECEDING) AS streak
  FROM flagged)
SELECT user_id, event_type, MIN(d) AS start_date, MAX(d) AS end_date
FROM streaks GROUP BY user_id, event_type, streak
"""


def q_users_cumulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative date-list table (J1 cumulation endpoint state,
    M2/lecture-lab/user_cumulated_populate.sql; A7 distinct array agg).

    Catalog form computes the final-state snapshot directly; the
    day-by-day cumulate_datelist operator is exercised in unit tests.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            _arr_str(F.sort_array(F.collect_set(utc_date_of_ts("ts")))).alias(
                "dates_active"
            ),
            F.countDistinct(utc_date_of_ts("ts")).alias("n_days"),
        )
    )


ORACLE_USERS_CUMULATED = """
SELECT user_id,
       array_to_string(list_transform(
         array_agg(DISTINCT CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)),
         x -> CAST(x AS VARCHAR)), ',') AS dates_active,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id
"""


def q_datelist_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIT(32)-style datelist_int bitmask (A10/A11 + §7 hard-part 2,
    M2/lecture-lab/anaylze_datelist.sql:11-31): bit i = ref_date - i
    active. Probes: BIT_COUNT + low-7-bit weekly mask."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("user_id").isNotNull())
        .select("user_id", utc_date_of_ts("ts").alias("d"))
        .distinct()
    )
    ref = F.lit(DATELIST_REF).cast("date")
    return (
        daily.groupBy("user_id")
        .agg(datelist_int(F.col("d"), ref).alias("datelist_int"))
        .select(
            "user_id",
            "datelist_int",
            F.bit_count("datelist_int").cast("int").alias("active_days"),
            (F.col("datelist_int").bitwiseAND(F.lit(127)) > 0).alias(
                "active_last_week"
            ),
        )
    )


ORACLE_DATELIST = f"""
WITH daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE user_id IS NOT NULL),
mask AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN date_diff('day', d, DATE '{DATELIST_REF}')
                            BETWEEN 0 AND 31
                       THEN (CAST(1 AS BIGINT) << date_diff('day', d, DATE '{DATELIST_REF}'))
                       ELSE 0 END) AS BIGINT) AS datelist_int
  FROM daily GROUP BY user_id)
SELECT user_id, datelist_int,
       bit_count(datelist_int)::INT AS active_days,
       (datelist_int & 127) > 0 AS active_last_week
FROM mask
"""


def q_array_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly array metrics (A12/A13 element-wise array aggregation +
    J12 date spine + W10 ordered collect,
    M2/lecture-lab/array_metrics_analysis.sql): one slot per January
    day, zero-filled."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.where(
            F.col("user_id").isNotNull()
            & (F.trunc(utc_date_of_ts("ts"), "month")
               == F.lit("2024-01-01").cast("date"))
        )
        .groupBy(
            "user_id", F.dayofmonth(utc_date_of_ts("ts")).alias("di")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    users = daily.select("user_id").distinct()
    spine = users.select(
        "user_id", F.explode(F.sequence(F.lit(1), F.lit(31))).alias("di")
    )
    filled = spine.join(daily, ["user_id", "di"], "left").select(
        "user_id", "di", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )
    return filled.groupBy("user_id").agg(
        _arr_str(ordered_collect("c", "di")).alias("hit_array"),
        F.sum("c").alias("total_hits"),
    )


ORACLE_ARRAY_METRICS = """
WITH daily AS (
  SELECT user_id, EXTRACT(day FROM ts)::INT AS di, COUNT(*) AS c
  FROM events
  WHERE user_id IS NOT NULL
    AND date_trunc('month', CAST(ts AS DATE)) = DATE '2024-01-01'
  GROUP BY 1, 2),
users AS (SELECT DISTINCT user_id FROM daily),
spine AS (
  SELECT u.user_id, s.di
  FROM users u, LATERAL (SELECT UNNEST(range(1, 32)) AS di) s),
filled AS (
  SELECT s.user_id, s.di, COALESCE(d.c, 0)::BIGINT AS c
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.di = d.di)
SELECT user_id,
       array_to_string(list_transform(array_agg(c ORDER BY di),
                                      x -> CAST(x AS VARCHAR)), ',') AS hit_array,
       SUM(c)::BIGINT AS total_hits
FROM filled GROUP BY user_id
"""


def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority dedup (W3/W4, M2/homework/assignmnet_2.sql:47-67): best
    row per (user, type, day) with a deterministic total order."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ev = ev.withColumn("event_date", utc_date_of_ts("ts"))
    kept = dedup_keep_first(
        ev,
        ["user_id", "event_type", "event_date"],
        [F.asc("ts"), F.asc("event_id")],
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


ORACLE_DEDUP_KEEP_FIRST = """
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id IS NOT NULL)
SELECT event_type, COUNT(*) AS n_rows, ROUND(SUM(value), 2) AS sum_value
FROM ranked WHERE rn = 1
GROUP BY event_type
"""


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + conditional distinct counts (A4, A5)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.when(F.col("value") > 50, F.col("user_id"))).alias(
            "n_users_high_value"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_DISTINCT_USERS = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CASE WHEN value > 50 THEN user_id END) AS n_users_high_value,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization, 5-minute gap (T5 homework spec,
    M4F/homework/homework.md:1-7) via gaps-and-islands (W1+W2)."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(prev.isNull() | ((us - prev) > 300_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        utc_ts_str(F.min("ts")).alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.unix_micros(F.col("ts"))) - F.min(F.unix_micros(F.col("ts")))).alias(
            "duration_us"
        ),
    ).drop("session_id").select("user_id", "session_start", "n_events", "duration_us")


ORACLE_SESSIONS = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 300000000
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       (MAX(epoch_us(ts)) - MIN(epoch_us(ts)))::BIGINT AS duration_us
FROM sessions GROUP BY user_id, session_id
"""


def q_tumbling_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window aggregation (T3 batch analog,
    M4F/src/job/aggregation_job.py:96-108)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("num_hits"))
        .select(
            utc_ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "num_hits",
        )
    )


ORACLE_TUMBLING = """
SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       COUNT(*) AS num_hits
FROM events GROUP BY 1, 2
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (§2.8 map/JSON family,
    json_build_object inverse — get_json_object)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k_bucket", k % 10)
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


ORACLE_JSON = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n_events,
       ROUND(AVG(value), 6) AS avg_value
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# training-data pipeline: documents / embeddings
# ---------------------------------------------------------------------------

def q_doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint (hash-groupBy; md5 chosen
    because it is identical across engines)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("fingerprint", doc_fingerprint(F.col("text")))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


ORACLE_DOC_EXACT = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1
"""


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + per-source stats (text-analysis layer):
    whitespace tokens AND the GPT-2-style BPE-ish pre-tokenizer count
    (functions.text.BPE_ISH_PATTERN — same regex runs in DuckDB's RE2,
    so the proxy is oracle-checked)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("tc", token_count(F.col("text")))
        .withColumn("bc", bpe_ish_token_count(F.col("text")))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tc").cast("long").alias("total_tokens"),
            F.sum("bc").cast("long").alias("total_bpe_tokens"),
            F.round(F.avg("tc"), 6).alias("avg_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


ORACLE_DOC_TOKENS = """
WITH t AS (
  SELECT source, n_chars,
         length(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS tc,
         length(regexp_extract_all(text,
           '''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'))
           AS bc
  FROM documents)
SELECT source, COUNT(*) AS n_docs,
       SUM(tc)::BIGINT AS total_tokens,
       SUM(bc)::BIGINT AS total_bpe_tokens,
       ROUND(AVG(tc), 6) AS avg_tokens,
       ROUND(AVG(n_chars), 6) AS avg_chars
FROM t GROUP BY source
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score (deterministic heuristic; see
    functions.text.quality_score)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


ORACLE_DOC_QUALITY = """
WITH base AS (
  SELECT doc_id,
         length(text)::DOUBLE AS n,
         length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE AS n_alpha,
         length(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> ''))::DOUBLE AS tc
  FROM documents),
scored AS (
  SELECT doc_id,
         CASE WHEN n > 0 THEN n_alpha / n ELSE 0.0 END AS alpha_ratio,
         CASE WHEN tc > 0 THEN n / tc ELSE 0.0 END AS mean_tok,
         CASE WHEN n >= 50 AND n <= 20000 THEN 1.0 ELSE 0.5 END AS len_band
  FROM base)
SELECT doc_id,
       ROUND(alpha_ratio * 0.5 + len_band * 0.25 +
             (CASE WHEN mean_tok >= 3 AND mean_tok <= 12 THEN 1.0 ELSE 0.5 END) * 0.25,
             6) AS quality
FROM scored
"""


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (n-gram heuristic family)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("lang_pred", lang_id_heuristic(F.col("text")))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _lang_oracle() -> str:
    hits = []
    for lang, words in LANG_MARKERS.items():
        expr = " + ".join(
            f"(CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END)"
            for w in words
        )
        hits.append(f"({expr}) AS h_{lang}")
    case_order = list(LANG_MARKERS)  # earlier languages win ties
    cases = "\n         ".join(
        f"WHEN h_{lang} = best THEN '{lang}'" for lang in case_order
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
hits AS (
  SELECT doc_id, {", ".join(hits)}
  FROM toks),
best AS (
  SELECT doc_id, h_en, h_es, h_fr, h_de,
         greatest(h_en, h_es, h_fr, h_de) AS best
  FROM hits)
SELECT CASE WHEN best = 0 THEN 'und'
         {cases}
         ELSE 'und' END AS lang_pred,
       COUNT(*) AS n_docs
FROM best GROUP BY 1
"""


ORACLE_DOC_LANG = _lang_oracle()


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, Jaccard >= 0.8.

    Banding 128 hashes as 16 bands of 8: near-dup pairs in this corpus
    sit at j>=0.92 (per-band hit 0.92^8=0.51 → miss (1-0.51)^16 ≈ 1e-5)
    while the ~0.2 background similarity collides a band only 0.2^8 ≈
    2.6e-6 of the time — candidate pairs stay ~O(true pairs), not
    O(n²)/100. (Shorter bands guarantee recall closer to the 0.8
    threshold but admit quadratically many candidates on a shared-
    vocabulary corpus, and the exact-Jaccard verify on the candidates
    then dominates the runtime ~50x.) The extra 64 hashes are cheap:
    signatures are one vectorized Arrow-batched numpy pass. The DuckDB
    oracle computes the exhaustive O(n²) pairwise Jaccard, which only
    works at test scale; banded LSH is the 100 TB path.
    """
    docs = _t(spark, sf_dir, "documents")
    return dedup_minhash_lsh(
        docs, num_hashes=128, bands=16, jaccard_threshold=0.8
    )


ORACLE_MINHASH = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) - 4, 1) + 1),
           i -> substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), i::INT, 5)))
           AS shingles
  FROM documents),
pairs AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         length(list_intersect(a.shingles, b.shingles))::DOUBLE AS inter,
         length(list_distinct(list_concat(a.shingles, b.shingles)))::DOUBLE AS uni
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT doc_id_a, doc_id_b, ROUND(inter / uni, 6) AS jaccard
FROM pairs WHERE inter / uni >= 0.8
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, Hamming <= 3 over a 60-bit fingerprint.

    Fingerprint n-gram hashes are md5-derived (dedup.md5_hash60) so the
    DuckDB oracle recomputes the EXACT fingerprints and verifies the
    pair set by brute-force Hamming — the Spark side's pigeonhole chunk
    blocking (4x15-bit chunks) is exact for Hamming <= 3, so blocked
    and brute-force answers coincide and the oracle is a true gate.
    """
    docs = _t(spark, sf_dir, "documents")
    out = dedup_simhash(docs, max_hamming=3, hash_fn="md5")
    return out.withColumn("hamming", F.col("hamming").cast("long"))


ORACLE_SIMHASH = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
                                                      'g')), ' '),
                     t -> t <> '') AS tk
  FROM documents),
grams AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 2 THEN
           list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
         ELSE [array_to_string(tk, ' ')] END AS g
  FROM toks),
gh AS (
  SELECT doc_id, CAST('0x' || substr(md5(unnest(g)), 1, 15) AS BIGINT) AS h
  FROM grams),
bits AS (
  SELECT gh.doc_id, bs.b,
         SUM(CASE WHEN ((gh.h >> bs.b) & 1) = 1 THEN 1 ELSE -1 END) AS c
  FROM gh CROSS JOIN (SELECT unnest(range(60)) AS b) bs
  GROUP BY 1, 2),
fp AS (
  SELECT doc_id,
         SUM(CASE WHEN c > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sh
  FROM bits GROUP BY 1)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.sh, b.sh))::BIGINT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over the embedding column
    (exact ANN baseline; broadcast query side)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return cosine_topk_bruteforce(emb, queries, k=5, dim=64)


ORACLE_ANN = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(
           list_sum(list_transform(range(1, len(qv) + 1),
                                   i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                                           i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(cv) + 1),
                                             i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))),
           6) AS cosine
  FROM q, c WHERE query_id <> neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank::INT AS rank
FROM ranked WHERE rank <= 5
"""


def q_ann_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate cosine top-k.

    Hyperplanes are the md5-grid matrix (similarity.md5_planes), so the
    DuckDB oracle regenerates the identical planes, recomputes every
    bucket assignment, and replays candidate-union + exact re-rank —
    the approximate query is exactly falsifiable, not rows-only.
    """
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return cosine_topk_lsh(emb, queries, dim=64, k=5, nbits=4, n_tables=16)


ORACLE_ANN_LSH = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
planes AS (
  SELECT pp.p AS p, dd.d AS d,
         CAST('0x' || substr(md5('lsh_' || pp.p || '_' || dd.d), 1, 8)
              AS BIGINT) / 2147483648.0 - 1.0 AS c
  FROM (SELECT unnest(range(64)) AS p) pp,
       (SELECT unnest(range(64)) AS d) dd),
proj AS (
  SELECT v.vec_id, pl.p, SUM(v.e[pl.d + 1] * pl.c) AS s
  FROM v, planes pl GROUP BY 1, 2),
sig AS (
  SELECT vec_id, p // 4 AS t,
         SUM(CASE WHEN s > 0 THEN 1 << (p % 4) ELSE 0 END) AS b
  FROM proj GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sig q JOIN sig c ON q.t = c.t AND q.b = c.b
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(list_dot_product(a.e, b.e) /
               (sqrt(list_dot_product(a.e, a.e)) *
                sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
  FROM cand
  JOIN v a ON a.vec_id = query_id
  JOIN v b ON b.vec_id = neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank::INT AS rank
FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "top_customers": q_top_customers,
    "region_revenue": q_region_revenue,
    "grouping_sets": q_grouping_sets,
    "rolling_revenue": q_rolling_revenue,
    "top_supplier_per_nation": q_top_supplier_per_nation,
    "customer_order_spine": q_customer_order_spine,
    "part_pair_edges": q_part_pair_edges,
    "part_type_tiers": q_part_type_tiers,
    "acctbal_tiers": q_acctbal_tiers,
    "union_order_tiers": q_union_order_tiers,
    "filter_by_top1": q_filter_by_top1,
    "funnel_conversion": q_funnel,
    "retention_curve": q_retention,
    "growth_accounting": q_growth_accounting,
    "scd_streaks": q_scd_streaks,
    "users_cumulated": q_users_cumulated,
    "datelist_int": q_datelist_int,
    "array_metrics": q_array_metrics,
    "dedup_keep_first": q_dedup_keep_first,
    "distinct_users": q_distinct_users,
    "sessionization": q_sessionization,
    "tumbling_hits": q_tumbling_hits,
    "json_props": q_json_props,
    "doc_dedup_exact": q_doc_dedup_exact,
    "doc_token_stats": q_doc_token_stats,
    "doc_quality": q_doc_quality,
    "doc_lang_id": q_doc_lang_id,
    "minhash_lsh_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_cosine_lsh": q_ann_cosine_lsh,
}

ORACLES: dict[str, str] = {
    "pricing_summary": ORACLE_PRICING,
    "top_customers": ORACLE_TOP_CUSTOMERS,
    "region_revenue": ORACLE_REGION_REVENUE,
    "grouping_sets": ORACLE_GROUPING_SETS,
    "rolling_revenue": ORACLE_ROLLING,
    "top_supplier_per_nation": ORACLE_TOP_SUPPLIER,
    "customer_order_spine": ORACLE_SPINE,
    "part_pair_edges": ORACLE_PART_PAIRS,
    "part_type_tiers": ORACLE_PART_TIERS,
    "acctbal_tiers": ORACLE_ACCTBAL,
    "union_order_tiers": ORACLE_UNION_TIERS,
    "filter_by_top1": ORACLE_FILTER_TOP1,
    "funnel_conversion": ORACLE_FUNNEL,
    "retention_curve": ORACLE_RETENTION,
    "growth_accounting": ORACLE_GROWTH,
    "scd_streaks": ORACLE_SCD,
    "users_cumulated": ORACLE_USERS_CUMULATED,
    "datelist_int": ORACLE_DATELIST,
    "array_metrics": ORACLE_ARRAY_METRICS,
    "dedup_keep_first": ORACLE_DEDUP_KEEP_FIRST,
    "distinct_users": ORACLE_DISTINCT_USERS,
    "sessionization": ORACLE_SESSIONS,
    "tumbling_hits": ORACLE_TUMBLING,
    "json_props": ORACLE_JSON,
    "doc_dedup_exact": ORACLE_DOC_EXACT,
    "doc_token_stats": ORACLE_DOC_TOKENS,
    "doc_quality": ORACLE_DOC_QUALITY,
    "doc_lang_id": ORACLE_DOC_LANG,
    "minhash_lsh_pairs": ORACLE_MINHASH,
    "simhash_pairs": ORACLE_SIMHASH,
    "ann_cosine_topk": ORACLE_ANN,
    "ann_cosine_lsh": ORACLE_ANN_LSH,
}

# extension catalog (SCD incremental, ordered history, W12 streaks,
# semi/anti, merge, n-gram/embedding near-dup, multimodal plumbing)
from .catalog_ext import EXT_ORACLES, EXT_QUERIES  # noqa: E402

QUERIES.update(EXT_QUERIES)
ORACLES.update(EXT_ORACLES)

# write-path catalog (bucketed/partitioned/sorted/CSV/insert round-trips)
from .catalog_write import WRITE_ORACLES, WRITE_QUERIES  # noqa: E402

QUERIES.update(WRITE_QUERIES)
ORACLES.update(WRITE_ORACLES)

# round-2 additions (as-of join, exact quantiles, repetition stats,
# broadcast-dict UDF enrichment, bulk rename)
from .catalog_extra import EXTRA_ORACLES, EXTRA_QUERIES  # noqa: E402

QUERIES.update(EXTRA_QUERIES)
ORACLES.update(EXTRA_ORACLES)

# round-5 additions (pivot/unpivot reshaping, chunk-level dedup,
# corpus mixing, quantile-band filtering, int8 embedding quantization)
from .catalog_mix import MIX_ORACLES, MIX_QUERIES  # noqa: E402

QUERIES.update(MIX_QUERIES)
ORACLES.update(MIX_ORACLES)

# late round-6 additions (fuzzy entity matching, gap interpolation,
# and the remaining curation-surface sketches)
from .catalog_late import LATE_ORACLES, LATE_QUERIES  # noqa: E402

QUERIES.update(LATE_QUERIES)
ORACLES.update(LATE_ORACLES)

# round-13 additions (VERDICT r12 #5/#6): iterative BPE merge training
# and BM25 retrieval scoring
from .catalog_rank import RANK_ORACLES, RANK_QUERIES  # noqa: E402

QUERIES.update(RANK_QUERIES)
ORACLES.update(RANK_ORACLES)

# ---------------------------------------------------------------------------
# Gate ordering. The round driver gates exactly the FIRST `GATE_CAP`
# entries of queries(), so registry order is a correctness-visibility
# decision. Round-6 rotation (VERDICT r5 "Next round" #1 + #5): the 13
# round-5 additions that never had a driver row (pivot_lang_counts,
# unpivot_region_metrics, chunk_dedup_rebuild, corpus_mix_plan,
# quantile_band_filter, embedding_quantize_error, ann_q8_rerank,
# streaming_interval_join, bpe_merge_candidates, streaming_upsert_sink,
# dup_span_extract, dup_span_removal, tfidf_top_terms) are promoted
# into the gated prefix, plus the graph-surface pair user_vertices /
# part_pair_edges (VERDICT #5: keep the reference's vertex/edge
# workload fresh) and the SEVEN new round-6 entries (media_resize,
# streaming_sliding_hits, rolling_time_revenue, doc_bigram_lm_score,
# semantic_dedup, compaction_rollup, snapshot_cdc_diff — gated
# immediately so they never sit in the no-driver-row state the last
# three verdicts flagged). The 22 slots come exclusively from entries
# carrying
# >= 2 cumulative green driver rows (longest_streak r4+r5,
# union_order_tiers r4+r5, retention_curve r4+r5, exact_percentiles
# r4+r5, minhash_lsh_pairs r3+r4+r5, simhash_pairs r3+r4+r5,
# ann_cosine_ivf r3+r4+r5, ann_cosine_lsh r4+r5, embedding_neardup
# r3+r4+r5, media_features r4+r5, media_frame_sample r4+r5,
# skew_salted_agg r3+r4+r5, asof_latest_order r3+r4+r5,
# hash_sample_split r4+r5, stratified_sample r4+r5,
# doc_decontaminate r4+r5, pack_token_stream r4+r5, doc_chunks r4+r5,
# table_profile r4+r5, udf_enrich_broadcast r4+r5, metadata_scan
# r4+r5, insert_select_rollup r4+r5). After this rotation EVERY registry entry has at least one
# driver CORRECTNESS row (r1 ∪ … ∪ r6).
# Rotated-out entries keep full in-repo coverage: tools/gate_check.py
# runs the ENTIRE registry with the same oracles each round.
# ---------------------------------------------------------------------------

GATE_CAP = 50  # the driver gates exactly this many leading entries

_GATE_FIRST = [
    # -----------------------------------------------------------------
    # r16 rotation (VERDICT r15 #2, the standing 3-round freshness
    # policy): promote (a) ALL 44 entries whose newest driver row is
    # r13 — exactly the cohort the r15 rotation queued at the head of
    # _GATE_REST — and (b) the SIX new r16 entries (training-shard
    # export, learned lang-ID + its confusion eval, the NB-gated
    # flagship twin, IVFPQ posting-store compaction, batched BPE),
    # gated immediately so they never sit without a driver row.
    # 44 + 6 = 50 = GATE_CAP exactly. After this rotation no entry's
    # newest driver row is older than r14.
    # the 44 entries whose newest driver row was r13
    "corpus_curation_pipeline", # flagship composed pipeline; r13 row
    "streaming_dedup",      # dropDuplicatesWithinWatermark; r13 row
    "doc_dedup_exact",      # A14; r13 row
    "doc_lang_id",          # P9; r13 row
    "doc_decontaminate",    # leakage scrub; r13 row
    "pack_token_stream",    # sequence packing; r13 row
    "doc_chunks",           # chunking primary; r13 row
    "table_profile",        # one-pass profiling; r13 row
    "udf_enrich_broadcast", # T6 / SURVEY 2.10; r13 row
    "metadata_scan",        # S8 layouts; r13 row
    "insert_select_rollup", # S9 S10; r13 row
    "longest_streak",       # W12 streak half; r13 row
    "union_order_tiers",    # U1 U2 P6; r13 row
    "retention_curve",      # A16 + channel LIKE; r13 row
    "exact_percentiles",    # exact distributed percentiles; r13 row
    "minhash_lsh_pairs",    # banded LSH primary; r13 row
    "ann_cosine_ivf",       # IVF cell-blocked ANN; r13 row
    "ann_cosine_lsh",       # LSH-bucketed ANN; r13 row
    "embedding_neardup",    # blocked embedding near-dup; r13 row
    "media_features",       # multimodal feature extraction; r13 row
    "media_frame_sample",   # frame sampling; r13 row
    "hash_sample_split",    # deterministic hash split; r13 row
    "stratified_sample",    # per-stratum exact quotas; r13 row
    "bpe_train_merges",     # iterative BPE vocab training; r13 row
    "bpe_encode_corpus",    # merge-table tokenizer application; r13 row
    "bm25_top_docs",        # BM25 retrieval scoring; r13 row
    "ann_pq_adc",           # PQ/ADC third ANN scale path; r13 row
    "simhash_pairs",        # 4x15-bit pigeonhole near-dup; r13 row
    "skew_salted_agg",      # salted skewed aggregate; r13 row
    "asof_latest_order",    # as-of join; r13 row
    "ngram_jaccard_pairs",  # prefix-filtered primary; r13 row
    "array_metrics",        # J2 J4 J5 A12 A13 A6; r13 row
    "fuzzy_customer_pairs", # PassJoin edit-distance ER; r13 row
    "interpolate_daily_revenue", # gap-fill + linear interp; r13 row
    "hll_user_cardinality", # HyperLogLog registers; r13 row
    "session_concurrency_daily", # sweep-line concurrency; r13 row
    "media_ahash_neardup",  # perceptual-hash image dedup; r13 row
    "media_curation_pipeline", # composed image-dedup pass; r13 row
    "user_vertices",        # W3 + map-typed vertex props; r13 row
    "part_pair_edges",      # J9 pair self-join; r13 row
    "media_real_decode",    # stdlib PNG round-trip; r13 row
    "skew_salted_join",     # salted join twin; r13 row
    "semantic_dedup",       # SemDeDup cluster-then-dedup; r13 row
    "media_resize",         # NN resize + re-encode; r13 row
    # new this round: gate immediately
    "training_export_rollup", # mix->pack->shard write->manifest; NEW r16
    "doc_lang_id_learned",  # multi-class hashed NB lang id; NEW r16
    "lang_id_confusion",    # held-out confusion matrix; NEW r16
    "corpus_curation_pipeline_learned", # NB-gated flagship twin; NEW r16
    "ivfpq_index_compact",  # posting-store compaction; NEW r16
    "bpe_train_merges_batched", # top-k batched merge rounds; NEW r16
]

_GATE_REST = [
    # SEVENTH new r16 entry: the 50-slot prefix is exactly filled by
    # the 44-entry freshness cohort (displacing any of them would
    # leave an r13 row aging past the 3-round invariant) + the six
    # new entries above, so this one leads the r17 prefix instead of
    # gating immediately; until then it is covered by the
    # full-registry gate_check battery at HEAD like every rotated-out
    # entry (GATECHECK_r16 logs), just without a driver row yet.
    "training_export_tokenized",  # BPE ids -> packed windows -> shards; NEW r16
    # the 50 r14-row entries: FIRST IN LINE for the r17 prefix (they
    # will be exactly 3 rounds old then — the standing cadence)
    "doc_bigram_lm_score",  # bigram-LM quality score; r14 row
    "line_dedup_rebuild",   # C4/RefinedWeb segment removal; r14 row
    "kmv_set_ops",          # bottom-k sketch set algebra; r14 row
    "doc_winnow_fingerprint", # set-stats winnow twin; r14 row
    "doc_pii_redact",       # regex PII counting + masking; r14 row
    "neardup_clusters",     # CC + keep-one retention; r14 row
    "pivot_lang_counts",    # groupBy().pivot(); r14 row
    "streaming_neardup_admission", # stream-static LSH; r14 row
    "pagerank_parts",       # guard off hot path; r14 row
    "bloom_prune_stats",    # digest-fence family; r14 row
    "countmin_token_freq",  # digest-fence family; r14 row
    "distinct_sketch_users", # digest-fence family; r14 row
    "streaming_countmin",   # digest-fence family; r14 row
    "region_revenue",       # J3 J13; r14 row
    "tumbling_hits",        # batch T3/T4 twin; r14 row
    "host_activity_reduced", # J2 J12; r14 row
    "top_supplier_per_nation", # J13 A15 W9; r14 row
    "embedding_neardup_allpairs", # exact baseline twin; r14 row
    "acctbal_tiers",        # P6; r14 row
    "ann_cosine_topk",      # brute-force ANN baseline; r14 row
    "bulk_rename_summary",  # P2; r14 row
    "csv_roundtrip_rollup", # S2; r14 row
    "dedup_keep_first",     # W3 W4; r14 row
    "distinct_users",       # A4 A5; r14 row
    "doc_quality",          # text quality score; r14 row
    "doc_token_stats",      # token counting; r14 row
    "doc_winnow_neardup_pairs", # winnow primary; r14 row
    "filter_by_top1",       # P8 O6; r14 row
    "growth_accounting",    # J1; r14 row
    "json_props",           # JSON family; r14 row
    "part_type_tiers",      # P5; r14 row
    "sorted_layout_rollup", # O4 O5; r14 row
    "ann_ivfpq",            # IVF + PQ-on-residuals (IVFADC); r14 row
    "hybrid_rrf_topk",      # BM25 + ANN reciprocal-rank fusion; r14 row
    "bpe_train_merges_bytes", # byte-level BPE training; r14 row
    "streaming_bpe_encode", # streaming tokenizer application; r14 row
    "vocab_coverage_curve", # Zipf coverage curve; r14 row
    "streaming_embedding_admission", # vector ingest gate; r14 row
    "pipeline_replay_31d",  # 31-day growth replay; r14 row
    "rolling_time_revenue", # RANGE frame; r14 row
    "zscore_anomaly_days",  # integer-exact z-score; r14 row
    "unpivot_region_metrics", # unpivot wide->long; r14 row
    "chunk_dedup_rebuild",  # sub-document dedup; r14 row
    "corpus_mix_plan",      # mixing quotas; r14 row
    "quantile_band_filter", # percentile trimming; r14 row
    "embedding_quantize_error", # int8 SQ error; r14 row
    "ann_q8_rerank",        # SQ8 + rerank; r14 row
    "bpe_merge_candidates", # BPE pair stats; r14 row
    "dup_span_extract",     # duplicate-span extraction; r14 row
    "dup_span_removal",     # cleaned-corpus rebuild; r14 row
    # rotated out r16: the r15 prefix (each entry holds a fresh r15
    # driver row; operator ids stay covered by the gate_check
    # full-registry run at HEAD each round)
    "datelist_int",         # A10 A11; r15 row
    "tfidf_top_terms",      # tf-idf keywords; r15 row
    "histogram_quantiles",  # bin-histogram quantiles; r15 row
    "hard_negative_mining", # contrastive ANN; r15 row
    "zorder_locality_stats", # Morton clustering; r15 row
    "incremental_agg_merge", # partial-agg maintenance; r15 row
    "last_touch_attribution", # last_value window; r15 row
    "orc_roundtrip_rollup", # ORC round-trip; r15 row
    "top_event_paths",      # trigram path mining; r15 row
    "snapshot_cdc_diff",    # change-data-feed; r15 row
    "compaction_rollup",    # OPTIMIZE round-trip; r15 row
    "streaming_sliding_hits", # hopping-window twin; r15 row
    "streaming_interval_join", # stream-stream interval join; r15 row
    "streaming_upsert_sink", # streaming merge sink; r15 row
    "table_profile_approx", # HLL profile w/ 5-sigma envelope; r15 row
    "percentiles_approx",   # GK-sketch rank-error envelope; r15 row
    "doc_priority_sample",  # weighted priority sampling; r15 row
    "scd_incremental",      # double-advance guard; r15 row
    "scd_replay_31d",       # 31-day SCD incremental replay; r15 row
    "users_cumulated_replay_31d", # 31-day datelist replay; r15 row
    "pricing_summary",      # P3 A3 A17; r15 row
    "customer_order_spine", # J10 J11 J15; r15 row
    "top_customers",        # J3 J13 A15 O1-O3; r15 row
    "grouping_sets",        # A9 S3; r15 row
    "funnel_conversion",    # P7 J8 A16; r15 row
    "scd_streaks",          # W1 W2 A1; r15 row
    "users_cumulated",      # P4 A7 J1; r15 row
    "sessionization",       # W2 P4; r15 row
    "doc_ttr_repetition",   # TTR/repetition stats; r15 row
    "vocab_top_tokens",     # corpus vocabulary df table; r15 row
    "neardup_clusters_star", # large/small-star CC twin; r15 row
    "ngram_jaccard_allpairs", # exact baseline twin; r15 row
    "rolling_revenue",      # W5-W8 W11; r15 row
    "order_history",        # A6 W10; r15 row
    "best_stretch",         # W9 W12; r15 row
    "semi_anti_customers",  # J6 J7; r15 row
    "merge_upsert",         # S11 J1; r15 row
    "bucketed_join_rollup", # S4 S5 J14; r15 row
    "ann_ivfpq_fulltrain",  # distributed full-corpus Lloyd; NEW r15; r15 row
    "doc_quality_classifier", # hashed NB quality scoring; NEW r15; r15 row
    "classifier_pr_eval",   # held-out PR/threshold sweep; NEW r15; r15 row
    "streaming_ivfpq_index", # incremental ANN index maint; NEW r15; r15 row
    "unigram_train_vocab",  # SentencePiece-shape unigram EM; NEW r15; r15 row
    "unigram_encode_corpus", # unigram tokenizer application; NEW r15; r15 row
    "partitioned_prune_rollup", # S6 S7; r15 row
    "streaming_tumbling_hits", # T1 T3 T4; r15 row
    "streaming_kafka_mirror", # S12 S14; r15 row
    "streaming_session_windows", # T5; r15 row
    "streaming_foreachbatch_sink", # T7 T8 S13; r15 row
    "streaming_stateful_sessions", # stateful op; r15 row
]

assert len(_GATE_FIRST) == GATE_CAP, (
    f"gated prefix has {len(_GATE_FIRST)} entries, driver cap is {GATE_CAP}"
)

GATE_ORDER = _GATE_FIRST + _GATE_REST

assert set(GATE_ORDER) == set(QUERIES), (
    "GATE_ORDER out of sync with registry: "
    f"missing={set(QUERIES) - set(GATE_ORDER)} "
    f"stale={set(GATE_ORDER) - set(QUERIES)}"
)
QUERIES = {name: QUERIES[name] for name in GATE_ORDER}
ORACLES = {name: ORACLES[name] for name in GATE_ORDER if name in ORACLES}
