"""Relational query inventory (SURVEY.md §2.B) over the synthetic star schema.

Every operator class the reference's ~45 DAO queries use — scans, point
lookups, pagination, filters, the full join taxonomy (anti/semi/equi/
left/full-outer/cross-scalar/as-of/range), aggregations (scalar, grouped,
distinct, weighted, bucketed, conditional, multi-level), window functions
(lead-gap, latest-per-key, cumulative, nested agg+window), set ops and
scalar functions — re-expressed as idiomatic DataFrame plans with DuckDB
oracle twins.

Engine-portability rules (see functions/decimals.py): sums aggregate in
decimal (exact, order-independent), ratios divide the exact sums in
double, LIMIT/OFFSET queries carry a total order, date_trunc results are
normalized to DATE or formatted strings (Spark returns TIMESTAMP where
DuckDB returns DATE).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.decimals import MEASURE, dec, dsum, dsumd, ratio
from ..operators.asof import as_of_join
from ..operators.gaps import find_gaps_scalable
from ..operators.latest import latest_per_key
from ..operators.pagination import paginate
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# Flagship: grouped multi-aggregate pricing summary (B11/B12/B19).
# Reference analogue: leased-assets / repayment multi-sum rollups
# (`ls_opening.rs:379-453`, `ls_repayment.rs:127-183`).
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-shaped grouped rollup; maps B12 grouped SUM + B19 multi-sum.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsumd("l_quantity", "sum_qty"),
        dsumd("l_extendedprice", "sum_base_price"),
        dsumd(disc_price, "sum_disc_price"),
        # 2dp × 2dp × 2dp = 6 decimal digits — scale 6 keeps the cast
        # exact (a narrower scale would round, and double→decimal rounding
        # differs between engines at the .5 boundary).
        F.sum(dec(charge, "decimal(18,6)")).cast("double").alias("sum_charge"),
        ratio(F.sum(dec("l_quantity")), n).alias("avg_qty"),
        ratio(F.sum(dec("l_extendedprice")), n).alias("avg_price"),
        ratio(F.sum(dec("l_discount")), n).alias("avg_disc"),
        n.alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Scans / point lookups / pagination (B0 family).
# ---------------------------------------------------------------------------


@query(
    "q02_point_lookup",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice, o_orderstatus
    FROM orders WHERE o_custkey = 42
    """,
    doc="B0 point lookup by key (`ls_opening.rs:579-592` get-by-address).",
)
def q02_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") == 42)
        .select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
    )


@query(
    "q03_in_list",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer WHERE c_custkey IN (1, 5, 7, 11, 42, 137)
    """,
    doc="B0 IN-list lookup (`ls_opening.rs:659-684` get_leases).",
)
def q03_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").isin(1, 5, 7, 11, 42, 137))
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


@query(
    "q04_search_paginated",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE lower(c_name) LIKE '%4%'
    ORDER BY c_acctbal DESC, c_custkey
    OFFSET 5 LIMIT 20
    """,
    doc="B0a ILIKE substring search + ORDER/OFFSET/LIMIT (`ls_opening.rs:748-778`).",
)
def q04_search_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.lower(F.col("c_name")).contains("4"))
        .select("c_custkey", "c_name", "c_acctbal")
    )
    return paginate(c, [F.col("c_acctbal").desc(), F.col("c_custkey").asc()], offset=5, limit=20)


@query(
    "q05_txs_filtered_paged",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE (user_id = 3 OR user_id = 7)
      AND event_type IN ('click', 'purchase')
    ORDER BY ts DESC, event_id DESC
    OFFSET 10 LIMIT 50
    """,
    doc="B0b raw_message-style multi-predicate scan + pagination (`raw_message.rs:43-117`).",
)
def q05_txs_filtered_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load(spark, sf_dir, "events")
        .filter(
            ((F.col("user_id") == 3) | (F.col("user_id") == 7))
            & F.col("event_type").isin("click", "purchase")
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    return paginate(e, [F.col("ts").desc(), F.col("event_id").desc()], offset=10, limit=50)


@query(
    "q06_minute_bucket_max",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS bucket_start,
           event_type,
           MAX(value) AS max_value,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="B0c minute-bucketed MAX price series (`mp_asset.rs:61-87`).",
)
def q06_minute_bucket_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    bucket = (F.floor(F.col("ts").cast("double") / 900) * 900).cast("bigint")
    return (
        e.groupBy(bucket.alias("bucket_start"), F.col("event_type"))
        .agg(F.max("value").alias("max_value"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q07_ledger_summary",
    oracle="""
    SELECT COUNT(*) AS n_events,
           MIN(event_id) AS first_event,
           MAX(event_id) AS last_event,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    """,
    doc="B0d blocks count/first/last (`block.rs:76-135`).",
)
def q07_ledger_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q08_range_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity < 24
    """,
    doc="B11 scalar SUM/COUNT over a time range + thresholds (`lp_deposit.rs:95-136`).",
)
def q08_range_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        dsumd(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Join taxonomy (B1–B10).
# ---------------------------------------------------------------------------


@query(
    "q09_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="B1 anti-join: active-leases NOT EXISTS (`ls_state.rs:72-126`).",
)
def q09_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q10_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
    doc="B2 semi-join EXISTS flag (`ls_opening.rs:1067-1072`).",
)
def q10_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q11_dim_join_rollup",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="B3 fact↔dim equi-join with broadcast dim (`ls_opening.rs:385-396`).",
)
def q11_dim_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = F.broadcast(load(spark, sf_dir, "part"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsumd("l_quantity", "sum_qty"),
            dsumd(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@query(
    "q12_left_join_zero_fill",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(COALESCE(a.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(a.total_spent, 0) AS DOUBLE) AS total_spent
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_spent
      FROM orders GROUP BY o_custkey
    ) a ON a.o_custkey = c.c_custkey
    """,
    doc="B4 left join + COALESCE zero-fill (`ls_opening.rs:260-286`).",
)
def q12_left_join_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    a = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_spent"))
    )
    return c.join(a, c.c_custkey == a.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce(F.col("total_spent"), F.lit(0)).cast("double").alias("total_spent"),
    )


@query(
    "q13_full_outer_daily",
    oracle="""
    SELECT COALESCE(a.day, b.day) AS day,
           CAST(COALESCE(a.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(b.n_shipped, 0) AS BIGINT) AS n_shipped
    FROM (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
          FROM orders GROUP BY 1) a
    FULL OUTER JOIN (SELECT CAST(l_shipdate AS DATE) AS day, COUNT(*) AS n_shipped
          FROM lineitem GROUP BY 1) b
      ON a.day = b.day
    """,
    doc="B5 full outer join of daily opened vs closed series (`ls_opening.rs:1373-1380`).",
)
def q13_full_outer_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    b = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_shipped"))
    )
    return a.join(b, a.day == b.day, "full_outer").select(
        F.coalesce(a.day, b.day).alias("day"),
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce(F.col("n_shipped"), F.lit(0)).cast("bigint").alias("n_shipped"),
    )


@query(
    "q14_cross_scalar",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate = (SELECT MAX(l_shipdate) FROM lineitem)
    GROUP BY l_returnflag
    """,
    doc="B6 cross-join broadcast of a scalar aggregate (`ls_state.rs:213-216`).",
)
def q14_cross_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    mx = l.agg(F.max("l_shipdate").alias("__max_ship"))
    return (
        l.crossJoin(F.broadcast(mx))
        .filter(F.col("l_shipdate") == F.col("__max_ship"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsumd("l_quantity", "sum_qty"))
    )


@query(
    "q15_asof_join",
    oracle="""
    SELECT c.event_id, c.user_id, p.value AS last_purchase_value
    FROM events c
    LEFT JOIN LATERAL (
      SELECT value FROM events p
      WHERE p.event_type = 'purchase' AND p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
    ) p ON TRUE
    WHERE c.event_type = 'click'
    """,
    doc="B7 as-of join: latest price <= event time (`ls_opening.rs:1460-1467`).",
)
def q15_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = as_of_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        right_order="event_id",
    )
    return joined.select("event_id", "user_id", F.col("value_asof").alias("last_purchase_value"))


@query(
    "q16_range_join",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(*) AS n_early,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_early
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
    doc="B8 equi+range (theta) join: cumulative-within-horizon (`ls_state.rs:586-595`).",
)
def q16_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        o.join(l, cond)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_early"), dsumd("l_quantity", "qty_early"))
    )


@query(
    "q17_multiway_chain",
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY r_name, n_name
    """,
    doc="B9 multiway join chain per contract (`ls_opening.rs:1690-1791`).",
)
def q17_multiway_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsumd(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (B13–B20).
# ---------------------------------------------------------------------------


@query(
    "q18_monthly_active_users",
    oracle="""
    SELECT strftime(ts, '%Y-%m') AS month,
           COUNT(DISTINCT user_id) AS mau,
           COUNT(*) AS n_events
    FROM (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
      UNION ALL SELECT user_id, ts FROM events WHERE event_type = 'view'
      UNION ALL SELECT user_id, ts FROM events WHERE event_type = 'purchase'
      UNION ALL SELECT user_id, ts FROM events WHERE event_type = 'signup'
      UNION ALL SELECT user_id, ts FROM events WHERE event_type = 'error'
    ) u
    GROUP BY 1
    """,
    doc="B13 monthly COUNT(DISTINCT) over 5-way UNION ALL (`ls_opening.rs:1208-1254`).",
)
def q18_monthly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    parts = [
        e.filter(F.col("event_type") == t).select("user_id", "ts")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(F.date_format("ts", "yyyy-MM").alias("month")).agg(
        F.countDistinct("user_id").alias("mau"), F.count(F.lit(1)).alias("n_events")
    )


@query(
    "q19_value_stats",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="B14 AVG/MAX/MIN stats (`ls_state.rs:761-797`).",
)
def q19_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = F.count(F.lit(1))
    return load(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        n.alias("n"),
        ratio(F.sum(dec("o_totalprice")), n).alias("avg_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "q20_weighted_avg",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST(l_discount * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             / NULLIF(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 0) AS wavg_discount
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="B15 weighted average: SUM(rate*w)/NULLIF(SUM(w),0) (`lp_pool_state.rs:474-495`).",
)
def q20_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = F.broadcast(load(spark, sf_dir, "part"))
    num = F.sum(dec(F.col("l_discount") * F.col("l_quantity"), "decimal(18,6)"))
    den = F.sum(dec("l_quantity", "decimal(18,6)"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(ratio(num, den).alias("wavg_discount"))
    )


@query(
    "q21_histogram_buckets",
    oracle="""
    WITH buckets(bucket) AS (VALUES ('lt_100k'), ('100k_200k'), ('200k_300k'), ('gte_300k')),
    agg AS (
      SELECT CASE WHEN o_totalprice < 100000 THEN 'lt_100k'
                  WHEN o_totalprice < 200000 THEN '100k_200k'
                  WHEN o_totalprice < 300000 THEN '200k_300k'
                  ELSE 'gte_300k' END AS bucket,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total
      FROM orders GROUP BY 1
    )
    SELECT b.bucket,
           CAST(COALESCE(a.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(a.total, 0) AS DOUBLE) AS total
    FROM buckets b LEFT JOIN agg a ON a.bucket = b.bucket
    """,
    doc="B16 CASE-bucketed histogram with static bucket dim (`ls_state.rs:243-289`, `raw_message.rs:243-343`).",
)
def q21_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "lt_100k")
        .when(F.col("o_totalprice") < 200000, "100k_200k")
        .when(F.col("o_totalprice") < 300000, "200k_300k")
        .otherwise("gte_300k")
    )
    agg = o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total")
    )
    buckets = spark.createDataFrame(
        [("lt_100k",), ("100k_200k",), ("200k_300k",), ("gte_300k",)], ["bucket"]
    )
    return F.broadcast(buckets).join(agg, "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce(F.col("total"), F.lit(0)).cast("double").alias("total"),
    )


@query(
    "q22_conditional_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN value > 50 THEN 1 END) AS n_high,
           CAST(COUNT(CASE WHEN value > 50 THEN 1 END) AS DOUBLE) / COUNT(*) AS high_rate,
           MAX(CASE WHEN value > 50 THEN ts END) AS last_high_ts
    FROM events GROUP BY event_type
    """,
    doc="B17 conditional aggregation / win-rate (`ls_repayment.rs:252-265`, `raw_message.rs:225-230`).",
)
def q22_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    high = F.when(F.col("value") > 50, 1)
    n = F.count(F.lit(1))
    n_high = F.count(high)
    return e.groupBy("event_type").agg(
        n.alias("n"),
        n_high.alias("n_high"),
        (n_high.cast("double") / n).alias("high_rate"),
        F.max(F.when(F.col("value") > 50, F.col("ts"))).alias("last_high_ts"),
    )


@query(
    "q23_first_in_group",
    # The pick key is the TOTAL order (ts, event_id): on a ts tie Spark's
    # min_by/max_by and DuckDB's arg_min/arg_max may each pick a
    # different row, so a single-column key is a latent flaky hash
    # mismatch (q26 solved the identical problem the same way). DuckDB
    # 1.0's arg_min can't take a struct key, hence the row_number form.
    oracle="""
    SELECT f.user_id, f.value AS first_value, l.value AS last_value
    FROM (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ) f
    JOIN (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) l USING (user_id)
    WHERE f.rn = 1 AND l.rn = 1
    """,
    doc="B18 ARRAY_AGG[1]-style first pick, determinized via min_by/max_by "
    "over the total (ts, event_id) key (`ls_opening.rs:1722-1724`).",
)
def q23_first_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pick = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.min_by("value", pick).alias("first_value"),
        F.max_by("value", pick).alias("last_value"),
    )


@query(
    "q24_two_level_agg",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(order_value) AS DOUBLE) AS total_value,
           CAST(MAX(order_value) AS DOUBLE) AS max_order_value
    FROM (
      SELECT o.o_custkey, o.o_orderkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS order_value
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey, o.o_orderkey
    ) per_order
    GROUP BY o_custkey
    """,
    doc="B20 two-level aggregation: per-symbol then per-contract (`ls_opening.rs:1707-1729`).",
)
def q24_two_level_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    # Aggregation below the join: the per-order sum needs only lineitem,
    # so it runs BEFORE the join — map-side partials shrink the join
    # input from |lineitem| to |orders| (4x here, more at 100 TB where
    # the shuffle is the cost), and the (custkey, orderkey) compound
    # shuffle of the joined stream disappears. Catalyst does not push
    # aggregates below joins on its own; measured 1.41s -> 1.18s at
    # sf0.1. Inner-join semantics are unchanged: orders without lines
    # drop either way, an orderkey maps to exactly one custkey.
    per_order_l = l.groupBy("l_orderkey").agg(dsum("l_extendedprice", "order_value"))
    per_order = o.select("o_custkey", "o_orderkey").join(
        per_order_l, per_order_l.l_orderkey == o.o_orderkey
    )
    return per_order.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("order_value").cast("double").alias("total_value"),
        F.max("order_value").cast("double").alias("max_order_value"),
    )


# ---------------------------------------------------------------------------
# Window functions (B21–B25).
# ---------------------------------------------------------------------------


@query(
    "q25_gap_detection",
    oracle="""
    WITH ids AS (SELECT DISTINCT o_orderkey AS id FROM orders),
    w AS (SELECT id, lead(id) OVER (ORDER BY id) AS next_id FROM ids)
    SELECT id + 1 AS gap_start, next_id - 1 AS gap_end
    FROM w WHERE next_id > id + 1
    """,
    doc="B21/A4 LEAD-window block-gap detection, scalable range-partitioned variant (`block.rs:29-74`).",
)
def q25_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return find_gaps_scalable(load(spark, sf_dir, "orders"), "o_orderkey")


@query(
    "q26_latest_per_key",
    oracle="""
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_type,
           value AS last_value,
           ts AS last_ts
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
    doc="B22/B25 DISTINCT ON latest-per-key via shuffle-light max_by (`ls_state.rs:467-471`).",
)
def q26_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    latest = latest_per_key(e, keys=["user_id"], order_by="ts", tiebreak=["event_id"])
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


@query(
    "q27_cumulative_sum",
    oracle="""
    SELECT event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM events WHERE event_type = 'purchase'
    """,
    doc="B23 cumulative buyback total (`tr_profit.rs:110-121`), computed "
    "with the two-phase bucketed cumsum (operators/cumulative.py): "
    "per-month offsets over O(months) rows + a month-PARTITIONED "
    "per-row window — no single-task window over the series at any "
    "scale (plan-audited).",
)
def q27_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cumulative import running_total

    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cum = running_total(
        e,
        order_cols=["ts", "event_id"],
        value_col=dec("value"),
        bucket=F.date_trunc("month", F.col("ts")),
    )
    return cum.select(
        "event_id", "ts", F.col("running_total").cast("double").alias("running_total")
    )


@query(
    "q28_daily_cumulative",
    oracle="""
    SELECT day, CAST(daily_revenue AS DOUBLE) AS daily_revenue,
           CAST(SUM(daily_revenue) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cumulative_revenue
    FROM (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS daily_revenue
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ) d
    """,
    doc="B24 nested SUM(SUM()) OVER: daily + cumulative revenue (`tr_profit.rs:214-231`).",
)
def q28_daily_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(dsum("value", "daily_revenue"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        F.col("daily_revenue").cast("double").alias("daily_revenue"),
        F.sum("daily_revenue").over(w).cast("double").alias("cumulative_revenue"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k, set ops, scalar functions.
# ---------------------------------------------------------------------------


@query(
    "q29_topk_customers",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    ORDER BY total_spent DESC, o_custkey
    LIMIT 10
    """,
    doc="Top-k with total order (`ORDER BY ... LIMIT` pattern, `mp_asset.rs:96-121`). "
    "Spark plans this as TakeOrderedAndProject — no global sort.",
)
def q29_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsumd("o_totalprice", "total_spent"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("total_spent").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


@query(
    "q30_union_ledger",
    oracle="""
    SELECT user_id,
           CAST(SUM(signed_value) AS DOUBLE) AS net_value,
           COUNT(*) AS n_moves
    FROM (
      SELECT user_id, CAST(value AS DECIMAL(18,4)) AS signed_value
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, -CAST(value AS DECIMAL(18,4)) AS signed_value
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, CAST(0 AS DECIMAL(18,4)) AS signed_value
      FROM events WHERE event_type = 'signup'
    ) ledger
    GROUP BY user_id
    """,
    doc="Set ops: signed UNION ALL ledger (+open −close −liq, `ls_loan_closing.rs:50-78`).",
)
def q30_union_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pos = e.filter(F.col("event_type") == "purchase").select(
        "user_id", dec("value").alias("signed_value")
    )
    neg = e.filter(F.col("event_type") == "error").select(
        "user_id", (-dec("value")).cast(MEASURE).alias("signed_value")
    )
    zero = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.lit(0).cast(MEASURE).alias("signed_value")
    )
    ledger = pos.unionByName(neg).unionByName(zero)
    return ledger.groupBy("user_id").agg(
        F.sum("signed_value").cast("double").alias("net_value"),
        F.count(F.lit(1)).alias("n_moves"),
    )


@query(
    "q31_date_spine",
    oracle="""
    SELECT d.day,
           CAST(COALESCE(a.n_orders, 0) AS BIGINT) AS n_orders
    FROM (
      SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS day
    ) d
    LEFT JOIN (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ) a ON a.day = d.day
    """,
    doc="generate_series date spine with zero-fill (`ls_opening.rs:1321-1326`).",
)
def q31_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit("1995-01-01")),
                F.to_date(F.lit("1995-03-31")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    a = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return days.join(a, "day", "left").select(
        "day", F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders")
    )


@query(
    "q32_scalar_functions",
    oracle="""
    SELECT c_custkey,
           concat(c_name, '/', c_mktsegment) AS tag,
           upper(c_mktsegment) AS seg,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           greatest(c_acctbal, 0.0) AS bal_pos,
           nullif(c_nationkey, 3) AS natkey_nn,
           power(2.0, c_nationkey % 10) AS pow2
    FROM customer
    """,
    doc="Scalar-function surface: CONCAT/UPPER/SUBSTR/LENGTH/FLOOR/GREATEST/NULLIF/POWER "
    "(SURVEY §2.B scalar functions).",
)
def q32_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("tag"),
        F.upper("c_mktsegment").alias("seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.floor("c_acctbal").cast("bigint").alias("bal_floor"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_pos"),
        F.nullif(F.col("c_nationkey"), F.lit(3)).alias("natkey_nn"),
        F.pow(F.lit(2.0), F.col("c_nationkey") % 10).alias("pow2"),
    )


@query(
    "q33_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS BIGINT)) AS n_with_k
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured attribute extraction (A7 analogue: KV attrs → typed columns).",
)
def q33_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    raw = F.regexp_extract("props", r'"k":\s*(\d+)', 1)
    k = F.nullif(raw, F.lit("")).cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_with_k")
    )


# ---------------------------------------------------------------------------
# Parameterized-window, financial, and union-history queries (§2.C semantics).
# ---------------------------------------------------------------------------


@query(
    "q34_period_window",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate >= (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 3 MONTH
    GROUP BY 1
    """,
    doc="?period=3m window anchored at MAX(ts) (`helpers/time_window.rs:79-91`; "
    "W-variant pattern `ls_opening.rs:1510-1528`). NOW() is pinned to a "
    "data-derived scalar so both engines evaluate the same instant.",
)
def q34_period_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timewin import period_predicate

    o = load(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("__anchor"))
    return (
        o.crossJoin(F.broadcast(anchor))
        .filter(period_predicate(F.col("o_orderdate"), "3m", F.col("__anchor")))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsumd("o_totalprice", "revenue"))
    )


@query(
    "q35_apr_compounding",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 100 AS apr_pct,
           CAST(CAST((POWER(1 + (CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 100) / 100.0 / 365.0, 365.0) - 1) * 100
                AS DECIMAL(18,6)) AS DOUBLE) AS apy_pct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Daily-compounding APR→APY: (POWER(1+apr/100/365,365)-1)*100 "
    "(`ls_opening.rs:502,566`, `lp_pool_state.rs:514-517`).",
)
def q35_apr_compounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.finance import apr_to_apy

    l = load(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    apr = ratio(F.sum(dec("l_discount")), n) * 100
    return l.groupBy("l_returnflag").agg(
        apr.alias("apr_pct"),
        # round to 6dp in decimal (absorbs any POWER ulp drift between
        # engines), then present as double — result columns never ship
        # Decimal objects (see functions.decimals.dsumd).
        apr_to_apy(apr).cast("decimal(18,6)").cast("double").alias("apy_pct"),
    )


@query(
    "q36_history_union_paged",
    oracle="""
    SELECT event_id, ts, user_id, kind, value
    FROM (
      SELECT event_id, ts, user_id, 'repay' AS kind, value FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT event_id, ts, user_id, 'close' AS kind, value FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_id, ts, user_id, 'liquidation' AS kind, value FROM events WHERE event_type = 'error'
    ) h
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
    doc="Lease-history union (repay ∪ close ∪ liquidation) with type tag + "
    "paged total order (`ls_opening.rs:830-879`).",
)
def q36_history_union_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    def tagged(etype: str, kind: str) -> DataFrame:
        return e.filter(F.col("event_type") == etype).select(
            "event_id", "ts", "user_id", F.lit(kind).alias("kind"), "value"
        )

    h = (
        tagged("purchase", "repay")
        .unionByName(tagged("click", "close"))
        .unionByName(tagged("error", "liquidation"))
    )
    return h.orderBy(F.col("ts").desc(), F.col("event_id").desc()).limit(100)


@query(
    "q37_decimal_shift",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value / POWER(10.0, user_id % 3) AS DECIMAL(18,6))) AS DOUBLE) AS shifted_total,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Currency decimal-shift normalization amount/POWER(10,digits) "
    "(`handler/mp_assets.rs:16-206`, `ls_opening.rs:693`).",
)
def q37_decimal_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.finance import decimal_shift

    e = load(spark, sf_dir, "events")
    shifted = decimal_shift(F.col("value"), F.col("user_id") % 3)
    return e.groupBy("event_type").agg(
        F.sum(shifted.cast("decimal(18,6)")).cast("double").alias("shifted_total"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Additional window frames, grouping sets, and correlated-subquery shapes.
# ---------------------------------------------------------------------------


@query(
    "q38_moving_average",
    oracle="""
    SELECT day, CAST(daily_revenue AS DOUBLE) AS daily_revenue,
           CAST(AVG(CAST(daily_revenue AS DOUBLE)) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS ma7
    FROM (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS daily_revenue
      FROM orders GROUP BY 1
    ) d
    """,
    doc="Bounded-frame window: 7-day moving average over the daily series "
    "(frame shape beyond the reference's unbounded cumulative windows).",
)
def q38_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(dsum("o_totalprice", "daily_revenue"))
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        F.col("daily_revenue").cast("double").alias("daily_revenue"),
        F.avg(F.col("daily_revenue").cast("double")).over(w).alias("ma7"),
    )


@query(
    "q39_day_over_day",
    oracle="""
    SELECT day, CAST(daily_revenue AS DOUBLE) AS daily_revenue,
           CAST(lag(daily_revenue) OVER (ORDER BY day) AS DOUBLE) AS prev_revenue,
           CAST(daily_revenue AS DOUBLE) - CAST(lag(daily_revenue) OVER (ORDER BY day) AS DOUBLE) AS delta
    FROM (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS daily_revenue
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ) d
    """,
    doc="LAG delta (day-over-day change) — companion to the LEAD gap query.",
)
def q39_day_over_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(dsum("value", "daily_revenue"))
    )
    w = Window.orderBy("day")
    prev = F.lag("daily_revenue").over(w)
    return daily.select(
        "day",
        F.col("daily_revenue").cast("double").alias("daily_revenue"),
        prev.cast("double").alias("prev_revenue"),
        (F.col("daily_revenue").cast("double") - prev.cast("double")).alias("delta"),
    )


@query(
    "q50_rollup_totals",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP hierarchy totals (region → nation → grand total) — grouping-sets "
    "operator class; NULL rows are the subtotal levels in both engines.",
)
def q50_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsumd("c_acctbal", "total_balance"))
    )


@query(
    "q51_exists_range",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="Correlated EXISTS with a range predicate (TPC-H-Q4 shape): semi-join "
    "whose condition mixes equi key + inequality.",
)
def q51_exists_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01 00:00:00")))
    )
    l = load(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q52_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact interpolated percentiles (median/p90) per group — both engines "
    "use the linear-interpolation quantile definition. At 100 TB swap for "
    "approx_percentile with a documented error bound.",
)
def q52_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q62_approx_percentiles",
    # Derived-property oracle: the GK sketch itself differs across
    # engines, so the checkable output is the exact per-group stats plus
    # in-query booleans asserting the sketch landed inside the exact
    # rank-error window (percentile_cont at q ± 0.005 — ~150 ranks of
    # slack at sf0.1 vs the sketch's <= n/10000 rank error). The oracle
    # recomputes the exact columns and pins the booleans TRUE.
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           quantile_cont(o_totalprice, 0.5) AS median_exact,
           quantile_cont(o_totalprice, 0.9) AS p90_exact,
           TRUE AS median_ok,
           TRUE AS p90_ok
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Scale variant of q52: approx_percentile (Greenwald-Khanna "
    "sketch, accuracy=10000 => rank error <= 1/10000) per group. Exact "
    "percentile materializes and sorts every group's values through one "
    "shuffle; the sketch is a bounded-size accumulator that merges "
    "map-side, so at 100 TB the shuffle carries O(groups) sketches. "
    "The *_ok booleans assert sketch-vs-exact rank error in-query, so "
    "the driver hash fails if the sketch ever drifts out of bound.",
)
def q62_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # one array-percentile per aggregate kind: six scalar `percentile`
    # calls each buffer + sort the group's values independently
    # (measured 3x this query's runtime at sf0.1); the array form pays
    # one buffer and one sort for all six ranks, ditto the sketch pair.
    qs = F.array(*(F.lit(p) for p in (0.495, 0.5, 0.505, 0.895, 0.9, 0.905)))
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("o_totalprice", qs).alias("__ex"),
        F.approx_percentile(
            "o_totalprice", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
        ).alias("__apx"),
    )
    return agg.select(
        "o_orderpriority",
        "n",
        F.get("__ex", 1).alias("median_exact"),
        F.get("__ex", 4).alias("p90_exact"),
        F.get("__apx", 0).between(F.get("__ex", 0), F.get("__ex", 2)).alias("median_ok"),
        F.get("__apx", 1).between(F.get("__ex", 3), F.get("__ex", 5)).alias("p90_ok"),
    )


@query(
    "q59_sessionization",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *, SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM s GROUP BY 1, 2
    """,
    doc="Sessionization: per-user 30-min-gap sessions via lag → boundary "
    "flag → running session counter → per-session rollup. The batch twin "
    "of a streaming session window; the whole chain (two windows + the "
    "final groupBy) runs on ONE hash exchange because every step keys on "
    "user_id. Gap arithmetic in exact integer microseconds; value summed "
    "as decimal (float sums are partition-order dependent).",
)
def q59_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    boundary = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    s = e.withColumn(
        "session_id",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return s.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@query(
    "q60_approx_distinct_mau",
    # Derived-property oracle: HLL registers differ across engines, so
    # the checkable output is the exact MAU plus an in-query boolean
    # asserting the sketch landed within 5·rsd of it. The oracle
    # recomputes the exact count and pins the boolean TRUE — a drifting
    # sketch fails the driver hash.
    oracle="""
    SELECT strftime(ts, '%Y-%m') AS month,
           COUNT(DISTINCT user_id) AS mau_exact,
           COUNT(*) AS n_events,
           TRUE AS approx_ok
    FROM events GROUP BY 1
    """,
    doc="Scale variant of q18: HyperLogLog++ approximate monthly active "
    "users (rsd=0.01). countDistinct shuffles every distinct "
    "(month, user) pair; the HLL sketch is a fixed ~few-KB accumulator "
    "per group that merges map-side — at 100 TB the shuffle carries "
    "O(groups) sketches instead of O(distinct users) rows. approx_ok "
    "asserts |approx-exact| <= 5·rsd·exact in-query.",
)
def q60_approx_distinct_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(F.date_format("ts", "yyyy-MM").alias("month")).agg(
        F.countDistinct("user_id").alias("mau_exact"),
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("__mau_apx"),
    )
    err = F.abs(F.col("__mau_apx") - F.col("mau_exact")).cast("double")
    return agg.select(
        "month",
        "mau_exact",
        "n_events",
        (err <= 0.05 * F.col("mau_exact").cast("double")).alias("approx_ok"),
    )


@query(
    "q129_asof_auto_enrichment",
    # The LATERAL twin is q15's oracle shape over a different event
    # cohort; dispatched_form is a pinned literal, so the gate goes RED
    # if the statistics-driven dispatcher ever stops choosing the
    # broadcast form for this dimension-scale series (sf0.01: 150
    # purchase users x <=24 ticks; sf0.1: 1,500 x <=26 — both orders of
    # magnitude inside the (100k keys, 20k ticks) caps; at 100x users
    # the SAME query flips to union_sort by design, which is exactly
    # what the column would surface).
    oracle="""
    SELECT v.event_id, v.user_id, p.value AS last_purchase_value,
           'broadcast' AS dispatched_form
    FROM events v
    LEFT JOIN LATERAL (
      SELECT value FROM events p
      WHERE p.event_type = 'purchase' AND p.user_id = v.user_id AND p.ts <= v.ts
      ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
    ) p ON TRUE
    WHERE v.event_type = 'view'
    """,
    doc="B7 via the statistics-driven dispatcher: as_of_join_auto probes "
    "the right side's measured shape (one guarded aggregate job, "
    "memoized per plan) and picks the physical form — broadcast here, "
    "because the purchase series is dimension-scale. The chosen form "
    "rides the result as an oracle-pinned column, so dispatch drift is "
    "a correctness failure, not a silent plan change. "
    "operators/asof.py::as_of_join_auto; reference semantics "
    "`ls_opening.rs:1460-1467` (LATERAL pick-latest).",
)
def q129_asof_auto_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import as_of_join_auto

    e = load(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out, form = as_of_join_auto(
        views,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        right_order="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("value_asof").alias("last_purchase_value"),
        F.lit(form).alias("dispatched_form"),
    )
