"""Relational-breadth queries: semi/having joins, multi-way star chains,
grouping sets, and range-frame windows over the synthetic TPC-H-ish tables.

The reference's join surface stops at broadcast-size equi-joins
(diann/diann2msstats.py:117 and friends, see SURVEY §2.3); an engine a
reference user migrates onto also needs the standard analytic join/agg
shapes.  Each query here is the canonical Spark plan for one of them:

- semi-join (EXISTS) that never materializes the probe side's payload,
- a 6-table join chain where dimension order + broadcast choice decide the
  shuffle count,
- HAVING-over-fact pre-aggregation feeding a top-k,
- ROLLUP grouping sets computed in one shuffle (Expand, not a union of
  re-scans),
- a RANGE-frame sliding window (event-time seconds, not row counts).

Scale notes per query in the docstrings; all are single-digit-shuffle plans
whose only size-sensitive knob is the fact-table shuffle partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import broadcast

from quantms_utils_spark.tables import load


def order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped EXISTS: count orders per priority having at least one
    late-shipped lineitem. LEFT SEMI keeps exactly the orders columns — the
    lineitem side never reaches the aggregate, so the post-join shuffle
    carries (priority) only. The non-equi part of the predicate
    (l_shipdate > o_orderdate) rides on the equi hash join as a residual
    filter, not a BNLJ."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    hit = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_SEMI_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped 6-table chain: local-supplier revenue per ASIA nation.
    Catalyst folds the region filter through nation before the fact join
    (predicate transitivity), and nation/region/supplier broadcast — the only
    shuffles are lineitem⋈orders⋈customer. The c_nationkey = s_nationkey
    equality is the classic "local supplier" residual on the join."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


REGIONAL_REVENUE_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC
"""


def returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped returned-revenue ranking: filter the fact FIRST
    (l_returnflag = 'R' reaches the parquet scan as a pushed filter), join the
    surviving ~25% against orders/customer, aggregate per customer, top-20 via
    TakeOrderedAndProject (per-partition heaps — no global sort shuffle)."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


RETURNED_ITEMS_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def big_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped HAVING: orders whose total quantity exceeds 300. The fact
    pre-aggregates to (orderkey, qty) BEFORE touching orders/customer — the
    expensive shuffle happens on the narrow two-column frame, and the
    survivors (≪1%) drive broadcast-joinable lookups of the dimensions."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


BIG_ORDERS_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       round(total_qty, 2) AS total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over (returnflag, linestatus): subtotals and the
    grand total in ONE pass — Spark plans this as an Expand (each input row
    emitted once per grouping set) feeding a single hash aggregate, not three
    scans unioned. grouping_id() disambiguates the NULL-as-subtotal rows.
    Revenue accumulates in DECIMAL and rounds while DECIMAL before the
    DOUBLE cast (house decimal-canonicalization rule) so both engines
    resolve .xx5 boundaries identically."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


ROLLUP_REVENUE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       count(*) AS n_rows,
       grouping_id(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per-user 1-hour trailing average of `value`.
    A RANGE frame over epoch seconds — unlike a ROWS frame, the window's
    extent is data-dependent, which is what a rate/usage monitor needs.
    One shuffle (hash by user), sort within partitions; epoch is truncated to
    whole seconds on BOTH engines so frame boundaries agree."""
    e = load(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("avg_1h"),
    )


MOVING_AVG_RANGE_SQL = """
SELECT event_id, user_id,
       round(avg(value) OVER (
         PARTITION BY user_id
         ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
       ), 4) AS avg_1h
FROM events
"""


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (view → purchase) per user: conditional min-timestamps
    in ONE aggregate pass (no self-join) — the standard funnel shape at scale:
    shuffle once by user, compare step times post-agg."""
    e = load(spark, sf_dir, "events")
    first_view = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    first_purchase = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    per_user = e.groupBy("user_id").agg(
        first_view.alias("first_view"), first_purchase.alias("first_purchase")
    )
    return per_user.select(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewers"),
        F.sum(
            F.when(
                F.col("first_purchase") > F.col("first_view"), 1
            ).otherwise(0)
        ).cast("long").alias("n_converted"),
    )


EVENT_FUNNEL_SQL = """
SELECT count(*) AS n_users,
       count(first_view) AS n_viewers,
       CAST(sum(CASE WHEN first_purchase > first_view THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted
FROM (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p95) of `value` per event_type —
    F.percentile is the exact sort-based aggregate (one shuffle); at corpus
    scale swap in percentile_approx (t-digest sketch, mergeable map-side)
    and the plan shape stays identical."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       count(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/ntile over one per-user ordered window — all three functions
    share a single sort+shuffle (one Window operator), the planner-visible
    reason to co-locate window expressions with identical specs."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.ntile(4).over(w).alias("quartile"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT event_id, user_id,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       ntile(4) OVER w AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def approx_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based statistics per event_type: HyperLogLog++ distinct users
    and t-digest-style approximate p50/p95. These are the 100 TB forms of
    `distinct_count` / `value_percentiles` — mergeable, fixed-size state,
    map-side combinable, one shuffle of sketches instead of values.

    Tolerance-oracle design: approximate values can never hash-match an
    exact SQL twin, so the query ALSO computes the exact statistics in the
    same aggregation and emits booleans asserting each sketch landed within
    its documented error bound (HLL++ |approx−exact| ≤ 3·rsd·exact;
    percentile_approx inside the exact [p−ε, p+ε] rank band, far looser
    than the accuracy=10000 guarantee of ε = n/10000). The DuckDB oracle
    emits the exact columns plus constant TRUE flags — the hash matches iff
    every sketch honored its bound, turning the approximation contract
    itself into the checked value."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.percentile_approx("value", 0.5, 10_000).alias("ap50"),
        F.percentile_approx("value", 0.95, 10_000).alias("ap95"),
        F.countDistinct("user_id").alias("eu"),
        F.expr("percentile(value, 0.45)").alias("lo50"),
        F.expr("percentile(value, 0.55)").alias("hi50"),
        F.expr("percentile(value, 0.90)").alias("lo95"),
        F.expr("percentile(value, 0.99)").alias("hi95"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        agg.select(
            "event_type",
            "n_events",
            F.col("eu").alias("exact_users"),
            (F.abs(F.col("au") - F.col("eu")) <= F.col("eu") * 0.06).alias(
                "approx_users_ok"
            ),
            (
                (F.col("ap50") >= F.col("lo50"))
                & (F.col("ap50") <= F.col("hi50"))
            ).alias("approx_p50_ok"),
            (
                (F.col("ap95") >= F.col("lo95"))
                & (F.col("ap95") <= F.col("hi95"))
            ).alias("approx_p95_ok"),
        )
        .orderBy("event_type")
    )


APPROX_EVENT_STATS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_users_ok,
       TRUE AS approx_p50_ok,
       TRUE AS approx_p95_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def event_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level rollup cascade: daily aggregates computed FROM the hourly
    aggregate, not from raw events — the continuous-aggregate/materialized-
    rollup pattern every event warehouse runs at scale (raw → hourly once,
    every coarser grain re-aggregates partials). Only works because the
    aggregates are mergeable (sum/count); the oracle computes daily straight
    from raw, proving the cascade is lossless."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("hour")).cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("v"), 2).alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


EVENT_DAILY_ROLLUP_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise top-k (top-3 parts by retail price per brand): rank over a
    partitioned window + filter. Unlike global top-k (TakeOrderedAndProject),
    this shape shuffles once by group and never sorts globally — per-group
    heaps at 100 TB. row_number (not rank) with a full tiebreak keeps the
    result deterministic."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


TOPK_PER_GROUP_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
WHERE rn <= 3
ORDER BY p_brand, rn
"""


def hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: per event_type, every hour between that type's
    first and last event, zero-filled where no events landed. The hour axis
    is generated per group with sequence() over the group's own [min, max] —
    NO cross join against a global calendar table, so the density work scales
    with actual span per key, and the join back to observed counts stays an
    equi-join."""
    e = load(spark, sf_dir, "events")
    hours = e.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    axis = hours.select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    observed = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        axis.join(observed, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
        .orderBy("event_type", "hour")
    )


HOURLY_GAP_FILL_SQL = """
WITH spans AS (
  SELECT event_type, date_trunc('hour', min(ts)) AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY event_type
), axis AS (
  SELECT event_type, CAST(t.hour AS TIMESTAMP) AS hour
  FROM spans, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS t(hour)
), observed AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.event_type, a.hour, COALESCE(o.n, 0) AS n_events
FROM axis a LEFT JOIN observed o
  ON a.event_type = o.event_type AND a.hour = o.hour
ORDER BY a.event_type, a.hour
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user value totals as one column per event
    type. The value list is EXPLICIT — with it, pivot is a single hash
    aggregate with one output slot per (group, value); without it Spark must
    first scan for distinct values (an extra job) and the output schema
    becomes data-dependent, which breaks at 100 TB."""
    e = load(spark, sf_dir, "events")
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 2))
    )
    return pivoted.orderBy("user_id")


EVENT_PIVOT_SQL = f"""
SELECT user_id,
       {", ".join(f"round(sum(CASE WHEN event_type = '{t}' THEN value END), 2) AS {t}"
                  for t in EVENT_TYPES)}
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def part_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via stack(): numeric part measures melted to
    (key, measure, value) rows — a per-row expression (an Expand of width
    n_measures), no shuffle at all; the shape every metrics-normalization
    stage needs before a long-format aggregate."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'retailprice', CAST(p_retailprice AS DOUBLE), "
            "'size', CAST(p_size AS DOUBLE)) AS (measure, val)"
        ),
    )


PART_UNPIVOT_SQL = """
SELECT p_partkey, 'retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS val
FROM part
UNION ALL
SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val
FROM part
"""


def asof_join_two_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table as-of join (operators/joins.py:asof_join): every purchase
    picks up the user's latest prior-or-simultaneous click timestamp — the
    trades/quotes shape via UNION + WINDOW (one shuffle on user_id), checked
    against DuckDB's native ASOF JOIN."""
    from quantms_utils_spark.operators.joins import asof_join

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["click_ts"],
    )
    return joined.select("event_id", "user_id", "click_ts")


ASOF_JOIN_TWO_TABLE_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, c.click_ts
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
"""


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state-per-key via max_by (argmax aggregates): ONE hash
    aggregate instead of the window-rank-filter formulation — no sort, pure
    partial+final agg, the upsert/compaction read pattern ("current row per
    key") at minimum shuffle cost. Timestamps are unique per user in this
    data, so the argmax is deterministic."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.max_by("event_type", "ts").alias("last_type"),
            F.max_by("value", "ts").alias("last_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


LATEST_EVENT_SQL = """
SELECT user_id, max(ts) AS last_ts,
       max_by(event_type, ts) AS last_type,
       max_by(value, ts) AS last_value,
       count(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance, Pearson correlation
    against event recency) per event_type — single partial+final aggregate;
    the moment accumulators are mergeable, so the plan is identical to a
    plain sum at any scale."""
    e = load(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").cast("double")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 4).alias("sd_value"),
            F.round(F.var_samp("value"), 4).alias("var_value"),
            F.round(F.corr("value", epoch), 4).alias("corr_value_time"),
        )
        .orderBy("event_type")
    )


EVENT_VALUE_STATS_SQL = """
SELECT event_type,
       round(stddev_samp(value), 4) AS sd_value,
       round(var_samp(value), 4) AS var_value,
       round(corr(value, CAST(floor(epoch(ts)) AS DOUBLE)), 4) AS corr_value_time
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def customers_lapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): customers who ordered in 1996 but not in
    1998. Catalyst plans EXCEPT as aggregate + left-anti join — the pushed
    year filters prune at the scan, so both inputs are narrow before the
    anti join."""
    o = load(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y98 = o.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    return y96.subtract(y98).orderBy("o_custkey")


CUSTOMERS_LAPSED_SQL = """
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998
ORDER BY o_custkey
"""


def repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1996 and 1998 — planned as
    distinct + left-semi join, the same shuffle budget as one equi-join."""
    o = load(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y98 = o.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    return y96.intersect(y98).orderBy("o_custkey")


REPEAT_BUYERS_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
ORDER BY o_custkey
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers bucketed by first-order year, distinct
    actives counted per (cohort, order year). The cohort dimension is DERIVED
    from the fact (min-year aggregate), broadcast back onto it, then
    re-aggregated — two shuffles total, no self-join of the full fact."""
    o = load(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort_year")
    )
    return (
        o.join(broadcast(first), "o_custkey")
        .groupBy("cohort_year", F.year("o_orderdate").alias("order_year"))
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
        .orderBy("cohort_year", "order_year")
    )


COHORT_RETENTION_SQL = """
WITH first AS (
  SELECT o_custkey, min(year(o_orderdate)) AS cohort_year
  FROM orders GROUP BY o_custkey
)
SELECT cohort_year, year(o_orderdate) AS order_year,
       count(DISTINCT o.o_custkey) AS active_customers
FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
GROUP BY 1, 2
ORDER BY cohort_year, order_year
"""


def zorder_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout quality report: Morton-interleave (l_partkey,
    l_suppkey) at 10 bits/dim, split the curve into 16 equal-frequency
    buckets, and report each bucket's envelope (min/max of the key AND of
    both dimensions) — the zone-map tightness a Z-clustered rewrite buys.
    Buckets come from the TWO-PHASE global ntile (operators/rank.py) —
    the keyed frame is fact-sized, so the old unpartitioned ntile window
    was a single-task funnel; the production write path is
    ``operators.layout.zorder_layout`` (range repartition by the key),
    which needs no ntile at all."""
    from quantms_utils_spark.operators.layout import zorder_key
    from quantms_utils_spark.operators.rank import global_ntile

    li = load(spark, sf_dir, "lineitem")
    keyed = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zorder_key([F.col("l_partkey"), F.col("l_suppkey")], bits=10).alias("z"),
    )
    return (
        global_ntile(
            keyed,
            [F.col("z"), F.col("l_orderkey"), F.col("l_linenumber")],
            16,
            bucket_col="bucket",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
            F.min("l_partkey").alias("part_min"),
            F.max("l_partkey").alias("part_max"),
            F.min("l_suppkey").alias("supp_min"),
            F.max("l_suppkey").alias("supp_max"),
        )
        .orderBy("bucket")
    )


ZORDER_BUCKET_STATS_SQL = """
WITH keyed AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         (((l_partkey & 1023) >> 0 & 1) << 0) | (((l_partkey & 1023) >> 1 & 1) << 2) | (((l_partkey & 1023) >> 2 & 1) << 4) | (((l_partkey & 1023) >> 3 & 1) << 6) | (((l_partkey & 1023) >> 4 & 1) << 8) | (((l_partkey & 1023) >> 5 & 1) << 10) | (((l_partkey & 1023) >> 6 & 1) << 12) | (((l_partkey & 1023) >> 7 & 1) << 14) | (((l_partkey & 1023) >> 8 & 1) << 16) | (((l_partkey & 1023) >> 9 & 1) << 18) | (((l_suppkey & 1023) >> 0 & 1) << 1) | (((l_suppkey & 1023) >> 1 & 1) << 3) | (((l_suppkey & 1023) >> 2 & 1) << 5) | (((l_suppkey & 1023) >> 3 & 1) << 7) | (((l_suppkey & 1023) >> 4 & 1) << 9) | (((l_suppkey & 1023) >> 5 & 1) << 11) | (((l_suppkey & 1023) >> 6 & 1) << 13) | (((l_suppkey & 1023) >> 7 & 1) << 15) | (((l_suppkey & 1023) >> 8 & 1) << 17) | (((l_suppkey & 1023) >> 9 & 1) << 19) AS z
  FROM lineitem
), bucketed AS (
  SELECT *, ntile(16) OVER (ORDER BY z, l_orderkey, l_linenumber) AS bucket
  FROM keyed
)
SELECT bucket, count(*) AS n_rows,
       min(z) AS z_min, max(z) AS z_max,
       min(l_partkey) AS part_min, max(l_partkey) AS part_max,
       min(l_suppkey) AS supp_min, max(l_suppkey) AS supp_max
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot reconciliation on orders: snapshot A = orders
    through 1995-01-01; snapshot B = orders through 1996-01-01 minus every
    97th key (deletions) with urgent orders repriced (updates). table_diff
    classifies every key in one full-outer key join with map-side row
    hashes; the oracle reproduces the statuses with direct IS DISTINCT FROM
    column comparison — the hash is an implementation detail, the status
    semantics are the contract."""
    from quantms_utils_spark.operators.diff import table_diff

    o = load(spark, sf_dir, "orders")
    snap_a = o.filter(F.col("o_orderdate") <= "1995-01-01")
    snap_b = (
        o.filter(
            (F.col("o_orderdate") <= "1996-01-01")
            & (F.col("o_orderkey") % 97 != 0)
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderpriority") == "1-URGENT",
                F.col("o_totalprice") + 10.0,
            ).otherwise(F.col("o_totalprice")),
        )
    )
    return table_diff(snap_a, snap_b, keys=["o_orderkey"])


def snapshot_diff_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same reconciliation scenario as `snapshot_diff`, but through
    table_diff's EXACT mode (null-safe struct comparison instead of
    map-side hashes — no sentinels, no collision probability) with
    unchanged rows kept, rolled up to per-status counts. Proves the exact
    path end-to-end: the oracle is the same IS DISTINCT FROM comparison
    aggregated by status."""
    from quantms_utils_spark.operators.diff import table_diff

    o = load(spark, sf_dir, "orders")
    snap_a = o.filter(F.col("o_orderdate") <= "1995-01-01")
    snap_b = (
        o.filter(
            (F.col("o_orderdate") <= "1996-01-01")
            & (F.col("o_orderkey") % 97 != 0)
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderpriority") == "1-URGENT",
                F.col("o_totalprice") + 10.0,
            ).otherwise(F.col("o_totalprice")),
        )
    )
    d = table_diff(
        snap_a, snap_b, keys=["o_orderkey"], exact=True, include_unchanged=True
    )
    return (
        d.groupBy("status").agg(F.count(F.lit(1)).alias("n")).orderBy("status")
    )


SNAPSHOT_DIFF_EXACT_SQL = """
WITH snap_a AS (
  SELECT * FROM orders WHERE o_orderdate <= TIMESTAMP '1995-01-01'
), snap_b AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 10.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders
  WHERE o_orderdate <= TIMESTAMP '1996-01-01' AND o_orderkey % 97 <> 0
), joined AS (
  SELECT CASE WHEN a.o_orderkey IS NULL THEN 'inserted'
              WHEN b.o_orderkey IS NULL THEN 'deleted'
              WHEN (a.o_custkey IS DISTINCT FROM b.o_custkey)
                OR (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
                OR (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
                OR (a.o_orderdate IS DISTINCT FROM b.o_orderdate)
                OR (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
                THEN 'updated'
              ELSE 'unchanged' END AS status
  FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
)
SELECT status, count(*) AS n FROM joined GROUP BY status ORDER BY status
"""


SNAPSHOT_DIFF_SQL = """
WITH snap_a AS (
  SELECT * FROM orders WHERE o_orderdate <= TIMESTAMP '1995-01-01'
), snap_b AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 10.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders
  WHERE o_orderdate <= TIMESTAMP '1996-01-01' AND o_orderkey % 97 <> 0
), joined AS (
  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         CASE WHEN a.o_orderkey IS NULL THEN 'inserted'
              WHEN b.o_orderkey IS NULL THEN 'deleted'
              WHEN (a.o_custkey IS DISTINCT FROM b.o_custkey)
                OR (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
                OR (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
                OR (a.o_orderdate IS DISTINCT FROM b.o_orderdate)
                OR (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
                THEN 'updated'
              ELSE 'unchanged' END AS status
  FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
)
SELECT o_orderkey, status FROM joined WHERE status <> 'unchanged'
"""


def event_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity week,
    counted as retained in each later week they act again — the canonical
    product-analytics rollup. Two shuffles total at any scale: one groupBy
    user for the cohort assignment (re-joined on the SAME user key, so AQE
    plans a co-partitioned join), then one distinct-count per (cohort_week,
    week_offset) — the output is weeks x weeks, independent of event
    volume."""
    e = load(spark, sf_dir, "events")
    weekly = e.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    ).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


EVENT_RETENTION_SQL = """
WITH weekly AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
), cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
       CAST(count(DISTINCT weekly.user_id) AS BIGINT) AS n_users
FROM weekly JOIN cohort USING (user_id)
GROUP BY 1, 2
"""


def event_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (outlier clipping to the exact p05/p95) — the
    standard numeric-cleaning pass before a value column feeds a model. Two
    bounded stages: one percentile aggregate per event_type (a handful of
    rows, BROADCAST back to the events), then one map-only clip feeding a
    second aggregate. The fact table shuffles once; the percentile table
    never does."""
    from pyspark.sql.functions import broadcast

    e = load(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clipped = e.join(broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "clipped"
        ),
        (
            (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
        ).alias("was_clipped"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("was_clipped").cast("long")).alias("n_clipped"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg("clipped"), 4).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )


EVENT_WINSORIZE_SQL = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
), c AS (
  SELECT e.event_type, e.value,
         least(greatest(e.value, b.lo), b.hi) AS clipped,
         (e.value < b.lo OR e.value > b.hi) AS was_clipped
  FROM events e JOIN b USING (event_type)
)
SELECT event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN was_clipped THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped,
       round(avg(value), 4) AS mean_raw,
       round(avg(clipped), 4) AS mean_winsorized
FROM c GROUP BY event_type ORDER BY event_type
"""


def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join (operators.joins.interval_overlap_join
    — binned equi-join with the bin-OWNERSHIP trick, never a nested loop and
    never a distinct pass): each user's view-activity interval against every
    OTHER user's purchase-activity interval, aggregated to overlap partners
    and total overlapping seconds per viewer. The oracle is the brute-force
    overlap join."""
    from quantms_utils_spark.operators.joins import interval_overlap_join

    e = load(spark, sf_dir, "events")
    # integer MICROSECONDS, not float seconds: the per-viewer overlap sum
    # adds ~10^3 terms, and float-second accumulation error flips the
    # 3-decimal rounding on ~0.5% of rows at sf0.1 — long-µs sums are exact
    # (≲ 10^16 « 2^63) and both engines derive the identical quotient
    usec = F.unix_micros(F.col("ts"))
    iv = e.groupBy("user_id", "event_type").agg(
        F.min(usec).cast("double").alias("lo"),
        F.max(usec).cast("double").alias("hi"),
    )
    views = iv.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("user_a"), "lo", "hi"
    )
    buys = iv.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_b"), "lo", "hi"
    )
    pairs = interval_overlap_join(
        views, buys, lo_col="lo", hi_col="hi", bin_width=7 * 86400.0 * 1e6
    ).where(F.col("user_a") != F.col("user_b_r"))
    ov = (
        F.least(F.col("hi"), F.col("hi_r"))
        - F.greatest(F.col("lo"), F.col("lo_r"))
    ).cast("long")
    return pairs.groupBy(F.col("user_a").cast("long").alias("user_a")).agg(
        F.count(F.lit(1)).alias("n_partners"),
        F.round(F.sum(ov) / F.lit(1000000.0), 3).alias("overlap_seconds"),
    )


INTERVAL_OVERLAP_SQL = """
WITH iv AS (
  SELECT user_id, event_type,
         min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
  FROM events GROUP BY user_id, event_type
), v AS (
  SELECT user_id AS ua, lo, hi FROM iv WHERE event_type = 'view'
), p AS (
  SELECT user_id AS ub, lo AS lo_r, hi AS hi_r FROM iv
  WHERE event_type = 'purchase'
)
SELECT CAST(ua AS BIGINT) AS user_a, CAST(count(*) AS BIGINT) AS n_partners,
       round(sum(least(hi, hi_r) - greatest(lo, lo_r)) / 1000000.0, 3)
         AS overlap_seconds
FROM v JOIN p ON lo <= hi_r AND lo_r <= hi AND ua <> ub
GROUP BY ua
"""


def event_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from an event stream: collapse each user's
    event_type history into validity intervals [valid_from, valid_to) that
    start where the value CHANGES (lag comparison), close at the next change
    (lead), and stay open on the latest row (is_current) — the
    change-data-capture→warehouse-dimension step every incremental pipeline
    runs. Two windows over ONE shuffle (both partition by user_id with the
    same ordering, so Catalyst plans a single Exchange+Sort); ties broken by
    event_id for a deterministic total order."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__prev", F.lag("event_type").over(w))
        .filter(~F.col("__prev").eqNullSafe(F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


EVENT_SCD2_SQL = """
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), c AS (
  SELECT user_id, ts, event_id, event_type FROM t
  WHERE prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def table_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit across the candidate partition keys of four
    tables (operators.skew.key_skew_profile): distinct keys, hottest-key
    row count, max/avg skew ratio, and top-key share — the measured numbers
    that pick between plain hash joins, AQE skew splitting, and salting.
    Four independent two-level aggregates unioned; each is map-side
    combinable and the output is four rows regardless of input size."""
    from quantms_utils_spark.operators.skew import key_skew_profile

    parts = [
        key_skew_profile(
            load(spark, sf_dir, "events"), "user_id", "events.user_id"
        ),
        key_skew_profile(
            load(spark, sf_dir, "events"), "event_type", "events.event_type"
        ),
        key_skew_profile(
            load(spark, sf_dir, "documents"), "source", "documents.source"
        ),
        key_skew_profile(
            load(spark, sf_dir, "orders"), "o_custkey", "orders.o_custkey"
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_SKEW_PROFILE_SQL = """
  SELECT '{label}' AS shuffle_key,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(max(cnt) AS BIGINT) AS max_rows_per_key,
         round(max(cnt) * count(*) / CAST(sum(cnt) AS DOUBLE), 4)
           AS skew_ratio,
         round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 6) AS top_key_share
  FROM (SELECT count(*) AS cnt FROM {table} GROUP BY {key})
"""

TABLE_SKEW_SQL = " UNION ALL ".join(
    _SKEW_PROFILE_SQL.format(label=lbl, table=tbl, key=key)
    for lbl, tbl, key in [
        ("events.user_id", "events", "user_id"),
        ("events.event_type", "events", "event_type"),
        ("documents.source", "documents", "source"),
        ("orders.o_custkey", "orders", "o_custkey"),
    ]
)


def event_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on the event stream: per-type median and
    MAD (median absolute deviation — the outlier-resistant spread that a
    mean/stddev monitor loses to the outliers themselves), then count the
    events whose modified z-score |x − med| / (1.4826·MAD) exceeds 3.5
    (the Iglewicz–Hoban cut). Two grouped exact percentiles (the second
    over the broadcast-joined residuals) + one conditional count; at
    corpus scale both swap to percentile_approx with the same plan shape.
    The per-type medians are a tiny dim, so the join back is broadcast."""
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    resid = e.join(broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = resid.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad"),
        F.max("med").alias("med"),
        F.count(F.lit(1)).alias("n_events"),
    )
    flagged = (
        resid.drop("med")
        .join(broadcast(mad.select("event_type", "mad")), "event_type")
        .filter(F.col("ad") > 3.5 * 1.4826 * F.col("mad"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_anomalies"))
    )
    return (
        mad.join(flagged, "event_type", "left")
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_events",
            F.coalesce("n_anomalies", F.lit(0)).alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


EVENT_ANOMALY_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), resid AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad, max(med) AS med,
         count(*) AS n_events
  FROM resid GROUP BY event_type
), flagged AS (
  SELECT r.event_type, count(*) AS n_anomalies
  FROM resid r JOIN mad m USING (event_type)
  WHERE r.ad > 3.5 * 1.4826 * m.mad
  GROUP BY r.event_type
)
SELECT m.event_type, round(m.med, 4) AS med, round(m.mad, 4) AS mad,
       m.n_events, coalesce(f.n_anomalies, 0) AS n_anomalies
FROM mad m LEFT JOIN flagged f USING (event_type)
ORDER BY m.event_type
"""


def incremental_view_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (operators.diff.
    maintain_count_sum): the per-customer (order count, revenue) rollup is
    maintained from snapshot A to snapshot B by applying ONLY the changed
    rows' retractions/additions to the standing view — O(delta), no rescan
    of B. The snapshots are the snapshot_diff scenario (late orders
    inserted, every-97th key deleted, urgent orders repriced). The ORACLE
    is a direct rebuild of the view over snapshot B — hash equality proves
    the incremental path bit-equal to recomputation (sums run in
    DECIMAL(18,2) so no float-order drift)."""
    from quantms_utils_spark.operators.diff import maintain_count_sum

    o = load(spark, sf_dir, "orders")
    snap_a = o.filter(F.col("o_orderdate") <= "1995-01-01")
    snap_b = o.filter(
        (F.col("o_orderdate") <= "1996-01-01") & (F.col("o_orderkey") % 97 != 0)
    ).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderpriority") == "1-URGENT",
            F.col("o_totalprice") + 10.0,
        ).otherwise(F.col("o_totalprice")),
    )
    out = maintain_count_sum(
        snap_a, snap_b, keys=["o_orderkey"], group_col="o_custkey",
        value_col="o_totalprice",
    )
    return out.select(
        "o_custkey",
        "n_rows",
        F.round(F.col("total").cast("double"), 2).alias("total"),
    )


INCREMENTAL_VIEW_SQL = """
WITH snap_b AS (
  SELECT o_custkey,
         CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 10.0
              ELSE o_totalprice END AS price
  FROM orders
  WHERE o_orderdate <= DATE '1996-01-01' AND o_orderkey % 97 <> 0
)
SELECT o_custkey,
       count(*) AS n_rows,
       round(CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
FROM snap_b
GROUP BY o_custkey
"""


def supplier_wait_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped blame analysis — the hardest classic relational shape
    (EXISTS + NOT EXISTS against the same fact): suppliers who were the
    ONLY late-delivering supplier on a multi-supplier order ("late" =
    shipped more than 90 days after the order date — the synthetic schema
    has no receipt/commit dates). Spark-first: both correlated subqueries
    become per-orderkey aggregates computed in ONE pass over the
    fact-joined lineitem (count distinct suppliers, count distinct LATE
    suppliers), then a single equi-join back — the double self-join the
    SQL implies collapses to one shuffle + one join. Top-10 by blame
    count."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l = li.join(o, li.l_orderkey == o.o_orderkey)
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    blamed = (
        l.filter(late)
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    return (
        blamed.join(broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(10)
    )


SUPPLIER_WAIT_BLAME_SQL = """
WITH fact AS (
  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                             THEN l_suppkey END) AS n_late_supp
  FROM fact GROUP BY l_orderkey
), blamed AS (
  SELECT DISTINCT f.l_orderkey, f.l_suppkey
  FROM fact f
  JOIN per_order p ON f.l_orderkey = p.l_orderkey
  WHERE f.l_shipdate > f.o_orderdate + INTERVAL 90 DAY
    AND p.n_supp > 1 AND p.n_late_supp = 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM blamed JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 10
"""


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped correlated minimum — "the supplier offering each part at
    its minimum cost" — WITHOUT the correlated subquery: a min window over
    partition(p_partkey) ranks every (part, supplier) offer in the same
    shuffle that would have computed the join, then one equality filter.
    The synthetic schema has no partsupp table, so the offer cost is a
    deterministic md5-derived function of (partkey, suppkey) both engines
    recompute. The offer predicate (p_partkey + s_suppkey) % 7 = 0 is a
    THETA join as written, but factors into an equi-join on the derived
    residue class — p % 7 = (7 - s % 7) % 7 — so it plans as a broadcast
    HASH join, not a nested loop (pinned below by the oracle row set).
    Top-20 parts by id."""
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    offers = (
        p.select("p_partkey")
        .join(
            broadcast(s.select("s_suppkey", "s_name")),
            F.pmod(F.col("p_partkey"), F.lit(7))
            == F.pmod(
                F.lit(7) - F.pmod(F.col("s_suppkey"), F.lit(7)), F.lit(7)
            ),
        )
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("p_partkey").cast("string"),
                                F.lit("/"),
                                F.col("s_suppkey").cast("string"),
                            )
                        ),
                        1,
                        6,
                    ),
                    16,
                    10,
                ).cast("long")
                % 100000
            ).alias("cost_cents"),
        )
    )
    w = Window.partitionBy("p_partkey")
    best = offers.withColumn(
        "min_cost", F.min("cost_cents").over(w)
    ).filter(F.col("cost_cents") == F.col("min_cost"))
    return (
        best.select("p_partkey", "s_suppkey", "s_name", "cost_cents")
        .orderBy("p_partkey", "s_suppkey")
        .limit(20)
    )


CHEAPEST_SUPPLIER_SQL = """
WITH offers AS (
  SELECT p_partkey, s_suppkey, s_name,
         ('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || '/'
                         || CAST(s_suppkey AS VARCHAR)), 1, 6))::BIGINT
           % 100000 AS cost_cents
  FROM part JOIN supplier ON p_partkey % 7 = (7 - s_suppkey % 7) % 7
), best AS (
  SELECT *, min(cost_cents) OVER (PARTITION BY p_partkey) AS min_cost
  FROM offers
)
SELECT p_partkey, s_suppkey, s_name, cost_cents
FROM best WHERE cost_cents = min_cost
ORDER BY p_partkey, s_suppkey
LIMIT 20
"""


def event_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of `value`
    (α = 0.3) — a RECURSIVE per-key fold no window frame can express
    (each state depends on the previous state, not a fixed frame).
    Spark-first: one shuffle groups each user's (ts, event_id, value)
    structs, sort_array orders them in-row, and a pure-Catalyst
    F.aggregate folds the tail onto the head (seeded with the first
    element) — per-group O(n), no Python, no driver iteration. DuckDB's
    list_reduce replays the identical left fold in the identical order,
    so the doubles agree before rounding. At whale-key scale the
    per-group array is the bound to watch — the production form is
    operators.windows.ewma_chunked (two-level affine-map fold, per-key
    state bounded at max(chunk, n/chunk); equivalence + 1M-event whale
    pinned in tests/test_whale_guards.py); this registry form keeps the
    single fold because DuckDB's list_reduce replays it verbatim."""
    from quantms_utils_spark.functions.core import let_once

    e = load(spark, sf_dir, "events")
    alpha = 0.3
    g = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("_seq"),
    )
    vals_expr = F.transform(F.col("_seq"), lambda st: st["value"])

    def _fold(vals):
        return F.aggregate(
            F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
            F.element_at(vals, 1),
            lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
        )

    return g.select(
        "user_id",
        "n_events",
        F.round(let_once(vals_expr, _fold), 6).alias("ewma"),
    )


EVENT_EWMA_SQL = """
SELECT user_id,
       count(*) AS n_events,
       round(list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
FROM events
GROUP BY user_id
"""


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed exchange-free join under the correctness gate: lineitem
    and orders are WRITTEN as identically-bucketed catalog tables (8
    buckets on the join key, bucket-sorted, external path in a tempdir —
    operators.bucketing.write_bucketed), then sort-merge-joined with no
    Exchange on either side (plan pinned in tests/test_bucketing.py) and
    aggregated to revenue per order priority. The oracle is the plain
    join+aggregate over the original parquet — hash equality proves the
    bucketed write→read→join path loses/duplicates nothing. This is the
    shuffle-once-at-write-time amortization every repeated fact⋈fact
    workload buys at 100 TB."""
    import tempfile

    from quantms_utils_spark.operators.bucketing import write_bucketed

    base = tempfile.mkdtemp(prefix="bucketed_join_")
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (1 - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    spark.sql("DROP TABLE IF EXISTS bj_lineitem")
    spark.sql("DROP TABLE IF EXISTS bj_orders")
    write_bucketed(l, "bj_lineitem", 8, "l_orderkey", path=base + "/l")
    write_bucketed(o, "bj_orders", 8, "o_orderkey", path=base + "/o")
    j = spark.table("bj_lineitem").join(
        spark.table("bj_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("rev").cast("double"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


BUCKETED_JOIN_SQL = """
SELECT o_orderpriority,
       count(*) AS n_items,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2)
         AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted join under the correctness gate: events (the skewed big
    side — event_type is a classic hot key) equi-join a tiny event_type
    weight dim through operators.skew.salted_join (big side seeded-salted
    into 8 sub-keys, small side exploded across salts), then aggregate
    weighted value per type. The ORACLE is the PLAIN join+aggregate —
    hash equality IS the row-identity guarantee salting must preserve.
    Weighted sums run in DECIMAL so salt-dependent partial-sum order
    cannot drift the float result."""
    from quantms_utils_spark.operators.skew import salted_join

    e = load(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )
    dim = spark.createDataFrame(
        [("view", 1), ("click", 2), ("purchase", 10), ("signup", 5),
         ("error", -3)],
        "event_type string, weight int",
    )
    joined = salted_join(e, dim, on=["event_type"], n_salts=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("v") * F.col("weight")).cast("double"), 4
            ).alias("weighted_value"),
        )
        .orderBy("event_type")
    )


SKEW_SALTED_JOIN_SQL = """
WITH dim AS (
  SELECT * FROM (VALUES ('view', 1), ('click', 2), ('purchase', 10),
                        ('signup', 5), ('error', -3)) AS t(event_type, weight)
)
SELECT e.event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6)) * weight) AS DOUBLE), 4)
         AS weighted_value
FROM events e JOIN dim USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


def event_type_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each event_type's share of total value — the
    percent-of-total window over the AGGREGATED frame (rows = distinct
    types), so the window costs nothing; sums in DECIMAL for an exact
    numerator/denominator before the one rounded division."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("tot")
    )
    w = Window.partitionBy()
    return agg.select(
        "event_type",
        F.round(F.col("tot").cast("double"), 4).alias("type_value"),
        F.round(
            (F.col("tot") / F.sum("tot").over(w)).cast("double"), 6
        ).alias("share"),
    ).orderBy("event_type")


EVENT_TYPE_SHARE_SQL = """
WITH agg AS (
  SELECT event_type, sum(CAST(value AS DECIMAL(18,6))) AS tot
  FROM events GROUP BY event_type
)
SELECT event_type,
       round(CAST(tot AS DOUBLE), 4) AS type_value,
       round(CAST(tot / sum(tot) OVER () AS DOUBLE), 6) AS share
FROM agg
ORDER BY event_type
"""


def snapshot_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as a batch transform (operators.diff.merge_upsert):
    target = orders through 1995-01-01; the source CHANGE FEED carries only
    the delta — urgent repricings (matched → update), the 1995→1996
    arrivals (not matched → insert), and delete markers for every 97th
    key (matched + flag → delete). Applying the feed must reproduce
    exactly the 1996 snapshot of `snapshot_diff`'s scenario, which the
    oracle builds DIRECTLY — so a dropped delete, a double-applied update,
    or an anti-join slip all shift the per-priority DECIMAL rollup and
    hash-mismatch. The merge itself is one left-anti join + union — no
    full-outer, no row comparison."""
    from quantms_utils_spark.operators.diff import merge_upsert

    o = load(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderdate") <= "1995-01-01")
    in_range = o.filter(F.col("o_orderdate") <= "1996-01-01")
    repriced = F.when(
        F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice") + 10.0
    ).otherwise(F.col("o_totalprice"))
    deleted = F.col("o_orderkey") % 97 == 0
    arriving = F.col("o_orderdate") > "1995-01-01"
    urgent = F.col("o_orderpriority") == "1-URGENT"
    source = (
        in_range.filter(
            (deleted & ~arriving) | (~deleted & (urgent | arriving))
        )
        .withColumn("o_totalprice", repriced)
        .withColumn("is_deleted", deleted)
    )
    merged = merge_upsert(
        target, source, keys=["o_orderkey"], delete_col="is_deleted"
    )
    return merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total"),
        F.sum("o_orderkey").alias("key_sum"),
    )


SNAPSHOT_MERGE_SQL = """
WITH snap_b AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 10.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE o_orderdate <= TIMESTAMP '1996-01-01' AND o_orderkey % 97 <> 0
)
SELECT o_orderpriority, count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM snap_b GROUP BY o_orderpriority
"""


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag QUANTITY-weighted median of extended price
    (operators.windows.weighted_quantile): percentile() has no weighted
    form, so the engine runs the canonical cumulative-weight window (one
    Exchange + one Sort per group, deterministic tiebreak on the line
    key) and takes the first value reaching half the group's weight. The
    oracle replays the identical two windows, so an off-by-one in the
    running frame (exclusive vs inclusive) or a tie mis-order flips the
    picked value and hash-mismatches. Weights sum in DECIMAL so the ≥
    threshold compare is exact in both engines."""
    from quantms_utils_spark.operators.windows import weighted_quantile

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("decimal(18,2)").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    out = weighted_quantile(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        "w",
        q=0.5,
        order_tiebreak=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "l_returnflag",
        F.round("l_extendedprice_q", 2).alias("wmedian_price"),
        F.round(F.col("total_weight").cast("double"), 2).alias("total_qty"),
    )


WEIGHTED_MEDIAN_SQL = """
WITH cum AS (
  SELECT l_returnflag, l_extendedprice,
         sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
           PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
       round(min(l_extendedprice), 2) AS wmedian_price,
       round(CAST(max(tw) AS DOUBLE), 2) AS total_qty
FROM cum WHERE cw >= 0.5 * tw
GROUP BY l_returnflag
"""


def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 intervals that
    `event_scd2_intervals` builds: for each (user, probe timestamp) the
    version row whose validity covers the probe — feature-store
    "as-of correctness" (no leakage from future versions). The probe grid
    is 4 fixed daily timestamps per user; the lookup is the union+window
    as-of (operators.joins.asof_join) — ONE shuffle on user, no
    interval explosion, no correlated subquery. Because SCD2 intervals
    abut by construction, as-of on valid_from IS the interval-containment
    lookup; the oracle states the containment form directly (valid_from ≤
    t < coalesce(valid_to, ∞)) plus an anti-null check, so the two
    formulations cross-validate."""
    from quantms_utils_spark.operators.joins import asof_join

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__prev", F.lag("event_type").over(w))
        .filter(~F.col("__prev").eqNullSafe(F.col("event_type")))
        .select(
            "user_id",
            F.col("event_type").alias("version_type"),
            F.col("ts").alias("valid_from"),
        )
    )
    probes = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        F.lit(f"2024-01-{d:02d} 12:00:00").cast("timestamp")
                        for d in (2, 5, 8, 11)
                    ]
                )
            ).alias("probe_ts"),
        )
    )
    return asof_join(
        probes,
        dim,
        on=["user_id"],
        left_ts="probe_ts",
        right_ts="valid_from",
        right_value_cols=["version_type", "valid_from"],
    ).select("user_id", "probe_ts", "version_type", "valid_from")


SCD2_POINT_SQL = """
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), dim AS (
  SELECT user_id, event_type AS version_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM t WHERE prev IS DISTINCT FROM event_type
), probes AS (
  SELECT DISTINCT user_id,
         CAST(p AS TIMESTAMP) AS probe_ts
  FROM events, (SELECT unnest(['2024-01-02 12:00:00',
                               '2024-01-05 12:00:00',
                               '2024-01-08 12:00:00',
                               '2024-01-11 12:00:00']) AS p)
)
SELECT p.user_id, p.probe_ts, d.version_type, d.valid_from
FROM probes p LEFT JOIN dim d
  ON d.user_id = p.user_id
 AND d.valid_from <= p.probe_ts
 AND (d.valid_to IS NULL OR p.probe_ts < d.valid_to)
"""


QUERIES = {
    "incremental_view_refresh": (incremental_view_refresh, INCREMENTAL_VIEW_SQL),
    "event_value_ewma": (event_value_ewma, EVENT_EWMA_SQL),
    "bucketed_join_revenue": (bucketed_join_revenue, BUCKETED_JOIN_SQL),
    "skew_salted_join_agg": (skew_salted_join_agg, SKEW_SALTED_JOIN_SQL),
    "event_type_revenue_share": (
        event_type_revenue_share,
        EVENT_TYPE_SHARE_SQL,
    ),
    "supplier_wait_blame": (supplier_wait_blame, SUPPLIER_WAIT_BLAME_SQL),
    "cheapest_supplier_per_part": (
        cheapest_supplier_per_part,
        CHEAPEST_SUPPLIER_SQL,
    ),
    "event_anomaly_mad": (event_anomaly_mad, EVENT_ANOMALY_MAD_SQL),
    "event_scd2_intervals": (event_scd2_intervals, EVENT_SCD2_SQL),
    "table_skew_report": (table_skew_report, TABLE_SKEW_SQL),
    "approx_event_stats": (approx_event_stats, APPROX_EVENT_STATS_SQL),
    "topk_per_group": (topk_per_group, TOPK_PER_GROUP_SQL),
    "hourly_gap_fill": (hourly_gap_fill, HOURLY_GAP_FILL_SQL),
    "event_pivot": (event_pivot, EVENT_PIVOT_SQL),
    "part_unpivot": (part_unpivot, PART_UNPIVOT_SQL),
    "asof_join_two_table": (asof_join_two_table, ASOF_JOIN_TWO_TABLE_SQL),
    "latest_event_per_user": (latest_event_per_user, LATEST_EVENT_SQL),
    "event_value_stats": (event_value_stats, EVENT_VALUE_STATS_SQL),
    "customers_lapsed": (customers_lapsed, CUSTOMERS_LAPSED_SQL),
    "repeat_buyers": (repeat_buyers, REPEAT_BUYERS_SQL),
    "cohort_retention": (cohort_retention, COHORT_RETENTION_SQL),
    "event_daily_rollup": (event_daily_rollup, EVENT_DAILY_ROLLUP_SQL),
    "event_retention_cohorts": (event_retention_cohorts, EVENT_RETENTION_SQL),
    "event_value_winsorized": (event_value_winsorized, EVENT_WINSORIZE_SQL),
    "interval_overlap_pairs": (interval_overlap_pairs, INTERVAL_OVERLAP_SQL),
    "window_lag_lead": (window_lag_lead, WINDOW_LAG_LEAD_SQL),
    "event_funnel": (event_funnel, EVENT_FUNNEL_SQL),
    "value_percentiles": (value_percentiles, VALUE_PERCENTILES_SQL),
    "order_priority_semi": (order_priority_semi, ORDER_PRIORITY_SEMI_SQL),
    "regional_revenue": (regional_revenue, REGIONAL_REVENUE_SQL),
    "returned_items_topk": (returned_items_topk, RETURNED_ITEMS_SQL),
    "big_orders_having": (big_orders_having, BIG_ORDERS_SQL),
    "rollup_revenue": (rollup_revenue, ROLLUP_REVENUE_SQL),
    "moving_avg_range": (moving_avg_range, MOVING_AVG_RANGE_SQL),
    "layout_zorder_stats": (zorder_bucket_stats, ZORDER_BUCKET_STATS_SQL),
    "snapshot_diff": (snapshot_diff, SNAPSHOT_DIFF_SQL),
    "snapshot_diff_exact": (snapshot_diff_exact, SNAPSHOT_DIFF_EXACT_SQL),
    "snapshot_merge_apply": (snapshot_merge_apply, SNAPSHOT_MERGE_SQL),
    "weighted_median_price": (weighted_median_price, WEIGHTED_MEDIAN_SQL),
    "scd2_point_in_time": (scd2_point_in_time, SCD2_POINT_SQL),
}


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the sibling surface to `rollup_revenue`
    (ROLLUP) and the shape BI layers emit: three NON-hierarchical set
    combinations ((returnflag, linestatus), (returnflag), (linestatus))
    in ONE pass. Spark plans the set list as a single Expand (each input
    row replicated once per set) feeding one hash aggregate — never three
    scans unioned; grouping_id() disambiguates NULL-as-subtotal rows from
    genuine NULLs. Unlike ROLLUP, the (linestatus)-only set has no
    hierarchical parent — exactly what ROLLUP cannot express."""
    l = load(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_price,
               count(*) AS n_rows,
               grouping_id(l_returnflag, l_linestatus) AS gid
        FROM __gs_lineitem
        GROUP BY GROUPING SETS (
          (l_returnflag, l_linestatus), (l_returnflag), (l_linestatus)
        )
        """
    )


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       count(*) AS n_rows,
       grouping_id(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY GROUPING SETS (
  (l_returnflag, l_linestatus), (l_returnflag), (l_linestatus)
)
"""

QUERIES["grouping_sets_revenue"] = (grouping_sets_revenue, GROUPING_SETS_SQL)


def balance_quartile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank windows (ntile) — the remaining classic window
    family: quartile customers by account balance WITHIN each nation, then
    summarize each (nation, quartile) band. The ntile shuffle partitions
    by nation (dimension-bounded key count, skew-free by construction);
    the band summary aggregates the already-partitioned frame, so the
    whole query is one Exchange + Sort + two operators. Tie order is
    pinned by (acctbal, custkey) so both engines assign identical tiles.
    Output (n_name, quartile, n_custs, min_bal, max_bal)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        c.withColumn("quartile", F.ntile(4).over(w))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("n_name", "quartile")
    )


BALANCE_QUARTILE_BANDS_SQL = """
WITH tiled AS (
  SELECT c_nationkey, c_acctbal,
         ntile(4) OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer
)
SELECT n_name, quartile, count(*) AS n_custs,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM tiled JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["balance_quartile_bands"] = (
    balance_quartile_bands,
    BALANCE_QUARTILE_BANDS_SQL,
)


def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration (Herfindahl–Hirschman) index of supplier
    revenue within each part type — the concentration-metric shape:
    revenue shares square and sum INSIDE one aggregated frame. Plan: one
    fact aggregate to (p_type, suppkey) cells (part dim broadcast), then a
    |types|×|suppliers|-bounded window for the type totals and one more
    tiny aggregate. Shares divide exact DECIMAL sums; the final HHI is
    rounded once. Output (p_type, n_suppliers, hhi) — hhi in [0, 1],
    1 = single-supplier monopoly."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount").cast("decimal(18,6)")
    )
    cells = (
        li.join(broadcast(p.select("p_partkey", "p_type")),
                li.l_partkey == p.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum(rev).alias("srev"))
    )
    wt = Window.partitionBy("p_type")
    share = F.col("srev").cast("double") / F.sum("srev").over(wt).cast("double")
    return (
        cells.select("p_type", share.alias("sh"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(F.col("sh") * F.col("sh")), 6).alias("hhi"),
        )
        .orderBy("p_type")
    )


SUPPLIER_CONCENTRATION_HHI_SQL = """
WITH cells AS (
  SELECT p_type, l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,6))
             * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS srev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), shares AS (
  SELECT p_type,
         CAST(srev AS DOUBLE) / CAST(sum(srev) OVER (PARTITION BY p_type)
                                     AS DOUBLE) AS sh
  FROM cells
)
SELECT p_type, count(*) AS n_suppliers, round(sum(sh * sh), 6) AS hhi
FROM shares GROUP BY 1 ORDER BY 1
"""

QUERIES["supplier_concentration_hhi"] = (
    supplier_concentration_hhi,
    SUPPLIER_CONCENTRATION_HHI_SQL,
)


def customer_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto analysis: what share of total revenue do the top 10/20/50%
    of customers carry? Cumulative-distribution-over-aggregate shape: one
    fact aggregate to per-customer revenue, then the TWO-PHASE global
    percent_rank (operators/rank.py: range-partition → local index →
    broadcast offsets) over that |customers|-row frame (revenue-desc,
    custkey tie-break — a total order, so percent_rank ≡
    (row_number-1)/(n-1)), then a three-band conditional rollup — the
    fact table is touched once and NOTHING funnels through a
    single-task ordered window, so the shape survives a fact-derived
    frame at 100×. Output (band, n_customers, revenue_share)."""
    from quantms_utils_spark.operators.rank import global_percent_rank

    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("crev")
    ).localCheckpoint(eager=False)  # branches: ranking + the total below
    ranked = global_percent_rank(
        per_cust,
        [F.col("crev").desc(), F.col("o_custkey")],
        rank_col="pr",
    ).select("crev", "pr")
    band = (
        F.when(F.col("pr") <= 0.10, "top10")
        .when(F.col("pr") <= 0.20, "top20")
        .when(F.col("pr") <= 0.50, "top50")
        .otherwise("rest")
    )
    tot = per_cust.agg(F.sum("crev").alias("trev"))
    return (
        ranked.select(band.alias("band"), "crev")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("crev").alias("brev"),
        )
        .crossJoin(broadcast(tot))
        .select(
            "band",
            "n_customers",
            F.round(
                F.col("brev").cast("double") / F.col("trev").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("band")
    )


CUSTOMER_PARETO_SHARE_SQL = """
WITH per_cust AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS crev
  FROM orders GROUP BY 1
), ranked AS (
  SELECT crev,
         percent_rank() OVER (ORDER BY crev DESC, o_custkey) AS pr
  FROM per_cust
), tot AS (SELECT sum(crev) AS trev FROM per_cust)
SELECT CASE WHEN pr <= 0.10 THEN 'top10'
            WHEN pr <= 0.20 THEN 'top20'
            WHEN pr <= 0.50 THEN 'top50'
            ELSE 'rest' END AS band,
       count(*) AS n_customers,
       round(CAST(sum(crev) AS DOUBLE) / CAST(max(trev) AS DOUBLE), 6)
         AS revenue_share
FROM ranked, tot
GROUP BY 1 ORDER BY 1
"""

QUERIES["customer_pareto_share"] = (
    customer_pareto_share,
    CUSTOMER_PARETO_SHARE_SQL,
)


def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: for part pairs
    co-occurring in ≥ 2 orders, support, confidence and lift — the
    classic market-basket family. Scale shape (optimization round 13,
    guide §2.4 "remove shuffles outright" / §3.3 "explode after the
    join"): ONE ``groupBy(orderkey).agg(array_sort(collect_set(partkey)))``
    fact exchange replaces the previous distinct() + within-order
    SELF-JOIN (which paid a second orderkey exchange per join side plus
    two sort-merge sorts); pairs explode IN-ARRAY (the
    ``lsh_candidate_pairs`` idiom — the sorted-unique array emits each
    a<b pair exactly once per order), and the per-part basket counts and
    the order total derive from the SAME grouped frame (pinned, released
    on result drop per the dedup-module cache policy — column pruning
    defeats ReuseExchange across the three consumers otherwise). The
    pair-space bound is unchanged: C(items-per-order, 2) per order —
    bounded by basket size, never |parts|². NULL semantics are preserved
    exactly: collect_set drops NULL partkeys (which could never satisfy
    ``part_a < part_b`` or the count joins), NULL-orderkey rows still
    feed per-part counts but never pairs or the order total (SQL
    NULL-equality, mirrored by the isNotNull pair filter and
    ``count(l_orderkey)``). The ratios cast counts to DOUBLE BEFORE
    multiplying (support·n_orders and cnt_a·cnt_b as BIGINT products
    would silently wrap at whale scale in non-ANSI Spark while DuckDB
    errors — the cast keeps both engines identical and overflow-free)
    and round once. Top-20 by lift (tie-broken by the pair) with
    min-support 2; the order count is a 1-row broadcast, never a driver
    action. Output (part_a, part_b, support, confidence, lift)."""
    from quantms_utils_spark.operators.dedup import _release_on_drop

    li = load(spark, sf_dir, "lineitem")
    grouped = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .persist()
    )
    n_orders = grouped.agg(F.count("l_orderkey").alias("n_orders"))
    parts = F.col("parts")
    pair = F.flatten(
        F.transform(
            parts,
            lambda x, i: F.transform(
                F.slice(parts, i + F.lit(2), F.size(parts) - i - F.lit(1)),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = (
        grouped.where(F.col("l_orderkey").isNotNull())
        .select(F.explode(pair).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    # The per-part basket counts feed TWO broadcast sides (ca/cb) and
    # Catalyst plans each broadcast exchange independently — unpinned, the
    # explode+aggregate over the basket arrays executed twice (measured:
    # two identical ~630 ms broadcast-build stages in the event-log
    # profile). The frame is aggregate-sized (one row per part), so the
    # pin is cheap; released with the result per the module cache policy.
    counts = (
        grouped.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    ca = counts.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a"))
    cb = counts.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b"))
    result = (
        pairs.join(broadcast(ca), "part_a")
        .join(broadcast(cb), "part_b")
        .crossJoin(broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(
                F.col("support").cast("double") / F.col("cnt_a").cast("double"), 6
            ).alias("confidence"),
            F.round(
                F.col("support").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )
    return _release_on_drop(result, grouped, counts)


MARKET_BASKET_LIFT_SQL = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
), counts AS (
  SELECT l_partkey, count(*) AS cnt FROM baskets GROUP BY 1
)
SELECT part_a, part_b, support,
       round(CAST(support AS DOUBLE) / CAST(ca.cnt AS DOUBLE), 6) AS confidence,
       round(CAST(support AS DOUBLE) * CAST(n_orders AS DOUBLE)
             / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)), 6) AS lift
FROM pairs
JOIN counts ca ON ca.l_partkey = part_a
JOIN counts cb ON cb.l_partkey = part_b
CROSS JOIN n
ORDER BY lift DESC, part_a, part_b
LIMIT 20
"""

QUERIES["market_basket_lift"] = (market_basket_lift, MARKET_BASKET_LIFT_SQL)


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — the third member of the multi-dimensional aggregate trio
    next to `rollup_revenue` (ROLLUP) and `grouping_sets_revenue`
    (explicit sets): ALL 2^2 grouping combinations of (returnflag,
    linestatus) in one pass, including the (linestatus)-only marginal
    ROLLUP omits and the grand total GROUPING SETS would have to spell
    out. Same Expand-feeding-one-aggregate plan — never four unioned
    scans; grouping_id() disambiguates subtotal NULLs."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


CUBE_REVENUE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       count(*) AS n_rows,
       grouping_id(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""

QUERIES["cube_revenue"] = (cube_revenue, CUBE_REVENUE_SQL)


def event_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED-sketch rollup (Spark 4 Datasketches surface): per-day HLL
    user sketches (`hll_sketch_agg` — a BINARY column you could store in a
    daily rollup table) are RE-AGGREGATED with `hll_union_agg` up to
    event_type, and the unioned estimate is checked against the exact
    distinct count. This is the property that makes sketches the 100 TB
    design: yesterday's sketch merges with today's without re-reading
    history, at fixed state size. Same tolerance-oracle contract as
    `approx_event_stats`: the oracle emits exact values + constant TRUE,
    so the hash matches iff every union landed within the documented
    bound. Output (event_type, n_days, exact_users, rollup_ok)."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    rolled = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= F.col("exact_users") * 0.06
            ).alias("rollup_ok"),
        )
        .orderBy("event_type")
    )


EVENT_HLL_ROLLUP_SQL = """
SELECT event_type,
       count(DISTINCT CAST(ts AS DATE)) AS n_days,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS rollup_ok
FROM events
GROUP BY 1 ORDER BY 1
"""

QUERIES["event_hll_rollup"] = (event_hll_rollup, EVENT_HLL_ROLLUP_SQL)


def event_top_types_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch surface (Spark 4 `approx_top_k`,
    Datasketches frequent-items): top-3 event types with counts. The
    sketch is EXACT whenever the distinct count fits its capacity
    (5 types ≪ the default 10k), so unlike the HLL/t-digest family this
    sketch query carries a plain exact oracle — and at 100 TB the same
    expression degrades gracefully to approximate heavy hitters with
    fixed state, the property `text_heavy_hitters_cms` builds by hand.
    Output (event_type, n) by descending count (no count ties in the
    synthetic data at any SF)."""
    e = load(spark, sf_dir, "events")
    topk = e.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
    return (
        topk.select(F.explode("tk").alias("x"))
        .select(
            F.col("x.item").alias("event_type"),
            F.col("x.count").alias("n"),
        )
        .orderBy(F.col("n").desc(), "event_type")
    )


EVENT_TOP_TYPES_SKETCH_SQL = """
SELECT event_type, count(*) AS n
FROM events
GROUP BY 1 ORDER BY n DESC, event_type
LIMIT 3
"""

QUERIES["event_top_types_sketch"] = (
    event_top_types_sketch,
    EVENT_TOP_TYPES_SKETCH_SQL,
)


def lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL join — the correlated per-row-LIMIT subquery surface:
    each nation's top-2 customers by balance, written as ``JOIN LATERAL
    (… ORDER BY … LIMIT 2)``. Catalyst DECORRELATES the per-nation limit
    into a rank window over one customer shuffle (plan-pinned: Window
    appears, BroadcastNestedLoopJoin does not) — the same physical plan a
    hand-written rank()<=2 query gets, which is exactly why the lateral
    form is safe at scale. Deterministic tie-break by custkey. Output
    (n_name, c_name, c_acctbal)."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    n.createOrReplaceTempView("__lat_nation")
    c.createOrReplaceTempView("__lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS c_acctbal
        FROM __lat_nation n
        JOIN LATERAL (
          SELECT c_name, c_acctbal FROM __lat_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
        """
    )


LATERAL_TOP_CUSTOMERS_SQL = """
SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
"""

QUERIES["lateral_top_customers"] = (
    lateral_top_customers,
    LATERAL_TOP_CUSTOMERS_SQL,
)


def orders_vs_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery IN THE SELECT LIST — the remaining
    decorrelation surface next to Q17's WHERE-clause form: every order
    carries its customer's average order value, then the top-20 orders
    most above that average. Catalyst decorrelates the per-row subquery
    into ONE per-customer aggregate joined back (plan-pinned: no
    re-execution per row, no nested loop); the ratio divides exact
    DECIMAL sums cast once. Deterministic top-20 by (ratio desc,
    orderkey)."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__ord")
    return spark.sql(
        """
        WITH t AS (
          SELECT o_orderkey, o_custkey,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                 (SELECT avg(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                  FROM __ord o2 WHERE o2.o_custkey = o.o_custkey) AS cust_avg
          FROM __ord o
        )
        SELECT o_orderkey, o_custkey,
               CAST(round(price, 2) AS DOUBLE) AS price,
               round(CAST(price AS DOUBLE) / CAST(cust_avg AS DOUBLE), 6)
                 AS ratio_to_avg
        FROM t
        ORDER BY ratio_to_avg DESC, o_orderkey
        LIMIT 20
        """
    )


ORDERS_VS_CUSTOMER_AVG_SQL = """
WITH t AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         (SELECT avg(CAST(o2.o_totalprice AS DECIMAL(18,2)))
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS cust_avg
  FROM orders o
)
SELECT o_orderkey, o_custkey,
       CAST(round(price, 2) AS DOUBLE) AS price,
       round(CAST(price AS DOUBLE) / CAST(cust_avg AS DOUBLE), 6)
         AS ratio_to_avg
FROM t
ORDER BY ratio_to_avg DESC, o_orderkey
LIMIT 20
"""

QUERIES["orders_vs_customer_avg"] = (
    orders_vs_customer_avg,
    ORDERS_VS_CUSTOMER_AVG_SQL,
)


def part_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period RANK MOVERS — the reporting shape behind every
    "top climbers" dashboard: part revenue ranks in 1995-1997 vs
    1998-2000, joined to surface the biggest rank changes. Both period
    aggregates come from ONE scan (conditional sums); both ranks come
    from the TWO-PHASE global rank (operators/rank.py: range-partition →
    local index → broadcast offsets), so the |parts| frame never funnels
    through a single-task ordered window — the sort fully breaks ties
    (rev desc, partkey), making row_number ≡ rank(). The top-15 is
    deterministic (|delta| desc, partkey). Parts absent from a period
    rank by zero revenue — an inner join on the always-present partkey,
    never a lossy period filter. Output (p_partkey, rank_early,
    rank_late, rank_delta)."""
    from quantms_utils_spark.operators.rank import global_row_number

    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount").cast("decimal(18,6)")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.when(F.year("l_shipdate") <= 1997, rev).otherwise(
                F.lit(0).cast("decimal(18,6)")
            )
        ).alias("rev_early"),
        F.sum(
            F.when(F.year("l_shipdate") >= 1998, rev).otherwise(
                F.lit(0).cast("decimal(18,6)")
            )
        ).alias("rev_late"),
    )
    # The two rank passes CHAIN (the second re-range-partitions the first's
    # output on the other sort key) — no join to reunite branches, and the
    # fact scan + conditional-sum agg runs once.
    ranked = global_row_number(
        global_row_number(
            per_part,
            [F.col("rev_early").desc(), F.col("l_partkey")],
            rank_col="rank_early",
        ),
        [F.col("rev_late").desc(), F.col("l_partkey")],
        rank_col="rank_late",
    ).select(F.col("l_partkey").alias("p_partkey"), "rank_early", "rank_late")
    return (
        ranked.select(
            "p_partkey",
            "rank_early",
            "rank_late",
            (F.col("rank_early") - F.col("rank_late")).alias("rank_delta"),
        )
        .orderBy(F.abs(F.col("rank_delta")).desc(), "p_partkey")
        .limit(15)
    )


PART_RANK_MOVERS_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CASE WHEN year(l_shipdate) <= 1997
                  THEN CAST(l_extendedprice AS DECIMAL(18,6))
                       * (1 - CAST(l_discount AS DECIMAL(18,6)))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS rev_early,
         sum(CASE WHEN year(l_shipdate) >= 1998
                  THEN CAST(l_extendedprice AS DECIMAL(18,6))
                       * (1 - CAST(l_discount AS DECIMAL(18,6)))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS rev_late
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT l_partkey AS p_partkey,
         rank() OVER (ORDER BY rev_early DESC, l_partkey) AS rank_early,
         rank() OVER (ORDER BY rev_late DESC, l_partkey) AS rank_late
  FROM per_part
)
SELECT p_partkey, rank_early, rank_late,
       rank_early - rank_late AS rank_delta
FROM ranked
ORDER BY abs(rank_early - rank_late) DESC, p_partkey
LIMIT 15
"""

QUERIES["part_rank_movers"] = (part_rank_movers, PART_RANK_MOVERS_SQL)


def orderkey_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-SPACE ISLANDS over a sparse key subset: the orderkeys of
    URGENT orders form a naturally gappy subset of the key space, and
    this reports the 10 largest CONTIGUOUS runs of present keys — the
    gaps-and-islands shape over a global (not per-group) order. The
    global row_number comes from the TWO-PHASE rank operator
    (operators/rank.py: range-partition → local index → broadcast
    offsets), making this the direct driver-checked showcase of that
    operator: ``key - global_rn`` is constant within a contiguous run,
    one aggregate per island yields (start, end, size). Nothing funnels
    through a single task at any step. Output (start_key, end_key,
    n_keys) top-10 by size desc, start asc."""
    from quantms_utils_spark.operators.rank import global_row_number

    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    ranked = global_row_number(
        o, [F.col("o_orderkey")], rank_col="rn"
    )
    islands = ranked.withColumn("island", F.col("o_orderkey") - F.col("rn"))
    return (
        islands.groupBy("island")
        .agg(
            F.min("o_orderkey").alias("start_key"),
            F.max("o_orderkey").alias("end_key"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .select("start_key", "end_key", "n_keys")
        .orderBy(F.col("n_keys").desc(), "start_key")
        .limit(10)
    )


ORDERKEY_GAP_ISLANDS_SQL = """
WITH ranked AS (
  SELECT o_orderkey,
         row_number() OVER (ORDER BY o_orderkey) AS rn
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
), islands AS (
  SELECT o_orderkey, o_orderkey - rn AS island FROM ranked
)
SELECT min(o_orderkey) AS start_key,
       max(o_orderkey) AS end_key,
       count(*) AS n_keys
FROM islands
GROUP BY island
ORDER BY n_keys DESC, start_key
LIMIT 10
"""

QUERIES["orderkey_gap_islands"] = (
    orderkey_gap_islands,
    ORDERKEY_GAP_ISLANDS_SQL,
)


def event_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST outlier census per event type: exact median + median
    absolute deviation (MAD), then count values beyond 3×MAD — the
    outlier rule that, unlike z-scores, a few whales cannot drag. Two
    aggregate passes over the stream (median, then MAD of deviations),
    each reduced to a ≤|types|-row frame that broadcasts back onto the
    stream — no window over raw events, no sort. Exact ``percentile``
    is deliberate here (it hash-aggregates per type); at whale scale
    per type swap in approx_percentile with documented error. Output
    (event_type, med, mad, n_outliers) ordered by type."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    flagged = dev.join(broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * F.col("mad"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


EVENT_VALUE_MAD_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type, median(value) AS med
  FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type, e.value, abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m ON e.event_type = m.event_type
), mad AS (
  SELECT event_type, median(adev) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type,
       round(any_value(d.med), 6) AS med,
       round(any_value(m.mad), 6) AS mad,
       CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY 1 ORDER BY 1
"""

QUERIES["event_value_mad_outliers"] = (
    event_value_mad_outliers,
    EVENT_VALUE_MAD_OUTLIERS_SQL,
)


def event_value_grid_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantiles WITHOUT a per-group sort — the third member of the
    percentile family (next to sort-based exact `value_percentiles` and
    the approx sketch): `value` lives on a bounded 2-decimal grid, so
    reduce the stream to a (type, value, count) HISTOGRAM in one
    map-side-combined shuffle, run the cumulative sum over the ≤
    |grid|-row groups (the window is bounded by grid size, NEVER by the
    event count), and take the smallest value whose cumulative count
    reaches ceil(p·n) — percentile_disc semantics. Targets are computed
    in exact INTEGER arithmetic ((n+1)/2, (9n+9)/10) so the ≥ compare
    cannot diverge cross-engine at any n. This is the shape that stays
    exact at 100 TB: the raw stream is touched once; everything ordered
    is grid-bounded. Output (event_type, p50, p90, n_events)."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    hist = e.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    j = cum.join(broadcast(tot), "event_type")
    return (
        j.groupBy("event_type")
        .agg(
            F.round(
                F.min(
                    F.when(
                        F.col("cum") >= F.floor((F.col("n") + 1) / 2),
                        F.col("value"),
                    )
                ),
                2,
            ).alias("p50"),
            F.round(
                F.min(
                    F.when(
                        F.col("cum") >= F.floor((9 * F.col("n") + 9) / 10),
                        F.col("value"),
                    )
                ),
                2,
            ).alias("p90"),
            F.first("n").alias("n_events"),
        )
        .orderBy("event_type")
    )


EVENT_VALUE_GRID_QUANTILES_SQL = """
WITH hist AS (
  SELECT event_type, value, count(*) AS cnt
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, value, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY value
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist
), tot AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM hist GROUP BY 1
)
SELECT c.event_type,
       round(min(CASE WHEN c.cum >= (t.n + 1) // 2 THEN c.value END), 2)
         AS p50,
       round(min(CASE WHEN c.cum >= (9 * t.n + 9) // 10 THEN c.value END), 2)
         AS p90,
       any_value(t.n) AS n_events
FROM cum c JOIN tot t ON c.event_type = t.event_type
GROUP BY 1 ORDER BY 1
"""

QUERIES["event_value_grid_quantiles"] = (
    event_value_grid_quantiles,
    EVENT_VALUE_GRID_QUANTILES_SQL,
)


def layout_zone_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map MANIFEST cross-check: build the file-statistics manifest
    for the lineitem parquet from its FOOTERS only
    (operators.layout.file_zone_map — distributed footer reads, no data
    pages), and let the oracle recompute the SAME statistics from the
    DATA (count/min/max over the table). A green row proves the
    manifest the pruned-scan path trusts actually equals ground truth —
    the integrity property every lakehouse data-skipping design rests
    on (a wrong footer stat silently drops rows at read time). Output
    (file, n_rows, qty_min, qty_max, price_min, price_max)."""
    from quantms_utils_spark.operators.layout import file_zone_map

    zm = file_zone_map(
        spark, f"{sf_dir}/lineitem.parquet", ["l_quantity", "l_extendedprice"]
    )
    return zm.select(
        F.element_at(F.split(F.col("file"), "/"), -1).alias("file"),
        "n_rows",
        F.round("l_quantity_min", 2).alias("qty_min"),
        F.round("l_quantity_max", 2).alias("qty_max"),
        F.round("l_extendedprice_min", 2).alias("price_min"),
        F.round("l_extendedprice_max", 2).alias("price_max"),
    )


LAYOUT_ZONE_MANIFEST_SQL = """
SELECT 'lineitem.parquet' AS file,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(min(l_quantity), 2) AS qty_min,
       round(max(l_quantity), 2) AS qty_max,
       round(min(l_extendedprice), 2) AS price_min,
       round(max(l_extendedprice), 2) AS price_max
FROM lineitem
"""

QUERIES["layout_zone_manifest"] = (layout_zone_manifest, LAYOUT_ZONE_MANIFEST_SQL)


def bloom_pruned_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-MANIFEST pruned point lookup — the equality-predicate half
    of the file-skipping family (operators.layout.file_bloom_manifest /
    bloom_pruned_read): build the per-file Bloom manifest over
    ``documents.source`` from ONE distributed scan (k engine-native
    xxhash64 positions per value, bit_or-packed sparse word maps), prune
    the file list through the k-bit membership probe (an unset bit is
    hard proof of absence — the manifest is data-derived, unlike footer
    stats), then apply the exact row filter on the superset and
    aggregate. The oracle recomputes the aggregate from the raw table
    with a plain WHERE — so a dropped file (false negative), a missed
    row, or a leaked non-matching row all hash-mismatch. Min/max zone
    maps cannot prune this scan shape at all (every file spans the
    source dictionary); this is the complement that can. Output
    (lang, n_docs, total_chars) for source = 'src7'."""
    from quantms_utils_spark.operators.layout import (
        bloom_pruned_read,
        file_bloom_manifest,
    )

    path = f"{sf_dir}/documents.parquet"
    man = file_bloom_manifest(spark, path, "source", m_bits=1024, k=3)
    pruned = bloom_pruned_read(
        spark, path, man, "source", "src7", m_bits=1024, k=3
    )
    return (
        pruned.filter(F.col("source") == "src7")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


BLOOM_PRUNED_SOURCE_STATS_SQL = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE source = 'src7'
GROUP BY lang
ORDER BY lang
"""

QUERIES["bloom_pruned_source_stats"] = (
    bloom_pruned_source_stats,
    BLOOM_PRUNED_SOURCE_STATS_SQL,
)


def customer_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-OVERLAP estimation via KMV sketches
    (operators.sketches.kmv_sketch): how many customers do the 1995 and
    1996 order cohorts share? HLL answers union-only (intersection needs
    inclusion-exclusion with compounding error); the KMV sketch's k
    smallest hashes of A ∪ B are a uniform sample of the union, so the
    fraction present in both sketches estimates Jaccard directly — the
    corpus-overlap primitive ("does my train shard overlap that eval
    set") that exact joins can't answer at 100 TB and this engine also
    needs for dedup triage. k = 512 → ~4.4% σ on distincts; measured
    errors here are ≤2.9% (distinct) and ≤0.009 (Jaccard absolute) at
    every SF, asserted with ≥3× margin. Tolerance-oracle contract as
    `event_hll_rollup`: the oracle emits the EXACT values + constant
    TRUE, so the hash matches iff every estimate landed in-bound.
    Sketch build is whale-safe (two-level pigeonhole top-k, no global
    window); everything downstream is a broadcast of two k-length
    arrays. Output (exact_1995, exact_1996, exact_jaccard, distinct_ok,
    jaccard_ok)."""
    from quantms_utils_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_jaccard,
        kmv_sketch,
    )

    K = 512
    o = (
        load(spark, sf_dir, "orders")
        .select(F.year("o_orderdate").alias("y"), "o_custkey")
        .filter(F.col("y").isin(1995, 1996))
    )
    sk = kmv_sketch(o, ["y"], "o_custkey", k=K)
    a = sk.filter(F.col("y") == 1995).select(F.col("kmv").alias("kmv_a"))
    b = sk.filter(F.col("y") == 1996).select(F.col("kmv").alias("kmv_b"))
    est = a.crossJoin(F.broadcast(b)).select(
        kmv_distinct_estimate(F.col("kmv_a"), K).alias("est_a"),
        kmv_distinct_estimate(F.col("kmv_b"), K).alias("est_b"),
        kmv_jaccard(F.col("kmv_a"), F.col("kmv_b"), K).alias("est_j"),
    )
    ex_a = o.filter(F.col("y") == 1995).select("o_custkey").distinct()
    ex_b = o.filter(F.col("y") == 1996).select("o_custkey").distinct()
    exact = (
        ex_a.agg(F.count(F.lit(1)).alias("exact_1995"))
        .crossJoin(F.broadcast(ex_b.agg(F.count(F.lit(1)).alias("exact_1996"))))
        .crossJoin(
            F.broadcast(
                ex_a.intersect(ex_b).agg(F.count(F.lit(1)).alias("n_inter"))
            )
        )
        .crossJoin(
            F.broadcast(
                ex_a.union(ex_b)
                .distinct()
                .agg(F.count(F.lit(1)).alias("n_union"))
            )
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_1995",
        "exact_1996",
        F.round(F.col("n_inter") / F.col("n_union"), 6).alias("exact_jaccard"),
        (
            (F.abs(F.col("est_a") - F.col("exact_1995")) <= F.col("exact_1995") * 0.10)
            & (F.abs(F.col("est_b") - F.col("exact_1996")) <= F.col("exact_1996") * 0.10)
        ).alias("distinct_ok"),
        (
            F.abs(F.col("est_j") - F.col("n_inter") / F.col("n_union")) <= 0.04
        ).alias("jaccard_ok"),
    )


CUSTOMER_OVERLAP_KMV_SQL = """
WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
     b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS exact_1995,
       CAST((SELECT count(*) FROM b) AS BIGINT) AS exact_1996,
       round((SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
             * 1.0 /
             (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)), 6)
         AS exact_jaccard,
       TRUE AS distinct_ok,
       TRUE AS jaccard_ok
"""

QUERIES["customer_overlap_kmv"] = (
    customer_overlap_kmv,
    CUSTOMER_OVERLAP_KMV_SQL,
)


def user_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival — time-to-event analytics with RIGHT
    CENSORING, the estimator product analytics reaches for the moment
    "time to first purchase" has users who never purchased (dropping
    them biases survival down; counting them as converted biases it up;
    KM handles both). Origin = each user's first signup; event = first
    later purchase; users without one censor at the corpus horizon.

    Spark shape: two filtered aggregates build the per-user
    (duration, is_event) frame (one shuffle each), then the KM table
    lives on the DISTINCT-duration frame — ≤ the day span of the corpus
    (a few dozen rows), so the ordered cumulative windows (at-risk
    counts from a descending cumulative sum; the survival product as
    exp·Σ·ln in ascending duration order) are windows over a BOUNDED
    aggregated frame, not the fact table. Cross-engine float
    determinism: d_i/n_i are integer ratios, and both engines run the
    identical exp(sum(ln(...))) in the identical ascending-duration
    order. Output (duration_days, n_risk, n_events, survival) for event
    durations only."""
    e = load(spark, sf_dir, "events")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    pu = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("tp"))
        .join(su, "user_id")
        .filter(F.col("tp") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("tp").alias("tp"))
    )
    horizon = e.agg(F.max("ts").alias("h"))
    durs = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff(
                F.to_date(F.coalesce(F.col("tp"), F.col("h"))),
                F.to_date("t0"),
            ).alias("dur"),
            F.col("tp").isNotNull().alias("is_event"),
        )
    )
    by_day = durs.groupBy("dur").agg(
        F.count(F.lit(1)).alias("c"),
        F.count(F.when(F.col("is_event"), 1)).alias("d_i"),
    )
    w_desc = (
        Window.orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_asc = (
        Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # both windows run on the distinct-duration frame: bounded by the day
    # span of the corpus, never the fact table (docstring contract)
    km = (
        by_day.withColumn("n_risk", F.sum("c").over(w_desc))
        .withColumn(
            # a fully-converting final risk set gives factor 0 — S drops to
            # exactly 0 there; nullif keeps ln() defined (Spark nulls,
            # DuckDB raises) and the zero_seen flag restores the 0
            "factor",
            F.log(F.nullif(1 - F.col("d_i") / F.col("n_risk"), F.lit(0.0))),
        )
        .withColumn(
            "zero_seen",
            F.max((F.col("d_i") == F.col("n_risk")).cast("int")).over(w_asc),
        )
        .withColumn(
            "survival",
            F.when(F.col("zero_seen") == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum("factor").over(w_asc))
            ),
        )
        .filter(F.col("d_i") > 0)
    )
    return km.select(
        F.col("dur").alias("duration_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_i").cast("long").alias("n_events"),
        F.round("survival", 6).alias("survival"),
    ).orderBy("duration_days")


USER_SURVIVAL_KM_SQL = """
WITH su AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), pu AS (
  SELECT e.user_id, min(e.ts) AS tp
  FROM events e JOIN su ON e.user_id = su.user_id
  WHERE e.event_type = 'purchase' AND e.ts > su.t0
  GROUP BY e.user_id
), durs AS (
  SELECT date_diff('day', CAST(su.t0 AS DATE),
                   CAST(coalesce(pu.tp, (SELECT max(ts) FROM events)) AS DATE))
           AS dur,
         pu.tp IS NOT NULL AS is_event
  FROM su LEFT JOIN pu ON su.user_id = pu.user_id
), by_day AS (
  SELECT dur, count(*) AS c,
         count(*) FILTER (is_event) AS d_i
  FROM durs GROUP BY dur
), km AS (
  SELECT dur, d_i,
         sum(c) OVER (ORDER BY dur DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n_risk
  FROM by_day
)
SELECT dur AS duration_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d_i AS BIGINT) AS n_events,
       round(CASE WHEN max(CASE WHEN d_i = n_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY dur
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  = 1
             THEN 0.0
             ELSE exp(sum(ln(nullif(1 - d_i / n_risk, 0.0)))
                      OVER (ORDER BY dur
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             END, 6) AS survival
FROM km
WHERE TRUE
QUALIFY d_i > 0
ORDER BY duration_days
"""

QUERIES["user_survival_km"] = (user_survival_km, USER_SURVIVAL_KM_SQL)


def event_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan — the classic sequential drift detector
    (Page, 1954) run retrospectively over the daily value series: the
    cumulative sum of deviations from the global mean peaks (in absolute
    value) at the most likely level-shift day. Monitoring pipelines pair
    this with `corpus_drift_psi` — PSI says THAT a distribution moved,
    the CUSUM argmax says WHEN the level moved.

    Spark shape: one map-side-combining daily aggregate over the fact
    table (sums in DECIMAL — exact, so both engines agree bit-for-bit
    before any float op), the global mean from the same decimal totals
    broadcast as a 1-row frame, and the running sum as an ordered window
    over the DISTINCT-day frame — bounded by the corpus day span (≤ a
    few dozen rows), never the fact table. The double prefix sum runs in
    identical day order on both engines, so floats match. Output
    (day, daily_value, cusum, is_peak) for all days; is_peak marks the
    max-|CUSUM| day (ties: earliest)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v")
    )
    tot = daily.agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # windows over the distinct-day frame only (bounded — see docstring)
    cus = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            "day",
            F.col("v").cast("double").alias("dv"),
            (
                F.col("v").cast("double")
                - F.col("s").cast("double") / F.col("n").cast("double")
            ).alias("dev"),
        )
        .withColumn("cusum", F.sum("dev").over(w))
    )
    w_all = Window.orderBy(F.abs(F.col("cusum")).desc(), F.col("day"))
    return (
        cus.withColumn("rn", F.row_number().over(w_all))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("dv", 6).alias("daily_value"),
            # + 0.0 normalizes IEEE negative zero: the final CUSUM is
            # mathematically 0 and the float residue's SIGN is engine-
            # dependent ("-0.0" vs "0.0" hash-differ as text)
            (F.round("cusum", 6) + F.lit(0.0)).alias("cusum"),
            (F.col("rn") == 1).alias("is_peak"),
        )
        .orderBy("day")
    )


EVENT_CHANGEPOINT_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1
), tot AS (SELECT sum(v) AS s, count(*) AS n FROM daily),
cus AS (
  SELECT day,
         CAST(v AS DOUBLE) AS dv,
         sum(CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM daily CROSS JOIN tot
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       round(dv, 6) AS daily_value,
       round(cusum, 6) + 0.0 AS cusum,
       row_number() OVER (ORDER BY abs(cusum) DESC, day) = 1 AS is_peak
FROM cus
ORDER BY day
"""

QUERIES["event_changepoint_cusum"] = (
    event_changepoint_cusum,
    EVENT_CHANGEPOINT_CUSUM_SQL,
)
