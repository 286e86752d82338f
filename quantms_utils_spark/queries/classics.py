"""Classic warehouse query shapes (TPC-H-derived) over the synthetic
tables — round-4 breadth: the join/aggregation archetypes a reference
user's downstream analysts run daily, each expressed shuffle-minimal and
oracle-paired.

House conventions: monetary aggregates accumulate in DECIMAL, are rounded
WHILE STILL DECIMAL (HALF_UP is exact and engine-identical on decimals;
rounding after a double cast diverges at shortest-repr .xx5 boundaries),
then cast to DOUBLE for hashing — same order on BOTH sides;
DuckDB ``sum(BIGINT/INTEGER)`` returns HUGEINT, so integer sums are cast
back to BIGINT in the SQL; every dimension join is an explicit
``broadcast()`` (nation/region/customer/supplier/part are dimension-sized
at any scale factor that matters — the fact table is lineitem/orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from quantms_utils_spark.tables import load

QUERIES: dict = {}

# Revenue accumulates exactly: each INPUT casts to DECIMAL first (inputs
# carry <= 2 decimals, so the scalar cast is boundary-safe), then the
# product/sum run in exact decimal arithmetic in BOTH engines. Casting the
# double product instead would round its 7th digit, where Spark and DuckDB
# can disagree at half-ulp boundaries (observed: a 1-cent drift at sf0.01).
_REV = "CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))"


def _revenue_col():
    return F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount").cast("decimal(18,6)")
    )


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): trade volume between every
    ordered nation pair by ship year. Spark-first plan: lineitem joins
    orders (fact-to-fact on l_orderkey — the one real shuffle), then
    BROADCASTS customer, supplier, and nation twice (aliased dims); the
    nation-pair filter (supp < cust, lexicographic) prunes the symmetric
    half before the final hash aggregate. At 100 TB the orderkey join is
    co-partitionable (both facts bucket by orderkey); everything else is
    map-side. Output: (supp_nation, cust_nation, l_year, revenue)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    # The lineitem⋈orders edge is fact-to-fact: pin SortMergeJoin
    # (optimization round 13, guide §3.1 "pick the strategy
    # deliberately"). The planner's size estimate put the 2-column orders
    # projection under the broadcast threshold at bench scale, but
    # building and shipping a 150k-row broadcast hash relation per run
    # was the query's dominant cost (isolated A/B: 2.35 s broadcast →
    # 1.20 s merge) and GC-unstable in a long-lived session — and at
    # 100 TB orders is a fact table that must never broadcast; the hint
    # makes the local plan the same shape as the cluster plan.
    joined = (
        li.join(
            o.select("o_orderkey", "o_custkey").hint("merge"),
            li.l_orderkey == o.o_orderkey,
        )
        .join(broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(s.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_revenue_col()).alias("_rev"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
        )
    )


VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum(CAST({_REV} AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY 1, 2, 3
"""

QUERIES["volume_shipping"] = (volume_shipping, VOLUME_SHIPPING_SQL)


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share), generalized: for each
    customer REGION and ship year, the share of revenue fulfilled by
    suppliers whose nation lies in that same region (intra-region
    fulfillment ratio). The conditional-sum-over-sum idiom: ONE aggregate
    computes numerator and denominator together (sum(when(...)) /
    sum(...)) — never two scans, never a self-join. Region dims broadcast
    twice under different aliases. Output: (region, l_year, mkt_share,
    total_revenue)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    cdim = (
        c.select("c_custkey", "c_nationkey")
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("r_name").alias("cust_region"))
    )
    sdim = (
        s.select("s_suppkey", "s_nationkey")
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    rev = _revenue_col()
    # Same fact-to-fact SortMergeJoin pin as `volume_shipping` (guide
    # §3.1): the auto-chosen 150k-row orders broadcast was this query's
    # dominant and GC-unstable cost (shared-JVM A/B: 10.8 s degrading →
    # 1.48 s stable with merge), and orders never broadcasts at scale.
    joined = (
        li.join(
            o.select("o_orderkey", "o_custkey").hint("merge"),
            li.l_orderkey == o.o_orderkey,
        )
        .join(broadcast(cdim), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(sdim), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        joined.groupBy(
            F.col("cust_region").alias("region"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(
                F.when(F.col("supp_region") == F.col("cust_region"), rev).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )
            ).alias("_intra"),
            F.sum(rev).alias("_total"),
        )
        .select(
            "region",
            "l_year",
            F.round(
                F.col("_intra").cast("double") / F.col("_total").cast("double"), 6
            ).alias("mkt_share"),
            F.round(F.col("_total"), 2).cast("double").alias("total_revenue"),
        )
    )


MARKET_SHARE_SQL = f"""
WITH j AS (
  SELECT rc.r_name AS region,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST({_REV} AS DECIMAL(18,6)) AS rev,
         (rs.r_name = rc.r_name) AS intra
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region rc ON nc.n_regionkey = rc.r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN region rs ON ns.n_regionkey = rs.r_regionkey
)
SELECT region, l_year,
       round(CAST(sum(CASE WHEN intra THEN rev ELSE 0 END) AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share,
       CAST(round(sum(rev), 2) AS DOUBLE) AS total_revenue
FROM j GROUP BY 1, 2
"""

QUERIES["market_share"] = (market_share, MARKET_SHARE_SQL)


def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock), adapted to the lineitem fact
    (the synthetic schema has no partsupp): parts whose total revenue
    exceeds 0.1% of GLOBAL revenue. The global scalar is a 1-row
    aggregate broadcast into a cross join — the standard decorrelation of
    Q11's scalar subquery (Catalyst does this itself for an uncorrelated
    scalar subquery; stated explicitly here so the plan is pinned). One
    shuffle for the per-part aggregate, one broadcast for the threshold.
    Output: (l_partkey, part_value) for qualifying parts."""
    li = load(spark, sf_dir, "lineitem")
    rev = _revenue_col()
    per_part = li.groupBy("l_partkey").agg(F.sum(rev).alias("_val"))
    total = per_part.agg(F.sum("_val").alias("_tot"))
    return (
        per_part.crossJoin(broadcast(total))
        .filter(F.col("_val").cast("double") > 0.001 * F.col("_tot").cast("double"))
        .select(
            "l_partkey",
            F.round(F.col("_val"), 2).cast("double").alias("part_value"),
        )
    )


IMPORTANT_PARTS_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, sum(CAST({_REV} AS DECIMAL(18,6))) AS val
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(val AS DOUBLE) > 0.001 * (SELECT CAST(sum(val) AS DOUBLE) FROM per_part)
"""

QUERIES["important_parts"] = (important_parts, IMPORTANT_PARTS_SQL)


def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of orders-per-customer
    INCLUDING zero-order customers — the left-join-then-double-aggregate
    shape. First aggregate counts orders per customer after a LEFT join
    (nulls count as 0 via count of the join-side key, not count(*));
    second aggregates the count distribution. Customer is the PRESERVED
    left side of the outer join, so it cannot be the broadcast build side
    — the plan is a shuffle join on custkey feeding a partial-agg count,
    then the tiny distribution aggregate. Output: (c_count, custdist)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.select("c_custkey")
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


CUSTOMER_DISTRIBUTION_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1
"""

QUERIES["customer_distribution"] = (customer_distribution, CUSTOMER_DISTRIBUTION_SQL)


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) whose total revenue equals
    the global maximum — the view-plus-scalar-max shape. ONE fact
    aggregate produces the per-supplier revenue view (dimension-sized);
    the global max is a 1-row aggregate of that view broadcast back into
    it — keeping ties (Q15's correctness subtlety: every supplier at the
    max survives), with no unpartitioned sort anywhere. Output:
    (s_suppkey, s_name, total_revenue)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_revenue_col()).alias("_rev"))
    mx = per_supp.agg(F.max("_rev").alias("_mx"))
    return (
        per_supp.crossJoin(broadcast(mx))
        .filter(F.col("_rev") == F.col("_mx"))
        .join(broadcast(s.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev"), 2).cast("double").alias("total_revenue"),
        )
    )


TOP_SUPPLIER_SQL = f"""
WITH per_supp AS (
  SELECT l_suppkey, sum(CAST({_REV} AS DECIMAL(18,6))) AS rev
  FROM lineitem GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(round(rev, 2) AS DOUBLE) AS total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT max(rev) FROM per_supp)
"""

QUERIES["top_supplier"] = (top_supplier, TOP_SUPPLIER_SQL)


def parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many DISTINCT
    suppliers serve each (brand, type, size) part segment, excluding a
    supplier blacklist — the distinct-pairs + anti-join + countDistinct
    stack. Distinct (part, supp) pairs reduce the fact first (the Q16
    partsupp stand-in); the blacklist (suppliers whose name ends in '7')
    is an anti-join against a broadcast dim; part attributes broadcast.
    Output: (p_brand, p_type, p_size, supplier_cnt)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = s.filter(F.col("s_name").endswith("7")).select("s_suppkey")
    return (
        pairs.join(broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


PARTS_SUPPLIER_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (
  SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
)
GROUP BY 1, 2, 3
"""

QUERIES["parts_supplier_relationship"] = (
    parts_supplier_relationship,
    PARTS_SUPPLIER_SQL,
)


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-quantity orders): orders whose total line quantity
    exceeds a threshold, with customer attribution — the
    aggregate-then-semi-join shape. The HAVING aggregate reduces lineitem
    to qualifying orderkeys FIRST (tiny), which then drive a broadcast
    semi-probe into orders + customer — never the reverse order (joining
    first would shuffle the full fact twice). Output: (c_name, o_orderkey,
    o_orderdate, o_totalprice, total_qty)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty"))
        .filter(F.col("_qty") > 150)
    )
    return (
        o.join(broadcast(qualifying), o.o_orderkey == qualifying.l_orderkey)
        .join(broadcast(c.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("o_totalprice"),
            F.round(F.col("_qty"), 2).cast("double").alias("total_qty"),
        )
    )


LARGE_ORDERS_SQL = """
WITH q AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c_name, o_orderkey, o_orderdate,
       round(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice,
       CAST(round(qty, 2) AS DOUBLE) AS total_qty
FROM orders JOIN q ON o_orderkey = q.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""

QUERIES["large_orders"] = (large_orders, LARGE_ORDERS_SQL)


def promotion_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect) by ship month: percentage of revenue
    from PROMO-type parts — conditional-sum ratio in one aggregate, part
    type broadcast into the fact scan. Output: (l_month, promo_share,
    total_revenue)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = _revenue_col()
    return (
        li.join(broadcast(p.select("p_partkey", "p_type")),
                li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("l_month"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )
            ).alias("_promo"),
            F.sum(rev).alias("_total"),
        )
        .select(
            "l_month",
            F.round(
                F.lit(100.0) * F.col("_promo").cast("double")
                / F.col("_total").cast("double"),
                6,
            ).alias("promo_share"),
            F.round(F.col("_total"), 2).cast("double").alias("total_revenue"),
        )
    )


PROMOTION_REVENUE_SQL = f"""
SELECT strftime(l_shipdate, '%Y-%m') AS l_month,
       round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                   THEN CAST({_REV} AS DECIMAL(18,6))
                                   ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS promo_share,
       CAST(round(sum(CAST({_REV} AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""

QUERIES["promotion_revenue"] = (promotion_revenue, PROMOTION_REVENUE_SQL)


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity order revenue): total revenue from
    lineitems of one brand whose quantity is below 20%% of that part's
    average order quantity — the classic CORRELATED SCALAR SUBQUERY.
    Spark-first: the per-part average becomes one aggregate over the
    brand-filtered fact slice, broadcast back onto the same slice (the
    agg is |parts of brand| rows — dimension-sized at any SF). The
    threshold compare is EXACT integer-free decimal arithmetic:
    ``qty < 0.2 * sum/n``  ⟺  ``qty * 5 * n < sum`` with qty and sum in
    DECIMAL, so no engine ever divides (avg-of-double ulp drift at the
    compare boundary is the classic cross-engine flake). Output one row:
    (small_qty_revenue, n_items)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    brand_parts = p.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    qty = F.col("l_quantity").cast("decimal(18,6)")
    slice_ = li.join(broadcast(brand_parts), li.l_partkey == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = slice_.groupBy("l_partkey").agg(
        F.sum(qty).alias("qsum"), F.count(F.lit(1)).alias("qn")
    ).select(F.col("l_partkey").alias("t_partkey"), "qsum", "qn")
    return (
        slice_.join(broadcast(per_part), slice_.l_partkey == F.col("t_partkey"))
        .filter(qty * F.lit(5) * F.col("qn") < F.col("qsum"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH slice AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
), per_part AS (
  SELECT l_partkey AS t_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,6))) AS qsum,
         count(*) AS qn
  FROM slice GROUP BY 1
)
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS small_qty_revenue,
       count(*) AS n_items
FROM slice JOIN per_part ON l_partkey = t_partkey
WHERE CAST(l_quantity AS DECIMAL(18,6)) * 5 * qn < qsum
"""

QUERIES["small_quantity_revenue"] = (small_quantity_revenue, SMALL_QUANTITY_REVENUE_SQL)


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): three
    OR'd conjunctive (brand, size-band, quantity-band) groups evaluated in
    ONE pass — the shape that exercises predicate normalization. The part
    columns arrive by broadcast; the whole disjunction stays inside
    whole-stage codegen (no UDF, no multi-scan union). Output one row:
    (disjunct_revenue, n_items)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(
        broadcast(p.select("p_partkey", "p_brand", "p_size")),
        li.l_partkey == p.p_partkey,
    )
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    disjunct = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#15") & size.between(1, 15) & qty.between(20, 30))
    )
    return j.filter(disjunct).agg(
        F.round(F.sum(_revenue_col()), 2).cast("double").alias("disjunct_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


DISJUNCTIVE_REVENUE_SQL = f"""
SELECT CAST(round(sum(CAST({_REV} AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS disjunct_revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

QUERIES["disjunctive_revenue"] = (disjunctive_revenue, DISJUNCTIVE_REVENUE_SQL)


def excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess shipments), adapted to the
    synthetic schema (no partsupp table): suppliers who in 1996 shipped
    more than 50 units of ANY single SMALL-type part — a NESTED
    SEMI-JOIN: part filter feeds a (suppkey, partkey) HAVING aggregate,
    whose distinct supplier keys semi-join the supplier dim, which then
    broadcasts nation for the name. Spark-first: the inner EXISTS chain is
    one hash aggregate + ``left_semi`` join (never a correlated re-scan);
    part and nation broadcast, and the post-HAVING key set — tiny at any
    SF after the threshold — broadcasts into the supplier probe too. Output (s_name, n_name) sorted."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    small_parts = p.filter(F.col("p_type") == "SMALL").select("p_partkey")
    heavy = (
        li.filter(F.year("l_shipdate") == 1996)
        .join(broadcast(small_parts), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("units"))
        .filter(F.col("units") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


EXCESS_SHIPMENT_SUPPLIERS_SQL = """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL' AND year(l_shipdate) = 1996
  GROUP BY l_suppkey, l_partkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 50
)
ORDER BY s_name
"""

QUERIES["excess_shipment_suppliers"] = (
    excess_shipment_suppliers,
    EXCESS_SHIPMENT_SUPPLIERS_SQL,
)


def dormant_customer_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers whose account
    balance is above the average POSITIVE balance but who placed no order
    on/after 2000-01-01 — scalar aggregate subquery + ANTI-JOIN, rolled up
    by nation. The global threshold compare is exact decimal cross-
    multiplication (``bal > sum/n`` ⟺ ``bal * n > sum``) so neither
    engine divides; the 1-row threshold broadcasts into the customer scan
    via crossJoin(broadcast(...)); recent orders anti-join on custkey.
    Output (n_name, n_custs, total_acctbal)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("bal_sum"), F.count(F.lit(1)).alias("bal_n")
    )
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    return (
        c.crossJoin(broadcast(thresh))
        .filter(bal * F.col("bal_n") > F.col("bal_sum"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum(bal), 2).cast("double").alias("total_acctbal"),
        )
    )


DORMANT_CUSTOMER_OPPORTUNITY_SQL = """
WITH thresh AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
         count(*) AS bal_n
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name,
       count(*) AS n_custs,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_acctbal
FROM customer, thresh
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_n > bal_sum
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '2000-01-01'
  )
GROUP BY 1
"""

QUERIES["dormant_customer_opportunity"] = (
    dormant_customer_opportunity,
    DORMANT_CUSTOMER_OPPORTUNITY_SQL,
)


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the what-if aggregate — total
    revenue that would have been lost had 1994's small-quantity,
    mid-discount lineitems shipped discount-free. Pure scan shape: three
    pushable predicates feed ONE partial-aggregated sum; no join, no
    shuffle beyond the 1-row final agg. The canary query for predicate
    pushdown + scan throughput (reference has no analog; this is the
    classic minimal-plan benchmark). Revenue accumulates in DECIMAL,
    rounds while DECIMAL, then casts DOUBLE (house rule). Output: one
    row (revenue)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1994)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * F.col("l_discount").cast("decimal(18,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


FORECAST_REVENUE_CHANGE_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE year(l_shipdate) = 1994
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

QUERIES["forecast_revenue_change"] = (
    forecast_revenue_change,
    FORECAST_REVENUE_CHANGE_SQL,
)


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year), adapted
    to the testdata's tables (no partsupp, so supply cost is proxied by
    10% of p_retailprice per unit): profit = revenue − cost for parts
    of the PROMO type class, grouped by supplier nation and order
    year. The join tree is the Q9 classic: lineitem×orders (orderdate →
    year) as the fact spine, part (filtered, BROADCAST) prunes lines
    early, supplier×nation (BROADCAST chain) labels the group — one
    fact shuffle for the orderkey join, everything else map-side.
    DECIMAL accumulation throughout. Output (nation, o_year,
    sum_profit) ordered."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    profit = _revenue_col() - (
        F.col("p_retailprice").cast("decimal(18,6)")
        * F.lit(0.1).cast("decimal(18,6)")
        * F.col("l_quantity").cast("decimal(18,6)")
    )
    return (
        li.join(
            broadcast(p.select("p_partkey", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(
            broadcast(
                s.select("s_suppkey", "s_nationkey").join(
                    broadcast(n.select("n_nationkey", "n_name")),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(profit), 2).cast("double").alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


PRODUCT_TYPE_PROFIT_SQL = """
SELECT n_name AS nation,
       year(o_orderdate) AS o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l_discount AS DECIMAL(18,6)))
                      - CAST(p_retailprice AS DECIMAL(18,6))
                        * CAST(0.1 AS DECIMAL(18,6))
                        * CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""

QUERIES["product_type_profit"] = (product_type_profit, PRODUCT_TYPE_PROFIT_SQL)


def customer_spend_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year SPEND-BAND MIGRATION matrix (the TPC-DS-style
    customer-value movement report): band every customer's 1996 and 1997
    order spend (zero / low / mid / high on fixed thresholds — band
    edges are business constants, so banding is a map-side CASE, no
    percentile pass) and count customers per (band_1994, band_1995)
    cell. One conditional-sum scan of orders builds both years; the
    LEFT join from customer keeps never-ordered customers in the
    zero/zero cell. DECIMAL sums; ≤16-row output."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(
                F.year("o_orderdate") == 1996,
                F.col("o_totalprice").cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        ).alias("s96"),
        F.sum(
            F.when(
                F.year("o_orderdate") == 1997,
                F.col("o_totalprice").cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        ).alias("s97"),
    )

    def band(col):
        return (
            F.when(col <= 0, "zero")
            .when(col < 150000, "low")
            .when(col < 500000, "mid")
            .otherwise("high")
        )

    joined = c.join(
        spend, c.c_custkey == spend.o_custkey, "left"
    ).select(
        band(F.coalesce(F.col("s96"), F.lit(0))).alias("band_1996"),
        band(F.coalesce(F.col("s97"), F.lit(0))).alias("band_1997"),
    )
    return (
        joined.groupBy("band_1996", "band_1997")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("band_1996", "band_1997")
    )


CUSTOMER_SPEND_BAND_MIGRATION_SQL = """
WITH spend AS (
  SELECT o_custkey,
         sum(CASE WHEN year(o_orderdate) = 1996
                  THEN CAST(o_totalprice AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS s96,
         sum(CASE WHEN year(o_orderdate) = 1997
                  THEN CAST(o_totalprice AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS s97
  FROM orders GROUP BY 1
), banded AS (
  SELECT CASE WHEN coalesce(s96, 0) <= 0 THEN 'zero'
              WHEN coalesce(s96, 0) < 150000 THEN 'low'
              WHEN coalesce(s96, 0) < 500000 THEN 'mid'
              ELSE 'high' END AS band_1996,
         CASE WHEN coalesce(s97, 0) <= 0 THEN 'zero'
              WHEN coalesce(s97, 0) < 150000 THEN 'low'
              WHEN coalesce(s97, 0) < 500000 THEN 'mid'
              ELSE 'high' END AS band_1997
  FROM customer LEFT JOIN spend ON c_custkey = o_custkey
)
SELECT band_1996, band_1997, count(*) AS n_customers
FROM banded GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["customer_spend_band_migration"] = (
    customer_spend_band_migration,
    CUSTOMER_SPEND_BAND_MIGRATION_SQL,
)


def segment_top_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment TOP BRAND by revenue — the cross-dimensional
    argmax report (TPC-DS flavor): lineitem×orders on the orderkey spine
    (the one fact shuffle), customer (segment) and part (brand) as
    BROADCAST dimensions, then a row_number window over the aggregated
    (segment, brand) frame — ≤|segments|·|brands| rows, bounded, so the
    per-segment window is partition-parallel and never sees the fact
    stream. Ties break on brand. Output (c_mktsegment, p_brand,
    revenue) one row per segment."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cell = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("c_mktsegment", "p_brand")
        .agg(F.sum(_revenue_col()).alias("rev"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("rev").desc(), F.col("p_brand")
    )
    return (
        cell.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            "p_brand",
            F.round(F.col("rev"), 2).cast("double").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


SEGMENT_TOP_BRAND_SQL = """
WITH cell AS (
  SELECT c_mktsegment, p_brand,
         sum(CAST(l_extendedprice AS DECIMAL(18,6))
             * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT c_mktsegment, p_brand, rev,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY rev DESC, p_brand) AS rn
  FROM cell
)
SELECT c_mktsegment, p_brand,
       CAST(round(rev, 2) AS DOUBLE) AS revenue
FROM ranked WHERE rn = 1
ORDER BY c_mktsegment
"""

QUERIES["segment_top_brand"] = (segment_top_brand, SEGMENT_TOP_BRAND_SQL)


def unshipped_orders_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): the 10 highest-revenue
    BUILDING-segment orders placed before the cutoff whose lineitems ship
    after it — the "what's worth expediting" report. Spark-first plan:
    the customer-segment filter BROADCASTS into orders (dim semi-join,
    no fact shuffle for it), the date predicates push into both parquet
    scans, and the only real shuffle is the orderkey fact-to-fact join +
    group. Top-10 via TakeOrderedAndProject on the EXACT decimal revenue
    (round only at output, per the repo's decimal canonicalization rule),
    orderkey tie-break so the selected set is deterministic in both
    engines. Output (l_orderkey, o_orderdate, revenue)."""
    cutoff = "1998-06-01"
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = li.join(
        o.join(
            broadcast(c.select("c_custkey")),
            o.o_custkey == c.c_custkey,
            "left_semi",
        ).select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_revenue_col()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
        )
    )


UNSHIPPED_ORDERS_REVENUE_SQL = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(round(sum({_REV}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-06-01'
  AND l_shipdate  > DATE '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY sum({_REV}) DESC, l_orderkey
LIMIT 10
"""

QUERIES["unshipped_orders_revenue"] = (
    unshipped_orders_revenue,
    UNSHIPPED_ORDERS_REVENUE_SQL,
)


def ship_delay_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / critical priority), adapted to
    the synthetic schema (no l_shipmode column): lineitems band by
    ORDER-TO-SHIP DELAY (≤ 90 days on-time, else late) and each band
    counts critical-priority (1-URGENT / 2-HIGH) vs lower-priority
    lineitems — the "is slow fulfilment eating the urgent orders"
    diagnostic. One fact-to-fact orderkey join, then a single
    conditional-count aggregate over TWO derived dimensions — never two
    scans, never a pivot shuffle. Output (delay_band, high_line_count,
    low_line_count)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    band = F.when(
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) <= 90,
        F.lit("on-time"),
    ).otherwise(F.lit("late"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(band.alias("delay_band"))
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
        .orderBy("delay_band")
    )


SHIP_DELAY_PRIORITY_MIX_SQL = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 90
            THEN 'on-time' ELSE 'late' END AS delay_band,
       count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["ship_delay_priority_mix"] = (
    ship_delay_priority_mix,
    SHIP_DELAY_PRIORITY_MIX_SQL,
)
