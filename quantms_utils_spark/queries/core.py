"""Core relational operator queries (SURVEY §2.1-2.8) over the synthetic
star schema, each with a DuckDB oracle.

Design notes for hash-parity with the oracle:
- every computed column is aliased identically on both sides;
- floats are rounded in-query on both sides (sum magnitudes here keep double
  error far below the rounding grain);
- integer-valued computed columns are cast to BIGINT on both sides (DuckDB
  sums of INTEGER widen to HUGEINT otherwise, Spark uses LONG);
- every windowed/top-k query orders by a unique tiebreak column so the result
  set is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import broadcast

from quantms_utils_spark.functions import file_stem, mods_position
from quantms_utils_spark.operators import (
    asof_lookup,
    exclusive_prefix_sum,
    interpolate_at,
    join_many_to_one,
    range_join_binned,
)
from quantms_utils_spark.tables import load


# --- S4/P2/A1-A4/F10: projection + filter pushdown into a grouped aggregate -


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-level column pruning + predicate
    pushdown (reference's hand-rolled usecols reads, diann2msstats.py:254-261)
    feeding partial+final aggregation."""
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- J1/J2: star join with broadcast dimensions -----------------------------


def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⟕ broadcast dimensions star join — the Spark shape of
    diann2msstats' report⋈design join (diann2msstats.py:117). nation/region
    are broadcast explicitly; customer joins shuffle-free under AQE when small
    enough, sort-merge at scale."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


STAR_JOIN_REVENUE_SQL = """
SELECT n_name, r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name, r_name
"""


# --- O1/O3: deterministic top-k ---------------------------------------------


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with unique tiebreak (reference sorts features by intensity desc,
    ms1_feature_finder.py:293-295). Spark plans this as TakeOrderedAndProject:
    per-partition heap + driver merge — no global sort shuffle."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
        .limit(10)
    )


TOPK_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --- S4/P1: projection + IN-filter (ms_level ∈ (1,2) analog) ----------------


def projection_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 ms-level filter analog (mzml_statistics.py:141-143): both the IN
    filter and the 3-column projection reach the parquet scan (PushedFilters /
    ReadSchema in the plan)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_linenumber").isin(1, 2) & (F.col("l_quantity") > 30))
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("linenumber"),
            F.round("l_quantity", 2).alias("qty"),
        )
    )


PROJECTION_FILTER_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber, round(l_quantity, 2) AS qty
FROM lineitem WHERE l_linenumber IN (1, 2) AND l_quantity > 30
"""


# --- J2/J3: validated many-to-one left join ---------------------------------


def validated_m1_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left m:1 join with dimension-uniqueness validation
    (diann2msstats.py:117 validate='many_to_one'), aggregated per segment."""
    o = load(spark, sf_dir, "orders")
    c = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    joined = join_many_to_one(o, c, on="o_custkey", how="left")
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


VALIDATED_M1_JOIN_SQL = """
SELECT c_mktsegment AS mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- J3: anti-join diagnostics ----------------------------------------------


def anti_join_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the unmatched-run warn+drop diagnostic
    (diann2msstats.py:119-127) as a first-class operator."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- A6: distinct count -----------------------------------------------------


def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplex-detection nunique (diann2msstats.py:61,182) as grouped
    count-distinct (exact here; approx_count_distinct is the 100 TB variant)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


DISTINCT_COUNT_SQL = """
SELECT o_orderpriority AS priority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


# --- A7: distinct rows ------------------------------------------------------


def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_duplicates analog (diann2msstats.py:206, extract_sample.py:45)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("c_mktsegment").alias("mktsegment"), F.col("n_name").alias("nation"))
        .distinct()
    )


DISTINCT_ROWS_SQL = """
SELECT DISTINCT c_mktsegment AS mktsegment, n_name AS nation
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


# --- A8: duplicate-key detection (m:1 contract check) -----------------------


def dup_key_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample→(Condition,BioReplicate) uniqueness check
    (diann2msstats.py:205-213): keys violating a many-to-one contract."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.countDistinct("o_orderstatus").alias("n_status"))
        .filter(F.col("n_status") > 1)
    )


DUP_KEY_DETECT_SQL = """
SELECT o_custkey AS custkey, count(DISTINCT o_orderstatus) AS n_status
FROM orders GROUP BY o_custkey HAVING count(DISTINCT o_orderstatus) > 1
"""


# --- A9: group-merge of modification sites ----------------------------------


def group_concat_sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-merging aggregation (dianncfg.py:147-171): dedupe + sort + concat
    within group, fully map-side-combinable."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    site = F.substring("c_mktsegment", 1, 1)
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.concat_ws("", F.array_sort(F.collect_set(site))).alias("sites"))
    )


GROUP_CONCAT_SITES_SQL = """
SELECT n_name AS nation,
       string_agg(DISTINCT substring(c_mktsegment, 1, 1), '' ORDER BY substring(c_mktsegment, 1, 1)) AS sites
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- §2.7: union (multi-file ingest shape) ----------------------------------


def union_multifile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two branch scans — the multi-mzML directory ingest the
    reference does one file at a time."""
    l = load(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "A").select("l_linestatus")
    r = l.filter(F.col("l_returnflag") == "R").select("l_linestatus")
    return (
        a.unionByName(r)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


UNION_MULTIFILE_SQL = """
SELECT l_linestatus AS linestatus, count(*) AS n FROM (
  SELECT l_linestatus FROM lineitem WHERE l_returnflag = 'A'
  UNION ALL
  SELECT l_linestatus FROM lineitem WHERE l_returnflag = 'R'
) u GROUP BY l_linestatus
"""


# --- A5/W1: exclusive prefix sum (pTIC) -------------------------------------


def prefix_sum_exclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pTIC exclusive running cumulative (ms1_feature_finder.py:75-102): each
    event sees the sum of strictly-earlier values plus its fraction of the
    partition total."""
    e = load(spark, sf_dir, "events")
    df = exclusive_prefix_sum(
        e, "value", ["user_id"], ["ts", "event_id"], out_col="cum_before"
    )
    total = F.sum("value").over(Window.partitionBy("user_id"))
    return df.select(
        "event_id",
        "user_id",
        F.round("cum_before", 2).alias("cum_before"),
        F.round(F.col("cum_before") / total, 4).alias("ptic"),
    )


PREFIX_SUM_SQL = """
SELECT event_id, user_id,
  round(coalesce(sum(value) OVER w, 0), 2) AS cum_before,
  round(coalesce(sum(value) OVER w, 0) / sum(value) OVER (PARTITION BY user_id), 4) AS ptic
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


# --- W3/J7: as-of lookup ----------------------------------------------------


def asof_precursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precursor as-of lookup (mzml_statistics.py:253-260): value of the last
    strictly-preceding 'signup' event per user — window last(ignorenulls), no
    join, one shuffle."""
    e = load(spark, sf_dir, "events")
    df = asof_lookup(
        e,
        F.col("event_type") == "signup",
        "value",
        ["user_id"],
        ["ts", "event_id"],
        out_col="last_signup_value",
        strict=True,
    )
    return df.select(
        "event_id", "user_id", F.round("last_signup_value", 2).alias("last_signup_value")
    )


ASOF_PRECURSOR_SQL = """
SELECT event_id, user_id,
  round(last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 2) AS last_signup_value
FROM events
"""


# --- J6: binned range join --------------------------------------------------


def range_join_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature↔scan interval-containment join (ms1_feature_finder.py:307-322)
    via the binned equi-join strategy: intervals explode over covered bins,
    points hit exactly one bin, residual predicate filters — a hash join, not
    a nested loop."""
    e = load(spark, sf_dir, "events")
    intervals = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.min("value").alias("lo"),
            ((F.min("value") + F.max("value")) / 2).alias("hi"),
        )
    )
    points = e.select("user_id", "event_id", "value")
    joined = range_join_binned(
        intervals,
        points,
        lo_col="lo",
        hi_col="hi",
        point_col="value",
        bin_width=25.0,
        equi_keys=["user_id"],
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_in_range"),
        F.round(F.sum("value"), 2).alias("sum_in_range"),
    )


RANGE_JOIN_SQL = """
WITH iv AS (
  SELECT user_id, min(value) AS lo, (min(value) + max(value)) / 2 AS hi
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT iv.user_id AS user_id, count(*) AS n_in_range, round(sum(e.value), 2) AS sum_in_range
FROM iv JOIN events e ON e.user_id = iv.user_id AND e.value >= iv.lo AND e.value <= iv.hi
GROUP BY iv.user_id
"""


# --- W4: rank ---------------------------------------------------------------


def window_rank_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hit-rank recomputation (psm_conversion.py:168): rank within partition
    with unique tiebreak, filtered to top ranks."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT o_custkey, o_orderkey,
         rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) t WHERE rnk <= 3
"""


# --- W2: linear interpolation at arbitrary positions ------------------------


def interpolate_ptic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pTIC lerp at arbitrary retention times (ms1_feature_finder.py:104-142):
    purchase events are the anchor curve; every event's timestamp is a query
    point. Edge rows clamp to the nearest anchor (:129-132)."""
    e = load(spark, sf_dir, "events").withColumn("x", F.col("ts").cast("double"))
    df = interpolate_at(
        e,
        F.col("event_type") == "purchase",
        x_col="x",
        y_col="value",
        partition_cols=["user_id"],
        order_cols=["ts", "event_id"],
        out_col="interp_value",
    )
    return df.select(
        "event_id", "user_id", F.round("interp_value", 4).alias("interp_value")
    )


INTERPOLATE_SQL = """
WITH base AS (
  SELECT event_id, user_id, ts, epoch(ts) AS x,
         CASE WHEN event_type = 'purchase' THEN value END AS ay,
         CASE WHEN event_type = 'purchase' THEN epoch(ts) END AS ax
  FROM events
), w AS (
  SELECT event_id, user_id, x,
    last_value(ay IGNORE NULLS) OVER wp AS py,
    last_value(ax IGNORE NULLS) OVER wp AS px,
    first_value(ay IGNORE NULLS) OVER wn AS ny,
    first_value(ax IGNORE NULLS) OVER wn AS nx
  FROM base
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
  round(CASE WHEN py IS NULL THEN ny
             WHEN ny IS NULL THEN py
             WHEN nx = px THEN py
             ELSE py + (ny - py) * (x - px) / (nx - px) END, 4) AS interp_value
FROM w
"""


# --- F1/F2: scan-id regex extraction ----------------------------------------


def scan_id_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-number regex extraction (openms.py:4-24) applied to the events
    props payload; misses become NULL then coalesce to a sentinel."""
    e = load(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
    return e.select(
        "event_id",
        F.coalesce(F.nullif(k, F.lit("")).cast("long"), F.lit(-1)).alias("k"),
    )


SCAN_ID_EXTRACT_SQL = """
SELECT event_id,
       coalesce(CAST(nullif(regexp_extract(props, '"k": (\\d+)', 1), '') AS BIGINT), -1) AS k
FROM events
"""


# --- F7: label value mapping ------------------------------------------------


def label_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SILAC/mTRAQ label mapping (diann2msstats.py:182-199) as a when/otherwise
    chain over a categorical column."""
    c = load(spark, sf_dir, "customer")
    code = (
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", "L")
        .when(F.col("c_mktsegment") == "BUILDING", "M")
        .when(F.col("c_mktsegment") == "FURNITURE", "H")
        .otherwise("X")
    )
    return c.groupBy(code.alias("label_code")).agg(F.count(F.lit(1)).alias("n"))


LABEL_MAP_SQL = """
SELECT CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'L' WHEN 'BUILDING' THEN 'M'
            WHEN 'FURNITURE' THEN 'H' ELSE 'X' END AS label_code,
       count(*) AS n
FROM customer GROUP BY 1
"""


# --- F6: filename stem with .d.zip double-extension -------------------------


def filename_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_true_stem (diann2msstats.py:133-138) over synthesized paths covering
    the .d.zip double-extension case."""
    d = load(spark, sf_dir, "documents")
    ext = (
        F.when(F.col("doc_id") % 3 == 0, ".d.zip")
        .when(F.col("doc_id") % 3 == 1, ".mzML")
        .otherwise(".raw")
    )
    path = F.concat(F.col("source"), F.lit("/run_"), F.col("doc_id").cast("string"), ext)
    return d.select("doc_id", path.alias("path"), file_stem(path).alias("stem"))


FILENAME_STEM_SQL = """
WITH p AS (
  SELECT doc_id,
         source || '/run_' || CAST(doc_id AS VARCHAR) ||
         CASE WHEN doc_id % 3 = 0 THEN '.d.zip' WHEN doc_id % 3 = 1 THEN '.mzML' ELSE '.raw' END AS path
  FROM documents
)
SELECT doc_id, path,
       regexp_replace(str_split(path, '/')[-1], '(\\.d\\.zip|\\.[^.]+)$', '') AS stem
FROM p
"""


# --- P12/F11: per-row null defaulting + casts -------------------------------


def null_defaulting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """charge-if-truthy-else-null idiom (mzml_statistics.py:186-199) as
    nullif/coalesce/when expressions."""
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("linenumber"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("flag"),
        F.when(F.col("l_tax") == 0, None).otherwise(F.round("l_tax", 2)).alias("tax"),
    )


NULL_DEFAULTING_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
       coalesce(nullif(l_returnflag, 'N'), 'none') AS flag,
       CASE WHEN l_tax = 0 THEN NULL ELSE round(l_tax, 2) END AS tax
FROM lineitem
"""


# --- A1-A3: per-row array aggregates (peak statistics) ----------------------


def array_peak_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-spectrum peak stats (mzml_statistics.py:132-148): num_peaks /
    base_peak_intensity / summed_peak_intensities as array expressions over
    the embedding column."""
    e = load(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.array_max(emb_d), 6).alias("max_val"),
        F.round(F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x), 5).alias("sum_val"),
    )


ARRAY_PEAK_STATS_SQL = """
SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
       round(list_max(embedding::DOUBLE[]), 6) AS max_val,
       round(list_aggregate(embedding::DOUBLE[], 'sum'), 5) AS sum_val
FROM embeddings
"""


# --- F3: mods_position (single-mod slice; full parser unit-tested) ----------


def mods_position_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mods_position (psm_conversion.py:41-56) on synthesized peptidoforms.
    The oracle covers the single-mod + N-term cases; multi-mod gold cases are
    in tests/test_functions.py."""
    p = load(spark, sf_dir, "part")
    residues = F.upper(F.regexp_replace(F.col("p_name"), "[^a-zA-Z]", ""))
    pep = (
        F.when(F.col("p_size") % 3 == 0,
               F.concat(F.substring(residues, 1, 4), F.lit("(Oxidation)"),
                        F.substring(residues, 5, 100)))
        .when(F.col("p_size") % 3 == 1, F.concat(F.lit("(Acetyl)"), residues))
        .otherwise(residues)
    )
    mods = mods_position(pep)
    return p.select(
        "p_partkey",
        pep.alias("peptidoform"),
        F.element_at(mods, 1).alias("first_mod"),
    )


MODS_POSITION_SQL = """
WITH pep AS (
  SELECT p_partkey,
    CASE WHEN p_size % 3 = 0 THEN
           substring(upper(regexp_replace(p_name, '[^a-zA-Z]', '', 'g')), 1, 4) || '(Oxidation)' ||
           substring(upper(regexp_replace(p_name, '[^a-zA-Z]', '', 'g')), 5, 100)
         WHEN p_size % 3 = 1 THEN '(Acetyl)' || upper(regexp_replace(p_name, '[^a-zA-Z]', '', 'g'))
         ELSE upper(regexp_replace(p_name, '[^a-zA-Z]', '', 'g')) END AS peptidoform
  FROM part
)
SELECT p_partkey, peptidoform,
       CASE WHEN peptidoform LIKE '%(%' THEN
         CAST(strpos(peptidoform, '(') - 1 AS VARCHAR) || '-' ||
         regexp_extract(peptidoform, '\\(([^)]+)\\)', 1)
       END AS first_mod
FROM pep
"""


def mods_position_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF form of mods parsing: LATERAL-join a Python table function
    (functions/udtfs.py:ParseMods) against synthesized peptidoforms — the
    row-multiplying parse surface (SURVEY §2.10 U4) exposed to SQL users.
    Unmodified peptides yield no rows (plain LATERAL semantics)."""
    from quantms_utils_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    p = load(spark, sf_dir, "part")
    residues = F.upper(F.regexp_replace(F.col("p_name"), "[^a-zA-Z]", ""))
    pep = (
        F.when(F.col("p_size") % 3 == 0,
               F.concat(F.substring(residues, 1, 4), F.lit("(Oxidation)"),
                        F.substring(residues, 5, 100)))
        .when(F.col("p_size") % 3 == 1, F.concat(F.lit("(Acetyl)"), residues))
        .otherwise(residues)
    )
    p.select("p_partkey", pep.alias("peptidoform")).createOrReplaceTempView(
        "__pep_synth_for_udtf"
    )
    return spark.sql(
        """
        SELECT p.p_partkey, p.peptidoform, m.pos, m.mod_name
        FROM __pep_synth_for_udtf AS p, LATERAL parse_mods(p.peptidoform) AS m
        """
    )


MODS_POSITION_UDTF_SQL = """
WITH pep AS (
  SELECT p_partkey,
    CASE WHEN p_size % 3 = 0 THEN
           substring(upper(regexp_replace(p_name, '[^a-zA-Z]', '', 'g')), 1, 4) || '(Oxidation)' ||
           substring(upper(regexp_replace(p_name, '[^a-zA-Z]', '', 'g')), 5, 100)
         WHEN p_size % 3 = 1 THEN '(Acetyl)' || upper(regexp_replace(p_name, '[^a-zA-Z]', '', 'g'))
         ELSE upper(regexp_replace(p_name, '[^a-zA-Z]', '', 'g')) END AS peptidoform
  FROM part
)
SELECT p_partkey, peptidoform,
       CAST(strpos(peptidoform, '(') - 1 AS INT) AS pos,
       regexp_extract(peptidoform, '\\(([^)]+)\\)', 1) AS mod_name
FROM pep
WHERE peptidoform LIKE '%(%'
"""


# --- F12-ish: JSON extraction -----------------------------------------------


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props parsing — get_json_object vs DuckDB json."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


JSON_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
"""


# --- streaming-equivalent batch semantics -----------------------------------


def event_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate in its batch form; the streaming twin (same
    logical plan on readStream + watermark) lives in
    quantms_utils_spark.streaming."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


EVENT_HOURLY_AGG_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative flag sum
    — the batch shape of applyInPandasWithState sessionization."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(F.col("ts").cast("double")).over(w)
    new_sess = F.when(
        prev_ts.isNull() | ((F.col("ts").cast("double") - prev_ts) > 1800), 1
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = e.withColumn("sess_id", F.sum(new_sess).over(wc).cast("long"))
    return sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double")), 3).alias(
            "duration_s"
        ),
    )


SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_id, ts,
    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
  FROM g
)
SELECT user_id, sess_id, count(*) AS n_events,
       round(epoch(max(ts)) - epoch(min(ts)), 3) AS duration_s
FROM s GROUP BY user_id, sess_id
"""



def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-profiling of the orders table: per-column row/null/
    distinct counts — the data-quality primitive every ingest pipeline runs
    before trusting a new drop. ONE aggregate over the table (multiple exact
    count-distincts share the pass via Expand), then the single result row
    fans out to per-column rows with explode — no per-column scans, no
    driver-side loop over columns. At 100 TB swap the exact distincts for
    approx_count_distinct (same single-pass shape, fixed-size sketches); the
    exact form here is what the oracle can reproduce."""
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    o = load(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"_dist_{c}"))
    row = o.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(structs).alias("p")).select("p.*")


TABLE_PROFILE_SQL = " UNION ALL ".join(
    f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
        CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        count(DISTINCT {c}) AS n_distinct FROM orders"""
    for c in [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
)

def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/scan roundtrip: write documents to an ORC table partitioned
    by lang (Spark's built-in columnar sibling to parquet — the second
    binary columnar format a migrating user expects), read it back, and
    aggregate per source: row count, char sum, distinct partition values
    recovered from the directory layout, and an order-insensitive md5
    digest-sum over the text column. The oracle computes the identical
    aggregate straight from the parquet table, so any row, value, or
    partition-column loss in the ORC write→read path hash-mismatches.
    The ORC artifact lands in a fresh tempdir (left for the lazy scan to
    read; /tmp-lifetime)."""
    import tempfile

    d = load(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="orc_roundtrip_") + "/docs_orc"
    (
        d.select("doc_id", "lang", "source", "n_chars", "text")
        .write.mode("overwrite")
        .partitionBy("lang")
        .orc(path)
    )
    back = spark.read.orc(path)
    digest = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(digest).alias("text_digest_sum"),
    )


ORC_ROUNDTRIP_SQL = """
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
         AS text_digest_sum
FROM documents
GROUP BY source
"""


def jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL (newline-delimited JSON) sink/scan roundtrip — the
    interchange text format every data-engineering stack speaks. Writes
    documents as compressed JSONL, reads them back WITH SCHEMA INFERENCE
    (the path that silently widens/narrows types when it goes wrong —
    which is exactly what the digest-sum + char-sum aggregate would
    catch), and aggregates per lang. gzip codec, distributed per-partition
    files; the oracle recomputes from parquet."""
    import tempfile

    d = load(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="jsonl_roundtrip_") + "/docs_jsonl"
    (
        d.select("doc_id", "lang", "source", "n_chars", "text")
        .write.mode("overwrite")
        .option("compression", "gzip")
        .json(path)
    )
    back = spark.read.json(path)  # schema inference on purpose
    digest = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(digest).alias("text_digest_sum"),
    )


JSONL_ROUNDTRIP_SQL = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
         AS text_digest_sum
FROM documents
GROUP BY lang
"""


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (operators.expectations) over
    orders: six rules — nullability, key uniqueness, a numeric floor, two
    vocabulary checks (one passing, one deliberately failing on the 'P'
    status so the failure path is value-checked too), a regex, and a
    table-size floor — ALL evaluated in one aggregate pass over one scan.
    The oracle computes each violation count independently and stacks the
    same six rows."""
    from quantms_utils_spark.operators.expectations import (
        Expectation,
        check_expectations,
    )

    o = load(spark, sf_dir, "orders")
    rules = [
        Expectation("custkey_not_null", "not_null", "o_custkey"),
        Expectation("orderkey_unique", "unique", "o_orderkey"),
        Expectation("price_nonnegative", "min", "o_totalprice", (0.0,)),
        Expectation(
            "priority_vocab",
            "accepted",
            "o_orderpriority",
            ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        ),
        Expectation("status_fo_only", "accepted", "o_orderstatus", ("F", "O")),
        Expectation("status_shape", "matches", "o_orderstatus", (r"^[A-Z]$",)),
        Expectation("at_least_1k_rows", "row_count_min", None, (1000,)),
    ]
    return check_expectations(o, rules)


DATA_QUALITY_SQL = """
WITH s AS (
  SELECT count(*) AS n,
         count(CASE WHEN o_custkey IS NULL THEN 1 END) AS v0,
         count(o_orderkey) - count(DISTINCT o_orderkey) AS v1,
         count(CASE WHEN o_totalprice < 0.0 THEN 1 END) AS v2,
         count(CASE WHEN o_orderpriority IS NOT NULL
                     AND o_orderpriority NOT IN
                       ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                    THEN 1 END) AS v3,
         count(CASE WHEN o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('F','O') THEN 1 END) AS v4,
         count(CASE WHEN o_orderstatus IS NOT NULL
                     AND NOT regexp_matches(o_orderstatus, '^[A-Z]$')
                    THEN 1 END) AS v5,
         greatest(0, 1000 - count(*)) AS v6
  FROM orders
)
SELECT r.rule, r.kind, r."column", s.n AS n_checked,
       r.v AS n_violations, r.v = 0 AS passed
FROM s, LATERAL (
  VALUES ('custkey_not_null',  'not_null',      'o_custkey',       s.v0),
         ('orderkey_unique',   'unique',        'o_orderkey',      s.v1),
         ('price_nonnegative', 'min',           'o_totalprice',    s.v2),
         ('priority_vocab',    'accepted',      'o_orderpriority', s.v3),
         ('status_fo_only',    'accepted',      'o_orderstatus',   s.v4),
         ('status_shape',      'matches',       'o_orderstatus',   s.v5),
         ('at_least_1k_rows',  'row_count_min', NULL,              s.v6)
) AS r(rule, kind, "column", v)
"""


def sessionize_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization through Spark's NATIVE session_window
    aggregation (the built-in the lag+cumsum formulation in `sessionize`
    hand-rolls): groupBy(user, session_window(ts, '30 minutes')) merges
    events whose gap to the session END is < 30 min in ONE aggregation —
    no window function, no running flag sum, and the identical operator
    works unchanged on a stream (session_window is the streaming
    session-aggregation primitive; the batch call here is the same
    physical SessionWindow node). Boundary contract: an event landing
    EXACTLY gap after the previous closes the session (t < prev + gap
    extends), so the oracle's island condition is >= 1800 — one boundary
    stricter than `sessionize`'s > 1800, which is exactly the subtle
    semantic the twin queries pin against each other."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.session_window(F.col("ts"), "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.max(F.col("ts").cast("double"))
                - F.min(F.col("ts").cast("double")),
                3,
            ).alias("duration_s"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            "n_events",
            "duration_s",
        )
    )


SESSIONIZE_NATIVE_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS sess_id
  FROM g
)
SELECT user_id, min(ts) AS sess_start,
       count(*) AS n_events,
       round(epoch_us(max(ts)) / 1000000.0
             - epoch_us(min(ts)) / 1000000.0, 3) AS duration_s
FROM s GROUP BY user_id, sess_id
"""


def json_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type: parse_json
    builds the binary variant ONCE per row, variant_get extracts the
    typed path — the Spark-4-native replacement for repeated
    get_json_object string re-parsing (`json_extract`'s idiom). At 100 TB
    the difference is real: VARIANT parses each props cell once into a
    binary-encoded tree and every extraction is a cheap path walk, where
    N get_json_object calls re-parse the string N times. Aggregates the
    extracted k per event_type (count, sum, distinct) so the whole
    parse→extract→aggregate chain is value-checked; the oracle uses
    DuckDB's native JSON extraction."""
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("pv")
    ).select(
        "event_type",
        F.variant_get(F.col("pv"), "$.k", "long").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").alias("k_sum"),
        F.countDistinct("k").alias("k_distinct"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


JSON_VARIANT_SQL = """
SELECT event_type,
       count(*) AS n_rows,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
         AS k_distinct,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY 1
"""


QUERIES = {
    "sink_orc_roundtrip": (orc_roundtrip_stats, ORC_ROUNDTRIP_SQL),
    "sink_jsonl_roundtrip": (jsonl_roundtrip_stats, JSONL_ROUNDTRIP_SQL),
    "table_profile": (table_profile, TABLE_PROFILE_SQL),
    "pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "star_join_revenue": (star_join_revenue, STAR_JOIN_REVENUE_SQL),
    "topk_orders": (topk_orders, TOPK_ORDERS_SQL),
    "projection_filter_pushdown": (projection_filter_pushdown, PROJECTION_FILTER_SQL),
    "validated_m1_join_agg": (validated_m1_join_agg, VALIDATED_M1_JOIN_SQL),
    "anti_join_unmatched": (anti_join_unmatched, ANTI_JOIN_SQL),
    "distinct_count": (distinct_count, DISTINCT_COUNT_SQL),
    "distinct_rows": (distinct_rows, DISTINCT_ROWS_SQL),
    "dup_key_detect": (dup_key_detect, DUP_KEY_DETECT_SQL),
    "group_concat_sites": (group_concat_sites, GROUP_CONCAT_SITES_SQL),
    "union_multifile": (union_multifile, UNION_MULTIFILE_SQL),
    "prefix_sum_exclusive": (prefix_sum_exclusive, PREFIX_SUM_SQL),
    "asof_precursor": (asof_precursor, ASOF_PRECURSOR_SQL),
    "range_join_features": (range_join_features, RANGE_JOIN_SQL),
    "window_rank_hits": (window_rank_hits, WINDOW_RANK_SQL),
    "interpolate_ptic": (interpolate_ptic, INTERPOLATE_SQL),
    "scan_id_extract": (scan_id_extract, SCAN_ID_EXTRACT_SQL),
    "label_map": (label_map, LABEL_MAP_SQL),
    "filename_stem": (filename_stem, FILENAME_STEM_SQL),
    "null_defaulting": (null_defaulting, NULL_DEFAULTING_SQL),
    "array_peak_stats": (array_peak_stats, ARRAY_PEAK_STATS_SQL),
    "mods_position_single": (mods_position_single, MODS_POSITION_SQL),
    "mods_position_udtf": (mods_position_udtf, MODS_POSITION_UDTF_SQL),
    "json_extract": (json_extract, JSON_EXTRACT_SQL),
    "json_variant_stats": (json_variant_stats, JSON_VARIANT_SQL),
    "event_hourly_agg": (event_hourly_agg, EVENT_HOURLY_AGG_SQL),
    "sessionize": (sessionize, SESSIONIZE_SQL),
    "sessionize_session_window": (sessionize_session_window, SESSIONIZE_NATIVE_SQL),
    "data_quality_report": (data_quality_report, DATA_QUALITY_SQL),
}
