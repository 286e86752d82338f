"""Event-path / sequence analytics over the events stream table: Markov
transition matrices and rolling-window distinct counts.

Both are classic clickstream questions the reference's tabular surface
cannot ask but a 100 TB event store needs daily. Scale shapes:

- Transitions: the lag() shuffle is partitionBy(user) — state per key is
  one user's history; the probability normalization is a window over the
  AGGREGATED (from, to) matrix, |types|² rows, never the event stream.
- Rolling distinct: the trailing-window distinct-count is re-expressed as
  a bounded covering EXPLODE (each (hour, user) row covers the w hours it
  can influence) + one distinct + one count — an equi-join-shaped plan
  instead of the range self-join a naive TRAILING WINDOW DISTINCT needs.
  Work scales with rows × window hours; no BroadcastNestedLoopJoin, no
  per-hour rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from quantms_utils_spark.tables import load


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    session stream: lag(event_type) over (user, time) gives the (from, to)
    stream; one aggregate gives counts; transition probability normalizes
    per from-state with a window over the aggregated matrix (≤ |types|²
    rows). The oracle replays lag + normalization verbatim."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = trans.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wt), 6).alias("prob"),
    )


EVENT_TRANSITIONS_SQL = """
WITH trans AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM trans WHERE from_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6)
         AS prob
FROM counts
"""

_WINDOW_HOURS = 3


def event_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-hour distinct active users per hour — the sliding
    engagement metric. A window frame cannot express DISTINCT, and the
    naive form is a range self-join (hour × events BNLJ); instead every
    distinct (hour, user) pair EXPLODES to the 3 target hours it covers
    (bounded ×3 fan-out), one distinct collapses multi-hour users, one
    count per target hour finishes. Target hours are semi-joined to hours
    that actually exist so the fan-out cannot mint phantom buckets. The
    oracle recomputes with the equivalent covering unnest."""
    e = load(spark, sf_dir, "events")
    hu = e.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
    ).distinct()
    hours = hu.select("h").distinct()
    cov = hu.select(
        F.explode(
            F.array(
                *[
                    F.col("h") + F.expr(f"INTERVAL {k} HOUR")
                    for k in range(_WINDOW_HOURS)
                ]
            )
        ).alias("hour"),
        "user_id",
    ).distinct()
    return (
        cov.join(hours, cov["hour"] == hours["h"], "left_semi")
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("n_users_3h"))
    )


EVENT_ROLLING_DISTINCT_SQL = """
WITH hu AS (
  SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
), hours AS (
  SELECT DISTINCT h FROM hu
), cov AS (
  SELECT DISTINCT h + to_hours(d) AS hour, user_id
  FROM hu, (SELECT unnest([0, 1, 2]) AS d)
)
SELECT CAST(c.hour AS TIMESTAMP) AS hour, count(*) AS n_users_3h
FROM cov c JOIN hours ON hours.h = c.hour
GROUP BY 1
"""


def event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-type affinity matrix (bipartite co-occurrence projection):
    which event types are performed by the same users. One distinct
    (user, type) aggregate, a user-co-partitioned self-join with the
    ordered-pair predicate (per-user fan-out ≤ C(|types|,2) — bounded by
    the type vocabulary, never user volume), per-type user counts joined
    back broadcast-style, Jaccard + cosine affinities on the counts. The
    |types|² output makes this the recommender-style "projection of a
    bipartite graph" kernel in miniature; the oracle replays every stage."""
    e = load(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    n_per_type = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select(
        F.col("user_id").alias("__uid_b"), F.col("event_type").alias("type_b")
    )
    co = (
        a.join(
            b,
            (F.col("user_id") == F.col("__uid_b"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = n_per_type.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")
    )
    nb = n_per_type.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        co.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("n_both") / F.sqrt(F.col("n_a") * F.col("n_b")), 6
            ).alias("cosine"),
        )
    )


EVENT_AFFINITY_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), npt AS (
  SELECT event_type, count(*) AS n_users FROM ut GROUP BY 1
), co AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_both, na.n_users AS n_a, nb.n_users AS n_b,
       round(n_both / CAST(na.n_users + nb.n_users - n_both AS DOUBLE), 6)
         AS jaccard,
       round(n_both / sqrt(CAST(na.n_users AS DOUBLE) * nb.n_users), 6)
         AS cosine
FROM co
JOIN npt na ON na.event_type = type_a
JOIN npt nb ON nb.event_type = type_b
"""


QUERIES = {
    "event_transitions": (event_transitions, EVENT_TRANSITIONS_SQL),
    "event_rolling_distinct": (event_rolling_distinct, EVENT_ROLLING_DISTINCT_SQL),
    "event_type_affinity": (event_type_affinity, EVENT_AFFINITY_SQL),
}


def event_retry_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry retry dedup: collapse bursts of the same (user, type)
    arriving within 1 second of the previous kept occurrence's burst into
    one row — the batch twin of the streaming
    `dropDuplicatesWithinWatermark` dedup. A lag() time-delta over
    (user, type) marks burst STARTS (gap > 1s or first row); a running
    count of starts assigns burst ids IN THE SAME window (one Exchange +
    one Sort for both); one aggregate keeps the first event and sums the
    burst. Output is per-burst: first event id/ts, burst size, summed
    value (accumulated in DECIMAL, emitted as rounded DOUBLE per the
    house canonicalization convention — raw DECIMAL output hashes
    differently across engines)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_start = F.when(
        gap_us.isNull() | (gap_us > 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.sum(is_start).over(wr).alias("burst"),
    )
    return b.groupBy("user_id", "event_type", "burst").agg(
        F.min(F.struct("ts", "event_id")).alias("_first"),
        F.count(F.lit(1)).alias("n_collapsed"),
        F.sum("v").alias("value_sum"),
    ).select(
        "user_id",
        "event_type",
        F.col("_first.event_id").alias("first_event_id"),
        F.col("_first.ts").alias("first_ts"),
        "n_collapsed",
        F.round(F.col("value_sum").cast("double"), 2).alias("value_sum"),
    )


EVENT_RETRY_COLLAPSE_SQL = """
WITH g AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(value AS DECIMAL(18,2)) AS v,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
), b AS (
  SELECT *, sum(is_start) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst
  FROM g
)
SELECT user_id, event_type,
       min(event_id ORDER BY ts, event_id) AS first_event_id,
       min(ts) AS first_ts,
       count(*) AS n_collapsed,
       round(CAST(sum(v) AS DOUBLE), 2) AS value_sum
FROM b GROUP BY user_id, event_type, burst
"""

QUERIES["event_retry_collapse"] = (
    event_retry_collapse,
    EVENT_RETRY_COLLAPSE_SQL,
)


def event_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily gap-fill with forward fill per user — the resample/ffill
    primitive every feature pipeline needs (pandas ``resample().ffill()``)
    that SQL expresses with a calendar spine + LOCF window. Spark-first:

    1. collapse events to ONE row per (user, day) keeping the day's last
       value (max_by on (ts, event_id) — one shuffle);
    2. build each user's day spine with ``sequence(min_day, max_day)`` +
       explode — the spine is |user| × span rows, generated, never joined
       against a calendar table;
    3. left-join spine to daily rows ON (user, day) — co-partitioned with
       the aggregate's own partitioning — and forward-fill with
       ``last(value, ignorenulls=True)`` over (user ORDER BY day).

    Per-user state in every window is one scalar; no as-of range join, no
    per-day rescans. The oracle replays spine + LOCF with DuckDB's
    generate_series + last_value IGNORE NULLS. Output one row per (user,
    day): (user_id, day, filled_value, is_observed)."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.struct("ts", "event_id", "value").alias("_o"),
        )
        .groupBy("user_id", "day")
        .agg(F.max("_o").alias("_last"))
        .select(
            "user_id", "day", F.col("_last.value").alias("day_value")
        )
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
        .select(
            "user_id",
            F.explode(F.sequence("_d0", "_d1")).alias("day"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.round(
                F.last("day_value", ignorenulls=True).over(w), 6
            ).alias("filled_value"),
            F.col("day_value").isNotNull().alias("is_observed"),
        )
    )


EVENT_GAP_FILL_SQL = """
WITH ranked AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         row_number() OVER (
           PARTITION BY user_id, CAST(ts AS DATE)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), daily AS (
  SELECT user_id, day, value AS day_value FROM ranked WHERE rn = 1
), span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
), spine AS (
  SELECT user_id, CAST(g.day AS DATE) AS day
  FROM span, LATERAL unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS g(day)
)
SELECT s.user_id, s.day,
       round(last_value(d.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS filled_value,
       d.day_value IS NOT NULL AS is_observed
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""

QUERIES["event_gap_fill"] = (event_gap_fill, EVENT_GAP_FILL_SQL)


def event_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonality profile per event type — the weekly
    traffic fingerprint (168 cells per type) with a per-type z-score
    marking which cells run hot/cold. Two bounded aggregates: the event
    stream collapses to (type, dow, hour) counts in ONE shuffle; mean and
    population-stddev per type are a window over the AGGREGATED 168-row
    frame (never the stream). Empty cells are absent rows (not zero
    cells) — the profile is of observed traffic, and the oracle replays
    exactly that contract. Epoch-derived dow (days since Thursday
    1970-01-01) keeps the day numbering engine-independent instead of
    leaning on locale-sensitive dayofweek(); the arithmetic runs on
    INTEGER microseconds end-to-end (DuckDB's epoch() returns DOUBLE,
    whose float floor-div/modulo leaks fractions into the day number —
    observed as phantom dow=7 cells)."""
    e = load(spark, sf_dir, "events")
    eps = (F.unix_micros(F.col("ts")) / F.lit(1_000_000)).cast("long")
    epd = (eps / F.lit(86400)).cast("long")
    cells = (
        e.select(
            "event_type",
            (((epd + 4) % 7)).cast("int").alias("dow"),
            F.hour("ts").alias("hod"),
        )
        .groupBy("event_type", "dow", "hod")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("event_type")
    mean = F.avg("n").over(wt)
    sd = F.stddev_pop("n").over(wt)
    return cells.select(
        "event_type",
        "dow",
        "hod",
        "n",
        F.round((F.col("n") - mean) / F.nullif(sd, F.lit(0.0)), 6).alias(
            "z"
        ),
    )


EVENT_SEASONALITY_SQL = """
WITH cells AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 1000000 // 86400 + 4) % 7 AS INT) AS dow,
         CAST(hour(ts) AS INT) AS hod,
         count(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type, dow, hod, n,
       round((n - avg(n) OVER (PARTITION BY event_type))
             / nullif(stddev_pop(n) OVER (PARTITION BY event_type), 0), 6)
         AS z
FROM cells
"""

QUERIES["event_seasonality"] = (event_seasonality, EVENT_SEASONALITY_SQL)


def event_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time distribution: seconds until the SAME USER's next event,
    summarized per event type (count, mean, exact median/p90, max). The
    lead() gap stream shuffles once on user; the percentile summary is a
    per-type aggregate over the gap rows. Terminal events (no next) are
    excluded — dwell is defined between consecutive events. Exact
    percentiles keep the oracle replayable; at 100 TB the same plan swaps
    in percentile_approx with identical shape."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "event_type",
            (
                F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
            ).alias("_us"),
        )
        .filter(F.col("_us").isNotNull())
        .select("event_type", (F.col("_us") / 1_000_000.0).alias("gap_s"))
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_s"), 6).alias("mean_s"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 6).alias("median_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 6).alias("p90_s"),
        F.round(F.max("gap_s"), 6).alias("max_s"),
    )


EVENT_DWELL_SQL = """
WITH gaps AS (
  SELECT event_type,
         (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
          - epoch_us(ts)) / 1000000.0 AS gap_s
  FROM events
)
SELECT event_type, count(*) AS n_gaps,
       round(avg(gap_s), 6) AS mean_s,
       round(quantile_cont(gap_s, 0.5), 6) AS median_s,
       round(quantile_cont(gap_s, 0.9), 6) AS p90_s,
       round(max(gap_s), 6) AS max_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY 1
"""

QUERIES["event_dwell_time"] = (event_dwell_time, EVENT_DWELL_SQL)


def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching (the Flink/Trino
    CEP flagship, absent from both the reference and vanilla Spark SQL):
    per user, count non-overlapping occurrences of the journey pattern
    ``view … click … purchase`` with NO intervening purchase (regex
    ``v[^p]*c[^p]*p`` over the ordered event-type initial-letter string —
    the five synthetic types have distinct initials). Spark-first: one
    shuffle on user_id builds the ordered sequence via
    ``array_sort(collect_list(struct(ts, event_id, chr)))`` (struct sort =
    deterministic ts, event_id order), then JVM-side ``regexp_count`` —
    no UDF, no per-row Python. Per-user state is that user's event string;
    the whale-key bound is the same per-user-history contract as the EWMA
    family (coarse chunking applies identically if a user exceeds memory).
    Output (user_id, n_journeys) for matched users only."""
    e = load(spark, sf_dir, "events")
    seq = (
        e.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"),
                F.substring("event_type", 1, 1).alias("c"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda x: x["c"]),
                "",
            ).alias("journey")
        )
    )
    return (
        seq.select(
            "user_id",
            F.regexp_count("journey", F.lit("v[^p]*c[^p]*p")).alias("n_journeys"),
        )
        .filter(F.col("n_journeys") > 0)
        .orderBy("user_id")
    )


EVENT_PATTERN_MATCH_SQL = """
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS journey
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(regexp_extract_all(journey, 'v[^p]*c[^p]*p')) AS INTEGER)
         AS n_journeys
FROM seq
WHERE len(regexp_extract_all(journey, 'v[^p]*c[^p]*p')) > 0
ORDER BY user_id
"""

QUERIES["event_pattern_match"] = (event_pattern_match, EVENT_PATTERN_MATCH_SQL)


def event_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: every purchase credits its value to
    the LAST preceding non-purchase event type of that user — the
    marketing-analytics workhorse. Spark-first: one window over
    (user, ts, event_id) with ``last(..., ignorenulls=True)`` over ROWS
    UNBOUNDED PRECEDING TO 1 PRECEDING carries the most recent channel
    forward (per-key window state = ONE scalar, no history array), then a
    tiny aggregate over |channels| rows. Values sum in DECIMAL for an
    exact total before the single round+cast. Output
    (channel, attributed_value, n_purchases)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("channel", channel)
        .filter((F.col("event_type") == "purchase") & F.col("channel").isNotNull())
        .groupBy("channel")
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("attributed_value"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
        .orderBy("channel")
    )


EVENT_ATTRIBUTION_SQL = """
WITH touched AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS channel
  FROM events
)
SELECT channel,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS attributed_value,
       count(*) AS n_purchases
FROM touched
WHERE event_type = 'purchase' AND channel IS NOT NULL
GROUP BY 1 ORDER BY 1
"""

QUERIES["event_attribution_last_touch"] = (
    event_attribution_last_touch,
    EVENT_ATTRIBUTION_SQL,
)


def event_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS: longest run of CONSECUTIVE active days per user,
    reported as a histogram (longest_streak, n_users). The classic trick:
    distinct (user, day) → row_number per user by day → ``day - rn`` is
    constant within a consecutive island, so one aggregate per (user,
    island) yields streak lengths. Every window is partitioned by
    user_id (per-key state = that user's active days — bounded), the
    histogram aggregates the |users| frame; nothing global. Days are
    integer offsets from 2024-01-01 so both engines do exact integer
    arithmetic, not interval math. Output (longest_streak, n_users)
    ordered."""
    e = load(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island", F.col("day") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak")
    )
    return (
        longest.groupBy("longest_streak")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("longest_streak")
    )


EVENT_ACTIVITY_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
  FROM events
), islands AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM days
), streaks AS (
  SELECT user_id, island, count(*) AS streak_len
  FROM islands GROUP BY 1, 2
), longest AS (
  SELECT user_id, max(streak_len) AS longest_streak
  FROM streaks GROUP BY 1
)
SELECT longest_streak, count(*) AS n_users
FROM longest GROUP BY 1 ORDER BY 1
"""

QUERIES["event_activity_streaks"] = (
    event_activity_streaks,
    EVENT_ACTIVITY_STREAKS_SQL,
)


def user_modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE per group with a deterministic tiebreak: each user's most
    frequent event type (count desc, type asc), rolled up to how many
    users each type is modal for. The per-user argmax is a row_number
    window over the AGGREGATED (user, type) count frame — partitioned by
    user (≤ |types| rows per group), so it scales as a hash shuffle on
    an already-reduced frame, never the raw event stream. Output
    (event_type, n_users) ordered by type."""
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    modal = counts.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        modal.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("event_type")
    )


USER_MODAL_EVENT_TYPE_SQL = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
), modal AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type) AS rn
  FROM counts
)
SELECT event_type, count(*) AS n_users
FROM modal WHERE rn = 1
GROUP BY 1 ORDER BY 1
"""

QUERIES["user_modal_event_type"] = (
    user_modal_event_type,
    USER_MODAL_EVENT_TYPE_SQL,
)
