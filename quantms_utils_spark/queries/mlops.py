"""Distributed model-training queries: a logistic-regression quality
classifier trained on the `documents` table, with the full training
trajectory replayed by an unrolled-SQL oracle (the same technique as the
k-means Lloyd twin in `queries/similarity.py` — per-update rounding makes
every weight bit-reproducible across engines).

Features are deliberately boring-but-real corpus statistics (bias, scaled
char count, scaled whitespace-token count) and the label is the language-id
column — the point is the TRAINING LOOP's correctness and shape (one
map-side-combinable gradient aggregate per iteration), not the model's
sophistication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from quantms_utils_spark.tables import load

LOGREG_ITER = 3
LOGREG_LR = 0.5
LOGREG_ROUND = 6
_FEATURES = ["x0", "x1", "x2"]

# ws-token count twin of operators.text.ws_token_count (same as
# TOKEN_COUNTS_SQL in queries/textops.py)
_WS_SQL = (
    "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))"
)

_D_SQL = f"""d AS (
  SELECT doc_id, 1.0 AS x0, n_chars / 1000.0 AS x1,
         ({_WS_SQL}) / 100.0 AS x2,
         (lang = 'en')::INT AS y
  FROM documents
)"""


def _feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quantms_utils_spark.operators.text import ws_token_count

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        (F.col("n_chars").cast("double") / F.lit(1000.0)).alias("x1"),
        (ws_token_count(F.col("text")).cast("double") / F.lit(100.0)).alias(
            "x2"
        ),
        (F.col("lang") == "en").cast("int").alias("y"),
    )


def _score_z(prev: list) -> F.Column:
    """x · w with the weights given as COLUMNS (or literals) — the same
    term order and association as operators.ml.logreg_score builds from
    literal weights, so the two forms are expression-identical real
    arithmetic."""
    z = None
    for c, wcol in zip(_FEATURES, prev):
        term = F.col(c) * wcol
        z = term if z is None else z + term
    return z


def _train_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained weights as a LAZY 1-row frame (w0..w2) — optimization
    round 13 (guide §5 "the driver should do almost no data work"):
    ``operators.ml.logreg_train`` runs one BLOCKING ``.collect()`` per GD
    iteration during query CONSTRUCTION, i.e. ``LOGREG_ITER`` synchronous
    full-corpus scans before the query's own action even starts — each a
    driver sync-barrier at 100 TB. Here iteration t+1 instead
    ``crossJoin(broadcast(...))``s the 1-row weight aggregate of iteration
    t back onto the feature frame — exactly the oracle's unrolled ``w1..wN``
    CTE shape — so the whole training trajectory executes inside the ONE
    action of whichever query consumes it. Update algebra is term-for-term
    the operator's (z = Σ x_j·w_j in feature order, update
    ``round(w_j − lr·Σ err·x_j / n, 6)`` with the same association), so the
    weights are bit-identical (pinned by
    tests/test_review_r13.py::test_lazy_logreg_chain_matches_operator).
    The broadcasts are 1-row → the BNLJ sites are the adjudicated bounded
    class (tests/test_registry_plan_invariants.py)."""
    d = _feature_frame(spark, sf_dir)
    k = len(_FEATURES)
    wf: DataFrame | None = None
    for it in range(LOGREG_ITER):
        if wf is None:
            prev = [F.lit(0.0)] * k
            src = d
        else:
            prev = [F.col(f"w{j}") for j in range(k)]
            src = d.crossJoin(F.broadcast(wf))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_score_z(prev)))
        err = p - F.col("y").cast("double")
        # the weight reference sits outside the aggregate → wrap it
        # (1-row source, so any_value is exact; mirrors the oracle CTE)
        lead = [
            F.lit(0.0) if it == 0 else F.any_value(prev[j]) for j in range(k)
        ]
        wf = src.agg(
            *[
                F.round(
                    lead[j]
                    - F.lit(LOGREG_LR)
                    * F.sum(err * F.col(_FEATURES[j]))
                    / F.count(F.lit(1)),
                    LOGREG_ROUND,
                ).alias(f"w{j}")
                for j in range(k)
            ]
        )
    return wf


def _scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature frame with the trained weights attached (1-row broadcast)
    and ``p`` = the score rounded to 4 — the shared input of the scoring /
    eval / calibration / lift queries."""
    wf = _train_frame(spark, sf_dir)
    d = _feature_frame(spark, sf_dir)
    prev = [F.col(f"w{j}") for j in range(len(_FEATURES))]
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_score_z(prev))), 4)
    return d.crossJoin(F.broadcast(wf)).withColumn("p", p)


def quality_logreg_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained classifier weights as (dim, weight) rows — value-checks
    the distributed gradient-descent loop itself (the lazy chain of
    ``_train_frame``, algebra-identical to operators.ml.logreg_train)
    against the oracle's unrolled replay."""
    wf = _train_frame(spark, sf_dir)
    return wf.selectExpr(
        "inline(array("
        "struct(0 AS dim, w0 AS weight), "
        "struct(1 AS dim, w1 AS weight), "
        "struct(2 AS dim, w2 AS weight)))"
    )


def _iter_sql(n_iter: int) -> str:
    """Unrolled gradient-descent CTE chain: w1..wN, each a 1-row table of
    (w0, w1, w2) referencing the previous iteration's scalars."""
    ctes = []
    for it in range(1, n_iter + 1):
        prev = (
            ["0.0", "0.0", "0.0"]
            if it == 1
            else [f"w{it - 1}.w{j}" for j in range(3)]
        )
        z = " + ".join(f"{prev[j]} * x{j}" for j in range(3))
        # the leading weight reference sits outside the aggregates -> it
        # must be wrapped (1-row CTE, so any_value is exact)
        lead = (
            ["0.0"] * 3
            if it == 1
            else [f"any_value({prev[j]})" for j in range(3)]
        )
        cols = ", ".join(
            f"round({lead[j]} - {LOGREG_LR} * sum((1.0 / (1.0 + exp(-({z}))) - y) * x{j})"
            f" / count(*), {LOGREG_ROUND}) AS w{j}"
            for j in range(3)
        )
        src = "d" if it == 1 else f"d, w{it - 1}"
        ctes.append(f"w{it} AS (SELECT {cols} FROM {src})")
    return ",\n".join(ctes)


QUALITY_LOGREG_WEIGHTS_SQL = f"""
WITH {_D_SQL},
{_iter_sql(LOGREG_ITER)}
SELECT 0 AS dim, w0 AS weight FROM w{LOGREG_ITER}
UNION ALL SELECT 1 AS dim, w1 AS weight FROM w{LOGREG_ITER}
UNION ALL SELECT 2 AS dim, w2 AS weight FROM w{LOGREG_ITER}
"""


def quality_logreg_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the trained classifier (probability rounded
    to 4 decimals; the keep decision compares the ROUNDED score in both
    engines so a last-ulp sigmoid difference can never flip it). The scoring
    pass is map-only — at 100 TB this is the quality-filter scan."""
    return _scored_frame(spark, sf_dir).select(
        "doc_id",
        F.col("p").alias("p_en"),
        (F.col("p") > F.lit(0.5)).alias("pred_en"),
        F.col("y").cast("boolean").alias("is_en"),
    )


QUALITY_LOGREG_SCORES_SQL = f"""
WITH {_D_SQL},
{_iter_sql(LOGREG_ITER)}
SELECT doc_id,
       round(1.0 / (1.0 + exp(-(w0 * x0 + w1 * x1 + w2 * x2))), 4) AS p_en,
       round(1.0 / (1.0 + exp(-(w0 * x0 + w1 * x1 + w2 * x2))), 4) > 0.5
         AS pred_en,
       y = 1 AS is_en
FROM d, w{LOGREG_ITER}
"""


QUERIES = {
    "text_quality_logreg_weights": (
        quality_logreg_weights,
        QUALITY_LOGREG_WEIGHTS_SQL,
    ),
    "text_quality_logreg_scores": (
        quality_logreg_scores,
        QUALITY_LOGREG_SCORES_SQL,
    ),
}


def quality_logreg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation in the 100 TB shape: AUC computed EXACTLY from
    the (rounded-score, label) histogram — one aggregate collapses the corpus
    to ≤10^4 score buckets, then a window over the bucket table (bounded by
    bucket count, not rows) accumulates the Mann-Whitney pair count with the
    standard tie correction (ties contribute half). Threshold metrics at 0.5
    ride in the same pass; guarded divisions so a degenerate classifier
    yields NULL precision, not Infinity."""
    from pyspark.sql import Window

    scored = _scored_frame(spark, sf_dir).select(
        "p", F.col("y").cast("long").alias("y")
    )
    buckets = scored.groupBy("p").agg(
        F.sum("y").alias("n_pos"),
        F.sum(F.lit(1) - F.col("y")).alias("n_neg"),
    )
    w_prev = Window.orderBy("p").rowsBetween(
        Window.unboundedPreceding, -1
    )
    contrib = buckets.select(
        "n_pos",
        "n_neg",
        (
            F.col("n_pos")
            * (
                F.coalesce(F.sum("n_neg").over(w_prev), F.lit(0))
                + F.col("n_neg") / F.lit(2.0)
            )
        ).alias("pairs"),
        (F.col("p") > 0.5).alias("pred"),
    )
    agg = contrib.agg(
        F.sum("n_pos").alias("P"),
        F.sum("n_neg").alias("N"),
        F.sum("pairs").alias("pairs"),
        F.sum(F.when(F.col("pred"), F.col("n_pos")).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred"), F.col("n_neg")).otherwise(0)).alias("fp"),
    )
    P, N = F.col("P"), F.col("N")
    tp, fp = F.col("tp"), F.col("fp")
    return agg.select(
        P.alias("n_pos"),
        N.alias("n_neg"),
        F.round(F.col("pairs") / (P * N), 6).alias("auc"),
        F.round((tp + (N - fp)) / (P + N).cast("double"), 6).alias(
            "accuracy"
        ),
        F.when(tp + fp > 0, F.round(tp / (tp + fp).cast("double"), 6))
        .otherwise(F.lit(None).cast("double"))
        .alias("precision"),
        F.round(tp / P.cast("double"), 6).alias("recall"),
    )


QUALITY_LOGREG_EVAL_SQL = f"""
WITH {_D_SQL},
{_iter_sql(LOGREG_ITER)},
s AS (
  SELECT round(1.0 / (1.0 + exp(-(w0 * x0 + w1 * x1 + w2 * x2))), 4) AS p, y
  FROM d, w{LOGREG_ITER}
), b AS (
  SELECT p, CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(1 - y) AS BIGINT) AS n_neg
  FROM s GROUP BY p
), c AS (
  SELECT n_pos, n_neg,
         n_pos * (coalesce(sum(n_neg) OVER (ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + n_neg / 2.0) AS pairs,
         p > 0.5 AS pred
  FROM b
), a AS (
  SELECT CAST(sum(n_pos) AS BIGINT) AS P, CAST(sum(n_neg) AS BIGINT) AS N,
         sum(pairs) AS pairs,
         CAST(sum(CASE WHEN pred THEN n_pos ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN pred THEN n_neg ELSE 0 END) AS BIGINT) AS fp
  FROM c
)
SELECT P AS n_pos, N AS n_neg,
       round(pairs / (P * N), 6) AS auc,
       round((tp + (N - fp)) / (P + N)::DOUBLE, 6) AS accuracy,
       CASE WHEN tp + fp > 0 THEN round(tp / (tp + fp)::DOUBLE, 6)
            ELSE NULL END AS precision,
       round(tp / P::DOUBLE, 6) AS recall
FROM a
"""


QUERIES["text_quality_logreg_eval"] = (
    quality_logreg_eval,
    QUALITY_LOGREG_EVAL_SQL,
)


def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (operators.ml.population_stability):
    PSI of the document-length distribution between the md5 train split
    (pct < 80, the text_train_split rule) and the holdout, binned at 50
    chars capped at bin 11. Emitted per bin — (bin, counts, smoothed
    shares, psi_term) — because the per-bin terms are what a drift
    dashboard plots; Σ psi_term is the headline index. Two
    map-side-combinable count aggregates + a 1-row broadcast total; the
    corpora never co-shuffle."""
    from quantms_utils_spark.operators.ml import population_stability

    d = load(spark, sf_dir, "documents")
    pct = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 100
    )
    binned = d.select(
        F.least(F.lit(11), F.floor(F.col("n_chars") / 50)).alias("bin"),
        pct.alias("pct"),
    )
    train = binned.filter(F.col("pct") < 80)
    holdout = binned.filter(F.col("pct") >= 80)
    out = population_stability(train, holdout, bin_col="bin")
    return out.select(
        "bin",
        "n_a",
        "n_b",
        F.round("p_a", 6).alias("p_a"),
        F.round("p_b", 6).alias("p_b"),
        F.round("psi_term", 6).alias("psi_term"),
    )


CORPUS_DRIFT_PSI_SQL = """
WITH binned AS (
  SELECT least(11, n_chars // 50) AS bin,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100
           AS pct
  FROM documents
), ca AS (
  SELECT bin, count(*) AS n_a FROM binned WHERE pct < 80 GROUP BY bin
), cb AS (
  SELECT bin, count(*) AS n_b FROM binned WHERE pct >= 80 GROUP BY bin
), j AS (
  SELECT coalesce(ca.bin, cb.bin) AS bin,
         coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
  FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin
), tot AS (
  SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS nbins FROM j
)
SELECT bin, n_a, n_b,
       round((n_a + 1.0) / (ta + nbins), 6) AS p_a,
       round((n_b + 1.0) / (tb + nbins), 6) AS p_b,
       round(((n_a + 1.0) / (ta + nbins) - (n_b + 1.0) / (tb + nbins))
             * ln(((n_a + 1.0) / (ta + nbins))
                  / ((n_b + 1.0) / (tb + nbins))), 6) AS psi_term
FROM j, tot
"""


QUERIES["corpus_drift_psi"] = (corpus_drift_psi, CORPUS_DRIFT_PSI_SQL)


def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve of the trained classifier: decile bins of the
    ROUNDED score vs the empirical positive rate — the reliability diagram
    behind every score-threshold decision. One aggregate collapses the
    corpus to ≤10 bins; mean predicted probability sums in DECIMAL so the
    cross-engine average is exact before the final double division. Bin
    assignment uses the rounded score (both engines bin identical doubles,
    so the edges cannot drift)."""
    scored = _scored_frame(spark, sf_dir).select(
        "p", F.col("y").cast("long").alias("y")
    )
    binned = scored.select(
        F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("int").alias("bin"),
        F.col("p").cast("decimal(8,4)").alias("pd"),
        "y",
    )
    g = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pd").alias("sp"),
        F.sum("y").alias("n_pos"),
    )
    return g.select(
        "bin",
        "n_docs",
        F.round(F.col("sp").cast("double") / F.col("n_docs"), 6).alias(
            "mean_p"
        ),
        "n_pos",
        F.round(F.col("n_pos") / F.col("n_docs").cast("double"), 6).alias(
            "pos_rate"
        ),
    )


QUALITY_CALIBRATION_SQL = f"""
WITH {_D_SQL},
{_iter_sql(LOGREG_ITER)},
s AS (
  SELECT round(1.0 / (1.0 + exp(-(w0 * x0 + w1 * x1 + w2 * x2))), 4) AS p, y
  FROM d, w{LOGREG_ITER}
), b AS (
  SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin,
         CAST(p AS DECIMAL(8,4)) AS pd, y
  FROM s
), g AS (
  SELECT bin, count(*) AS n_docs, sum(pd) AS sp,
         CAST(sum(y) AS BIGINT) AS n_pos
  FROM b GROUP BY bin
)
SELECT bin, n_docs,
       round(CAST(sp AS DOUBLE) / n_docs, 6) AS mean_p,
       n_pos,
       round(n_pos / CAST(n_docs AS DOUBLE), 6) AS pos_rate
FROM g
"""

QUERIES["text_quality_calibration"] = (
    quality_calibration_bins,
    QUALITY_CALIBRATION_SQL,
)


_TREND_EPOCH0 = 1704067200  # 2024-01-01 UTC — keeps x small enough that
# the DECIMAL moment sums stay well inside 38 digits


def event_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time (slope + intercept) —
    distributed regression as ONE map-side-combinable moment aggregate
    (n, Σx, Σy, Σxy, Σx²), the treeAggregate shape every per-group model
    fit reduces to. Cross-engine determinism: the moments accumulate in
    DECIMAL (exact), and the closed-form solution is evaluated in DOUBLE
    from identical exact inputs with identical operand order — so the
    doubles agree bit-for-bit before rounding. x is integer seconds since
    2024-01-01 (small offsets keep the decimal moments narrow); a
    float-summed covar_pop would NOT hash-match across engines, which is
    exactly why this query exists."""
    e = load(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts") - F.lit(_TREND_EPOCH0)).cast("decimal(18,0)")
    y = F.col("value").cast("decimal(18,2)")
    g = e.select(
        "event_type", x.alias("x"), y.alias("y")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return g.select(
        "event_type",
        F.col("n"),
        F.round(slope * 86400, 8).alias("slope_per_day"),
        F.round((sy - slope * sx) / n, 8).alias("intercept"),
    )


EVENT_TREND_SQL = f"""
WITH m AS (
  SELECT event_type,
         count(*) AS n,
         sum(CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_EPOCH0}
                  AS DECIMAL(18,0))) AS sx,
         sum(CAST(value AS DECIMAL(18,2))) AS sy,
         sum(CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_EPOCH0}
                  AS DECIMAL(18,0))
             * CAST(value AS DECIMAL(18,2))) AS sxy,
         sum(CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_EPOCH0}
                  AS DECIMAL(18,0))
             * CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_EPOCH0}
                    AS DECIMAL(18,0))) AS sxx
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 86400, 8)
         AS slope_per_day,
       round((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 8)
         AS intercept
FROM m
"""

QUERIES["event_trend_slopes"] = (event_trend_slopes, EVENT_TREND_SQL)


# Poisson(1) inverse-CDF thresholds on a 24-bit md5 uniform (integer
# compares — no float boundary can disagree across engines); k caps at 7
_BOOT_T = [6171992, 12343985, 15429982, 16458647, 16715813, 16767247, 16775819]
_BOOT_B = 50


def event_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type mean of `value` with a POISSON BOOTSTRAP 96% CI —
    the distributed bootstrap: resampling-with-replacement is approximated
    by independent per-row Poisson(1) weights, so all B=50 replicates
    compute in ONE pass over the data (explode ×B, one aggregate) with no
    global resample shuffle — the standard trick for CIs at 100 TB
    (Chamandy et al., Google, 2012). Determinism: weights come from
    md5(event_id:b) through integer inverse-CDF thresholds (no RNG, no
    float compares); replicate sums accumulate in DECIMAL; the CI bounds
    are ORDER STATISTICS (2nd / 49th of 50 sorted replicate means —
    explicit nearest-rank, no interpolation formula to disagree on). The
    oracle replays every stage including the threshold table. A replicate
    whose weights all land on 0 for a tiny group yields a NULL mean;
    Spark's collect_list drops NULLs while DuckDB's list() keeps them, so
    BOTH sides filter NULL replicate means explicitly before sorting —
    the order-statistic indices then read identical lists."""
    e = load(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,2)")
    b = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b")
    # The xB explode multiplies work 50x but inherits the SCAN's
    # partitioning (a single small file = a single task); fan the base
    # rows out first so the blowup stage parallelizes (measured:
    # 1.6s -> 0.9s at sf0.1 on local[32]). _fan_out never *reduces* a
    # well-partitioned 100 TB scan; results are unchanged — every
    # downstream aggregate is order-independent (exact DECIMAL sums).
    from quantms_utils_spark.operators.dedup import _fan_out

    base = _fan_out(e.select("event_type", "event_id", vdec.alias("v")))
    rows = base.select("event_type", "event_id", "v", b)
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            6,
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(7)
    for k in range(len(_BOOT_T) - 1, -1, -1):
        w = F.when(hv < _BOOT_T[k], F.lit(k)).otherwise(w)
    rep = (
        rows.withColumn("w", w)
        .groupBy("event_type", "b")
        .agg(
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("v")).alias("swv"),
        )
        .select(
            "event_type",
            (F.col("swv").cast("double") / F.nullif(F.col("sw"), F.lit(0))).alias(
                "m"
            ),
        )
    )
    ci = (
        rep.filter(F.col("m").isNotNull())
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("m")).alias("ms"))
    )
    point = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(vdec).alias("sv"),
    )
    return (
        point.join(ci, "event_type")
        .select(
            "event_type",
            "n_events",
            F.round(F.col("sv").cast("double") / F.col("n_events"), 6).alias(
                "mean_value"
            ),
            F.round(F.element_at("ms", 2), 6).alias("boot_lo"),
            F.round(F.element_at("ms", _BOOT_B - 1), 6).alias("boot_hi"),
        )
    )


_BOOT_W_SQL = " ".join(
    f"WHEN hv < {t} THEN {k}" for k, t in enumerate(_BOOT_T)
)

EVENT_BOOTSTRAP_SQL = f"""
WITH r AS (
  SELECT event_type, b, CAST(value AS DECIMAL(18,2)) AS v,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                          || CAST(b AS VARCHAR)), 1, 6))::BIGINT AS hv
  FROM events, (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b)
), wr AS (
  SELECT event_type, b, v, CASE {_BOOT_W_SQL} ELSE 7 END AS w FROM r
), rep AS (
  SELECT event_type, b,
         CAST(sum(w * v) AS DOUBLE) / nullif(sum(w), 0) AS m
  FROM wr GROUP BY event_type, b
), ci AS (
  SELECT event_type, list_sort(list(m)) AS ms FROM rep
  WHERE m IS NOT NULL GROUP BY event_type
), point AS (
  SELECT event_type, count(*) AS n_events,
         sum(CAST(value AS DECIMAL(18,2))) AS sv
  FROM events GROUP BY event_type
)
SELECT p.event_type, p.n_events,
       round(CAST(sv AS DOUBLE) / n_events, 6) AS mean_value,
       round(ms[2], 6) AS boot_lo,
       round(ms[{_BOOT_B - 1}], 6) AS boot_hi
FROM point p JOIN ci USING (event_type)
"""

QUERIES["event_bootstrap_ci"] = (event_bootstrap_ci, EVENT_BOOTSTRAP_SQL)


# Poisson(1) inverse-CDF thresholds on the signed-64-bit xxhash64 uniform:
# threshold_k = floor(cdf_k * 2^64) - 2^63 (integer compares, like _BOOT_T).
_BOOT_CDF = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119,
]
_BOOT_T64 = [int(p * 2.0**64) - 2**63 for p in _BOOT_CDF]


def event_bootstrap_ci_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-default Poisson bootstrap (xxhash64 weight family) —
    benchmark entry; structure-identical to the oracle-checked md5
    variant (`event_bootstrap_ci`), with the per-(row, replicate) md5 →
    hex-window → conv chain replaced by ONE codegen'd xxhash64(event_id,
    b) and 64-bit integer threshold compares. Same pipeline: explode ×B,
    one (type, b) aggregate, order-statistic CI. The same
    oracle/performance family split as the md5/xxhash64 MinHash pair."""
    e = load(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,2)")
    b = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b")
    # The xB explode multiplies work 50x but inherits the SCAN's
    # partitioning (a single small file = a single task); fan the base
    # rows out first so the blowup stage parallelizes (measured:
    # 1.6s -> 0.9s at sf0.1 on local[32]). _fan_out never *reduces* a
    # well-partitioned 100 TB scan; results are unchanged — every
    # downstream aggregate is order-independent (exact DECIMAL sums).
    from quantms_utils_spark.operators.dedup import _fan_out

    base = _fan_out(e.select("event_type", "event_id", vdec.alias("v")))
    rows = base.select("event_type", "event_id", "v", b)
    hv = F.xxhash64(F.col("event_id"), F.col("b"))
    w = F.lit(7)
    for k in range(len(_BOOT_T64) - 1, -1, -1):
        w = F.when(hv < F.lit(_BOOT_T64[k]), F.lit(k)).otherwise(w)
    rep = (
        rows.withColumn("w", w)
        .groupBy("event_type", "b")
        .agg(
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("v")).alias("swv"),
        )
        .select(
            "event_type",
            (F.col("swv").cast("double") / F.nullif(F.col("sw"), F.lit(0))).alias(
                "m"
            ),
        )
    )
    ci = (
        rep.filter(F.col("m").isNotNull())
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("m")).alias("ms"))
    )
    point = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(vdec).alias("sv"),
    )
    return point.join(ci, "event_type").select(
        "event_type",
        "n_events",
        F.round(F.col("sv").cast("double") / F.col("n_events"), 6).alias(
            "mean_value"
        ),
        F.round(F.element_at("ms", 2), 6).alias("boot_lo"),
        F.round(F.element_at("ms", _BOOT_B - 1), 6).alias("boot_hi"),
    )


def quality_logreg_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model LIFT / gains table — the classifier-ops artifact next to the
    AUC eval: decile documents by classifier score (ntile(10) over
    (p_en desc, doc_id) — deterministic ties), report per-decile volume,
    positives, positive rate, and the CUMULATIVE capture rate (what share
    of all positives the top-k deciles catch — the curve a filtering
    budget is set from). The deciles come from the TWO-PHASE global
    ntile (operators/rank.py) — the scored frame is corpus-sized, so an
    unpartitioned ntile window would funnel it through one task;
    cumulative sums run over the 10-row decile rollup. Oracle replays
    training, scoring, tiling, and both cumulative ratios."""
    from quantms_utils_spark.operators.rank import global_ntile

    scored = quality_logreg_scores(spark, sf_dir)
    tiled = global_ntile(
        scored,
        [F.col("p_en").desc(), F.col("doc_id")],
        10,
        bucket_col="decile",
    ).select("decile", F.col("is_en").cast("int").alias("pos"))
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pos").alias("n_pos"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    return per.select(
        "decile",
        "n_docs",
        "n_pos",
        F.round(F.col("n_pos") / F.col("n_docs"), 6).alias("pos_rate"),
        F.round(
            F.sum("n_pos").over(wc) / F.sum("n_pos").over(tot), 6
        ).alias("cum_capture"),
    ).orderBy("decile")


QUALITY_LOGREG_LIFT_SQL = f"""
WITH {_D_SQL},
{_iter_sql(LOGREG_ITER)},
scored AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-(w0 * x0 + w1 * x1 + w2 * x2))), 4) AS p_en,
         y AS pos
  FROM d, w{LOGREG_ITER}
), tiled AS (
  SELECT ntile(10) OVER (ORDER BY p_en DESC, doc_id) AS decile, pos
  FROM scored
), per AS (
  SELECT decile, count(*) AS n_docs, sum(pos) AS n_pos
  FROM tiled GROUP BY 1
)
SELECT decile,
       n_docs,
       CAST(n_pos AS BIGINT) AS n_pos,
       round(CAST(n_pos AS DOUBLE) / n_docs, 6) AS pos_rate,
       round(CAST(sum(n_pos) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(sum(n_pos) OVER () AS DOUBLE), 6) AS cum_capture
FROM per ORDER BY decile
"""

QUERIES["text_quality_logreg_lift"] = (
    quality_logreg_lift,
    QUALITY_LOGREG_LIFT_SQL,
)


def event_cuped_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B lift — the experimentation-platform workhorse
    (Deng et al., WSDM'13): users hash-split into two variants, the
    POST-period value metric is adjusted by each user's PRE-period value
    (the covariate), removing the between-user variance the experiment
    never randomized over. θ = cov(x, y)/var(x) pooled; adjusted lift =
    raw lift − θ·(mean_x_B − mean_x_A); the theoretical variance
    reduction is ρ² = cov²/(var_x·var_y).

    Cross-engine determinism, the hard part: EVERY moment (Σx, Σy, Σx²,
    Σy², Σxy, per-variant Σ) accumulates in DECIMAL — exact, so both
    engines hold identical sums — and only the final θ/lift/ρ² formulas
    run in double, written in the same operation order on both sides
    (IEEE doubles are deterministic given identical inputs and order;
    a float covar_pop would be partition-order-dependent and never
    hash-match — the same reason `event_trend_slopes` pins its moments).
    The variant split is the md5-prefix idiom both engines can compute
    (`('0x'||substr(md5(user_id),1,6)) % 2`). ONE scan: conditional
    pre/post sums per user, then ONE global moment aggregate (map-side
    combinable, 1-row result). Output (n_a, n_b, lift_raw, lift_cuped,
    var_reduction)."""
    cutoff = "2024-01-16"
    # (13,6) bounds per-user period sums at 10^7 (orders of magnitude above
    # the data at any SF) while keeping the second-moment PRODUCTS exact in
    # BOTH engines: (13,6)x(13,6) -> Spark DECIMAL(27,12) (< the 38 cap, no
    # allowPrecisionLoss rounding), DuckDB int128 widening (an 18,6 square
    # overflows DuckDB's int64 fixed-point and raises)
    dec = "decimal(13,6)"
    from quantms_utils_spark.operators.dedup import _fan_out

    # testdata scans arrive as ONE partition; fan out so the md5 split and
    # the per-user partial aggregate parallelize (same rule as the
    # bootstrap family; never reduces a well-partitioned 100 TB scan)
    e = _fan_out(load(spark, sf_dir, "events").select("user_id", "ts", "value"))
    zero = F.lit(0).cast(dec)
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("ts") < cutoff, F.col("value").cast(dec))
                ),
                zero,
            ).cast(dec).alias("x"),
            F.coalesce(
                F.sum(
                    F.when(F.col("ts") >= cutoff, F.col("value").cast(dec))
                ),
                zero,
            ).cast(dec).alias("y"),
        )
        .withColumn(
            "variant",
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 6),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            ),
        )
    )
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("x")).otherwise(zero)).alias("sx_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("x")).otherwise(zero)).alias("sx_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("y")).otherwise(zero)).alias("sy_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("y")).otherwise(zero)).alias("sy_b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("n")
    var_x = (d("sxx") - d("sx") * d("sx") / n) / n
    var_y = (d("syy") - d("sy") * d("sy") / n) / n
    cov = (d("sxy") - d("sx") * d("sy") / n) / n
    theta = cov / var_x
    lift_raw = d("sy_b") / d("n_b") - d("sy_a") / d("n_a")
    lift_cuped = lift_raw - theta * (d("sx_b") / d("n_b") - d("sx_a") / d("n_a"))
    return m.select(
        F.col("n_a"),
        F.col("n_b"),
        F.round(lift_raw, 6).alias("lift_raw"),
        F.round(lift_cuped, 6).alias("lift_cuped"),
        F.round(cov * cov / (var_x * var_y), 6).alias("var_reduction"),
    )


EVENT_CUPED_AB_LIFT_SQL = """
WITH per_user AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                                THEN CAST(value AS DECIMAL(13,6)) END),
                       0) AS DECIMAL(13,6)) AS x,
         CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                                THEN CAST(value AS DECIMAL(13,6)) END),
                       0) AS DECIMAL(13,6)) AS y,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6))::BIGINT % 2
           AS variant
  FROM events GROUP BY user_id
), m AS (
  SELECT count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         -- DECIMAL(19,6) operand forces DuckDB's int128 multiply path
         -- (int64-class operands raise on overflow instead of widening);
         -- values are exact either way, matching Spark's (27,12) products
         sum(CAST(x AS DECIMAL(19,6)) * x) AS sxx,
         sum(CAST(y AS DECIMAL(19,6)) * y) AS syy,
         sum(CAST(x AS DECIMAL(19,6)) * y) AS sxy,
         count(*) FILTER (variant = 0) AS n_a,
         count(*) FILTER (variant = 1) AS n_b,
         sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS sx_a,
         sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS sx_b,
         sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS sy_a,
         sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS sy_b
  FROM per_user
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       round(CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             - CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS lift_raw,
       round((CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
              - CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))
             - (((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
               * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                  - CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)), 6)
         AS lift_cuped,
       round(((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             / (((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))), 6)
         AS var_reduction
FROM m
"""

QUERIES["event_cuped_ab_lift"] = (event_cuped_ab_lift, EVENT_CUPED_AB_LIFT_SQL)
