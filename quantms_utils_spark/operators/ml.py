"""Distributed training of small linear models — the quality-classifier
step of a corpus pipeline (a fastText-style "is this document worth
training on?" filter), expressed Spark-first.

Full-batch gradient descent with the same driver/executor split as
:func:`operators.similarity.kmeans_train`: the model (a handful of doubles)
lives on the driver and is folded into each iteration's gradient expression
as literals; the distributed work per iteration is ONE map-side-combinable
aggregate (the per-feature error sums), so an iteration costs one scan
regardless of corpus size and nothing per-row ever reaches the driver.
Weights are rounded after each update, which makes the whole training
trajectory bit-reproducible across engines — an unrolled-SQL oracle replays
it exactly (`queries/mlops.py`).

At 100 TB this is the textbook shape (MLlib's own linear models are
treeAggregate gradient sums); for d features the driver holds d doubles and
each iteration shuffles d partial sums per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def logreg_score(feature_cols: list[str], weights: list[float]) -> Column:
    """P(label=1 | x) = sigmoid(x · w) as a pure Catalyst expression."""
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if len(feature_cols) != len(weights):
        raise ValueError(
            f"{len(feature_cols)} feature columns but {len(weights)} weights"
        )
    z = None
    for c, w in zip(feature_cols, weights):
        term = F.col(c) * F.lit(float(w))
        z = term if z is None else z + term
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 3,
    lr: float = 0.5,
    round_decimals: int = 6,
) -> list[float]:
    """Full-batch gradient descent for logistic regression.

    Per iteration: gradient_j = Σ (sigmoid(x·w) − y) · x_j over all rows,
    computed as one aggregate (partial sums combine map-side); update
    w_j ← round(w_j − lr · gradient_j / n, round_decimals). Weights start
    at zero, so the first iteration's sigmoid is exactly 0.5 in any engine;
    per-update rounding absorbs cross-engine last-ulp drift in exp() for
    the later iterations.

    Loud-fail guards (round 10 review): an empty frame raises instead of
    dying in a 0-division, and rows with a NULL feature or label raise
    instead of silently contributing zero gradient while still inflating
    ``n`` (a biased model with no error). The NULL probe rides in the
    first iteration's aggregate — no extra scan. Round 11 (ADVICE r10):
    ``n_iter >= 1`` is validated at entry — the probe rides in iteration
    0, so ``n_iter=0`` would otherwise skip every guard and silently
    return all-zero weights.
    """
    if n_iter < 1:
        raise ValueError(
            f"logreg_train: n_iter must be >= 1, got {n_iter} (zero "
            "iterations would return the all-zero initial weights without "
            "ever validating the training frame)"
        )
    k = len(feature_cols)
    w = [0.0] * k
    probe_cols = [*feature_cols, label_col]
    any_null = None
    for c in probe_cols:
        cond = F.col(c).isNull()
        any_null = cond if any_null is None else any_null | cond
    for it in range(n_iter):
        p = logreg_score(feature_cols, w)
        err = p - F.col(label_col).cast("double")
        extra = (
            [F.count(F.when(any_null, F.lit(1))).alias("n_bad")]
            if it == 0
            else []
        )
        row = df.agg(
            *[
                F.sum(err * F.col(c)).alias(f"g{i}")
                for i, c in enumerate(feature_cols)
            ],
            F.count(F.lit(1)).alias("n"),
            *extra,
        ).collect()[0]
        n = row["n"]
        if it == 0:
            if n == 0:
                raise ValueError("logreg_train: empty training frame")
            if row["n_bad"]:
                raise ValueError(
                    f"logreg_train: {row['n_bad']} rows have NULL in a "
                    f"feature/label column {probe_cols} — drop or impute "
                    "them first (they would silently bias the gradient)"
                )
        w = [
            round(w[i] - lr * float(row[f"g{i}"]) / n, round_decimals)
            for i in range(k)
        ]
    return w


def population_stability(
    a: DataFrame,
    b: DataFrame,
    bin_col: str = "bin",
    smoothing: float = 1.0,
) -> DataFrame:
    """Population Stability Index between two binned distributions — the
    drift monitor a production corpus pipeline runs between yesterday's
    shard and today's (or train vs. serving): PSI < 0.1 is stable, > 0.25
    is an investigate-now shift.

    ``a``/``b`` are DataFrames with a ``bin_col``; each side collapses to
    per-bin counts (one map-side-combinable aggregate each — the corpora
    never co-shuffle), full-outer-joined on the bin so a bin present in
    only one side still contributes. Laplace smoothing (add ``smoothing``
    to every bin count, with the union bin-count in the denominator) keeps
    empty bins finite without masking them. Returns one row per bin:
    ``(bin, n_a, n_b, p_a, p_b, psi_term)`` where ``psi = Σ psi_term`` —
    emitted per-bin (not pre-summed) because the per-bin terms are what a
    drift dashboard plots. All ratios divide exact integers, so the terms
    are engine-deterministic.
    """
    ca = a.groupBy(F.col(bin_col).alias("bin")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    cb = b.groupBy(F.col(bin_col).alias("bin")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    return population_stability_from_counts(ca, cb, smoothing=smoothing)


def population_stability_from_counts(
    ca: DataFrame,
    cb: DataFrame,
    smoothing: float = 1.0,
) -> DataFrame:
    """PSI from PRE-AGGREGATED bin tables ``(bin, n_a)`` / ``(bin, n_b)`` —
    the form the streaming drift monitor uses, where each side is already a
    standing count table (epoch-merged) rather than raw rows. Same math and
    output as :func:`population_stability`."""
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    j = ca.join(cb, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    tot = j.agg(
        F.sum("n_a").alias("__ta"),
        F.sum("n_b").alias("__tb"),
        F.count(F.lit(1)).alias("__nbins"),
    )
    s = F.lit(float(smoothing))
    pa = (F.col("n_a") + s) / (F.col("__ta") + s * F.col("__nbins"))
    pb = (F.col("n_b") + s) / (F.col("__tb") + s * F.col("__nbins"))
    return j.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        pa.alias("p_a"),
        pb.alias("p_b"),
        ((pa - pb) * F.log(pa / pb)).alias("psi_term"),
    )
