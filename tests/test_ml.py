"""Unit tests for the distributed logistic-regression trainer."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from quantms_utils_spark.operators.ml import logreg_score, logreg_train


def _toy(spark):
    # y = 1 iff x1 > 0 — linearly separable on one feature
    rows = [(1.0, float(v), 1 if v > 0 else 0) for v in range(-20, 21) if v != 0]
    return spark.createDataFrame(rows, "x0 double, x1 double, y int")


def test_logreg_learns_separable_direction(spark):
    df = _toy(spark)
    w = logreg_train(df, ["x0", "x1"], "y", n_iter=10, lr=0.5)
    assert w[1] > 0.5  # the separating feature gets a clear positive weight
    preds = df.select(
        "y", (logreg_score(["x0", "x1"], w) > 0.5).cast("int").alias("p")
    )
    acc = preds.where(F.col("y") == F.col("p")).count() / preds.count()
    assert acc == 1.0


def test_logreg_training_is_deterministic(spark):
    df = _toy(spark).repartition(7)  # partitioning must not change weights
    w1 = logreg_train(df, ["x0", "x1"], "y", n_iter=3, lr=0.5)
    w2 = logreg_train(df.repartition(3), ["x0", "x1"], "y", n_iter=3, lr=0.5)
    assert w1 == w2  # per-update rounding absorbs float re-association


def test_logreg_zero_init_first_step(spark):
    # with w=0 the first sigmoid is exactly 0.5, so the first update is
    # analytic: w_j = -lr * sum((0.5 - y) * x_j) / n  (rounded)
    df = spark.createDataFrame(
        [(1.0, 2.0, 1), (1.0, -2.0, 0)], "x0 double, x1 double, y int"
    )
    w = logreg_train(df, ["x0", "x1"], "y", n_iter=1, lr=0.5)
    assert w == [0.0, round(0.5 * 2.0 / 2, 6)]


def test_psi_identical_distributions_zero(spark):
    from quantms_utils_spark.operators.ml import population_stability

    a = spark.createDataFrame([(i % 3,) for i in range(30)], "bin long")
    b = spark.createDataFrame([(i % 3,) for i in range(60)], "bin long")
    rows = population_stability(a, b).collect()
    # same shape (uniform over 3 bins) at different sizes -> every term 0
    for r in rows:
        assert abs(r["psi_term"]) < 1e-12
    assert {r["bin"] for r in rows} == {0, 1, 2}


def test_psi_one_sided_bin_is_finite_and_positive(spark):
    from quantms_utils_spark.operators.ml import population_stability

    a = spark.createDataFrame([(0,)] * 10 + [(1,)] * 10, "bin long")
    b = spark.createDataFrame([(0,)] * 20, "bin long")  # bin 1 absent
    rows = {r["bin"]: r for r in population_stability(a, b).collect()}
    assert rows[1]["n_b"] == 0
    import math

    assert math.isfinite(rows[1]["psi_term"])  # smoothing keeps it finite
    assert rows[1]["psi_term"] > 0
    total = sum(r["psi_term"] for r in rows.values())
    assert total > 0.25  # a vanished bin is an investigate-now shift


def test_psi_hand_computed(spark):
    import math

    from quantms_utils_spark.operators.ml import population_stability

    a = spark.createDataFrame([(0,)] * 8 + [(1,)] * 2, "bin long")
    b = spark.createDataFrame([(0,)] * 5 + [(1,)] * 5, "bin long")
    rows = {r["bin"]: r for r in population_stability(a, b).collect()}
    pa0, pb0 = (8 + 1) / 12, (5 + 1) / 12
    assert rows[0]["p_a"] == pytest.approx(pa0)
    assert rows[0]["psi_term"] == pytest.approx(
        (pa0 - pb0) * math.log(pa0 / pb0)
    )


def test_logreg_train_loud_fail_on_empty_and_null(spark):
    """Round-10 (review): empty frames and NULL feature/label rows raise
    with actionable messages instead of ZeroDivisionError / a silently
    biased gradient (NULL terms drop from the sums while n still counts
    the row)."""
    import pytest

    from quantms_utils_spark.operators.ml import logreg_score, logreg_train

    empty = spark.createDataFrame([], "x0 double, y int")
    with pytest.raises(ValueError, match="empty training frame"):
        logreg_train(empty, ["x0"], "y", n_iter=1)

    withnull = spark.createDataFrame(
        [(1.0, 1), (None, 0), (2.0, 1)], "x0 double, y int"
    )
    with pytest.raises(ValueError, match="NULL"):
        logreg_train(withnull, ["x0"], "y", n_iter=1)

    with pytest.raises(ValueError, match="non-empty"):
        logreg_score([], [])
    with pytest.raises(ValueError, match="weights"):
        logreg_score(["x0"], [0.1, 0.2])


def test_logreg_train_rejects_zero_iterations(spark):
    """Round-11 (ADVICE r10): the empty/NULL probe rides in iteration 0,
    so n_iter=0 (or negative) would skip validation entirely and silently
    return all-zero weights — rejected at entry instead."""
    import pytest

    from quantms_utils_spark.operators.ml import logreg_train

    df = spark.createDataFrame([(1.0, 1), (2.0, 0)], "x0 double, y int")
    with pytest.raises(ValueError, match="n_iter must be >= 1"):
        logreg_train(df, ["x0"], "y", n_iter=0)
    with pytest.raises(ValueError, match="n_iter must be >= 1"):
        logreg_train(df, ["x0"], "y", n_iter=-3)


def test_population_stability_rejects_negative_smoothing(spark):
    import pytest

    from quantms_utils_spark.operators.ml import population_stability

    a = spark.createDataFrame([(1,)], "bin int")
    with pytest.raises(ValueError, match="smoothing"):
        population_stability(a, a, smoothing=-1.0)
