"""Weighted sampling (Efraimidis–Spiridakis) and shuffle-key skew profile."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quantms_utils_spark.operators.skew import key_skew_profile
from quantms_utils_spark.operators.text import weighted_sample


def test_weighted_sample_exact_k_and_no_replacement(spark):
    df = spark.createDataFrame(
        [(i, 10.0) for i in range(100)], "id long, w double"
    )
    out = weighted_sample(df, "id", "w", 30).collect()
    ids = [r["id"] for r in out]
    assert len(ids) == 30
    assert len(set(ids)) == 30


def test_weighted_sample_biases_toward_heavy_weights(spark):
    # ids 0..199 weight 1; ids 200..399 weight 50. A 100-row sample must be
    # dominated by the heavy half (binomial tail: P(heavy<=70) ~ 1e-13 at
    # p=50/51), and the md5-keyed draw is deterministic so no flakiness.
    rows = [(i, 1.0) for i in range(200)] + [(i, 50.0) for i in range(200, 400)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample(df, "id", "w", 100).collect()
    heavy = sum(1 for r in out if r["id"] >= 200)
    assert heavy > 70


def test_weighted_sample_drops_nonpositive_and_null_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "id long, w double",
    )
    ids = {r["id"] for r in weighted_sample(df, "id", "w", 10).collect()}
    assert ids == {1, 5}


def test_weighted_sample_deterministic(spark):
    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(500)], "id long, w double"
    ).repartition(13)
    a = sorted(r["id"] for r in weighted_sample(df, "id", "w", 50).collect())
    b = sorted(r["id"] for r in weighted_sample(df, "id", "w", 50).collect())
    assert a == b


def test_weighted_sample_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(100)], "id long, w double"
    )
    plan = weighted_sample(df, "id", "w", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, not a global Sort


def test_key_skew_profile_known_distribution(spark):
    # key 'a' x 8, 'b' x 1, 'c' x 1 → 3 keys, 10 rows, max 8,
    # skew_ratio 8/(10/3)=2.4, top share 0.8
    df = spark.createDataFrame(
        [("a",)] * 8 + [("b",), ("c",)], "k string"
    )
    r = key_skew_profile(df, "k", "t.k").collect()[0]
    assert r["shuffle_key"] == "t.k"
    assert r["n_keys"] == 3
    assert r["n_rows"] == 10
    assert r["max_rows_per_key"] == 8
    assert r["skew_ratio"] == pytest.approx(2.4)
    assert r["top_key_share"] == pytest.approx(0.8)


def test_key_skew_profile_counts_null_as_a_key(spark):
    df = spark.createDataFrame(
        [("a",), (None,), (None,)], "k string"
    )
    r = key_skew_profile(df, "k").collect()[0]
    assert r["n_keys"] == 2
    assert r["max_rows_per_key"] == 2


def test_key_skew_profile_uniform_is_ratio_one(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(25)], "k long")
    r = key_skew_profile(df, "k").collect()[0]
    assert r["skew_ratio"] == pytest.approx(1.0)
