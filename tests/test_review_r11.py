"""Round-11 adversarial-review regressions: windows / joins / skew /
bucketing / sinks / expectations — the last operator families that had
never been reviewed at full effort (VERDICT r10 item 1). Each test pins
one concrete silent-wrongness class found in the review."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_interpolate_ignores_anchor_with_null_xy(spark):
    """An anchor row with NULL y (or x) must be skipped ENTIRELY: before
    the fix, last(ignorenulls) skipped the NULL y but still took that
    anchor's x, silently lerping one anchor's x against an older anchor's
    y."""
    from quantms_utils_spark.operators.windows import interpolate_at

    rows = [
        ("r", 0.0, 10.0, True),
        ("r", 1.0, None, True),   # corrupt anchor: must not desync pairs
        ("r", 2.0, 30.0, True),
        ("r", 1.5, None, False),  # probe between anchors 0 and 2
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double, a boolean")
    out = {
        r["x"]: r["interp"]
        for r in interpolate_at(df, F.col("a"), "x", "y", ["k"], ["x"]).collect()
    }
    # lerp between (0, 10) and (2, 30) at x=1.5 -> 25; the broken pairing
    # lerped between prev=(x=1, y=10) and next=(2, 30) -> 20
    assert out[1.5] == pytest.approx(25.0)


def test_weighted_quantile_raises_on_bad_rows(spark):
    """NULL value/weight and negative weight rows raise instead of
    silently shifting the quantile (a NULL value sorts first while its
    weight still moves the cumulative curve; negative weights make the
    running sum non-monotone)."""
    from quantms_utils_spark.operators.windows import weighted_quantile

    good = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 5.0, 1.0), ("a", 3.0, 1.0)],
        "g string, v double, w double",
    )
    row = weighted_quantile(good, ["g"], "v", "w", q=0.5).collect()[0]
    assert row["v_q"] == pytest.approx(1.0)  # cw 2 >= 0.5*4

    for bad_row in [("a", None, 1.0), ("a", 1.0, None), ("a", 1.0, -2.0)]:
        bad = spark.createDataFrame([bad_row], "g string, v double, w double")
        with pytest.raises(Exception, match="weighted_quantile"):
            weighted_quantile(bad, ["g"], "v", "w").collect()


def test_asof_join_null_ts_and_null_key_match_sql_semantics(spark):
    """Right rows with NULL ts or NULL key can never match (SQL: NULL <= t
    is never true, join equality is null-unsafe). Before the fix the
    window formulation grouped NULL keys together and sorted NULL
    timestamps first, handing NULL-ts left rows a NULL-ts right payload."""
    from quantms_utils_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", None), (3, None, 10.0)],
        "id long, k string, ts double",
    )
    right = spark.createDataFrame(
        [("u", None, "bad_null_ts"), (None, 5.0, "bad_null_key"),
         ("u", 7.0, "good")],
        "k string, ts double, payload string",
    )
    got = {
        r["id"]: r["payload"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_value_cols=["payload"],
        ).collect()
    }
    assert got[1] == "good"   # 7.0 <= 10.0
    assert got[2] is None     # NULL left ts matches nothing
    assert got[3] is None     # NULL left key matches nothing


def test_interval_overlap_join_rejects_suffix_collision_and_bad_width(spark):
    from quantms_utils_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(0.0, 1.0, "x")], "lo double, hi double, score_r string"
    )
    right = spark.createDataFrame(
        [(0.5, 2.0, "y")], "lo double, hi double, score string"
    )
    with pytest.raises(ValueError, match="collide"):
        interval_overlap_join(left, right, lo_col="lo", hi_col="hi", bin_width=1.0)
    with pytest.raises(ValueError, match="bin_width"):
        interval_overlap_join(
            left.drop("score_r"), right, lo_col="lo", hi_col="hi", bin_width=0.0
        )


def test_salted_join_rejects_reserved_salt_column(spark):
    from quantms_utils_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a")], "k int, _salt string")
    small = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(big, small, on=["k"])


def test_key_skew_profile_ratio_runs_in_double(spark):
    """The max·n_keys product runs in double (long·long wraps past 2^63 at
    100 TB cardinalities); values still agree exactly on small counts."""
    from quantms_utils_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 2, "k string"
    )
    row = key_skew_profile(df, "k").collect()[0]
    assert row["skew_ratio"] == pytest.approx(6 * 2 / 8, abs=1e-4)
    assert row["top_key_share"] == pytest.approx(6 / 8, abs=1e-6)


def test_bucketed_join_validates_bucket_specs(spark, tmp_path):
    """Mismatched (or missing) bucket specs raise instead of silently
    re-shuffling both sides — the cost this operator exists to amortize."""
    from quantms_utils_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    df = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    spark.sql("DROP TABLE IF EXISTS r11_b8")
    spark.sql("DROP TABLE IF EXISTS r11_b4")
    spark.sql("DROP TABLE IF EXISTS r11_plain")
    write_bucketed(df, "r11_b8", 8, "k", path=str(tmp_path / "b8"))
    write_bucketed(df, "r11_b4", 4, "k", path=str(tmp_path / "b4"))
    df.write.option("path", str(tmp_path / "plain")).saveAsTable("r11_plain")
    try:
        with pytest.raises(ValueError, match="incompatible bucket specs"):
            bucketed_join(spark, "r11_b8", "r11_b4", on=["k"])
        with pytest.raises(ValueError, match="incompatible bucket specs"):
            bucketed_join(spark, "r11_b8", "r11_plain", on=["k"])
        # matching specs pass; validate=False accepts anything
        assert bucketed_join(spark, "r11_b8", "r11_b8", on=["k"]).count() == 2
        assert (
            bucketed_join(
                spark, "r11_b8", "r11_plain", on=["k"], validate=False
            ).count()
            == 2
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS r11_b8")
        spark.sql("DROP TABLE IF EXISTS r11_b4")
        spark.sql("DROP TABLE IF EXISTS r11_plain")


def test_write_single_csv_rejects_uri_targets(spark, tmp_path):
    """Path('s3://…') silently collapses '//' — URI targets are rejected
    loudly; local targets still work."""
    from quantms_utils_spark.sinks import write_single_csv

    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="LOCAL filesystem"):
        write_single_csv(df, "s3://bucket/out.csv")
    out = write_single_csv(df, tmp_path / "ok.csv")
    assert (tmp_path / "ok.csv").read_text().splitlines()[0] == "k,v"
    assert out.endswith("ok.csv")


def test_write_parquet_observed_rejects_empty_metrics(spark, tmp_path):
    from quantms_utils_spark.sinks import write_parquet_observed

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="at least one metric"):
        write_parquet_observed(df, tmp_path / "t.parquet", {})


def test_expectation_validates_params():
    """A parameterized rule with no params raises a clear ValueError at
    construction instead of a bare IndexError at expression compile."""
    from quantms_utils_spark.operators.expectations import Expectation

    with pytest.raises(ValueError, match="exactly one param"):
        Expectation("r", "min", "c")
    with pytest.raises(ValueError, match="exactly one param"):
        Expectation("r", "matches", "c", params=("a", "b"))
    with pytest.raises(ValueError, match="at least one allowed"):
        Expectation("r", "accepted", "c")
    # valid forms still construct
    Expectation("r", "min", "c", params=(1,))
    Expectation("r", "accepted", "c", params=("x",))
