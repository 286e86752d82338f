"""Two-phase global rank (operators/rank.py): equivalence with the
single-partition window on small data, plus the scale-shape contracts the
operator exists for — multi-partition output (no global funnel) and a
bounded driver footprint (offsets only)."""

import pytest
from pyspark.sql import Row, Window, functions as F

from quantms_utils_spark.operators.rank import (
    global_percent_rank,
    global_rank,
    global_row_number,
)


def _data(spark, n=997, dup_every=7):
    # values collide every `dup_every` rows so rank() has real tie groups
    rows = [Row(id=i, v=(i * 37) % (n // dup_every)) for i in range(n)]
    return spark.createDataFrame(rows).repartition(8)


def test_row_number_matches_window(spark):
    df = _data(spark)
    order = [F.col("v").desc(), F.col("id")]
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(
            df, order, rank_col="rn", num_partitions=8
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_rank_ties_share_and_gap(spark):
    df = _data(spark)
    order = [F.col("v").desc(), F.col("id")]
    got = {
        r["id"]: r["rk"]
        for r in global_rank(
            df, order, ["v"], rank_col="rk", num_partitions=8
        ).collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.rank().over(Window.orderBy(F.col("v").desc()))
        ).collect()
    }
    assert got == want


def test_percent_rank_matches_window(spark):
    df = _data(spark, n=211)
    order = [F.col("v").asc(), F.col("id")]
    got = {
        r["id"]: r["pr"]
        for r in global_percent_rank(
            df, order, rank_col="pr", num_partitions=5
        ).collect()
    }
    want = {
        r["id"]: r["pr"]
        for r in df.withColumn(
            "pr", F.percent_rank().over(Window.orderBy(*order))
        ).collect()
    }
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_no_single_partition_funnel(spark):
    # the whole point: the ranked output must NOT sit in one partition
    df = _data(spark, n=2000)
    out = global_row_number(
        df, [F.col("v"), F.col("id")], num_partitions=8
    ).withColumn("p", F.spark_partition_id())
    per_part = out.groupBy("p").count().collect()
    assert len(per_part) > 1
    assert max(r["count"] for r in per_part) < 2000


def test_column_order_and_type(spark):
    df = _data(spark, n=50)
    out = global_row_number(df, [F.col("id")], rank_col="r", num_partitions=3)
    assert out.columns == ["id", "v", "r"]
    assert dict(out.dtypes)["r"] == "bigint"


def test_empty_and_single_row(spark):
    df = _data(spark, n=50).filter("id < 0")
    assert global_row_number(df, [F.col("id")], num_partitions=4).count() == 0
    one = _data(spark, n=50).filter("id = 7")
    got = global_percent_rank(one, [F.col("id")], num_partitions=4).collect()
    assert len(got) == 1 and got[0]["pr"] == 0.0


@pytest.mark.parametrize("n,k", [(100, 10), (97, 10), (7, 16), (160, 16)])
def test_ntile_matches_window(spark, n, k):
    from quantms_utils_spark.operators.rank import global_ntile

    df = _data(spark, n=n)
    order = [F.col("v").desc(), F.col("id")]
    got = {
        r["id"]: r["b"]
        for r in global_ntile(
            df, order, k, bucket_col="b", num_partitions=6
        ).collect()
    }
    want = {
        r["id"]: r["b"]
        for r in df.withColumn(
            "b", F.ntile(k).over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


import os


@pytest.mark.skipif(
    os.environ.get("RUN_SCALE_TESTS") != "1",
    reason="stress tier: set RUN_SCALE_TESTS=1",
)
def test_two_phase_matches_window_at_millions(spark):
    """Stress equivalence: 3M rows with a skewed sort key (10% of rows
    share one hot value, fully tie-broken by id) — the two-phase rank
    must agree with the single-partition window EXACTLY, and its output
    must remain spread over many partitions."""
    df = (
        spark.range(0, 3_000_000)
        .select(
            F.col("id"),
            F.when(F.col("id") % 10 == 0, F.lit(7))
            .otherwise(F.xxhash64("id") % 100_000)
            .alias("v"),
        )
        .repartition(32)
    )
    order = [F.col("v"), F.col("id")]
    two = global_row_number(df, order, rank_col="rn", num_partitions=32)
    win = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    # full row-by-row join compare would shuffle 2×3M — compare exact
    # checksums instead (equal iff the (id → rn) maps are identical,
    # modulo a 64-bit collision). rn is cast to long on BOTH sides:
    # xxhash64 is type-sensitive and row_number() yields int while the
    # two-phase rank yields bigint.
    chk = lambda d: d.agg(
        F.sum(
            F.xxhash64("id", F.col("rn").cast("long")).cast("decimal(38,0)")
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    a, b = chk(two), chk(win)
    assert a["n"] == b["n"] == 3_000_000
    assert a["s"] == b["s"]
    parts = two.withColumn("p", F.spark_partition_id()).select("p").distinct().count()
    assert parts > 8


def test_reserved_column_clash_raises(spark):
    df = _data(spark, n=10).withColumnRenamed("v", "_gr_rn")
    with pytest.raises(ValueError, match="reserves column"):
        global_row_number(df, [F.col("id")])


def test_rank_null_tie_values_match_window(spark):
    """NULL tie-column values must rank exactly like rank() OVER — the
    merge join is null-safe, so null-keyed rows are never dropped
    (round-6 ADVICE fix)."""
    from pyspark.sql import Window

    from quantms_utils_spark.operators.rank import global_rank

    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 13)
        .alias("score"),
    )
    got = global_rank(
        df,
        [F.col("score").asc_nulls_first(), F.col("id").asc()],
        ["score"],
        rank_col="rnk",
        num_partitions=8,
    )
    want = df.withColumn(
        "rnk",
        F.rank().over(Window.orderBy(F.col("score").asc_nulls_first())),
    )
    a = sorted(map(tuple, got.select("id", "score", "rnk").collect()))
    b = sorted(map(tuple, want.select("id", "score", "rnk").collect()))
    assert a == b
    assert got.count() == 200  # null rows present, not join-dropped
