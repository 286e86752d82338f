"""Spark 4 SQL-surface pins: declarative features a reference user's SQL
layer would reach for, proven equivalent to the engine's DataFrame forms.

- SQL UDFs (CREATE TEMPORARY FUNCTION … RETURN expr): the function body
  is inlined into the plan by Catalyst — same optimization surface as
  writing the expression by hand, which the plan assertion pins (no
  Python evaluation node appears).
- Session variables (DECLARE / SET VAR): parameterizing a query without
  string interpolation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    for t in ("lineitem", "events"):
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    return spark


def test_sql_udf_inlines_and_matches_dataframe_expr(tables):
    spark = tables
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_rev(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    via_udf = spark.sql(
        "SELECT l_returnflag, round(sum(disc_rev(l_extendedprice, l_discount)), 2) AS rev "
        "FROM lineitem GROUP BY 1 ORDER BY 1"
    )
    via_df = (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev")
        )
        .orderBy("l_returnflag")
    )
    assert [tuple(r) for r in via_udf.collect()] == [
        tuple(r) for r in via_df.collect()
    ]
    # the SQL UDF body is INLINED — no Python eval node in the plan
    plan = via_udf._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_session_variable_parameterizes_query(tables):
    spark = tables
    spark.sql("DECLARE OR REPLACE min_val DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR min_val = 50.0")
    got = spark.sql(
        "SELECT count(*) AS n FROM events WHERE value > min_val"
    ).first()["n"]
    expect = spark.table("events").filter(F.col("value") > 50.0).count()
    assert got == expect > 0
    # re-SET changes the result without re-building the query string
    spark.sql("SET VAR min_val = 1e9")
    assert spark.sql(
        "SELECT count(*) AS n FROM events WHERE value > min_val"
    ).first()["n"] == 0


def test_parameterized_sql_named_markers(tables):
    """spark.sql named parameter markers — injection-safe query
    parameterization; equivalent to the literal-inlined form."""
    spark = tables
    got = spark.sql(
        "SELECT count(*) AS n FROM events WHERE event_type = :t AND value > :v",
        args={"t": "purchase", "v": 50.0},
    ).first()["n"]
    expect = spark.sql(
        "SELECT count(*) AS n FROM events WHERE event_type = 'purchase' AND value > 50.0"
    ).first()["n"]
    assert got == expect > 0
