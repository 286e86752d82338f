"""Bucketed co-located join: identical bucket specs must elide the exchange
(and with sortBy, the sort) on both sides of a sort-merge join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quantms_utils_spark.operators.bucketing import bucketed_join, write_bucketed
from quantms_utils_spark.plans import explain_str
from quantms_utils_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    l = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    o = load(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderpriority"
    )
    write_bucketed(l, "b_lineitem", 8, "l_orderkey")
    write_bucketed(o, "b_orders", 8, "l_orderkey")
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_elides_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, on=["l_orderkey"])
        plan = explain_str(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    lt, rt = bucketed_tables
    l = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    o = load(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderpriority"
    )
    plain = sorted(map(tuple, l.join(o, "l_orderkey").collect()))
    bucketed = sorted(map(tuple, bucketed_join(spark, lt, rt, ["l_orderkey"]).collect()))
    assert bucketed == plain
