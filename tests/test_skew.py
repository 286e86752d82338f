"""Skew operators: salted join must be row-identical to the plain join, and
hot-key detection must rank by frequency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quantms_utils_spark.operators.skew import hot_keys, salted_join
from quantms_utils_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    l = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    return l, o


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_join_matches_plain(tables):
    l, o = tables
    plain = l.join(o, l.l_orderkey == o.o_orderkey)
    salted = salted_join(
        l, o.withColumnRenamed("o_orderkey", "l_orderkey"), on=["l_orderkey"]
    )
    assert _rows(salted) == _rows(
        plain.select("l_orderkey", "l_quantity", "o_orderkey", "o_orderpriority")
        .drop("o_orderkey")
        .select("l_orderkey", "l_quantity", "o_orderpriority")
    )


def test_salted_left_join_matches_plain(spark, tables):
    l, o = tables
    # restrict the small side so some big-side rows miss
    o_half = o.filter(F.col("o_orderkey") % 2 == 0).withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    plain = l.join(o_half, "l_orderkey", "left")
    salted = salted_join(l, o_half, on=["l_orderkey"], how="left")
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_join_rejects_unsupported_how(tables):
    l, o = tables
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(l, o, on=["l_orderkey"], how="full")


def test_hot_keys_ranking(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 10 + [("c",)] * 2, schema="k string"
    )
    got = [(r["k"], r["n_rows"]) for r in hot_keys(df, ["k"], min_count=5).collect()]
    assert got == [("a", 50), ("b", 10)]


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation: a 4-chain, a triangle, and an isolated edge all
    collapse to their minimum member; iteration count bounded by diameter."""
    from quantms_utils_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),  # triangle
         (20, 21)],                     # lone edge
        "src long, dst long",
    )
    got = {
        (r["v"], r["label"])
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_jaccard_for_pairs_keeps_short_doc_pairs(spark):
    """A candidate pair whose doc is too short to shingle must come back as
    jaccard 0, not silently vanish (the verify contract: one output row per
    input pair passing the threshold)."""
    from quantms_utils_spark.operators.dedup import jaccard_for_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "hi")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    got = jaccard_for_pairs(docs, pairs, "doc_id", "text", n=3, threshold=0.0)
    assert [tuple(r) for r in got.collect()] == [(1, 2, 0.0)]
