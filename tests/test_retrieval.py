"""BM25 lexical retrieval + reciprocal-rank fusion unit tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from quantms_utils_spark.operators.retrieval import (
    bm25_rank,
    bm25_scores,
    rrf_fuse,
)


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="a b"),
            Row(doc_id=2, text="A a  c"),  # case + whitespace normalization
            Row(doc_id=3, text="b c"),
        ]
    )


def _bm25_expected(tf, df, dl, n_docs, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark, tiny_corpus):
    out = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(tiny_corpus, ["a"]).collect()
    }
    # corpus: dl = 2, 3, 2 → avgdl = 7/3; 'a' appears in docs 1 and 2 (df=2)
    assert set(out) == {1, 2}
    avgdl = 7.0 / 3.0
    assert out[1] == pytest.approx(_bm25_expected(1, 2, 2, 3, avgdl))
    assert out[2] == pytest.approx(_bm25_expected(2, 2, 3, 3, avgdl))


def test_bm25_multi_term_sums(spark, tiny_corpus):
    single_a = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(tiny_corpus, ["a"]).collect()
    }
    single_b = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(tiny_corpus, ["b"]).collect()
    }
    both = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(tiny_corpus, ["a", "b"]).collect()
    }
    assert set(both) == {1, 2, 3}
    for d in both:
        assert both[d] == pytest.approx(
            single_a.get(d, 0.0) + single_b.get(d, 0.0)
        )


def test_bm25_blank_and_nonmatching_absent(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="x y"), Row(doc_id=2, text="   ")]
    )
    assert bm25_scores(df, ["z"]).count() == 0


def test_bm25_rank_deterministic_ties(spark):
    # identical docs → identical scores → rank by doc_id
    df = spark.createDataFrame(
        [Row(doc_id=i, text="a b") for i in (3, 1, 2)]
    )
    ranked = {r["doc_id"]: r["rnk"] for r in bm25_rank(df, ["a"]).collect()}
    assert ranked == {1: 1, 2: 2, 3: 3}


def test_bm25_plan_no_cartesian(spark, tiny_corpus):
    plan = bm25_rank(tiny_corpus, ["a"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame([Row(id=1, rnk=1), Row(id=2, rnk=2)])
    b = spark.createDataFrame([Row(id=2, rnk=1), Row(id=3, rnk=2)])
    out = {r["id"]: r for r in rrf_fuse(a, b, k=60).collect()}
    assert out[1]["rrf"] == pytest.approx(1 / 61)
    assert out[2]["rrf"] == pytest.approx(1 / 62 + 1 / 61)
    assert out[3]["rrf"] == pytest.approx(1 / 62)
    assert out[1]["rank_b"] is None and out[3]["rank_a"] is None


def test_rrf_missing_side_contributes_zero(spark):
    a = spark.createDataFrame([Row(id=7, rnk=1)])
    b = a.filter("id < 0")  # empty
    out = rrf_fuse(a, b, k=10).collect()
    assert len(out) == 1 and out[0]["rrf"] == pytest.approx(1 / 11)


def test_bm25_empty_terms_raises(spark, tiny_corpus):
    with pytest.raises(ValueError):
        bm25_scores(tiny_corpus, [])


def test_inverted_postings_hand_computed(spark, tiny_corpus):
    from quantms_utils_spark.operators.retrieval import inverted_postings

    rows = {
        (r["term"], r["doc_id"]): (r["tf"], r["first_pos"], r["df"])
        for r in inverted_postings(tiny_corpus).collect()
    }
    # corpus: d1="a b", d2="a a c" (normalized), d3="b c"
    assert rows[("a", 1)] == (1, 1, 2)
    assert rows[("a", 2)] == (2, 1, 2)  # tf 2, first at position 1
    assert rows[("b", 1)] == (1, 2, 2)
    assert rows[("b", 3)] == (1, 1, 2)
    assert rows[("c", 2)] == (1, 3, 2)
    assert rows[("c", 3)] == (1, 2, 2)


def test_inverted_postings_df_band(spark):
    from pyspark.sql import Row

    from quantms_utils_spark.operators.retrieval import inverted_postings

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common rare"),
            Row(doc_id=2, text="common"),
            Row(doc_id=3, text="common"),
        ]
    )
    terms = {
        r["term"] for r in inverted_postings(df, min_df=2, max_df=2).collect()
    }
    assert terms == set()  # 'common' df=3 > max, 'rare' df=1 < min
    terms = {
        r["term"] for r in inverted_postings(df, min_df=1, max_df=1).collect()
    }
    assert terms == {"rare"}


def test_bm25_query_terms_normalized_and_bag_weighted(spark):
    """Round-9 (review findings): uppercase/whitespace query terms must
    match the lowercased token stream (previously silently empty), and a
    term repeated in the query must weight its contribution by its query
    frequency (bag semantics per the docstring)."""
    from quantms_utils_spark.operators.retrieval import bm25_scores

    docs = spark.createDataFrame(
        [(1, "apple pie recipe"), (2, "apple apple tart"), (3, "banana")],
        "doc_id long, text string",
    )
    plain = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["apple"]).collect()}
    upper = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, [" Apple "]).collect()}
    assert plain and upper == plain  # normalization: same ranking

    doubled = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, ["apple", "apple"]).collect()
    }
    assert set(doubled) == set(plain)
    for k in plain:
        assert abs(doubled[k] - 2 * plain[k]) < 1e-12  # qf multiplies


def test_inverted_postings_max_df_strips_whales_same_result(spark):
    """Round-9: the salted whale pre-pass must return exactly the rows
    the plain window + post-filter formulation returns."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.retrieval import inverted_postings

    docs = spark.createDataFrame(
        [(i, "the common words " + ("rare " if i == 0 else "")) for i in range(30)],
        "doc_id long, text string",
    )
    got = sorted(
        map(tuple, inverted_postings(docs, max_df=10).collect())
    )
    # 'the'/'common'/'words' appear in all 30 docs -> stripped; 'rare' stays
    assert got == [("rare", 0, 1, 4, 1)]
    # and min_df-only path is untouched
    all_terms = {
        r["term"] for r in inverted_postings(docs, min_df=1).collect()
    }
    assert all_terms == {"the", "common", "words", "rare"}
