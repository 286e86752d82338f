"""Round-12 regression tests for the ADVICE r11 findings:

1. bucketed_join validates bucket columns against the JOIN keys, not just
   against each other — two tables both bucketed on k joined on=['v'] used
   to pass validation yet silently shuffle both sides.
2. range_join_binned / interval_overlap_join reject inputs already carrying
   the reserved "__bin" column (same hazard class as salted_join's "_salt").
3. The dedup cache policy gains an EXPLICIT lifetime API — release_caches()
   and cache_scope() — alongside the GC finalizer, so the idiomatic
   derive-and-rebind pattern keeps the single-pass guarantee.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quantms_utils_spark.operators.bucketing import bucketed_join, write_bucketed
from quantms_utils_spark.operators.dedup import (
    cache_scope,
    lsh_candidate_pairs,
    minhash_signatures,
    release_caches,
)
from quantms_utils_spark.operators.joins import (
    interval_overlap_join,
    range_join_binned,
)
from quantms_utils_spark.tables import load

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- bucketing


@pytest.fixture(scope="module")
def mismatched_key_tables(spark):
    l = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    r = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    write_bucketed(l, "b12_left", 8, "l_orderkey")
    write_bucketed(r, "b12_right", 8, "l_orderkey")
    yield "b12_left", "b12_right"
    spark.sql("DROP TABLE IF EXISTS b12_left")
    spark.sql("DROP TABLE IF EXISTS b12_right")


def test_bucketed_join_rejects_keys_not_covering_bucket_cols(
    spark, mismatched_key_tables
):
    """Both tables bucketed on l_orderkey but joined on l_suppkey: the old
    spec-vs-spec check passed this and silently shuffled both sides."""
    lt, rt = mismatched_key_tables
    with pytest.raises(ValueError, match="not a subset of the join keys"):
        bucketed_join(spark, lt, rt, on=["l_suppkey"])


def test_bucketed_join_allows_superset_join_keys(spark, mismatched_key_tables):
    """Joining on (bucket col + extra col) still elides the exchange — the
    bucket distribution satisfies a superset equi-join — so it must pass."""
    lt, rt = mismatched_key_tables
    out = bucketed_join(spark, lt, rt, on=["l_orderkey", "l_suppkey"])
    assert out.count() > 0


def test_bucketed_join_validate_false_still_permits_mismatch(
    spark, mismatched_key_tables
):
    lt, rt = mismatched_key_tables
    out = bucketed_join(spark, lt, rt, on=["l_suppkey"], validate=False)
    assert out.count() > 0


# ------------------------------------------------------- reserved __bin col


def test_range_join_binned_rejects_reserved_bin_column(spark):
    iv = spark.createDataFrame(
        [(1, 0.0, 10.0, 99)], "id long, lo double, hi double, __bin long"
    )
    pt = spark.createDataFrame([(1, 5.0)], "pid long, x double")
    with pytest.raises(ValueError, match="__bin.*reserved"):
        range_join_binned(
            iv, pt, lo_col="lo", hi_col="hi", point_col="x", bin_width=1.0
        )
    with pytest.raises(ValueError, match="__bin.*reserved"):
        range_join_binned(
            iv.drop("__bin"),
            pt.withColumn("__bin", F.lit(0)),
            lo_col="lo",
            hi_col="hi",
            point_col="x",
            bin_width=1.0,
        )


def test_interval_overlap_join_rejects_reserved_bin_column(spark):
    left = spark.createDataFrame(
        [(1, 0.0, 10.0, 7)], "id long, lo double, hi double, __bin long"
    )
    right = spark.createDataFrame([(2, 5.0, 15.0)], "rid long, lo double, hi double")
    with pytest.raises(ValueError, match="__bin.*reserved"):
        interval_overlap_join(left, right, lo_col="lo", hi_col="hi", bin_width=5.0)
    with pytest.raises(ValueError, match="__bin.*reserved"):
        interval_overlap_join(
            right, left, lo_col="lo", hi_col="hi", bin_width=5.0
        )


# ----------------------------------------------------- explicit cache scope


def _dup_docs(spark):
    return spark.createDataFrame(
        [(i, "common words shared by every copy of this page here") for i in range(6)]
        + [(20, "a unique document with entirely different tokens inside")],
        "doc_id long, text string",
    )


def test_release_caches_explicit_and_idempotent(spark):
    spark.catalog.clearCache()
    sigs = minhash_signatures(_dup_docs(spark), "doc_id", "text", n_hashes=8)
    pairs = lsh_candidate_pairs(sigs, "doc_id", 8, 2, max_bucket=10)
    pairs.collect()
    assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert release_caches(pairs) is True
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert release_caches(pairs) is False  # idempotent
    # a frame that never carried a pin returns False too, but WARNS
    # (ADVICE r13: a mis-targeted release must be detectable)
    with pytest.warns(RuntimeWarning, match="no pinned cache"):
        assert release_caches(sigs) is False


def test_cache_scope_survives_rebind_then_releases(spark):
    """The documented sharp edge: rebinding to a derived frame used to drop
    the cache mid-block. Inside cache_scope the pin outlives the rebind;
    on exit it is released."""
    spark.catalog.clearCache()
    sigs = minhash_signatures(_dup_docs(spark), "doc_id", "text", n_hashes=8)
    with cache_scope(lsh_candidate_pairs(sigs, "doc_id", 8, 2, max_bucket=10)) as pairs:
        pairs = pairs.filter(F.col("doc_a") >= 0)  # idiomatic rebind
        assert pairs.count() > 0
        assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


# --------------------------------------------------- knn tie-cluster fix


def test_knn_self_join_duplicate_embeddings_tie_break(spark):
    """Round-12 review fix: 30 identical vectors in one block — every
    pairwise cosine is exactly 1.0, a tie cluster far wider than any
    fixed emission margin. The contract (rank by rounded score desc,
    neighbor id asc) demands each row's neighbors be the k smallest
    OTHER ids; the old k+8 argpartition margin returned arbitrary ids."""
    from quantms_utils_spark.operators.similarity import knn_self_join

    rows = [(i, 0, [1.0, 0.0, 0.0, 0.0]) for i in range(30)]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    for nb in (1, 4):
        out = knn_self_join(
            df, "vec_id", "embedding", "label", k=3, n_buckets=nb
        )
        got = {}
        for r in out.collect():
            got.setdefault(r["vec_id"], []).append((r["rank"], r["neighbor_id"]))
        for i in range(30):
            want = sorted(set(range(30)) - {i})[:3]
            have = [n for _, n in sorted(got[i])]
            assert have == want, (nb, i, have, want)
