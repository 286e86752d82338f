"""Snapshot diff (CDC table comparison) tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from quantms_utils_spark.operators.diff import table_diff


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, v="a", n=1.0),
            Row(k=2, v="b", n=2.0),
            Row(k=3, v="c", n=None),
            Row(k=4, v=None, n=4.0),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, v="a", n=1.0),      # unchanged
            Row(k=2, v="B", n=2.0),      # updated (string)
            Row(k=3, v="c", n=3.0),      # updated (null -> value)
            Row(k=5, v="e", n=5.0),      # inserted; k=4 deleted
        ]
    )
    return old, new


def test_table_diff_statuses(spark, snaps):
    old, new = snaps
    got = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: "updated", 3: "updated", 4: "deleted", 5: "inserted"}


def test_table_diff_include_unchanged(spark, snaps):
    old, new = snaps
    got = {
        r["k"]: r["status"]
        for r in table_diff(old, new, ["k"], include_unchanged=True).collect()
    }
    assert got[1] == "unchanged" and len(got) == 5


def test_table_diff_null_vs_null_is_unchanged(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, None)], "k long, v string")
    assert table_diff(old, new, ["k"]).count() == 0


def test_table_diff_validation(spark, snaps):
    old, new = snaps
    with pytest.raises(ValueError):
        table_diff(old, new, [])
    with pytest.raises(ValueError):
        table_diff(old, new.drop("n"), ["k"])


def test_table_diff_keys_only_table(spark):
    # degenerate: no non-key columns -> presence/absence only
    old = spark.createDataFrame([Row(k=1), Row(k=2)])
    new = spark.createDataFrame([Row(k=2), Row(k=3)])
    got = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {1: "deleted", 3: "inserted"}


def test_table_diff_exact_mode(spark, snaps):
    old, new = snaps
    got = {
        r["k"]: r["status"]
        for r in table_diff(old, new, ["k"], exact=True).collect()
    }
    assert got == {2: "updated", 3: "updated", 4: "deleted", 5: "inserted"}


def test_table_diff_exact_sentinel_not_confusable(spark):
    # a real value equal to the hash mode's null sentinel: exact mode must
    # still see the NULL -> "\x00null" transition as an update
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "\x00null")], "k long, v string")
    assert table_diff(old, new, ["k"], exact=True).collect()[0][
        "status"
    ] == "updated"


def test_table_diff_rejects_map_columns(spark):
    old = spark.createDataFrame([(1, {"a": 1})], "k long, m map<string,int>")
    new = spark.createDataFrame([(1, {"a": 2})], "k long, m map<string,int>")
    with pytest.raises(ValueError, match="map-typed"):
        table_diff(old, new, ["k"])
    with pytest.raises(ValueError, match="map-typed"):
        table_diff(old, new, ["k"], exact=True)


def test_maintain_count_sum_matches_direct_rebuild(spark):
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.diff import maintain_count_sum

    old = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g2", 30.0), (4, "g2", 5.0)],
        "k long, g string, v double",
    )
    # 1 deleted; 2 updated in place; 3 updated AND MOVED g2->g1; 5 inserted
    new = spark.createDataFrame(
        [(2, "g1", 25.0), (3, "g1", 31.0), (4, "g2", 5.0), (5, "g3", 7.0)],
        "k long, g string, v double",
    )
    got = {
        r["g"]: (r["n_rows"], float(r["total"]))
        for r in maintain_count_sum(old, new, ["k"], "g", "v").collect()
    }
    direct = {
        r["g"]: (r["n"], float(r["s"]))
        for r in new.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    }
    assert got == direct
    assert got["g1"] == (2, 56.0)  # moved row lands in its NEW group


def test_maintain_count_sum_drops_emptied_groups(spark):
    from quantms_utils_spark.operators.diff import maintain_count_sum

    old = spark.createDataFrame([(1, "g1", 10.0)], "k long, g string, v double")
    new = spark.createDataFrame([], "k long, g string, v double")
    assert maintain_count_sum(old, new, ["k"], "g", "v").count() == 0


def test_merge_upsert_update_insert_keep(spark):
    from quantms_utils_spark.operators.diff import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    source = spark.createDataFrame(
        [(2, "B"), (4, "d")], "k long, v string"
    )
    got = {(r.k, r.v) for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_merge_upsert_delete_flag(spark):
    from quantms_utils_spark.operators.diff import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    source = spark.createDataFrame(
        [(2, "B", False), (3, "x", True), (9, "zz", True)],
        "k long, v string, dead boolean",
    )
    got = {
        (r.k, r.v)
        for r in merge_upsert(
            target, source, ["k"], delete_col="dead"
        ).collect()
    }
    # 3 deleted; 9's flagged row never inserts; 2 updated; 1 kept
    assert got == {(1, "a"), (2, "B")}


def test_merge_upsert_null_delete_flag_means_keep(spark):
    from quantms_utils_spark.operators.diff import merge_upsert

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    source = spark.createDataFrame(
        [(1, "A", None)], "k long, v string, dead boolean"
    )
    got = {
        (r.k, r.v)
        for r in merge_upsert(
            target, source, ["k"], delete_col="dead"
        ).collect()
    }
    assert got == {(1, "A")}


def test_merge_upsert_validation(spark):
    from quantms_utils_spark.operators.diff import merge_upsert

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    bad = spark.createDataFrame([(1, 2.0)], "k long, other double")
    with pytest.raises(ValueError, match="source data columns"):
        merge_upsert(target, bad, ["k"])
    with pytest.raises(ValueError, match="keys"):
        merge_upsert(target, target, [])


def test_table_diff_null_keys_match_null_safely(spark):
    """Round-10 (review): a NULL-key row compares against the other
    snapshot's NULL-key row (one 'updated'/'unchanged' verdict) instead of
    flapping as a phantom delete+insert pair on every diff forever."""
    from quantms_utils_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(None, "a", 5.0), (1, "b", 1.0)], "k int, g string, v double"
    )
    new = spark.createDataFrame(
        [(None, "a", 7.0), (1, "b", 1.0)], "k int, g string, v double"
    )
    for exact in (False, True):
        got = {
            (r["k"], r["status"])
            for r in table_diff(old, new, keys=["k"], exact=exact).collect()
        }
        assert got == {(None, "updated")}
    unchanged = table_diff(
        old, old, keys=["k"], include_unchanged=True
    ).collect()
    assert {(r["k"], r["status"]) for r in unchanged} == {
        (None, "unchanged"), (1, "unchanged"),
    }


def test_maintain_count_sum_null_key_change_reaches_view(spark):
    """Round-10 (review): a changed NULL-key row's retraction/addition must
    reach the standing view — the incremental refresh must equal a fresh
    rebuild of the new snapshot."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.diff import maintain_count_sum

    old = spark.createDataFrame(
        [(None, "a", 5.0), (1, "a", 1.0), (2, "b", 2.0)],
        "k int, g string, v double",
    )
    new = spark.createDataFrame(
        [(None, "b", 7.0), (1, "a", 1.0), (2, "b", 2.0)],
        "k int, g string, v double",
    )
    got = {
        (r["g"], r["n_rows"], float(r["total"]))
        for r in maintain_count_sum(old, new, ["k"], "g", "v").collect()
    }
    want = {
        (r["g"], r["n_rows"], float(r["total"]))
        for r in new.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
        )
        .collect()
    }
    assert got == want
