"""Unit tests for the sketch operators (Bloom, Count-Min) and SemDeDup."""

from __future__ import annotations

from pyspark.sql import functions as F

from quantms_utils_spark.operators.sketches import (
    bloom_bit_positions,
    bloom_decontaminate,
    bloom_probe,
    cms_build,
    cms_estimate,
)
from quantms_utils_spark.operators.similarity import semantic_dedup


def test_bloom_no_false_negatives(spark):
    """Every inserted value must probe true — for ANY filter size."""
    vals = spark.createDataFrame([(f"v{i}",) for i in range(200)], "g string")
    for n_bits in (64, 1 << 16):  # tiny filter forces bit sharing
        bloom = bloom_bit_positions(vals, "g", n_hashes=3, n_bits=n_bits)
        probed = bloom_probe(vals, bloom, ["g"], "g", 3, n_bits)
        assert probed.where(~F.col("bloom_hit")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Non-members: a roomy filter stays near-clean, a tiny one saturates."""
    members = spark.createDataFrame([(f"in{i}",) for i in range(100)], "g string")
    others = spark.createDataFrame([(f"out{i}",) for i in range(500)], "g string")
    roomy = bloom_bit_positions(members, "g", n_hashes=3, n_bits=1 << 20)
    fp = (
        bloom_probe(others, roomy, ["g"], "g", 3, 1 << 20)
        .where(F.col("bloom_hit"))
        .count()
    )
    # (1 - e^{-kn/m})^k at k=3, n=100, m=2^20 is ~2e-11 — 0 in practice
    assert fp == 0
    packed = bloom_bit_positions(members, "g", n_hashes=3, n_bits=32)
    fp_packed = (
        bloom_probe(others, packed, ["g"], "g", 3, 32)
        .where(F.col("bloom_hit"))
        .count()
    )
    assert fp_packed > 0  # saturation sanity: the tiny filter does collide


def test_bloom_decontaminate_flags_shared_grams(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words in this training document here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "quick brown fox jumps over")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in bloom_decontaminate(
            train, bench, "doc_id", "text", ngram_n=5
        ).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_overlap"] == 1
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
    for row in out.values():
        assert row["bloom_no_false_negative"]
        assert row["bloom_covers_exact"]


def test_cms_overestimates_within_bound(spark):
    import math

    rows = [(f"t{i % 37}",) for i in range(1000)] + [("whale",)] * 500
    toks = spark.createDataFrame(rows, "tok string")
    depth, width = 3, 256
    sketch = cms_build(toks, "tok", depth, width)
    # sketch is bounded by depth x width cells and each row's cells sum to N
    cells = sketch.collect()
    assert len(cells) <= depth * width
    n_total = toks.count()
    per_row = {}
    for c in cells:
        per_row[c["cms_row"]] = per_row.get(c["cms_row"], 0) + c["cms_cnt"]
    assert all(v == n_total for v in per_row.values())

    exact = {r["tok"]: r["cnt"] for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    probes = toks.select("tok").distinct()
    est = {
        r["tok"]: r["cms_est"]
        for r in cms_estimate(sketch, probes, "tok", depth, width).collect()
    }
    bound = math.e * n_total / width
    for tok, cnt in exact.items():
        assert est[tok] >= cnt  # CMS never undercounts
        assert est[tok] - cnt <= bound


def test_cms_absent_token_estimates_small(spark):
    toks = spark.createDataFrame([(f"t{i}",) for i in range(100)], "tok string")
    sketch = cms_build(toks, "tok", 3, 1024)
    ghosts = spark.createDataFrame([("never-seen",)], "tok string")
    [row] = cms_estimate(sketch, ghosts, "tok", 3, 1024).collect()
    # est for an absent value is >= 0 and bounded by collisions only
    assert 0 <= row["cms_est"] <= 3


def test_semantic_dedup_min_id_keeper(spark):
    # block 0: 1 ~ 2 ~ 3 (identical), 4 orthogonal; block 1: 5 alone
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.0]),
        (3, 0, [1.0, 0.0]),
        (4, 0, [0.0, 1.0]),
        (5, 1, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, cell int, embedding array<double>"
    )
    out = {
        r["vec_id"]: r.asDict()
        for r in semantic_dedup(
            df, "vec_id", "embedding", "cell", threshold=0.9
        ).collect()
    }
    assert not out[1]["is_dup"] and out[1]["dup_of"] is None
    assert out[2]["dup_of"] == 1 and out[2]["is_dup"]
    assert out[3]["dup_of"] == 1
    assert not out[4]["is_dup"]  # orthogonal survives in the same block
    assert not out[5]["is_dup"]  # other block never pairs across


class TestKMV:
    """KMV (k-minimum-values): the distinct sketch with native set
    INTERSECTION — mergeability and estimator contracts."""

    def _sets(self, spark):
        from pyspark.sql import functions as F

        return (
            spark.range(0, 3000)
            .select(F.lit("A").alias("g"), F.col("id").alias("v"))
            .union(
                spark.range(1500, 5500).select(
                    F.lit("B").alias("g"), F.col("id").alias("v")
                )
            )
        )

    def test_merge_equals_direct_bit_identical(self, spark):
        from pyspark.sql import functions as F

        from quantms_utils_spark.operators.sketches import kmv_merge, kmv_sketch

        df = self._sets(spark)
        per_group = kmv_sketch(df, ["g"], "v", k=128)
        merged = kmv_merge(
            per_group.select(F.lit("all").alias("g"), "kmv"), ["g"], k=128
        ).collect()[0]["kmv"]
        direct = kmv_sketch(
            df.select(F.lit("all").alias("g"), "v"), ["g"], "v", k=128
        ).collect()[0]["kmv"]
        assert merged == direct  # k smallest of union == merge of k smallest

    def test_distinct_estimator(self, spark):
        from pyspark.sql import functions as F

        from quantms_utils_spark.operators.sketches import (
            kmv_distinct_estimate,
            kmv_sketch,
        )

        df = self._sets(spark)
        est = {
            r["g"]: r["e"]
            for r in kmv_sketch(df, ["g"], "v", k=256)
            .select("g", kmv_distinct_estimate(F.col("kmv"), 256).alias("e"))
            .collect()
        }
        assert abs(est["A"] - 3000) <= 3000 * 0.15
        assert abs(est["B"] - 4000) <= 4000 * 0.15
        # unsaturated sketch = exact count
        small = spark.range(0, 33).select(
            F.lit("s").alias("g"), F.col("id").alias("v")
        )
        e = (
            kmv_sketch(small, ["g"], "v", k=256)
            .select(kmv_distinct_estimate(F.col("kmv"), 256).alias("e"))
            .collect()[0]["e"]
        )
        assert e == 33.0

    def test_jaccard_estimator(self, spark):
        from pyspark.sql import functions as F

        from quantms_utils_spark.operators.sketches import kmv_jaccard, kmv_sketch

        sk = kmv_sketch(self._sets(spark), ["g"], "v", k=256)
        a = sk.filter("g = 'A'").select(F.col("kmv").alias("a"))
        b = sk.filter("g = 'B'").select(F.col("kmv").alias("b"))
        j = (
            a.crossJoin(b)
            .select(kmv_jaccard(F.col("a"), F.col("b"), 256).alias("j"))
            .collect()[0]["j"]
        )
        exact = 1500 / 5500  # |1500..2999| / |0..5499|
        assert abs(j - exact) <= 0.08

    def test_validation_and_duplicates_ignored(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from quantms_utils_spark.operators.sketches import (
            kmv_distinct_estimate,
            kmv_sketch,
        )

        with pytest.raises(ValueError, match="positive"):
            kmv_sketch(spark.range(1), ["id"], "id", k=0)
        # duplicate VALUES must not inflate the sketch (distinct semantics)
        dup = spark.range(0, 50).select(
            F.lit("d").alias("g"), (F.col("id") % 10).alias("v")
        )
        e = (
            kmv_sketch(dup, ["g"], "v", k=64)
            .select(kmv_distinct_estimate(F.col("kmv"), 64).alias("e"))
            .collect()[0]["e"]
        )
        assert e == 10.0
