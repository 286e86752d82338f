"""kmeans_train_fast (Arrow partial-aggregation Lloyd) must reproduce the
oracle-replayable Catalyst-fold kmeans_train exactly (same argmin tiebreak,
same per-update rounding)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quantms_utils_spark.operators.similarity import (
    kmeans_train,
    kmeans_train_fast,
)
from quantms_utils_spark.tables import load

SF = "/root/testdata/sf0.001"


def _init(e, k):
    rows = e.where(F.col("vec_id") < k).select("vec_id", "embedding").collect()
    return [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in sorted(rows, key=lambda r: r["vec_id"])
    ]


def test_fast_matches_fold_on_embeddings(spark):
    e = load(spark, SF, "embeddings")
    init = _init(e, 8)
    slow = kmeans_train(e, "embedding", init, n_iter=2)
    fast = kmeans_train_fast(e, "embedding", init, n_iter=2)
    assert [c for c, _ in slow] == [c for c, _ in fast]
    for (_, a), (_, b) in zip(slow, fast):
        # identical after the shared per-update quantization; allow last-ulp
        # rounding flips at the .005 boundary
        assert all(abs(x - y) <= 0.01 for x, y in zip(a, b))


def test_fast_handles_empty_and_singleton_cells(spark):
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [10.1, 10.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    init = [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [50.0, 50.0])]
    slow = kmeans_train(df, "embedding", init, n_iter=2)
    fast = kmeans_train_fast(df, "embedding", init, n_iter=2)
    assert slow == fast  # cluster 2 empties out and is dropped in both
