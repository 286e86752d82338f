"""Exactness guard for the pair-tiled gemm scorer: every unordered in-block
pair must be produced exactly once, with the same cosine as a numpy
brute-force reference — across bucket counts that do and don't divide the
block sizes."""

from __future__ import annotations

import numpy as np
import pytest

from quantms_utils_spark.operators.similarity import cosine_pairs_blocked


@pytest.mark.parametrize("n_buckets", [1, 3, 4])
def test_tiled_pairs_match_bruteforce(spark, n_buckets):
    rng = np.random.RandomState(11)
    n, dim = 120, 16
    blocks = rng.randint(0, 3, n)
    vecs = rng.randn(n, dim)
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(blocks[i])) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vid long, emb array<double>, blk int")

    got = {
        (r["id_a"], r["id_b"]): r["cos_raw"]
        for r in cosine_pairs_blocked(
            df, "vid", "emb", "blk", threshold=-1.0, n_buckets=n_buckets
        ).collect()
    }

    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    expected = {}
    for i in range(n):
        for j in range(i + 1, n):
            if blocks[i] == blocks[j]:
                expected[(i, j)] = float(unit[i] @ unit[j])

    assert set(got) == set(expected), (
        f"pair set mismatch: missing={set(expected) - set(got)}, "
        f"extra={set(got) - set(expected)}"
    )
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-9


class TestIVF:
    def _blobs(self, spark):
        # two tight, well-separated blobs in 4-d
        rows = []
        for i in range(10):
            rows.append((i, [10.0 + 0.01 * i, 10.0, 0.0, 0.0]))
        for i in range(10, 20):
            rows.append((i, [-10.0, -10.0 - 0.01 * i, 0.0, 0.0]))
        return spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    def test_kmeans_separates_blobs(self, spark):
        from quantms_utils_spark.operators.similarity import (
            assign_to_centroids,
            kmeans_train,
        )

        df = self._blobs(spark)
        init = [(0, [10.0, 10.0, 0.0, 0.0]), (1, [-10.0, -10.0, 0.0, 0.0])]
        cents = kmeans_train(df, "embedding", init, n_iter=2)
        assert [cid for cid, _ in cents] == [0, 1]
        # centroid 0 ≈ blob-A mean, centroid 1 ≈ blob-B mean
        assert cents[0][1][0] == pytest.approx(10.045, abs=0.01)
        assert cents[1][1][1] == pytest.approx(-10.145, abs=0.01)
        got = df.select(
            "vec_id", assign_to_centroids("embedding", cents).alias("cid")
        ).collect()
        for r in got:
            assert r.cid == (0 if r.vec_id < 10 else 1)

    def test_kmeans_drops_empty_cluster(self, spark):
        from quantms_utils_spark.operators.similarity import kmeans_train

        df = self._blobs(spark)
        # third seed sits far from every vector → captures nothing → dropped
        init = [
            (0, [10.0, 10.0, 0.0, 0.0]),
            (1, [-10.0, -10.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1000.0, 0.0]),
        ]
        cents = kmeans_train(df, "embedding", init, n_iter=1)
        assert [cid for cid, _ in cents] == [0, 1]

    def test_ivf_full_probe_equals_bruteforce(self, spark):
        from pyspark.sql import functions as F

        from quantms_utils_spark.operators.similarity import (
            ann_bruteforce,
            ivf_search,
            kmeans_train,
        )

        df = self._blobs(spark)
        init = [(0, [10.0, 10.0, 0.0, 0.0]), (1, [-10.0, -10.0, 0.0, 0.0])]
        cents = kmeans_train(df, "embedding", init, n_iter=2)
        q = df.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("q_emb")
        )
        rest = df.filter(F.col("vec_id") != 0)
        exact = ann_bruteforce(rest, q, k=5).collect()
        probed = ivf_search(rest, q, cents, nprobe=len(cents), k=5).collect()
        assert [(r.vec_id, r.cos_sim) for r in exact] == [
            (r.vec_id, r.cos_sim) for r in probed
        ]
