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


class TestKnnSelfJoin:
    @pytest.mark.parametrize("n_buckets", [1, 3, 5])
    def test_knn_graph_matches_bruteforce(self, spark, n_buckets):
        """The tiled per-row top-k must equal the brute-force within-block
        kNN for any tile count (every pair meets in exactly one tile and
        tile-local top-k preserves global top-k membership)."""
        import numpy as np
        from pyspark.sql import Row, Window
        from pyspark.sql import functions as F
        from quantms_utils_spark.operators.similarity import (
            cosine_sim,
            knn_self_join,
        )

        rng = np.random.RandomState(5)
        rows = [
            Row(vec_id=i, label=i % 3,
                embedding=[float(x) for x in rng.randn(8)])
            for i in range(40)
        ]
        df = spark.createDataFrame(rows)
        got = {
            (r["vec_id"], r["rank"]): r["neighbor_id"]
            for r in knn_self_join(
                df, "vec_id", "embedding", "label", k=2, n_buckets=n_buckets
            ).collect()
        }
        a, b = df.alias("a"), df.alias("b")
        brute = (
            a.join(b, (F.col("a.label") == F.col("b.label"))
                   & (F.col("a.vec_id") != F.col("b.vec_id")))
            .select(
                F.col("a.vec_id").alias("vec_id"),
                F.col("b.vec_id").alias("neighbor_id"),
                F.round(
                    cosine_sim(F.col("a.embedding"), F.col("b.embedding")), 6
                ).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        want = {
            (r["vec_id"], r["rank"]): r["neighbor_id"]
            for r in brute.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 2)
            .collect()
        }
        assert got == want

    def test_small_block_yields_fewer_neighbors(self, spark):
        from pyspark.sql import Row
        from quantms_utils_spark.operators.similarity import knn_self_join

        df = spark.createDataFrame(
            [
                Row(vec_id=1, label=0, embedding=[1.0, 0.0]),
                Row(vec_id=2, label=0, embedding=[0.9, 0.1]),
                Row(vec_id=3, label=1, embedding=[0.0, 1.0]),
            ]
        )
        got = knn_self_join(df, "vec_id", "embedding", "label", k=3).collect()
        by_id = {}
        for r in got:
            by_id.setdefault(r["vec_id"], []).append(r["neighbor_id"])
        assert sorted(by_id[1]) == [2] and sorted(by_id[2]) == [1]
        assert 3 not in by_id  # singleton block: no neighbors


def test_knn_self_join_small_block_has_no_phantom_self_neighbor(spark):
    """Round-9 (review finding): a block with fewer than k competitors
    must not emit the -inf-masked self pair as a phantom neighbor row."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.similarity import knn_self_join

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.9, 0.1], "a"),
            (3, [0.0, 1.0], "a"),
        ],
        "vec_id long, vec array<double>, label string",
    )
    out = knn_self_join(
        df, "vec_id", "vec", block_col="label", k=5, n_buckets=2
    ).collect()
    assert all(r["neighbor_id"] != r["vec_id"] for r in out)
    assert all(r["cos_sim"] > float("-inf") for r in out)
    # each vector still gets its 2 real neighbors
    from collections import Counter

    per_id = Counter(r["vec_id"] for r in out)
    assert per_id == {1: 2, 2: 2, 3: 2}


def test_unit_vector_zero_norm_yields_zero_vector(spark):
    """Round-9 (review finding): an all-zero embedding must normalize to
    the zero vector (cosine 0 against everything), not NULL elements that
    crash the numpy GEMMs downstream."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.similarity import (
        cosine_pairs_blocked,
        unit_vector,
    )

    row = (
        spark.createDataFrame([([0.0, 0.0, 0.0],)], "v array<double>")
        .select(unit_vector(F.col("v")).alias("u"))
        .collect()[0]
    )
    assert row["u"] == [0.0, 0.0, 0.0]

    # end-to-end: a zero vector in a block must not crash the GEMM tile
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [1.0, 0.0], "a"),
            (3, [0.0, 0.0], "a"),
        ],
        "vec_id long, vec array<double>, label string",
    )
    pairs = cosine_pairs_blocked(
        df, "vec_id", "vec", "label", threshold=0.9, n_buckets=2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_kmeans_train_fast_unsorted_init_matches_sorted(spark):
    """Round-9 (review finding): tie-breaks go to the LOWEST cid
    regardless of the caller's init list order (argmin picks first
    position, so the list must be cid-sorted internally)."""
    from quantms_utils_spark.operators.similarity import kmeans_train_fast

    df = spark.createDataFrame(
        [([0.0, 0.0],), ([2.0, 0.0],), ([1.0, 0.0],)],  # middle is a tie
        "vec array<double>",
    )
    init_sorted = [(2, [0.0, 0.0]), (5, [2.0, 0.0])]
    init_rev = [(5, [2.0, 0.0]), (2, [0.0, 0.0])]
    a = kmeans_train_fast(df, "vec", init=init_sorted, n_iter=1)
    b = kmeans_train_fast(df, "vec", init=init_rev, n_iter=1)
    assert a == b  # the tie point lands in cid 2 either way


def test_knn_self_join_nan_embedding_surfaces_not_vanishes(spark):
    """Round-10 (ADVICE r9): a NaN-containing embedding must SURFACE in the
    kNN graph (NaN cos_sim rows), not silently vanish the way the round-9
    non-finite skip (aimed at the -inf diagonal mask) made it."""
    import math

    from quantms_utils_spark.operators.similarity import knn_self_join

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.9, 0.1], "a"),
            (3, [float("nan"), 1.0], "a"),
        ],
        "vec_id long, vec array<double>, label string",
    )
    out = knn_self_join(
        df, "vec_id", "vec", block_col="label", k=5, n_buckets=1
    ).collect()
    # the corrupted vector is visible: its pair rows surface with a
    # non-score (NaN crosses the pandas→Arrow boundary as NULL)
    bad_rows = [r for r in out if r["cos_sim"] is None
                or math.isnan(r["cos_sim"])]
    assert bad_rows, "NaN embedding silently dropped from the kNN graph"
    # and id 3 itself still appears as a graph node (detectable, not erased)
    assert any(r["vec_id"] == 3 for r in out)
    # finite pairs are unaffected
    assert any(
        r["vec_id"] == 1 and r["neighbor_id"] == 2
        and abs(r["cos_sim"] - 0.993884) < 1e-6
        for r in out
    )
    # the deliberate -inf self-mask is still skipped: no self pairs
    assert all(r["neighbor_id"] != r["vec_id"] for r in out)
