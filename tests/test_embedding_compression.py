"""Unit tests for embedding compression: int8 quantization and distributed
PCA (covariance partials, eigencomponents, projection)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from quantms_utils_spark.operators.similarity import (
    covariance_matrix,
    pca_components,
    pca_project,
    quantize_int8,
)


def _vec_df(spark, vectors):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<double>",
    )


def test_quantize_int8_roundtrip_error_bounded(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 16))
    df = _vec_df(spark, vecs)
    rows = df.select("vec_id", quantize_int8(F.col("embedding")).alias("qs")).collect()
    for r in rows:
        v = vecs[r["vec_id"]]
        scale = r["qs"]["scale"]
        q = np.array(r["qs"]["q"])
        assert scale == pytest.approx(np.abs(v).max() / 127.0)
        assert np.abs(q).max() <= 127
        # dequantization error bounded by scale/2 per element
        assert np.abs(v - q * scale).max() <= scale / 2 + 1e-12
        assert r["qs"]["mse"] == pytest.approx(np.mean((v - q * scale) ** 2))


def test_quantize_int8_zero_vector(spark):
    df = _vec_df(spark, [np.zeros(8)])
    r = df.select(quantize_int8(F.col("embedding")).alias("qs")).collect()[0]
    assert r["qs"]["scale"] == 0.0
    assert r["qs"]["q"] == [0] * 8
    assert r["qs"]["mse"] == 0.0


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(100, 6))
    df = _vec_df(spark, vecs).repartition(4)  # force multiple partials
    got = np.zeros((6, 6))
    for r in covariance_matrix(df, "embedding", 6).collect():
        got[r["i"], r["j"]] = r["cov"]
    want = np.cov(vecs, rowvar=False, bias=True)
    assert np.allclose(got, want, atol=1e-8)


def test_pca_components_recover_dominant_direction(spark):
    rng = np.random.default_rng(3)
    # data stretched along a known direction
    direction = np.array([3.0, 4.0]) / 5.0
    t = rng.normal(size=400)
    noise = rng.normal(scale=0.01, size=(400, 2))
    vecs = np.outer(t, direction) + noise
    df = _vec_df(spark, vecs)
    vals, comps = pca_components(df, "embedding", 2, 2)
    assert vals[0] > vals[1] > 0
    assert abs(np.dot(comps[0], direction)) > 0.999
    # orthonormal
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-9)


def test_pca_project_is_map_only_and_correct(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(50, 4))
    df = _vec_df(spark, vecs)
    vals, comps = pca_components(df, "embedding", 4, 2)
    out = pca_project(df, "embedding", comps)
    pdf = out.orderBy("vec_id").toPandas()
    want = vecs @ comps.T
    assert np.allclose(np.stack([pdf["pc0"], pdf["pc1"]], axis=1), want, atol=1e-8)
    # map-only: no exchange in the projection plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ann_batch_topk_matches_per_query_bruteforce(spark):
    import numpy as np
    from quantms_utils_spark.operators.similarity import ann_batch_topk

    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(40, 8))
    df = _vec_df(spark, vecs)
    qs = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = ann_batch_topk(df, qs, k=5).toPandas()
    assert set(out["q_id"]) == {0, 1, 2}
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(3):
        s = sims[q].copy()
        s[q] = -np.inf  # self excluded
        want = list(np.argsort(-s, kind="stable")[:5])
        got = list(out[out["q_id"] == q].sort_values("rank")["vec_id"])
        assert got == want, (q, got, want)


class TestProductQuantization:
    def _books(self, spark):
        from quantms_utils_spark.operators.similarity import pq_train
        from quantms_utils_spark.tables import load

        e = load(spark, "/root/testdata/sf0.001", "embeddings")
        return e, pq_train(
            e, "embedding", dim=64, n_subspaces=4, k=8, n_iter=2
        )

    def test_codes_in_range_and_duplicates_share_codes(self, spark):
        from pyspark.sql import functions as F

        from quantms_utils_spark.operators.similarity import pq_codes

        e, books = self._books(spark)
        # duplicate vec 0 under a new id: codes must be identical
        dup = e.filter(F.col("vec_id") == 0).select(
            F.lit(999999).alias("vec_id"), "embedding", "label"
        )
        codes = pq_codes(
            e.unionByName(dup), "embedding", books, dim=64
        ).collect()
        by_id = {r["vec_id"]: tuple(r[f"code_{m}"] for m in range(4)) for r in codes}
        for cs in by_id.values():
            assert all(0 <= c < 8 for c in cs)
        assert by_id[0] == by_id[999999]

    def test_adc_prefers_the_query_itself(self, spark):
        from pyspark.sql import functions as F

        from quantms_utils_spark.operators.similarity import (
            pq_adc_score,
            pq_codes,
        )

        e, books = self._books(spark)
        q = e.filter(F.col("vec_id") == 7).collect()[0]
        query = [float(x) for x in q["embedding"]]
        scored = (
            pq_codes(e, "embedding", books, dim=64)
            .select("vec_id", pq_adc_score(books, query).alias("d"))
            .orderBy("d", "vec_id")
            .collect()
        )
        # the query vector itself must land in the nearest handful (its own
        # codes reconstruct it best up to quantization)
        top_ids = [r["vec_id"] for r in scored[:5]]
        assert 7 in top_ids

    def test_pq_codes_is_map_only(self, spark):
        from quantms_utils_spark.operators.similarity import pq_codes

        e, books = self._books(spark)
        plan = (
            pq_codes(e, "embedding", books, dim=64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_pq_train_rejects_uneven_split(self, spark):
        import pytest as _pytest

        from quantms_utils_spark.operators.similarity import pq_train
        from quantms_utils_spark.tables import load

        e = load(spark, "/root/testdata/sf0.001", "embeddings")
        with _pytest.raises(ValueError, match="divide"):
            pq_train(e, "embedding", dim=64, n_subspaces=5, k=4)
