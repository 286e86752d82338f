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
