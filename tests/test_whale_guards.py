"""Whale-key guards for the recursive-fold family (round-4 item 6).

`event_value_ewma` and `media_wav_signal` fold a FULL per-key history
array inside one aggregation buffer — correct under the registry contract
but unbounded when one key holds millions of rows. These tests pin the
chunked two-level forms (`ewma_chunked`, `wav_signal_stats_chunked`):

- equivalence with the naive whole-history fold on multi-key random data
  (chunk size forced tiny so chunking actually happens);
- a synthetic 1M-event single user (the whale) through the chunked path
  with a small chunk size — peak per-key state is max(chunk, n/chunk)
  rows, so this passes in a bounded heap where the naive fold would
  materialize a 1M-element array in one buffer.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _naive_ewma(vals, alpha=0.3):
    s = vals[0]
    for v in vals[1:]:
        s = alpha * v + (1 - alpha) * s
    return s


def test_ewma_chunked_matches_naive_fold(spark):
    from quantms_utils_spark.operators.windows import ewma_chunked

    rng = random.Random(7)
    rows = []
    expected = {}
    for uid in range(12):
        n = rng.randrange(1, 40)
        vals = [round(rng.uniform(-5, 5), 3) for _ in range(n)]
        rows += [(uid, i, v) for i, v in enumerate(vals)]
        expected[uid] = (n, _naive_ewma(vals))
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    out = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in ewma_chunked(
            df, ["user_id"], ["seq"], "value", chunk_size=4
        ).collect()
    }
    assert set(out) == set(expected)
    for uid, (n, e) in expected.items():
        assert out[uid][0] == n
        assert out[uid][1] == pytest.approx(e, rel=1e-9)


def test_ewma_chunked_single_element_and_exact_chunk_boundary(spark):
    from quantms_utils_spark.operators.windows import ewma_chunked

    # n == 1 (seed only), n == chunk_size (one full chunk), n == 2*chunk
    df = spark.createDataFrame(
        [(0, 0, 42.0)]
        + [(1, i, float(i)) for i in range(4)]
        + [(2, i, float(i % 3) - 1.0) for i in range(8)],
        "user_id long, seq long, value double",
    )
    out = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in ewma_chunked(
            df, ["user_id"], ["seq"], "value", chunk_size=4
        ).collect()
    }
    assert out[0] == (1, pytest.approx(42.0))
    assert out[1][1] == pytest.approx(_naive_ewma([0.0, 1.0, 2.0, 3.0]), rel=1e-12)
    assert out[2][1] == pytest.approx(
        _naive_ewma([float(i % 3) - 1.0 for i in range(8)]), rel=1e-12
    )


def test_ewma_chunked_rejects_tiny_chunk(spark):
    from quantms_utils_spark.operators.windows import ewma_chunked

    df = spark.createDataFrame([(0, 0, 1.0)], "user_id long, seq long, value double")
    with pytest.raises(ValueError, match="chunk_size"):
        ewma_chunked(df, ["user_id"], ["seq"], "value", chunk_size=1)


def test_ewma_chunked_whale_1m_events(spark):
    """The actual whale: one user, 1M events, chunk_size 8192 → 123 chunk
    rows at level 3 and ≤ 8192-element arrays at level 2. The expected
    value is the closed-form geometric tail: for value v_i = (i % 7),
    weights below 1e-16 vanish, so only the last ~120 terms matter."""
    from quantms_utils_spark.operators.windows import ewma_chunked

    n = 1_000_000
    df = spark.range(n).select(
        F.lit(0).alias("user_id"),
        F.col("id").alias("seq"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    row = ewma_chunked(
        df, ["user_id"], ["seq"], "value", alpha=0.3, chunk_size=8192
    ).collect()[0]
    assert row["n_events"] == n
    # local closed form over the last 200 values (older weights < 1e-30)
    tail = [(i % 7) for i in range(n - 200, n)]
    s = tail[0]
    for v in tail[1:]:
        s = 0.3 * v + 0.7 * s
    assert row["ewma"] == pytest.approx(s, rel=1e-9)


def _signal_stats(samples):
    zc = sum(
        1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0)
    )
    peak = max(abs(s) for s in samples)
    mean = round(sum(abs(s) for s in samples) / len(samples), 6)
    return len(samples), zc, peak, mean


def test_wav_chunked_matches_direct_stats(spark):
    from quantms_utils_spark.operators.multimodal import wav_signal_stats_chunked

    rng = random.Random(11)
    rows = []
    expected = {}
    for uid in range(8):
        n = rng.randrange(1, 40)
        samples = [rng.randrange(-300, 300) for _ in range(n)]
        rows += [(uid, i, s) for i, s in enumerate(samples)]
        expected[uid] = _signal_stats(samples)
    df = spark.createDataFrame(rows, "user_id long, seq long, smp int")
    out = {
        r["media_id"]: (
            r["n_samples"],
            r["zero_crossings"],
            r["peak_abs"],
            r["mean_abs"],
        )
        for r in wav_signal_stats_chunked(
            df, "user_id", ["seq"], "smp", chunk_size=8
        ).collect()
    }
    assert out == expected


def test_wav_chunked_boundary_crossings_counted(spark):
    """Crossings that straddle a chunk boundary are exactly the merge
    state: samples alternate sign every row, chunk_size 4 → every chunk
    boundary is itself a crossing."""
    from quantms_utils_spark.operators.multimodal import wav_signal_stats_chunked

    n = 16
    samples = [100 if i % 2 == 0 else -100 for i in range(n)]
    df = spark.createDataFrame(
        [(0, i, s) for i, s in enumerate(samples)],
        "user_id long, seq long, smp int",
    )
    row = wav_signal_stats_chunked(
        df, "user_id", ["seq"], "smp", chunk_size=4
    ).collect()[0]
    assert row["zero_crossings"] == n - 1
    assert row["n_samples"] == n and row["peak_abs"] == 100


def test_wav_chunked_whale_1m_samples(spark):
    from quantms_utils_spark.operators.multimodal import wav_signal_stats_chunked

    n = 1_000_000
    # deterministic pseudo-signal: sign flips on a 3/7 pattern
    df = spark.range(n).select(
        F.lit(0).alias("user_id"),
        F.col("id").alias("seq"),
        (
            ((F.col("id") % 97) - 48)
            * F.when(F.col("id") % 3 == 0, -1).otherwise(1)
        ).cast("int").alias("smp"),
    )
    row = wav_signal_stats_chunked(
        df, "user_id", ["seq"], "smp", chunk_size=65536
    ).collect()[0]
    assert row["n_samples"] == n
    # independently computed in plain Python (fast: one pass)
    samples = [((i % 97) - 48) * (-1 if i % 3 == 0 else 1) for i in range(n)]
    en, ezc, epeak, emean = _signal_stats(samples)
    assert (row["zero_crossings"], row["peak_abs"]) == (ezc, epeak)
    assert row["mean_abs"] == pytest.approx(emean, abs=1e-6)
    assert math.isfinite(row["mean_abs"])
