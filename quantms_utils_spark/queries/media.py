"""Real-decode media queries: payloads are CONSTRUCTED from table numbers,
decoded by the pure-stdlib codecs (`functions/media_codecs.py`), and the
DuckDB oracle recomputes every decoded feature directly from the same
numbers — so the decode path itself (RIFF chunk walk, BMP header parse, Y4M
demux) is value-checked end-to-end, not stubbed.

Contrast with the `multimodal_*` queries (queries/textops.py), which pin the
deterministic stub kernel to exercise the Arrow-batch plumbing on arbitrary
bytes; here the bytes are real WAV/BMP/YUV4MPEG2 containers.

Scale shape: encode and decode are both Arrow-batched (pandas_udf /
mapInPandas) over one aggregation (WAV) or a map-only projection (BMP/Y4M) —
no shuffle beyond the one groupBy, no driver-side loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BinaryType

from quantms_utils_spark.functions import media_codecs as mc
from quantms_utils_spark.tables import load

WAV_RATE = 16000
Y4M_FPS = 2  # F2:1 in the stream header


@F.pandas_udf(BinaryType())
def _encode_wav_udf(samples: pd.Series) -> pd.Series:
    return samples.map(
        lambda arr: mc.encode_wav(np.asarray(arr, dtype=np.int16), WAV_RATE)
    )


def media_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events → per-user PCM16 WAV payload → REAL RIFF/PCM decode → audio
    features. The oracle recomputes rate/length/duration/RMS straight from
    the quantized sample values, so a hash match proves the WAV encoder and
    the chunk-walking decoder agree bit-for-bit on the PCM semantics."""
    from quantms_utils_spark.operators.multimodal import extract_audio_features

    e = load(spark, sf_dir, "events")
    # value ∈ [0.01, ~500] → ×50 stays well inside int16
    sample = F.round(F.col("value") * 50).cast("int")
    per_user = e.groupBy("user_id").agg(
        F.sort_array(F.collect_list(sample)).alias("samples")
    )
    media = per_user.select(
        F.col("user_id").cast("long").alias("media_id"),
        _encode_wav_udf("samples").alias("payload"),
    )
    return extract_audio_features(media)


MEDIA_WAV_FEATURES_SQL = f"""
SELECT user_id AS media_id,
       {WAV_RATE} AS sample_rate,
       count(*) AS n_samples,
       count(*) / CAST({WAV_RATE} AS DOUBLE) AS duration_s,
       round(sqrt(avg(pow(CAST(round(value * 50) AS INT) / 32768.0, 2))), 6)
         AS rms
FROM events GROUP BY user_id
"""


@F.pandas_udf(BinaryType())
def _encode_bmp_udf(
    w: pd.Series, h: pd.Series, r: pd.Series, g: pd.Series, b: pd.Series
) -> pd.Series:
    out = []
    for wi, hi, ri, gi, bi in zip(w, h, r, g, b):
        px = np.empty((int(hi), int(wi), 3), dtype=np.uint8)
        px[:, :, 0], px[:, :, 1], px[:, :, 2] = ri, gi, bi
        out.append(mc.encode_bmp(px))
    return pd.Series(out)


def media_bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → uniform-color 24-bit BMP payload (geometry and color
    derived from doc_id) → REAL BMP header+pixel decode → image features.
    Width/height verify the header parse; mean_luma verifies the pixel
    array + BT.601 luma math."""
    from quantms_utils_spark.operators.multimodal import extract_image_features

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    spec = d.select(
        F.col("doc_id"),
        (F.lit(8) + F.col("doc_id") % 8).cast("int").alias("w"),
        (F.lit(8) + (F.col("doc_id") * 3) % 8).cast("int").alias("h"),
        (F.col("doc_id") % 256).cast("int").alias("r"),
        ((F.col("doc_id") * 7) % 256).cast("int").alias("g"),
        ((F.col("doc_id") * 13) % 256).cast("int").alias("b"),
    )
    media = spec.select(
        F.col("doc_id").cast("long").alias("media_id"),
        _encode_bmp_udf("w", "h", "r", "g", "b").alias("payload"),
    )
    return extract_image_features(media)


MEDIA_BMP_FEATURES_SQL = """
SELECT doc_id AS media_id,
       CAST(8 + doc_id % 8 AS INT) AS width,
       CAST(8 + (doc_id * 3) % 8 AS INT) AS height,
       3 AS n_channels,
       round((0.299 * (doc_id % 256) + 0.587 * ((doc_id * 7) % 256)
              + 0.114 * ((doc_id * 13) % 256)) / 255.0, 4) AS mean_luma
FROM documents WHERE doc_id < 200
"""


@F.pandas_udf(BinaryType())
def _encode_y4m_udf(n_frames: pd.Series, gray: pd.Series) -> pd.Series:
    out = []
    for n, g in zip(n_frames, gray):
        frames = [np.full((4, 8), int(g), dtype=np.uint8)] * int(n)
        out.append(mc.encode_y4m_mono(frames, Y4M_FPS, 1))
    return pd.Series(out)


def media_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → YUV4MPEG2 mono stream (1–4 uniform 8×4 frames) → REAL Y4M
    demux → one row per frame with container-derived timestamps and digests
    of the actual Y-plane bytes. The oracle reproduces the digests with
    ``sha256(repeat(chr(g), 32))`` — gray values are pinned to single-byte
    ASCII so VARCHAR repetition equals the raw plane bytes."""
    from quantms_utils_spark.operators.multimodal import sample_video_frames

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    spec = d.select(
        F.col("doc_id"),
        (F.lit(1) + F.col("doc_id") % 4).cast("int").alias("n_frames"),
        (F.lit(32) + F.col("doc_id") % 95).cast("int").alias("gray"),
    )
    media = spec.select(
        F.col("doc_id").cast("long").alias("media_id"),
        _encode_y4m_udf("n_frames", "gray").alias("payload"),
    )
    return sample_video_frames(media)


MEDIA_Y4M_FRAMES_SQL = f"""
SELECT doc_id AS media_id,
       CAST(i AS INT) AS frame_idx,
       round(i / CAST({Y4M_FPS} AS DOUBLE), 4) AS ts_s,
       sha256(repeat(chr(CAST(32 + doc_id % 95 AS INT)), 32)) AS frame_digest
FROM documents,
     UNNEST(generate_series(0, doc_id % 4)) AS t(i)
WHERE doc_id < 100
"""


_PH_GROUPS = 60
_PH_DOCS = 240


@F.pandas_udf(BinaryType())
def _encode_pattern_bmp(bits: pd.Series) -> pd.Series:
    out = []
    for b in bits:
        grid = np.asarray(b, dtype=np.int64).reshape(8, 8)
        px8 = np.where(grid == 1, 200, 40).astype(np.uint8)
        big = np.repeat(np.repeat(px8, 2, axis=0), 2, axis=1)
        out.append(mc.encode_bmp(np.stack([big] * 3, axis=2)))
    return pd.Series(out)


def _phash_fingerprints(spark: SparkSession, sf_dir: str):
    """Shared front-end for the aHash queries: 240 docs → 60 base bit
    patterns × 4 one-bit-flip variants → 16×16 BMP payloads (2×2 uniform
    blocks) → REAL decode → 8×8 box average → aHash. The bit patterns are
    md5-derived Catalyst expressions, so the oracle rebuilds them exactly
    and the decode+pool+threshold chain is what a hash match proves."""
    from quantms_utils_spark.operators.multimodal import average_hash

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _PH_DOCS)
    g = (F.col("doc_id") % _PH_GROUPS).cast("string")
    v = F.expr(f"doc_id DIV {_PH_GROUPS}")

    def bit(i: int):
        if i == 0:
            return F.lit(1)
        if i == 63:
            return F.lit(0)
        return (
            F.conv(
                F.substring(F.md5(F.concat(g, F.lit(f":{i}"))), 1, 2), 16, 10
            ).cast("int")
            % 2
        )

    flip = F.when(
        v > 0,
        F.lit(1)
        + F.conv(
            F.substring(
                F.md5(F.concat(F.lit("flip:"), g, F.lit(":"), v.cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 62,
    ).otherwise(F.lit(-1))
    # two steps: _flip must be a resolvable column before the transform
    # lambda references it
    spec = d.select(
        F.col("doc_id"), flip.alias("_flip")
    ).select(
        "doc_id",
        F.transform(
            F.array(*[bit(i) for i in range(64)]),
            lambda b, i: F.when(
                i.cast("long") == F.col("_flip"), 1 - b
            ).otherwise(b),
        ).alias("bits"),
    )
    media = spec.select(
        F.col("doc_id").cast("long").alias("media_id"),
        _encode_pattern_bmp("bits").alias("payload"),
    )
    return average_hash(media)


def media_ahash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash of constructed BMP images (operators.
    multimodal.average_hash): the oracle recomputes every bit from the md5
    pattern formula, so a decode slip, a pooling off-by-one, or a bit-order
    mismatch flips the signed-int64 fingerprint and hash-mismatches."""
    return _phash_fingerprints(spark, sf_dir)


def media_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs: aHash fingerprints through the SimHash
    pigeonhole banding (operators.dedup.simhash_pairs) at Hamming ≤ 3 —
    each group's one-bit-flip variants must pair up (distance ≤ 2 by
    construction), random cross-group patterns must not (~32 bits apart).
    The oracle rebuilds fingerprints AND replays the banding join.

    Optimization round 13, examined and left UNPINNED: the executed plan
    runs the BMP encode → decode → pool Python pipeline once per
    fingerprint consumer (4 MapInPandas + 4 ArrowEvalPython nodes — band
    side a, band side b, and the two Hamming verify joins), but the
    fingerprinted set is 240 rows, so an eager localCheckpoint pin was
    MEASURED SLOWER (isolated A/B: 1.96 s unpinned vs 2.1–2.2 s pinned —
    the materialization barrier costs more than three 240-row Python
    passes save). At real image-corpus scale the pin (one codec pass,
    checkpoint stores only id+hash — the guide §8 'decide with small
    rows' shape) is the right call; revisit if _PH_DOCS ever grows."""
    from quantms_utils_spark.operators.dedup import simhash_pairs

    fps = _phash_fingerprints(spark, sf_dir)
    pairs = simhash_pairs(
        fps, "media_id", "ahash64", max_hamming=3, n_bands=4
    )
    return pairs.select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


_PH_FP_SQL = f"""
spec AS (
  SELECT doc_id, CAST(doc_id % {_PH_GROUPS} AS VARCHAR) AS g,
         doc_id // {_PH_GROUPS} AS v
  FROM documents WHERE doc_id < {_PH_DOCS}
), bits AS (
  SELECT doc_id, i,
         CASE WHEN i = 0 THEN 1 WHEN i = 63 THEN 0
              ELSE ('0x' || substr(md5(g || ':' || CAST(i AS VARCHAR)),
                                   1, 2))::INT % 2 END AS b,
         CASE WHEN v > 0
              THEN 1 + ('0x' || substr(md5('flip:' || g || ':'
                                           || CAST(v AS VARCHAR)),
                                       1, 4))::BIGINT % 62
              ELSE -1 END AS flip
  FROM spec, generate_series(0, 63) t(i)
), fb AS (
  SELECT doc_id, i, CASE WHEN i = flip THEN 1 - b ELSE b END AS b FROM bits
), u AS (
  SELECT doc_id,
         sum(CASE WHEN b = 1 THEN 1::HUGEINT << i ELSE 0::HUGEINT END) AS u
  FROM fb GROUP BY doc_id
), fp AS (
  SELECT doc_id AS media_id,
         CAST(CASE WHEN u >= (1::HUGEINT << 63) THEN u - (1::HUGEINT << 64)
                   ELSE u END AS BIGINT) AS ahash64
  FROM u
)
"""

MEDIA_AHASH_SQL = f"""
WITH {_PH_FP_SQL}
SELECT media_id, ahash64 FROM fp
"""

MEDIA_PHASH_PAIRS_SQL = f"""
WITH {_PH_FP_SQL},
bands AS (
  SELECT media_id, b, (ahash64 >> (16 * b)) & 65535 AS bv
  FROM fp, generate_series(0, 3) t(b)
), cand AS (
  SELECT DISTINCT a.media_id AS media_a, b2.media_id AS media_b
  FROM bands a JOIN bands b2
    ON a.b = b2.b AND a.bv = b2.bv AND a.media_id < b2.media_id
)
SELECT media_a, media_b,
       CAST(bit_count(xor(fa.ahash64, fb.ahash64)) AS BIGINT) AS hamming
FROM cand
JOIN fp fa ON fa.media_id = media_a
JOIN fp fb ON fb.media_id = media_b
WHERE bit_count(xor(fa.ahash64, fb.ahash64)) <= 3
"""




@F.pandas_udf(BinaryType())
def _encode_wav_ordered_udf(samples: pd.Series) -> pd.Series:
    return samples.map(
        lambda arr: mc.encode_wav(np.asarray(arr, dtype=np.int16), WAV_RATE)
    )


def media_wav_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ORDER-sensitive audio statistics: per-user signed PCM signal
    (event order by event_id, alternating sign so the waveform actually
    crosses zero) → WAV encode → real decode → zero crossings / peak /
    mean-abs (operators.multimodal.audio_signal_stats). The oracle
    recomputes every statistic from the event stream with a lag window —
    so any reorder, drop, or byte-swap inside the codec path shifts the
    crossing count and hash-mismatches. Complements `media_wav_features`,
    which is order-insensitive (RMS aggregate). Whale note: the per-user
    full-history collect here is the oracle-replayable form; the
    production form is operators.multimodal.wav_signal_stats_chunked
    (bounded per-chunk codec round-trips + associative merge with
    boundary-crossing state; 1M-sample whale pinned in
    tests/test_whale_guards.py)."""
    from quantms_utils_spark.operators.multimodal import audio_signal_stats

    e = load(spark, sf_dir, "events")
    sgn = F.when(F.col("event_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    sample = (F.round(F.col("value") * 50) * sgn).cast("int")
    per_user = e.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("event_id", sample.alias("s")))
            ),
            lambda st: st["s"],
        ).alias("samples")
    )
    media = per_user.select(
        F.col("user_id").cast("long").alias("media_id"),
        _encode_wav_ordered_udf("samples").alias("payload"),
    )
    return audio_signal_stats(media)


MEDIA_WAV_SIGNAL_SQL = """
WITH s AS (
  SELECT user_id, event_id,
         CAST(round(value * 50) AS INT)
           * (CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END) AS smp
  FROM events
), lagged AS (
  SELECT user_id, smp,
         lag(smp) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
  FROM s
)
SELECT user_id AS media_id,
       count(*) AS n_samples,
       CAST(sum(CASE WHEN prev IS NOT NULL
                      AND (prev < 0) <> (smp < 0) THEN 1 ELSE 0 END)
            AS BIGINT) AS zero_crossings,
       CAST(max(abs(smp)) AS BIGINT) AS peak_abs,
       round(CAST(sum(abs(smp)) AS DOUBLE) / count(*), 6) AS mean_abs
FROM lagged GROUP BY user_id
"""


QUERIES = {
    "media_wav_features": (media_wav_features, MEDIA_WAV_FEATURES_SQL),
    "media_bmp_features": (media_bmp_features, MEDIA_BMP_FEATURES_SQL),
    "media_y4m_frames": (media_y4m_frames, MEDIA_Y4M_FRAMES_SQL),
    "media_ahash_fingerprints": (media_ahash_fingerprints, MEDIA_AHASH_SQL),
    "media_phash_pairs": (media_phash_pairs, MEDIA_PHASH_PAIRS_SQL),
    "media_wav_signal": (media_wav_signal, MEDIA_WAV_SIGNAL_SQL),
}
