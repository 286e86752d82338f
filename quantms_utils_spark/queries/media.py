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


QUERIES = {
    "media_wav_features": (media_wav_features, MEDIA_WAV_FEATURES_SQL),
    "media_bmp_features": (media_bmp_features, MEDIA_BMP_FEATURES_SQL),
    "media_y4m_frames": (media_y4m_frames, MEDIA_Y4M_FRAMES_SQL),
}
