"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns travelling next to typed metadata
(shape, codec, duration, digest). The Spark-side contract — schemas,
Arrow-batched UDF signatures, partitioning — is real and tested. Decode
resolution per payload:

1. ``decode_stub=True`` → always the deterministic digest-derived fake
   (used by the oracle-checked demo queries whose payloads are not media).
2. otherwise, a payload whose magic bytes identify a pure-stdlib-decodable
   public format (WAV / BMP / PPM / PNG / Y4M — see
   ``functions/media_codecs.py``) is REALLY decoded, no external libs needed.
3. otherwise PIL / soundfile when importable (JPEG, FLAC, …).
4. otherwise the stub (``decode_stub=None``, the default) or a ``ValueError``
   (``decode_stub=False`` — strict mode, un-decodable payloads are an error).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
    ]
)

VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("ts_s", DoubleType(), True),
        StructField("frame_digest", StringType(), True),
    ]
)

try:  # pragma: no cover - environment-dependent
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

from quantms_utils_spark.functions import media_codecs

_IMAGE_FORMATS = ("bmp", "ppm", "png")


def _try_decode(fn, payload: bytes, media_id, strict: bool):
    """Run a real codec over one payload. A payload whose magic bytes match
    a supported format but whose body is corrupt/truncated must not abort
    the whole 100 TB job (round 10 review): in lenient mode it returns
    ``None`` (the caller emits a NULL-feature row — detectable, never
    fabricated); in strict mode it raises with the media_id attached."""
    try:
        return fn(payload)
    except Exception as exc:
        if strict:
            raise ValueError(
                f"corrupt media payload (media_id={media_id}): {exc}"
            ) from exc
        return None


def attach_payload_metadata(
    df: DataFrame, payload_col: str, id_col: str, media_type: str
) -> DataFrame:
    """Wrap an opaque binary column with the standard media metadata."""
    payload = F.col(payload_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decode: dimensions derived from the content digest.

    Stands in for PIL decoding when the library is absent; the Spark-side
    batch shape and schema are identical to the real path. Every derived
    value is a pure function of sha256 bytes, so a SQL oracle can reproduce
    it (hex-window parse) and verify the whole mapInPandas pipeline.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 3
    mean_luma = round(digest[2] / 255.0, 4)
    return width, height, channels, mean_luma


def extract_image_features(media: DataFrame, decode_stub: bool | None = None) -> DataFrame:
    """Decode / feature-extract over an opaque image payload column via
    mapInPandas (Arrow-batched; one task per input partition — the unit of
    parallelism is the file/object, matching how a 100 TB object store scan
    parallelizes). BMP/PPM/PNG payloads are REALLY decoded (pure-stdlib
    codecs); other formats fall through to PIL, then the stub (see module
    docstring for the resolution order)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None))
                    continue
                payload = bytes(payload)
                if decode_stub is True:
                    w, h, c, luma = _decode_image_stub(payload)
                elif media_codecs.sniff(payload) in _IMAGE_FORMATS:
                    feats = _try_decode(
                        media_codecs.image_features, payload, media_id,
                        strict=decode_stub is False,
                    )
                    w, h, c, luma = feats if feats else (None,) * 4
                elif HAVE_PIL:  # pragma: no cover - needs PIL + real images
                    img = PIL.Image.open(io.BytesIO(payload))
                    w, h = img.size
                    c = len(img.getbands())
                    luma = round(
                        sum(img.convert("L").getdata()) / (255.0 * w * h), 4
                    )
                elif decode_stub is False:
                    raise ValueError(
                        "un-decodable image payload in strict mode "
                        f"(media_id={media_id})"
                    )
                else:
                    w, h, c, luma = _decode_image_stub(payload)
                rows.append((media_id, w, h, c, luma))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels", "mean_luma"]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_width", IntegerType(), False),
        StructField("out_height", IntegerType(), False),
        StructField("thumbnail", BinaryType(), True),
        StructField("thumb_digest", StringType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    decode_stub: bool | None = None,
) -> DataFrame:
    """Resize/thumbnail an opaque image payload column via mapInPandas.

    Real path (BMP/PPM/PNG payloads, pure-stdlib codecs): decode →
    nearest-neighbor resample → PNG re-encode; PIL (LANCZOS) when the codec
    can't decode but PIL can. Stub path: the thumbnail is a deterministic
    digest-derived byte string (the sha256 of payload + target geometry), so
    schema, batch shape, AND values are oracle-reproducible — the Spark-side
    contract a real deployment keeps is identical either way: binary in,
    smaller binary + typed metadata out.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, width, height, None, None))
                    continue
                payload = bytes(payload)
                if decode_stub is True:
                    thumb = hashlib.sha256(
                        payload + f":{width}x{height}".encode()
                    ).hexdigest().encode("ascii")
                elif media_codecs.sniff(payload) in _IMAGE_FORMATS:
                    def _thumb(p):
                        px = media_codecs.decode_image_pixels(p)
                        return media_codecs.encode_png(
                            media_codecs.resize_nearest(px, width, height)
                        )

                    thumb = _try_decode(
                        _thumb, payload, media_id, strict=decode_stub is False
                    )
                    if thumb is None:
                        rows.append((media_id, width, height, None, None))
                        continue
                elif HAVE_PIL:  # pragma: no cover - needs PIL + real images
                    img = PIL.Image.open(io.BytesIO(payload))
                    img = img.resize((width, height), PIL.Image.LANCZOS)
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    thumb = buf.getvalue()
                elif decode_stub is False:
                    raise ValueError(
                        "un-decodable image payload in strict mode "
                        f"(media_id={media_id})"
                    )
                else:
                    thumb = hashlib.sha256(
                        payload + f":{width}x{height}".encode()
                    ).hexdigest().encode("ascii")
                digest = hashlib.sha256(thumb).hexdigest()
                rows.append((media_id, width, height, thumb, digest))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "out_width", "out_height", "thumbnail", "thumb_digest"],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


try:  # pragma: no cover - environment-dependent
    import soundfile  # noqa: F401

    HAVE_SOUNDFILE = True
except Exception:  # pragma: no cover
    HAVE_SOUNDFILE = False


def _decode_audio_stub(payload: bytes) -> tuple[int, int, float, float]:
    """Deterministic fake audio decode: rate/length/energy from the digest +
    byte length — sha256-derivable, so SQL-oracle-reproducible."""
    digest = hashlib.sha256(payload).digest()
    sample_rate = 8000 * (1 + digest[0] % 5)  # 8/16/24/32/40 kHz
    n_samples = len(payload) * 256 + digest[1]
    # Exact IEEE division, deliberately unrounded: int/int division of the
    # same operands is bit-identical in any engine, while decimal rounding of
    # a half-tie is not.
    duration_s = n_samples / sample_rate
    rms = round(digest[2] / 255.0, 4)
    return sample_rate, n_samples, duration_s, rms


def extract_audio_features(
    media: DataFrame, decode_stub: bool | None = None
) -> DataFrame:
    """Audio feature extraction (sample rate, length, duration, RMS energy)
    over an opaque payload column — same Arrow-batched mapInPandas contract as
    the image path. RIFF/WAVE payloads are REALLY decoded by the pure-stdlib
    PCM parser (``media_codecs.decode_wav``); other formats fall through to
    soundfile, then the deterministic stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None))
                    continue
                payload = bytes(payload)
                if decode_stub is True:
                    sr, n, dur, rms = _decode_audio_stub(payload)
                elif media_codecs.sniff(payload) == "wav":
                    feats = _try_decode(
                        media_codecs.decode_wav, payload, media_id,
                        strict=decode_stub is False,
                    )
                    sr, n, dur, rms = feats if feats else (None,) * 4
                elif HAVE_SOUNDFILE:  # pragma: no cover - needs soundfile
                    data, sr = soundfile.read(io.BytesIO(payload))
                    n = int(data.shape[0])
                    dur = n / sr
                    rms = round(float((data**2).mean() ** 0.5), 4)
                elif decode_stub is False:
                    raise ValueError(
                        "un-decodable audio payload in strict mode "
                        f"(media_id={media_id})"
                    )
                else:
                    sr, n, dur, rms = _decode_audio_stub(payload)
                rows.append((media_id, sr, n, dur, rms))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "duration_s", "rms"],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


FRAME_STRIDE_S = 0.5


def sample_video_frames(media: DataFrame, decode_stub: bool | None = None) -> DataFrame:
    """Frame sampling: one video payload → N frame rows (UDTF-shaped fan-out
    inside mapInPandas, so output batches are decoupled from input batches —
    the same contract a real ffmpeg/PyAV keyframe sampler needs).

    YUV4MPEG2 payloads are REALLY demuxed (``media_codecs.decode_y4m``):
    one row per frame, timestamp from the container frame rate, digest of the
    actual Y-plane bytes. Other codecs (H.264/VP9/…) need PyAV/ffmpeg, absent
    here — they raise in strict mode (``decode_stub=False``), otherwise fall
    to the stub (``1 + digest[3] % 4`` frames at a fixed stride, each with a
    content-derived digest standing in for the decoded frame tensor)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if decode_stub is not True and media_codecs.sniff(payload) == "y4m":
                    demuxed = _try_decode(
                        media_codecs.decode_y4m, payload, media_id,
                        strict=decode_stub is False,
                    )
                    if demuxed is None:
                        # corrupt stream: one NULL marker row, never zero
                        # silent rows and never fabricated frames
                        rows.append((media_id, None, None, None))
                        continue
                    _w, _h, fps, frames = demuxed
                    for i, fr in enumerate(frames):
                        rows.append(
                            (
                                media_id,
                                i,
                                round(i / fps, 4),
                                hashlib.sha256(fr).hexdigest(),
                            )
                        )
                    continue
                if decode_stub is False:  # pragma: no cover - needs PyAV
                    raise NotImplementedError(
                        "real video decoding beyond YUV4MPEG2 requires "
                        "PyAV/ffmpeg, absent here"
                    )
                digest = hashlib.sha256(payload).digest()
                n_frames = 1 + digest[3] % 4
                for i in range(n_frames):
                    frame_digest = hashlib.sha256(
                        payload + b":" + str(i).encode()
                    ).hexdigest()
                    rows.append((media_id, i, round(i * FRAME_STRIDE_S, 2), frame_digest))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_s", "frame_digest"]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=VIDEO_FRAMES_SCHEMA
    )


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ahash64", LongType(), True),
    ]
)


def average_hash(media: DataFrame, decode_stub: bool | None = None) -> DataFrame:
    """64-bit perceptual average-hash (aHash) per image payload: decode →
    grayscale → 8×8 downsample → bit i set iff cell i is brighter than the
    image mean. Near-identical images (re-encodes, small edits) land
    within a few bits, so the SimHash pigeonhole banding
    (`operators/dedup.simhash_pairs`) applies unchanged to the output —
    THE scalable image near-dup pipeline: map-only hashing, one banding
    shuffle, bit_count verify on candidates only.

    Determinism contract (what the oracle leans on): grayscale is the
    exact channel mean, the 8×8 reduction is the exact box average when
    both dimensions divide by 8 (nearest-neighbor otherwise), and bit
    index = row*8 + col from the top-left, LSB first; the unsigned bit
    vector is reinterpreted as a signed int64 (two's complement), same
    convention as SimHash fingerprints. Stub path (no decodable payload):
    sha256-derived bits, still deterministic.
    """

    def _hash_pixels(px) -> int:
        import numpy as np

        gray = px.astype(np.float64).mean(axis=2)
        h, w = gray.shape
        if h % 8 == 0 and w % 8 == 0:
            cells = gray.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
        else:
            cells = media_codecs.resize_nearest(
                px, 8, 8
            ).astype(np.float64).mean(axis=2)
        mean = cells.mean()
        u = 0
        for i, v in enumerate(cells.ravel()):
            if v > mean:
                u |= 1 << i
        return u - (1 << 64) if u >= (1 << 63) else u

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None))
                    continue
                payload = bytes(payload)
                if decode_stub is not True and media_codecs.sniff(
                    payload
                ) in _IMAGE_FORMATS:
                    fp = _try_decode(
                        lambda p: _hash_pixels(
                            media_codecs.decode_image_pixels(p)
                        ),
                        payload, media_id, strict=decode_stub is False,
                    )
                elif decode_stub is False:
                    raise ValueError(
                        "un-decodable image payload in strict mode "
                        f"(media_id={media_id})"
                    )
                else:
                    digest = hashlib.sha256(payload).digest()
                    u = int.from_bytes(digest[:8], "big")
                    fp = u - (1 << 64) if u >= (1 << 63) else u
                rows.append((media_id, fp))
            yield pd.DataFrame(rows, columns=["media_id", "ahash64"])

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AHASH_SCHEMA
    )


AUDIO_SIGNAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("zero_crossings", LongType(), True),
        StructField("peak_abs", LongType(), True),
        StructField("mean_abs", DoubleType(), True),
    ]
)


def audio_signal_stats(media: DataFrame, *, strict: bool = False) -> DataFrame:
    """Sample-level DSP statistics over WAV payloads: zero-crossing count
    (sign changes between consecutive samples — the cheap
    voiced/unvoiced + frequency proxy), peak amplitude, and mean absolute
    amplitude. Unlike `extract_audio_features` (aggregate RMS), this
    depends on sample ORDER — a decoder that reorders, drops, or
    byte-swaps samples changes the crossing count, which is exactly what
    the oracle query pins. Real-decode only (stdlib RIFF parser); all
    statistics are integer-exact until the final mean division. A corrupt
    payload yields a NULL-stat row (``strict=True`` raises with the
    media_id instead — round 10 review, same contract as the
    ``decode_stub`` operators)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None))
                    continue
                decoded = _try_decode(
                    media_codecs.decode_wav_samples, bytes(payload),
                    media_id, strict=strict,
                )
                if decoded is None:
                    rows.append((media_id, None, None, None, None))
                    continue
                _, x = decoded
                n = int(x.size)
                if n == 0:
                    rows.append((media_id, 0, 0, 0, 0.0))
                    continue
                neg = x < 0
                zc = int((neg[1:] != neg[:-1]).sum())
                ab = np.abs(x)
                rows.append(
                    (
                        media_id,
                        n,
                        zc,
                        int(ab.max()),
                        round(int(ab.sum()) / n, 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_samples",
                    "zero_crossings",
                    "peak_abs",
                    "mean_abs",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_SIGNAL_SCHEMA
    )


WAV_CHUNK_STATS_SCHEMA = StructType(
    [
        StructField("n_samples", LongType(), True),
        StructField("zero_crossings", LongType(), True),
        StructField("peak_abs", LongType(), True),
        StructField("sum_abs", LongType(), True),
        StructField("first_sample", IntegerType(), True),
        StructField("last_sample", IntegerType(), True),
    ]
)


def wav_signal_stats_chunked(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    sample_col: str,
    *,
    sample_rate: int = 8000,
    chunk_size: int = 65536,
) -> DataFrame:
    """Whale-key-safe variant of the per-key WAV signal pipeline
    (`media_wav_signal`): the naive form collects a key's ENTIRE ordered
    sample history into one array before encoding one giant WAV — a
    1M-event user is a 1M-element aggregation buffer. The signal
    statistics are SEGMENTABLE: zero crossings, peak, and sum-abs merge
    associatively across segments if each segment also reports its
    boundary samples (a crossing between chunk j's last sample and chunk
    j+1's first is the only cross-chunk state).

    Plan: one streaming window ranks rows per key (no array state) and
    assigns ``chunk = rank // chunk_size``; each (key, chunk) collects a
    BOUNDED sample array, round-trips it through the REAL codec
    (encode_wav → RIFF parse → stats, Arrow-batched pandas path exactly
    like `audio_signal_stats`); the final per-key aggregate sums counts,
    maxes peaks, and folds the ≤ n/chunk_size chunk-stat structs in chunk
    order to add boundary crossings. Peak per-key state is
    max(chunk_size, n/chunk_size) rows. Output schema matches
    `audio_signal_stats`: (media_id, n_samples, zero_crossings, peak_abs,
    mean_abs).
    """
    if chunk_size < 2:
        raise ValueError("chunk_size must be >= 2")

    @F.pandas_udf(WAV_CHUNK_STATS_SCHEMA)
    def _chunk_stats(samples: pd.Series) -> pd.DataFrame:
        import numpy as np

        rows = []
        for arr in samples:
            x = np.asarray(arr, dtype=np.int16)
            payload = media_codecs.encode_wav(x, sample_rate)
            _, y = media_codecs.decode_wav_samples(payload)
            n = int(y.size)
            if n == 0:
                rows.append((0, 0, 0, 0, None, None))
                continue
            neg = y < 0
            zc = int((neg[1:] != neg[:-1]).sum())
            ab = np.abs(y.astype(np.int64))
            rows.append(
                (n, zc, int(ab.max()), int(ab.sum()), int(y[0]), int(y[-1]))
            )
        return pd.DataFrame(
            rows,
            columns=[
                "n_samples",
                "zero_crossings",
                "peak_abs",
                "sum_abs",
                "first_sample",
                "last_sample",
            ],
        )

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    ranked = df.select(
        F.col(key_col).alias("media_id"),
        F.struct(*order_cols).alias("_ord"),
        F.col(sample_col).cast("int").alias("_s"),
        ((F.row_number().over(w) - 1) / F.lit(chunk_size))
        .cast("long")
        .alias("_chunk"),
    )
    per_chunk = (
        ranked.groupBy("media_id", "_chunk")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_ord", "_s"))),
                lambda st: st["_s"],
            ).alias("_samples")
        )
        .select("media_id", "_chunk", _chunk_stats("_samples").alias("_st"))
    )
    boundary_fold = F.aggregate(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "_chunk",
                    F.col("_st")["first_sample"].alias("f"),
                    F.col("_st")["last_sample"].alias("l"),
                )
            )
        ),
        F.struct(
            F.lit(None).cast("int").alias("prev_last"),
            F.lit(0).cast("long").alias("zc"),
        ),
        lambda acc, ch: F.struct(
            F.coalesce(ch["l"], acc["prev_last"]).alias("prev_last"),
            (
                acc["zc"]
                + F.when(
                    acc["prev_last"].isNotNull()
                    & ch["f"].isNotNull()
                    & ((acc["prev_last"] < 0) != (ch["f"] < 0)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("zc"),
        ),
        lambda acc: acc["zc"],
    )
    return per_chunk.groupBy("media_id").agg(
        F.sum(F.col("_st")["n_samples"]).alias("_n"),
        (F.sum(F.col("_st")["zero_crossings"]) + boundary_fold).alias(
            "zero_crossings"
        ),
        F.max(F.col("_st")["peak_abs"]).alias("peak_abs"),
        (
            F.round(
                F.sum(F.col("_st")["sum_abs"]).cast("double")
                / F.sum(F.col("_st")["n_samples"]),
                6,
            )
        ).alias("mean_abs"),
    ).select(
        "media_id",
        F.col("_n").alias("n_samples"),
        "zero_crossings",
        "peak_abs",
        "mean_abs",
    )
