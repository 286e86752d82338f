"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns travelling next to typed metadata
(shape, codec, duration, digest). The Spark-side contract — schemas,
Arrow-batched UDF signatures, partitioning — is real and tested; the actual
decode kernels depend on media libraries that are not part of this
environment, so they are gated: if PIL/soundfile are importable they run,
otherwise ``decode_stub=True`` substitutes a deterministic fake so pipelines
remain runnable and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
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
        StructField("mean_luma", StringType(), True),
    ]
)

try:  # pragma: no cover - environment-dependent
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False


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


def _decode_image_stub(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decode: dimensions derived from the content digest.

    Stands in for PIL decoding when the library is absent; the Spark-side
    batch shape and schema are identical to the real path.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 3
    mean_luma = f"{digest[2] / 255.0:.4f}"
    return width, height, channels, mean_luma


def extract_image_features(media: DataFrame, decode_stub: bool | None = None) -> DataFrame:
    """Decode / feature-extract over an opaque image payload column via
    mapInPandas (Arrow-batched; one task per input partition — the unit of
    parallelism is the file/object, matching how a 100 TB object store scan
    parallelizes)."""
    use_stub = decode_stub if decode_stub is not None else not HAVE_PIL

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None))
                    continue
                payload = bytes(payload)
                if use_stub:
                    w, h, c, luma = _decode_image_stub(payload)
                else:  # pragma: no cover - needs PIL + real images
                    img = PIL.Image.open(io.BytesIO(payload))
                    w, h = img.size
                    c = len(img.getbands())
                    luma = f"{sum(img.convert('L').getdata()) / (255.0 * w * h):.4f}"
                rows.append((media_id, w, h, c, luma))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels", "mean_luma"]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )
