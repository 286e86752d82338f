"""Unit tests for the pure-stdlib media codecs and their wiring into the
multimodal operators: REAL decode of WAV/BMP/PPM/PNG/Y4M payloads with zero
native dependencies."""

from __future__ import annotations

import hashlib
import math
import struct
import zlib

import numpy as np
import pytest

from quantms_utils_spark.functions import media_codecs as mc


# ---------------------------------------------------------------------------
# sniffing


def test_sniff_magic_bytes():
    assert mc.sniff(mc.encode_wav(np.zeros(4, dtype=np.int16), 8000)) == "wav"
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert mc.sniff(mc.encode_bmp(px)) == "bmp"
    assert mc.sniff(mc.encode_ppm(px)) == "ppm"
    assert mc.sniff(mc.encode_png(px)) == "png"
    y4m = mc.encode_y4m_mono([np.zeros((2, 2), dtype=np.uint8)], 2, 1)
    assert mc.sniff(y4m) == "y4m"
    assert mc.sniff(b"not a media payload at all") is None
    assert mc.sniff(b"") is None


# ---------------------------------------------------------------------------
# WAV


def test_wav_roundtrip_known_rms():
    # full-scale square wave: rms = 16384/32768 = 0.5 exactly
    samples = np.array([16384, -16384] * 50, dtype=np.int16)
    payload = mc.encode_wav(samples, 16000)
    sr, n, dur, rms = mc.decode_wav(payload)
    assert (sr, n) == (16000, 100)
    assert dur == pytest.approx(100 / 16000)
    assert rms == 0.5


def test_wav_8bit_and_stereo():
    # 8-bit unsigned: 128 is silence
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + 4, b"WAVE",
        b"fmt ", 16, 1, 1, 8000, 8000, 1, 8,
        b"data", 4,
    )
    sr, n, dur, rms = mc.decode_wav(hdr + bytes([128, 128, 255, 1]))
    assert (sr, n) == (8000, 4)
    assert rms == pytest.approx(
        round(math.sqrt((0 + 0 + (127 / 128) ** 2 + (127 / 128) ** 2) / 4), 6)
    )
    # stereo PCM16: frames counted per channel-pair
    stereo = np.array([1000, -1000, 2000, -2000], dtype=np.int16)
    data = stereo.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 2, 44100, 44100 * 4, 4, 16,
        b"data", len(data),
    )
    sr, n, dur, rms = mc.decode_wav(hdr + data)
    assert (sr, n) == (44100, 2)


def test_wav_rejects_non_pcm():
    bad = bytearray(mc.encode_wav(np.zeros(4, dtype=np.int16), 8000))
    struct.pack_into("<H", bad, 20, 3)  # fmt tag 3 = IEEE float
    with pytest.raises(ValueError, match="format tag"):
        mc.decode_wav(bytes(bad))


# ---------------------------------------------------------------------------
# rasters


def _gradient(h, w):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(w)[None, :] % 256
    px[:, :, 1] = np.arange(h)[:, None] * 3 % 256
    px[:, :, 2] = 17
    return px


@pytest.mark.parametrize("codec", ["bmp", "ppm", "png"])
def test_raster_roundtrip_exact(codec):
    px = _gradient(5, 7)  # odd width exercises BMP row padding
    enc = getattr(mc, f"encode_{codec}")
    dec = getattr(mc, f"decode_{codec}")
    assert np.array_equal(dec(enc(px)), px)


def test_png_gray_and_rgba_roundtrip():
    gray = (np.arange(12, dtype=np.uint8) * 20).reshape(3, 4)
    out = mc.decode_png(mc.encode_png(gray))
    assert np.array_equal(out[:, :, 0], gray)
    rgba = np.random.default_rng(7).integers(0, 255, (4, 3, 4), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(rgba)), rgba)


def test_png_defilter_all_filter_types():
    """Decode a PNG whose rows use filters 0-4 (hand-built)."""
    h, w, c = 5, 4, 3
    rng = np.random.default_rng(11)
    px = rng.integers(0, 255, (h, w, c), dtype=np.uint8)

    def filt(r):
        cur = px[r].reshape(-1).astype(np.int16)
        prev = px[r - 1].reshape(-1).astype(np.int16) if r else np.zeros(w * c, np.int16)
        left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
        ul = np.concatenate([np.zeros(c, np.int16), prev[:-c]])
        if r == 0:
            return b"\x00" + bytes((cur % 256).astype(np.uint8))
        if r == 1:
            return b"\x01" + bytes(((cur - left) % 256).astype(np.uint8))
        if r == 2:
            return b"\x02" + bytes(((cur - prev) % 256).astype(np.uint8))
        if r == 3:
            return b"\x03" + bytes(((cur - (left + prev) // 2) % 256).astype(np.uint8))
        p = left + prev - ul
        pa, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc_), left, np.where(pb <= pc_, prev, ul))
        return b"\x04" + bytes(((cur - pred) % 256).astype(np.uint8))

    raw = b"".join(filt(r) for r in range(h))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(payload), px)


def test_image_features_uniform_color():
    px = np.full((6, 8, 3), 0, dtype=np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = 100, 50, 200
    w, h, c, luma = mc.image_features(mc.encode_bmp(px))
    expect = round((0.299 * 100 + 0.587 * 50 + 0.114 * 200) / 255.0, 4)
    assert (w, h, c) == (8, 6, 3)
    assert luma == expect


def test_resize_nearest_uniform_preserves_color():
    px = np.full((16, 16, 3), 123, dtype=np.uint8)
    small = mc.resize_nearest(px, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.all(small == 123)
    up = mc.resize_nearest(small, 9, 5)
    assert up.shape == (5, 9, 3)
    assert np.all(up == 123)


# ---------------------------------------------------------------------------
# Y4M


def test_y4m_mono_roundtrip():
    frames = [np.full((4, 6), 10 * i, dtype=np.uint8) for i in range(3)]
    payload = mc.encode_y4m_mono(frames, 2, 1)
    w, h, fps, got = mc.decode_y4m(payload)
    assert (w, h, fps) == (6, 4, 2.0)
    assert [f for f in got] == [f.tobytes() for f in frames]


def test_y4m_420_extracts_y_plane():
    w, h = 4, 2
    y = bytes(range(w * h))
    uv = bytes([128] * ((w // 2) * (h // 2))) * 2
    payload = (
        b"YUV4MPEG2 W4 H2 F30:1 Ip A1:1 C420jpeg\n"
        + b"FRAME\n" + y + uv + b"FRAME\n" + y + uv
    )
    gw, gh, fps, frames = mc.decode_y4m(payload)
    assert (gw, gh, fps) == (4, 2, 30.0)
    assert frames == [y, y]


# ---------------------------------------------------------------------------
# operator wiring: real decode inside mapInPandas


def test_operators_really_decode_codec_payloads(spark):
    from quantms_utils_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_features,
        resize_images,
        sample_video_frames,
    )

    wav = mc.encode_wav(np.array([16384, -16384] * 8, dtype=np.int16), 8000)
    bmp = mc.encode_bmp(np.full((6, 8, 3), 90, dtype=np.uint8))
    y4m = mc.encode_y4m_mono(
        [np.full((4, 4), 7, dtype=np.uint8)] * 3, 2, 1
    )
    media = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(bmp)), (3, bytearray(y4m))],
        "media_id long, payload binary",
    )

    audio = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert audio[1].sample_rate == 8000
    assert audio[1].n_samples == 16
    assert audio[1].rms == 0.5
    # non-wav payloads fall to the deterministic stub, not an error
    assert audio[2].sample_rate in (8000, 16000, 24000, 32000, 40000)

    img = {r.media_id: r for r in extract_image_features(media).collect()}
    assert (img[2].width, img[2].height, img[2].n_channels) == (8, 6, 3)
    assert img[2].mean_luma == round(90 / 255.0, 4)

    thumbs = {r.media_id: r for r in resize_images(media, 4, 4).collect()}
    out = mc.decode_png(bytes(thumbs[2].thumbnail))
    assert out.shape == (4, 4, 3)
    assert np.all(out == 90)

    frames = sample_video_frames(media.filter("media_id = 3")).collect()
    assert [r.frame_idx for r in frames] == [0, 1, 2]
    assert [r.ts_s for r in frames] == [0.0, 0.5, 1.0]
    expect_digest = hashlib.sha256(bytes([7] * 16)).hexdigest()
    assert all(r.frame_digest == expect_digest for r in frames)


def test_strict_mode_raises_on_undecodable(spark):
    from quantms_utils_spark.operators.multimodal import extract_image_features

    media = spark.createDataFrame(
        [(1, bytearray(b"garbage bytes not an image"))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="strict mode"):
        extract_image_features(media, decode_stub=False).collect()


def test_average_hash_known_pattern(spark):
    import numpy as np

    from quantms_utils_spark.functions import media_codecs as mc
    from quantms_utils_spark.operators.multimodal import average_hash

    # 8x8 image, first row bright, rest dark -> bits 0..7 set
    px8 = np.full((8, 8), 10, dtype=np.uint8)
    px8[0, :] = 250
    img = np.stack([px8] * 3, axis=2)
    media = spark.createDataFrame(
        [(1, bytearray(mc.encode_bmp(img)))], "media_id long, payload binary"
    )
    row = average_hash(media).collect()[0]
    assert row.ahash64 == 0xFF

    # 16x16 upscale (2x2 blocks) must give the SAME hash via box pooling
    big = np.repeat(np.repeat(px8, 2, axis=0), 2, axis=1)
    media2 = spark.createDataFrame(
        [(2, bytearray(mc.encode_bmp(np.stack([big] * 3, axis=2))))],
        "media_id long, payload binary",
    )
    assert average_hash(media2).collect()[0].ahash64 == 0xFF


def test_average_hash_sign_convention(spark):
    import numpy as np

    from quantms_utils_spark.functions import media_codecs as mc
    from quantms_utils_spark.operators.multimodal import average_hash

    # only the LAST cell bright -> bit 63 set -> negative signed int64
    px8 = np.full((8, 8), 10, dtype=np.uint8)
    px8[7, 7] = 250
    media = spark.createDataFrame(
        [(1, bytearray(mc.encode_bmp(np.stack([px8] * 3, axis=2))))],
        "media_id long, payload binary",
    )
    row = average_hash(media).collect()[0]
    assert row.ahash64 == (1 << 63) - (1 << 64)


def test_average_hash_null_payload(spark):
    from quantms_utils_spark.operators.multimodal import average_hash

    media = spark.createDataFrame(
        [(1, None)], "media_id long, payload binary"
    )
    assert average_hash(media).collect()[0].ahash64 is None


def test_decode_wav_samples_roundtrip():
    import numpy as np

    from quantms_utils_spark.functions import media_codecs as mc

    sig = np.array([0, 100, -100, 32767, -32768, 5], dtype=np.int16)
    rate, back = mc.decode_wav_samples(mc.encode_wav(sig, 8000))
    assert rate == 8000
    assert back.tolist() == sig.astype(np.int64).tolist()


def test_audio_signal_stats_known_signal(spark):
    import numpy as np

    from quantms_utils_spark.functions import media_codecs as mc
    from quantms_utils_spark.operators.multimodal import audio_signal_stats

    # signs: + + - - + : 2 crossings; peak 4; mean |.| = (1+2+3+4+2)/5
    sig = np.array([1, 2, -3, -4, 2], dtype=np.int16)
    media = spark.createDataFrame(
        [(7, bytearray(mc.encode_wav(sig, 16000)))],
        "media_id long, payload binary",
    )
    r = audio_signal_stats(media).collect()[0]
    assert (r.n_samples, r.zero_crossings, r.peak_abs) == (5, 2, 4)
    assert r.mean_abs == round(12 / 5, 6)


class TestCodecCorruptionGuards:
    """Round-10 (review): truncated/degenerate payloads raise loudly in the
    codecs (never a silent partial decode), and the Spark operators turn
    decode failures into NULL rows in lenient mode instead of aborting the
    job — or raise with the media_id in strict mode."""

    def test_truncated_wav_data_chunk_raises(self):
        import numpy as np
        import pytest

        from quantms_utils_spark.functions.media_codecs import (
            decode_wav,
            decode_wav_samples,
            encode_wav,
        )

        wav = encode_wav(np.arange(100, dtype=np.int16), 8000)
        cut = wav[:-20]  # data chunk header still claims 200 bytes
        with pytest.raises(ValueError, match="truncated WAV chunk"):
            decode_wav(cut)
        with pytest.raises(ValueError, match="truncated WAV chunk"):
            decode_wav_samples(cut)

    def test_truncated_y4m_frame_raises(self):
        import numpy as np
        import pytest

        from quantms_utils_spark.functions.media_codecs import (
            decode_y4m,
            encode_y4m_mono,
        )

        frames = [np.full((4, 4), i, dtype=np.uint8) for i in range(3)]
        y4m = encode_y4m_mono(frames, 30, 1)
        with pytest.raises(ValueError, match="truncated Y4M frame"):
            decode_y4m(y4m[:-5])  # last frame short
        # odd-dimension 4:2:0 refused (chroma stride would corrupt)
        hdr420 = y4m.replace(b"Cmono", b"C420jpeg", 1).replace(
            b"W4 H4", b"W3 H3", 1
        )
        with pytest.raises(ValueError, match="even dimensions"):
            decode_y4m(hdr420)

    def test_truncated_png_raises(self):
        import numpy as np
        import pytest

        from quantms_utils_spark.functions.media_codecs import (
            decode_png,
            encode_png,
        )
        import struct
        import zlib

        px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        png = encode_png(px)
        # rebuild with an IDAT that inflates short (drop the last raw row)
        sig, rest = png[:8], png[8:]
        (ihdr_len,) = struct.unpack_from(">I", rest, 0)
        ihdr_chunk = rest[: 12 + ihdr_len]
        raw = b"".join(b"\x00" + px[r].tobytes() for r in range(3))  # 3 of 4
        body = zlib.compress(raw)
        idat = (
            struct.pack(">I", len(body)) + b"IDAT" + body
            + struct.pack(">I", zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF)
        )
        iend = struct.pack(">I", 0) + b"IEND" + struct.pack(
            ">I", zlib.crc32(b"IEND") & 0xFFFFFFFF
        )
        with pytest.raises(ValueError, match="truncated PNG"):
            decode_png(sig + ihdr_chunk + idat + iend)

    def test_resize_and_features_reject_degenerate(self):
        import numpy as np
        import pytest

        from quantms_utils_spark.functions.media_codecs import resize_nearest

        with pytest.raises(ValueError, match="empty"):
            resize_nearest(np.zeros((0, 4, 3), dtype=np.uint8), 8, 8)
        with pytest.raises(ValueError, match="positive"):
            resize_nearest(np.zeros((4, 4, 3), dtype=np.uint8), 0, 8)

    def test_operators_null_rows_lenient_raise_strict(self, spark):
        import numpy as np

        from quantms_utils_spark.functions.media_codecs import encode_wav
        from quantms_utils_spark.operators.multimodal import (
            attach_payload_metadata,
            audio_signal_stats,
            extract_audio_features,
        )

        good = encode_wav(np.arange(64, dtype=np.int16), 8000)
        corrupt = bytes(good[:-10])  # sniffs as wav, truncated body
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(corrupt))],
            "media_id long, payload binary",
        )
        media = attach_payload_metadata(df, "payload", "media_id", "audio")

        feats = {r["media_id"]: r for r in
                 extract_audio_features(media).collect()}
        assert feats[1]["n_samples"] == 64
        assert feats[2]["n_samples"] is None  # NULL row, job survived

        stats = {r["media_id"]: r for r in
                 audio_signal_stats(media).collect()}
        assert stats[1]["n_samples"] == 64
        assert stats[2]["n_samples"] is None

        import pytest

        with pytest.raises(Exception, match="media_id=2"):
            audio_signal_stats(media, strict=True).collect()
        with pytest.raises(Exception, match="media_id=2"):
            extract_audio_features(media, decode_stub=False).collect()
