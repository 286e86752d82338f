"""Pure-stdlib media codecs: real decode for public container formats with
zero native dependencies.

The multimodal operators (`operators/multimodal.py`) treat media as opaque
``binary`` columns. This module supplies REAL decoders for formats whose
public specs are parseable with stdlib ``struct``/``zlib`` + numpy:

- **WAV** (RIFF PCM 8/16-bit, mono or interleaved) — sample rate, length,
  RMS energy.
- **BMP** (Windows ``BITMAPINFOHEADER``, uncompressed 24-bit) — pixels.
- **PPM** (Netpbm ``P6``, maxval 255) — pixels.
- **PNG** (8-bit gray/RGB/RGBA, non-interlaced; zlib inflate + per-row
  defilter) — pixels.
- **Y4M** (YUV4MPEG2, ``Cmono``/4:2:0) — per-frame bytes + timestamps.

Encoders for WAV/BMP/PPM/PNG let pipelines materialize payloads from numeric
columns — which is what makes the decode path *oracle-verifiable*: a query
can build a WAV from known samples, decode it, and a SQL oracle recomputes
the same features directly from the source numbers.

Everything here is driver-free Python invoked inside Arrow-batched
mapInPandas workers; per-payload cost is O(bytes) with numpy vector inner
loops. Re-expresses (for media instead of spectra) the reference pattern of
binary-container parsing at `/root/reference/quantmsutils/mzml/mzml_statistics.py:170-220`
(pyopenms C++ there; public-format structs here).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# sniffing


def sniff(payload: bytes) -> str | None:
    """Identify a payload's container format from magic bytes."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"P6" and payload[2:3] in (b"\n", b" ", b"\t", b"\r"):
        return "ppm"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    return None


# ---------------------------------------------------------------------------
# WAV


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 mono RIFF/WAVE from an int16 sample vector."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, int, float, float]:
    """(sample_rate, n_samples, duration_s, rms) from a PCM WAV payload.

    Walks RIFF chunks (fmt → data); supports PCM 8-bit (unsigned) and 16-bit
    (signed LE), any channel count (channels are averaged into one RMS).
    RMS is over samples normalized to [-1, 1], rounded to 6 decimals.
    """
    if sniff(payload) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    sample_rate = n_channels = bits = None
    data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # a short slice would silently decode a PARTIAL sample stream
            raise ValueError(
                f"truncated WAV chunk {cid!r}: header claims {size} bytes, "
                f"{len(body)} available"
            )
        if cid == b"fmt ":
            if len(body) < 16:
                # a bare struct.error here reads as a codec bug, not a
                # corrupt input (r13 audit)
                raise ValueError(
                    f"truncated WAV fmt chunk: {len(body)} bytes, need 16"
                )
            fmt_tag, n_channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV format tag {fmt_tag}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if sample_rate <= 0 or n_channels <= 0:
        raise ValueError(
            f"degenerate WAV fmt (rate={sample_rate}, channels={n_channels})"
        )
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if n_channels > 1:
        x = x[: len(x) - len(x) % n_channels].reshape(-1, n_channels)
        n_samples = x.shape[0]
        rms = float(np.sqrt((x**2).mean())) if x.size else 0.0
    else:
        n_samples = len(x)
        rms = float(np.sqrt((x**2).mean())) if x.size else 0.0
    return sample_rate, n_samples, n_samples / sample_rate, round(rms, 6)


# ---------------------------------------------------------------------------
# raster images: BMP / PPM / PNG → uint8 pixel array (H, W, C)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Uncompressed 24-bit bottom-up BMP from an (H, W, 3) uint8 RGB array."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_len = (w * 3 + 3) & ~3
    pad = row_len - w * 3
    bgr = px[::-1, :, ::-1]  # bottom-up rows, BGR byte order
    body = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    hdr = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54,
        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return hdr + body


def decode_bmp(payload: bytes) -> np.ndarray:
    if sniff(payload) != "bmp":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (hdr={hdr_size}, bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP dimensions {w}x{h}")
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_len * h, offset=data_off
    ).reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_ppm(pixels: np.ndarray) -> bytes:
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if sniff(payload) != "ppm":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace/comment-separated
    # tokens, then a single whitespace byte before binary data
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit non-interlaced PNG (gray / RGB / RGBA), filter 0 rows."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Inflate + defilter an 8-bit non-interlaced PNG into (H, W, C) uint8."""
    if sniff(payload) != "png":
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = color_type = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            # surface truncation as such, not as downstream struct/zlib
            # noise from a partial IHDR/IDAT (r13 audit)
            raise ValueError(
                f"truncated PNG chunk {tag!r}: header claims {length} "
                f"bytes, {len(body)} available"
            )
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={bit_depth}, color={color_type}, "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate PNG dimensions {w}x{h}")
    c = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) < h * (stride + 1):
        # a short inflate would silently drop trailing rows (IndexError at
        # best, a partial image at worst)
        raise ValueError(
            f"truncated PNG pixel data: need {h * (stride + 1)} bytes, "
            f"got {len(raw)}"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            cur = line
            for i in range(stride):
                left = int(cur[i - c]) if i >= c else 0
                up = int(prev[i])
                if ftype == 1:
                    cur[i] = (int(line[i]) + left) & 0xFF
                elif ftype == 3:
                    cur[i] = (int(line[i]) + (left + up) // 2) & 0xFF
                else:
                    ul = int(prev[i - c]) if i >= c else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                    cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[r] = cur
        prev = out[r]
    return out.reshape(h, w, c)


def decode_image_pixels(payload: bytes) -> np.ndarray:
    """Dispatch BMP/PPM/PNG → (H, W, C) uint8 pixel array."""
    fmt = sniff(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "png":
        return decode_png(payload)
    raise ValueError(f"no pure-Python image decoder for format {fmt!r}")


def image_features(payload: bytes) -> tuple[int, int, int, float]:
    """(width, height, n_channels, mean_luma) — luma is ITU-R BT.601
    (0.299 R + 0.587 G + 0.114 B) over [0, 1]-normalized pixels, rounded to
    4 decimals; for gray/alpha images the luma is the gray channel mean."""
    px = decode_image_pixels(payload).astype(np.float64)
    if px.size == 0:
        raise ValueError("empty image (zero-area pixel array)")
    h, w, c = px.shape
    if c >= 3:
        luma = px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
    else:
        luma = px[:, :, 0]
    return w, h, c, round(float(luma.mean()) / 255.0, 4)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample — the deterministic, engine-agnostic resize
    kernel (no antialias filter to disagree over)."""
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot resize an empty image")
    if height <= 0 or width <= 0:
        raise ValueError(f"target dimensions must be positive ({width}x{height})")
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return pixels[rows][:, cols]


# ---------------------------------------------------------------------------
# Y4M video


def encode_y4m_mono(frames: list[np.ndarray], fps_num: int, fps_den: int) -> bytes:
    """YUV4MPEG2 Cmono stream from a list of (H, W) uint8 gray frames."""
    h, w = frames[0].shape
    hdr = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (w, h, fps_num, fps_den)
    return hdr + b"".join(b"FRAME\n" + f.tobytes() for f in frames)


def decode_y4m(payload: bytes):
    """Parse a YUV4MPEG2 stream → (width, height, fps, [frame Y-plane bytes]).

    Supports ``Cmono`` (Y only) and 4:2:0 (Y + quarter-size U/V; only the Y
    plane is returned per frame). Frame timestamps are ``idx * den / num``.
    """
    if sniff(payload) != "y4m":
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M stream header is unterminated (no newline)")
    w = h = None
    fps_num, fps_den = 30, 1
    mono = False
    for tok in payload[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps_num, fps_den = (int(x) for x in tok[1:].split(b":"))
        elif tok[:1] == b"C":
            mono = tok[1:] == b"mono"
            # Only Cmono and the 4:2:0 family stride correctly below; a
            # C444/C422/C411 stream previously failed by ACCIDENT (the
            # wrong frame_len mis-aligned the next FRAME marker) with a
            # misleading "frame marker missing" — reject it as what it
            # is (r13 audit).
            if not mono and not tok[1:].startswith(b"420"):
                raise ValueError(
                    f"unsupported Y4M colorspace {tok[1:].decode('ascii', 'replace')!r}"
                    " (Cmono and C420* only)"
                )
    if w is None or h is None:
        raise ValueError("Y4M missing W/H")
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate Y4M dimensions {w}x{h}")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError(f"degenerate Y4M frame rate {fps_num}:{fps_den}")
    if not mono and (w % 2 or h % 2):
        # 4:2:0 chroma planes are w/2 x h/2; odd dimensions would mis-stride
        # every frame after the first
        raise ValueError(f"4:2:0 Y4M requires even dimensions, got {w}x{h}")
    frame_len = w * h if mono else w * h + 2 * ((w // 2) * (h // 2))
    frames, pos = [], nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        fnl = payload.find(b"\n", pos)  # FRAME line (may carry params)
        if fnl < 0:
            raise ValueError(
                f"unterminated Y4M FRAME line at frame {len(frames)}"
            )
        if fnl + 1 + frame_len > len(payload):
            # a short tail would silently emit a PARTIAL final Y plane
            raise ValueError(
                f"truncated Y4M frame {len(frames)}: need {frame_len} bytes, "
                f"{len(payload) - fnl - 1} available"
            )
        frames.append(payload[fnl + 1 : fnl + 1 + w * h])  # Y plane only
        pos = fnl + 1 + frame_len
    return w, h, fps_num / fps_den, frames


def decode_wav_samples(payload: bytes) -> tuple[int, "np.ndarray"]:
    """(sample_rate, raw integer samples) from a PCM WAV payload — the
    sample-level sibling of :func:`decode_wav` for DSP-style features
    (zero crossings, peaks) where the aggregate RMS is not enough.
    16-bit returns the signed ints as stored; 8-bit returns center-shifted
    ints; multi-channel interleaving is preserved (callers that need mono
    average or slice)."""
    if sniff(payload) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    sample_rate = bits = None
    data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(
                f"truncated WAV chunk {cid!r}: header claims {size} bytes, "
                f"{len(body)} available"
            )
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(
                    f"truncated WAV fmt chunk: {len(body)} bytes, need 16"
                )
            fmt_tag, _n_channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV format tag {fmt_tag}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if sample_rate <= 0:
        raise ValueError(f"degenerate WAV sample rate {sample_rate}")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.int64)
    elif bits == 8:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    return sample_rate, x
