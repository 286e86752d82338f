"""Pure-Python MS-Numpress codecs (linear / pic / slof).

MS-Numpress is the public PSI-approved compression family for mzML binary
arrays (Teleman et al., "Numerical compression schemes for proteomics mass
spectrometry data", MCP 2014; reference C++ in the ms-numpress project). The
three schemes:

- **linear** (MS:1002312): fixed-point scaling + linear-prediction residuals
  in a variable-length nibble encoding — for m/z arrays (smooth, ascending).
- **pic** (MS:1002313): round-to-nearest positive integers in the same
  nibble encoding — for ion-count intensity arrays.
- **slof** (MS:1002314): ``log(x+1)`` scaled into an unsigned 16-bit
  little-endian short — lossy logarithmic intensity compression.

Wire format facts the decoders depend on (matching the reference codec):

- the fixed point (linear/slof) is one IEEE double stored **big-endian** in
  the first 8 bytes;
- linear then stores the first two fixed-point values as 4-byte
  **little-endian** unsigned ints, and every later value as
  ``encode_int(value - (2*prev - prev2))`` with 32-bit wraparound;
- ``encode_int`` emits a head nibble (``n`` = count of leading zero nibbles,
  or ``n-8`` leading ``0xF`` nibbles for negatives) followed by the
  remaining ``8-n`` nibbles least-significant-first; nibble pairs pack
  high-nibble-first into bytes, with a single ``0x0`` pad nibble when the
  total count is odd.

Encoders exist for fixture generation and round-trip tests; the engine's
hot path only decodes. Arrays in real spectra are ~1e3-1e5 elements, parsed
inside one Spark task per file — the per-element Python loop here is the
no-pyopenms fallback path, bounded by one spectrum at a time.

Reference parity target: quantmsutils reads these arrays via pyopenms,
which links the same reference codec (see
/root/reference/quantmsutils/mzml/mzml_statistics.py binary-array handling).
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = [
    "decode_linear",
    "decode_pic",
    "decode_slof",
    "encode_linear",
    "encode_pic",
    "encode_slof",
    "optimal_linear_fixed_point",
    "optimal_slof_fixed_point",
]

_U32 = 0xFFFFFFFF


def optimal_linear_fixed_point(data) -> float:
    """Largest scale keeping every value inside a signed 32-bit int."""
    m = max(1.0, float(np.max(data)) if len(data) else 1.0)
    return float(math.floor(0x7FFFFFFF / m))


def optimal_slof_fixed_point(data) -> float:
    m = max(1.0, float(np.max(data)) if len(data) else 1.0)
    return float(math.floor(0xFFFF / math.log(m + 1.0)))


# --- nibble-stream int codec -----------------------------------------------


def _encode_int(x: int, nibbles: list[int]) -> None:
    """Append the variable-length nibble encoding of a signed 32-bit int."""
    x &= _U32
    if x & 0xF0000000 == 0:
        # count leading zero nibbles (8 for x == 0)
        l = 8
        for i in range(8):
            if (x >> (4 * (7 - i))) & 0xF:
                l = i
                break
        nibbles.append(l)
        for i in range(8 - l):
            nibbles.append((x >> (4 * i)) & 0xF)
    elif x & 0xF0000000 == 0xF0000000:
        # count leading 0xF nibbles, capped at 7 so >=1 payload nibble stays
        l = 7
        for i in range(8):
            if (x >> (4 * (7 - i))) & 0xF != 0xF:
                l = min(i, 7)
                break
        nibbles.append(l + 8)
        for i in range(8 - l):
            nibbles.append((x >> (4 * i)) & 0xF)
    else:
        nibbles.append(0)
        for i in range(8):
            nibbles.append((x >> (4 * i)) & 0xF)


class _NibbleReader:
    def __init__(self, data: bytes, start_byte: int = 0):
        self._data = data
        self._pos = 2 * start_byte  # nibble index

    def remaining(self) -> int:
        return 2 * len(self._data) - self._pos

    def peek(self) -> int:
        return self._next(advance=False)

    def next(self) -> int:
        return self._next(advance=True)

    def _next(self, advance: bool) -> int:
        byte = self._data[self._pos // 2]
        nib = (byte >> 4) if self._pos % 2 == 0 else (byte & 0xF)
        if advance:
            self._pos += 1
        return nib

    def decode_int(self) -> int:
        """One signed 32-bit int from the stream (two's complement)."""
        head = self.next()
        res = 0
        if head <= 8:
            n = head
        else:
            n = head - 8
            for i in range(n):
                res |= 0xF << (4 * (7 - i))
        if n < 8:
            if self.remaining() < 8 - n:
                raise ValueError(
                    "truncated numpress nibble stream (corrupt input)"
                )
            for i in range(8 - n):
                res |= self.next() << (4 * i)
        return res - (1 << 32) if res & 0x80000000 else res


def _pack_nibbles(nibbles: list[int]) -> bytes:
    if len(nibbles) % 2:
        nibbles = nibbles + [0]  # pad nibble; decoders treat a lone 0 as pad
    return bytes(
        (nibbles[i] << 4) | nibbles[i + 1] for i in range(0, len(nibbles), 2)
    )


# --- linear -----------------------------------------------------------------


def encode_linear(data, fixed_point: float | None = None) -> bytes:
    """m/z array -> numpress-linear bytes (fixture/round-trip use)."""
    data = np.asarray(data, dtype=np.float64)
    fp = float(fixed_point or optimal_linear_fixed_point(data))
    out = bytearray(struct.pack(">d", fp))
    if len(data) == 0:
        return bytes(out)
    ints = [int(v * fp + 0.5) for v in data]
    out += struct.pack("<I", ints[0] & _U32)
    if len(data) == 1:
        return bytes(out)
    out += struct.pack("<I", ints[1] & _U32)
    nibbles: list[int] = []
    for i in range(2, len(ints)):
        extrapol = (2 * ints[i - 1] - ints[i - 2]) & _U32
        diff = (ints[i] - extrapol) & _U32
        _encode_int(diff, nibbles)
    return bytes(out) + _pack_nibbles(nibbles)


def decode_linear(data: bytes) -> np.ndarray:
    if len(data) < 8:
        raise ValueError("numpress-linear payload shorter than its header")
    fp = struct.unpack(">d", data[:8])[0]
    # r13 audit: a corrupt header with fp <= 0 or NaN would divide the
    # whole array into inf/NaN silently (the reference codec returns
    # garbage here too — raising is strictly safer and only diverges on
    # corrupt input). Valid encoders always write fp >= 1.
    if not (fp > 0) or math.isinf(fp):
        raise ValueError(f"corrupt numpress-linear fixed point {fp!r}")
    if len(data) < 12:
        return np.empty(0, dtype=np.float64)
    out = [struct.unpack("<I", data[8:12])[0]]
    if len(data) >= 16:
        out.append(struct.unpack("<I", data[12:16])[0])
        reader = _NibbleReader(data, start_byte=16)
        while reader.remaining() > 0:
            if reader.remaining() == 1 and reader.peek() == 0:
                break  # odd-count pad nibble
            diff = reader.decode_int()
            extrapol = (2 * out[-1] - out[-2]) & _U32
            out.append((extrapol + diff) & _U32)
    return np.array(out, dtype=np.float64) / fp


# --- pic --------------------------------------------------------------------


def encode_pic(data) -> bytes:
    """Intensity array -> numpress-pic bytes (round-to-nearest counts)."""
    nibbles: list[int] = []
    for v in np.asarray(data, dtype=np.float64):
        count = int(v + 0.5)
        if not 0 <= count <= _U32:
            raise ValueError(f"pic value out of unsigned 32-bit range: {v}")
        _encode_int(count, nibbles)
    return _pack_nibbles(nibbles)


def decode_pic(data: bytes) -> np.ndarray:
    reader = _NibbleReader(data)
    out = []
    while reader.remaining() > 0:
        if reader.remaining() == 1 and reader.peek() == 0:
            break
        out.append(reader.decode_int() & _U32)
    return np.array(out, dtype=np.float64)


# --- slof -------------------------------------------------------------------


def encode_slof(data, fixed_point: float | None = None) -> bytes:
    data = np.asarray(data, dtype=np.float64)
    fp = float(fixed_point or optimal_slof_fixed_point(data))
    shorts = np.minimum(
        (np.log1p(data) * fp + 0.5).astype(np.int64), 0xFFFF
    ).astype("<u2")
    return struct.pack(">d", fp) + shorts.tobytes()


def decode_slof(data: bytes) -> np.ndarray:
    if len(data) < 8:
        raise ValueError("numpress-slof payload shorter than its header")
    fp = struct.unpack(">d", data[:8])[0]
    if not (fp > 0) or math.isinf(fp):
        raise ValueError(f"corrupt numpress-slof fixed point {fp!r}")
    if (len(data) - 8) % 2:
        # the reference codec silently ignores a trailing odd byte; a
        # short body here means truncation, which must be loud (r13
        # audit — same contract as the media codecs)
        raise ValueError(
            f"truncated numpress-slof payload: {len(data) - 8} body bytes"
        )
    shorts = np.frombuffer(data, dtype="<u2", offset=8)
    return np.expm1(shorts.astype(np.float64) / fp)
