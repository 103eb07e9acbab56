"""Minimal pure-stdlib PNG decoder — the vendored real-codec path.

The container ships no media libraries, so the multimodal family's
``codec='pil'`` seam can only be value-tested where Pillow happens to
exist. This module closes that gap with a from-the-spec decoder for
the subset the fixtures and tests exercise: the public W3C PNG
specification / RFC 2083 — 8-bit greyscale (colour type 0) and 8-bit
truecolour (colour type 2), all five scanline filters (None / Sub /
Up / Average / Paeth), single IDAT stream or split chunks, no
interlace. Truecolour converts to luma with the ITU-R 601-2 transform
in the fixed-point rounding form ``(R*19595 + G*38470 + B*7471 +
0x8000) >> 16``.

Scale note: this decoder is NOT the production hot path — it exists
so the decode STAGE (mapInPandas batch shape, pixel plumbing,
invariants) is value-checked end to end with real image bytes. The
per-byte unfilter loop is fine for fixture-sized images; a real
deployment flips ``codec='pil'`` (or any vectorized codec) at the
same ``_decode_payload`` seam.

Reference parity: no counterpart in the reference (an HTTP adapter);
this supports SURVEY §2.4's multimodal family.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_gray(data: bytes) -> np.ndarray:
    """Decode PNG bytes to a (height, width) uint8 greyscale array.

    Supports 8-bit colour types 0 (grey, returned as-is) and 2 (RGB,
    converted to luma); raises ``ValueError`` on a non-PNG payload and
    ``NotImplementedError`` on an unsupported variant — the same
    clear-error contract as the codec seam itself.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        pos += 8
        chunk = data[pos : pos + length]
        if len(chunk) < length:  # truncated mid-chunk: clear error, not struct.error
            raise ValueError("truncated PNG payload")
        crc = data[pos + length : pos + length + 4]
        if len(crc) < 4:
            raise ValueError("truncated PNG payload")
        # verify the chunk CRC (r12 advice): a bit-flipped IHDR/IDAT that
        # stays length-consistent must be the documented clear error, not
        # silently wrong pixels
        if struct.unpack(">I", crc)[0] != (zlib.crc32(typ + chunk) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {typ!r} failed CRC check")
        pos += length + 4
        if typ == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or ctype not in (0, 2) or interlace != 0:
                raise NotImplementedError(
                    f"png codec supports 8-bit grey/RGB non-interlaced only "
                    f"(got depth={depth}, colour type={ctype}, interlace={interlace})"
                )
            channels = 1 if ctype == 0 else 3
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # cut at a chunk boundary: stream incomplete
        raise ValueError(f"truncated PNG payload: {e}") from e
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data has the wrong length")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    if (lines[:, 0] == 0).all():
        # filter-0 fast path: no unfiltering needed, pixels are the
        # scanline bytes — one NumPy slice instead of the per-byte
        # Python loop (the loop was a measured 13.7x-at-10x scale
        # cliff on the oracled pipeline's filter-0 payloads)
        arr = lines[:, 1:].reshape(height, width, channels)
        if channels == 1:
            return arr[:, :, 0].copy()
        r = arr[:, :, 0].astype(np.uint32)
        g = arr[:, :, 1].astype(np.uint32)
        b = arr[:, :, 2].astype(np.uint32)
        return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)
    prev = [0] * stride
    rows = []
    off = 0
    for _y in range(height):
        ftype = raw[off]
        line = raw[off + 1 : off + 1 + stride]
        off += stride + 1
        cur = [0] * stride
        for i in range(stride):
            x = line[i]
            a = cur[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ftype == 0:
                v = x
            elif ftype == 1:
                v = x + a
            elif ftype == 2:
                v = x + b
            elif ftype == 3:
                v = x + (a + b) // 2
            elif ftype == 4:
                v = x + _paeth(a, b, c)
            else:
                raise ValueError(f"unknown PNG filter type {ftype}")
            cur[i] = v & 0xFF
        rows.append(cur)
        prev = cur
    arr = np.array(rows, dtype=np.uint8).reshape(height, width, channels)
    if channels == 1:
        return arr[:, :, 0]
    r = arr[:, :, 0].astype(np.uint32)
    g = arr[:, :, 1].astype(np.uint32)
    b = arr[:, :, 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """Encode a (height, width) uint8 greyscale array as PNG bytes —
    colour type 0, bit depth 8, filter 0 on every scanline, one IDAT,
    correct chunk CRCs. The synthetic-asset counterpart of
    :func:`decode_png_gray` (``decode(encode(p)) == p`` exactly), so
    the multimodal pipeline's decode stage runs on REAL image bytes
    whose pixel values an oracle can derive independently."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("encode_png_gray expects a (height, width) array")
    height, width = arr.shape

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resample_nearest(frame: np.ndarray, height: int, width: int) -> np.ndarray:
    """Deterministic nearest-neighbour resample to (height, width) —
    the vendored stand-in for a codec library's resize.

    Index mapping is Pillow's NEAREST center sampling — source pixel
    ``floor((i + 0.5) * src / dst)`` — so ``codec='png'`` and
    ``codec='pil'`` yield the same pixels for the same asset when the
    declared geometry differs from the native size (r12 advice: the
    seam contract says only the codec string changes). The fixed-point
    form ``((2i + 1) * src) // (2 * dst)`` avoids float error."""
    sh, sw = frame.shape
    ys = ((2 * np.arange(height) + 1) * sh) // (2 * height)
    xs = ((2 * np.arange(width) + 1) * sw) // (2 * width)
    return frame[np.ix_(ys, xs)]
