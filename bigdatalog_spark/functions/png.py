"""Minimal pure-stdlib PNG codec (zlib + struct — no Pillow).

Implements the subset of ISO/IEC 15948 (the public PNG spec) that the
multimodal operators need: 8-bit-depth greyscale / RGB / RGBA,
non-interlaced, all five scanline filters on decode, filter-0 on encode.
This turns the image branch of the codec boundary in
operators/multimodal.py into a REAL decode: width/height/channel
statistics and nearest-neighbor resize run on actual pixel data. Video
and audio remain stubbed (they need ffmpeg-class decoders).

Numpy is used for the pixel array (already a hard dependency of the
Arrow path); the bytestream handling is stdlib only.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, RGB, grey+alpha, RGBA


def is_png(data: bytes | None) -> bool:
    return data is not None and bytes(data[:8]) == _SIGNATURE


def decode_png(data: bytes):
    """PNG bytes → (height, width, channels) uint8 numpy array.

    Supports bit depth 8, colour types 0/2/4/6, non-interlaced. Raises
    ValueError on anything else (the multimodal operator surfaces that as
    an unsupported-codec row, it does not crash the task)."""
    import numpy as np

    if not is_png(data):
        raise ValueError("not a PNG byte stream")
    data = bytes(data)
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, depth, colour, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if colour not in _CHANNELS:
                raise ValueError(f"unsupported PNG colour type {colour}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[colour]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")

    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif ftype == 2:  # Up
            out[y] = (line.astype(np.int16) + prev.astype(np.int16)) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[y, x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
    return out.reshape(height, width, channels)


def encode_png(arr) -> bytes:
    """(H, W) or (H, W, C) uint8 numpy array → PNG bytes (filter 0,
    single IDAT). C in {1, 2, 3, 4}."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    colour = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colour, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resize of an (H, W, C) array via index maps —
    pure numpy, deterministic."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[ys][:, xs]
