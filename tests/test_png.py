"""Pure-stdlib PNG codec + real-decode multimodal paths."""

import struct
import zlib

import numpy as np
import pytest

from bigdatalog_spark.functions.png import (
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
)


def _gradient(h, w, c):
    y = np.arange(h, dtype=np.uint8)[:, None, None]
    x = np.arange(w, dtype=np.uint8)[None, :, None]
    k = np.arange(c, dtype=np.uint8)[None, None, :]
    return (y * 7 + x * 13 + k * 41).astype(np.uint8)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_roundtrip_all_colour_types(c):
    arr = _gradient(13, 17, c)
    data = encode_png(arr)
    assert is_png(data)
    out = decode_png(data)
    assert out.shape == (13, 17, c)
    assert np.array_equal(out, arr)


def _encode_with_filter(arr, ftype):
    """Encode RGB rows with a chosen filter type to exercise decode paths
    the filter-0 encoder never emits."""
    h, w, c = arr.shape
    bpp = c
    rows = []
    prev = np.zeros(w * c, dtype=np.int16)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int16)
        if ftype == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
            filt = (line - left) & 0xFF
        elif ftype == 2:  # Up
            filt = (line - prev) & 0xFF
        elif ftype == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
            filt = (line - (left + prev) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (line - pred) & 0xFF
        else:
            filt = line & 0xFF
        rows.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_all_filters(ftype):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    out = decode_png(_encode_with_filter(arr, ftype))
    assert np.array_equal(out, arr)


def test_unsupported_depth_rejected():
    # hand-build a 16-bit IHDR
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        decode_png(data)


def test_resize_nearest_shapes():
    arr = _gradient(10, 20, 3)
    out = resize_nearest(arr, 5, 4)
    assert out.shape == (4, 5, 3)
    # corners map to corners under nearest
    assert np.array_equal(out[0, 0], arr[0, 0])


def test_extract_features_real_png(spark):
    """VERDICT stretch item: extract_features in STRICT mode (no fake)
    works on a real PNG fixture — width/height/channels come from actual
    pixels."""
    from bigdatalog_spark.operators.multimodal import extract_features

    arr = _gradient(6, 8, 3)
    rows = [
        (1, "image", bytearray(encode_png(arr)),
         {"width": 8, "height": 6, "sample_rate": None,
          "duration_ms": None, "codec": "png"}),
    ]
    media = spark.createDataFrame(rows, schema="""
        media_id long, kind string, payload binary,
        meta struct<width:int,height:int,sample_rate:int,
                    duration_ms:long,codec:string>
    """)
    (feat,) = extract_features(media, deterministic_fake=False).collect()
    f = feat["feature"]
    assert (f[0], f[1], f[2]) == (8.0, 6.0, 3.0)
    assert abs(f[3] - float(arr.mean())) < 1e-5


def test_resize_images_real_png(spark):
    from bigdatalog_spark.operators.multimodal import resize_images

    arr = _gradient(12, 16, 3)
    rows = [
        (1, "image", bytearray(encode_png(arr)),
         {"width": 16, "height": 12, "sample_rate": None,
          "duration_ms": None, "codec": "png"}),
    ]
    media = spark.createDataFrame(rows, schema="""
        media_id long, kind string, payload binary,
        meta struct<width:int,height:int,sample_rate:int,
                    duration_ms:long,codec:string>
    """)
    (out,) = resize_images(media, width=4, height=3,
                           deterministic_fake=False).collect()
    decoded = decode_png(bytes(out["payload"]))
    assert decoded.shape == (3, 4, 3)
    assert out["meta"]["width"] == 4 and out["meta"]["height"] == 3
