"""Multimodal plumbing tests: schemas, mapInPandas shapes, byte-budget
partitioning. Decode itself is stubbed (no codec libs in container)."""

import pytest

from bigdatalog_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
    sample_frames,
)


def _media(spark):
    rows = [
        (1, "image", b"\x89PNG" + bytes(range(64)), (64, 64, None, None, "png")),
        (2, "image", b"\xff\xd8" + bytes(range(32)), (32, 32, None, None, "jpeg")),
        (3, "audio", b"RIFF" + bytes(100), (None, None, 16000, 2500, "wav")),
        (4, "video", b"\x00\x00ftyp" + bytes(200), (640, 480, None, 3500, "h264")),
        (5, "image", None, (None, None, None, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shape(spark):
    out = extract_features(_media(spark)).collect()
    assert len(out) == 5
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id[1]["feature"]) == 8
    assert abs(sum(by_id[1]["feature"]) - 1.0) < 1e-6  # histogram normalized
    assert by_id[5]["n_bytes"] == 0


def test_extract_features_deterministic(spark):
    a = {r["media_id"]: r["feature"] for r in extract_features(_media(spark)).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(_media(spark)).collect()}
    assert a == b


def test_extract_features_strict_mode_raises(spark):
    with pytest.raises(Exception):  # NotImplementedError inside executor
        extract_features(_media(spark), deterministic_fake=False).collect()


def test_resize_images_filters_and_rewrites_meta(spark):
    out = resize_images(_media(spark), 16, 16).collect()
    assert {r["media_id"] for r in out} == {1, 2, 5}
    for r in out:
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 16


def test_sample_frames_one_row_per_second(spark):
    out = sample_frames(_media(spark), every_ms=1000).collect()
    # video id=4 has duration 3500ms → ts 0,1000,2000,3000
    assert [r["ts_ms"] for r in sorted(out, key=lambda r: r["ts_ms"])] == [0, 1000, 2000, 3000]
    assert all(r["media_id"] == 4 for r in out)
