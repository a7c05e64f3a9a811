"""Pure-stdlib WAV codec (functions/wav.py) + the real-audio feature path
through operators/multimodal.extract_features."""

import math

import numpy as np
import pytest

from bigdatalog_spark.functions.wav import (
    decode_wav,
    encode_wav,
    is_wav,
    wav_features,
)


def _sine(freq=440.0, rate=8000, secs=0.25, amp=0.5, channels=1):
    t = np.arange(int(rate * secs)) / rate
    mono = amp * np.sin(2 * math.pi * freq * t)
    return np.stack([mono] * channels, axis=1)


@pytest.mark.parametrize("width", [1, 2, 4])
def test_roundtrip_widths(width):
    arr = _sine()
    data = encode_wav(arr, 8000, sampwidth=width)
    assert is_wav(data)
    out, rate = decode_wav(data)
    assert rate == 8000
    assert out.shape == arr.shape
    # quantization error bounded by one step of the width
    tol = 2.0 / (2 ** (8 * width - 1)) + 1e-9
    assert np.abs(out - arr).max() <= tol


def test_stereo_roundtrip():
    arr = _sine(channels=2)
    arr[:, 1] *= 0.25  # distinct channels survive the interleave
    out, rate = decode_wav(encode_wav(arr, 16000))
    assert out.shape == arr.shape
    assert np.abs(out - arr).max() < 1e-3


def test_rejects_non_wav():
    assert not is_wav(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")


def test_features_from_real_samples():
    # 440 Hz sine at 8 kHz for 0.25 s: rms = amp/sqrt(2), zero-crossing
    # rate ≈ 2·f/rate, duration 250 ms
    data = encode_wav(_sine(), 8000)
    f = wav_features(data)
    assert f[0] == 8000.0 and f[1] == 1.0
    assert abs(f[2] - 250.0) < 1.0
    assert abs(f[3] - 0.5 / math.sqrt(2)) < 1e-3
    assert abs(f[4] - 0.5) < 1e-3
    assert abs(f[6] - 2 * 440.0 / 8000.0) < 0.01
    assert abs(f[7]) < 1e-3


def test_extract_features_real_wav_strict(spark):
    """extract_features in STRICT mode (no fake) works on a real WAV
    payload — sample rate/duration/rms come from actual samples."""
    from bigdatalog_spark.operators.multimodal import extract_features

    data = encode_wav(_sine(), 8000)
    rows = [
        (1, "audio", bytearray(data),
         {"width": None, "height": None, "sample_rate": 8000,
          "duration_ms": 250, "codec": "pcm_s16le"}),
    ]
    media = spark.createDataFrame(rows, schema="""
        media_id long, kind string, payload binary,
        meta struct<width:int,height:int,sample_rate:int,
                    duration_ms:long,codec:string>
    """)
    (feat,) = extract_features(media, deterministic_fake=False).collect()
    f = feat["feature"]
    assert f[0] == 8000.0
    assert abs(f[2] - 250.0) < 1.0
    assert abs(f[3] - 0.5 / math.sqrt(2)) < 1e-3


def test_video_still_raises_strict(spark):
    """The honest stub boundary is unchanged for video."""
    from bigdatalog_spark.operators.multimodal import extract_features

    rows = [
        (1, "video", bytearray(b"\x00\x01\x02"),
         {"width": None, "height": None, "sample_rate": None,
          "duration_ms": None, "codec": "h264"}),
    ]
    media = spark.createDataFrame(rows, schema="""
        media_id long, kind string, payload binary,
        meta struct<width:int,height:int,sample_rate:int,
                    duration_ms:long,codec:string>
    """)
    with pytest.raises(Exception, match="NotImplementedError|requires codec"):
        extract_features(media, deterministic_fake=False).collect()


def test_resample_linear_halves_and_preserves_ramp():
    from bigdatalog_spark.functions.wav import resample_linear

    ramp = np.linspace(0, 1, 800, endpoint=False).reshape(-1, 1)
    out = resample_linear(ramp, 8000, 4000)
    assert out.shape == (400, 1)
    # a ramp survives linear interpolation exactly at interior points
    assert np.abs(out[:, 0] - np.linspace(0, 1, 800, endpoint=False)[::2]).max() < 1e-9


def test_resample_audio_real_wav(spark):
    from bigdatalog_spark.functions.wav import decode_wav
    from bigdatalog_spark.operators.multimodal import resample_audio

    data = encode_wav(_sine(rate=8000, secs=0.5), 8000)
    rows = [
        (1, "audio", bytearray(data),
         {"width": None, "height": None, "sample_rate": 8000,
          "duration_ms": 500, "codec": "pcm_s16le"}),
    ]
    media = spark.createDataFrame(rows, schema="""
        media_id long, kind string, payload binary,
        meta struct<width:int,height:int,sample_rate:int,
                    duration_ms:long,codec:string>
    """)
    (row,) = resample_audio(media, 4000, deterministic_fake=False).collect()
    arr, rate = decode_wav(bytes(row.payload))
    assert rate == 4000
    assert row.meta.sample_rate == 4000
    assert abs(len(arr) - 2000) <= 1  # half the frames at half the rate
    assert abs(row.meta.duration_ms - 500) <= 1  # duration preserved


def test_wav_roundtrip_property():
    """Hypothesis: any bounded float signal survives 16-bit encode/decode
    within one quantization step, any rate/channel count."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None, derandomize=True)
    @given(
        vals=st.lists(
            st.floats(min_value=-1.0, max_value=1.0,
                      allow_nan=False, allow_infinity=False),
            min_size=1, max_size=64,
        ),
        rate=st.sampled_from([8000, 16000, 44100]),
        channels=st.integers(1, 3),
    )
    def prop(vals, rate, channels):
        arr = np.tile(np.asarray(vals).reshape(-1, 1), (1, channels))
        out, got_rate = decode_wav(encode_wav(arr, rate))
        assert got_rate == rate
        assert out.shape == arr.shape
        assert np.abs(out - np.clip(arr, -1, 1 - 1 / 32768.0)).max() <= 1 / 32768.0 + 1e-12

    prop()
