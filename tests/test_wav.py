"""Pure-stdlib WAV codec (functions/wav.py) + the real-audio feature path
through operators/multimodal.extract_features."""

import io
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


def test_truncated_wav_raises_valueerror():
    """stdlib wave raises EOFError/struct.error on truncated RIFF
    payloads; decode_wav must keep its documented ValueError contract so
    the multimodal stub fallback fires instead of crashing the task."""
    truncated = b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00"
    with pytest.raises(ValueError):
        decode_wav(truncated)
    # a full WAV chopped mid-data-chunk must also stay inside ValueError
    data = encode_wav(_sine(), 8000)
    for cut in (13, 20, 30, len(data) // 2):
        try:
            decode_wav(data[:cut])
        except ValueError:
            pass  # acceptable
        # anything else (EOFError, struct.error) propagates and fails


def test_8bit_full_range_symmetric():
    """8-bit decode stays within [-1, 1] (byte 0 → exactly -1.0) and
    encode reaches byte 255 — no truncation bias."""
    import wave as _wave

    # byte 0 and byte 255 straight through the decoder
    raw = encode_wav(np.array([[-1.0], [1.0], [0.0]]), 8000, sampwidth=1)
    with _wave.open(io.BytesIO(raw)) as w:
        frames = w.readframes(3)
    assert frames[0] == 0 and frames[1] == 255 and frames[2] == 128
    out, _ = decode_wav(raw)
    assert out[0, 0] == -1.0
    assert -1.0 <= out.min() and out.max() <= 1.0
    # roundtrip bias: mean error of a dense ramp must be ~0, not one-sided
    ramp = np.linspace(-1, 1, 1001).reshape(-1, 1)
    rt, _ = decode_wav(encode_wav(ramp, 8000, sampwidth=1))
    err = rt - np.clip(ramp, -1, 1 - 1 / 128.0)
    assert abs(err.mean()) < 1e-3
    assert np.abs(err).max() <= 1 / 256.0 + 1e-12


def test_float_wav_decode_real():
    """IEEE-float WAV (format code 3) decodes for real — f32 within
    float32 precision, f64 bit-exact — and feeds wav_features."""
    from bigdatalog_spark.functions.wav import encode_wav_float

    arr = _sine(rate=16000, secs=0.1)
    for width, tol in ((4, 1e-7), (8, 0.0)):
        data = encode_wav_float(arr, 16000, sampwidth=width)
        assert is_wav(data)
        out, rate = decode_wav(data)
        assert rate == 16000
        assert out.shape == arr.shape
        assert np.abs(out - arr).max() <= tol
    f = wav_features(encode_wav_float(arr, 16000))
    assert f[0] == 16000.0 and abs(f[2] - 100.0) < 1.0
    assert abs(f[3] - 0.5 / math.sqrt(2)) < 1e-3


def test_float_wav_roundtrip_property():
    """Hypothesis: any float signal survives the format-3 encode/decode —
    f64 exactly, any rate/channel count."""
    from hypothesis import given, settings, strategies as st

    from bigdatalog_spark.functions.wav import encode_wav_float

    @settings(max_examples=25, deadline=None, derandomize=True)
    @given(
        vals=st.lists(
            st.floats(min_value=-4.0, max_value=4.0,  # float WAV is unclamped
                      allow_nan=False, allow_infinity=False),
            min_size=1, max_size=64,
        ),
        rate=st.sampled_from([8000, 22050, 48000]),
        channels=st.integers(1, 3),
    )
    def prop(vals, rate, channels):
        arr = np.tile(np.asarray(vals).reshape(-1, 1), (1, channels))
        out, got_rate = decode_wav(encode_wav_float(arr, rate, sampwidth=8))
        assert got_rate == rate
        assert out.shape == arr.shape
        assert np.array_equal(out, arr)

    prop()


def test_resample_passthrough_keeps_original_rate(spark):
    """Fake-mode passthrough leaves the payload bytes unchanged, so the
    emitted meta must keep the ORIGINAL sample_rate, not claim target."""
    from bigdatalog_spark.operators.multimodal import resample_audio

    rows = [
        (1, "audio", bytearray(b"\xffOGGnot-a-wav-payload"),
         {"width": None, "height": None, "sample_rate": 22050,
          "duration_ms": 100, "codec": "vorbis"}),
    ]
    media = spark.createDataFrame(rows, schema="""
        media_id long, kind string, payload binary,
        meta struct<width:int,height:int,sample_rate:int,
                    duration_ms:long,codec:string>
    """)
    (row,) = resample_audio(media, 8000, deterministic_fake=True).collect()
    assert bytes(row.payload) == b"\xffOGGnot-a-wav-payload"
    assert row.meta.sample_rate == 22050  # NOT rewritten to 8000
    assert row.meta.duration_ms == 100


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
