"""Minimal pure-stdlib WAV (RIFF PCM) codec — no ffmpeg.

Implements the subset of the public RIFF/WAVE format (Microsoft/IBM
multimedia spec, as exposed by Python's stdlib ``wave`` module) that the
multimodal operators need: integer PCM at 8/16/32-bit depth, any channel
count and sample rate. This turns the AUDIO branch of the codec boundary
in operators/multimodal.py into a REAL decode: sample rate, duration and
waveform statistics (RMS, peak, zero-crossing rate) run on actual
samples. Compressed audio (MP3/AAC/FLAC) and float PCM remain stubbed —
those genuinely need ffmpeg-class decoders the container lacks.

Numpy is used for the sample array (already a hard dependency of the
Arrow path); the bytestream handling is stdlib only (wave + io + struct).
"""

from __future__ import annotations

import io
import wave

_WIDTH_DTYPE = {1: "u1", 2: "<i2", 4: "<i4"}  # wave yields unsigned for 8-bit
_WIDTH_SCALE = {1: 127.5, 2: 32768.0, 4: 2147483648.0}


def is_wav(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) >= 12
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"WAVE"
    )


def decode_wav(data: bytes):
    """WAV bytes → (samples, sample_rate): float64 numpy array shaped
    (n_frames, n_channels) normalized to [-1, 1], plus the sample rate.

    Supports 8/16/32-bit integer PCM (what stdlib ``wave`` reads). Raises
    ValueError on float PCM / compressed codecs (the multimodal operator
    surfaces that as an unsupported-codec row, it does not crash the
    task)."""
    import numpy as np

    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE byte stream")
    try:
        with wave.open(io.BytesIO(bytes(data))) as w:
            width = w.getsampwidth()
            rate = w.getframerate()
            nch = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except wave.Error as e:  # compressed / float PCM
        raise ValueError(f"unsupported WAV encoding: {e}") from e
    if width not in _WIDTH_DTYPE:
        raise ValueError(f"unsupported PCM sample width: {width}")
    arr = np.frombuffer(raw, dtype=_WIDTH_DTYPE[width]).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned, centre on zero
        arr = arr - 128.0
    arr = arr / _WIDTH_SCALE[width]
    if nch > 1:
        arr = arr.reshape(-1, nch)
    else:
        arr = arr.reshape(-1, 1)
    return arr, rate


def encode_wav(samples, sample_rate: int, sampwidth: int = 2) -> bytes:
    """(n_frames, n_channels) float array in [-1, 1] → WAV bytes (integer
    PCM at ``sampwidth`` bytes). The test-side inverse of decode_wav."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    scale = _WIDTH_SCALE[sampwidth]
    clipped = np.clip(arr, -1.0, 1.0 - 1.0 / scale)
    if sampwidth == 1:
        pcm = (clipped * scale + 128.0).astype("u1")
    else:
        pcm = (clipped * scale).astype(_WIDTH_DTYPE[sampwidth])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def wav_features(data: bytes) -> list:
    """8-dim feature vector from actual samples — the audio counterpart
    of the PNG pixel features: [sample_rate, n_channels, duration_ms,
    rms, peak, mean_abs, zero_crossing_rate, dc_offset]."""
    import numpy as np

    arr, rate = decode_wav(data)
    mono = arr.mean(axis=1)
    n = len(mono)
    if n == 0:
        return [float(rate), float(arr.shape[1]), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    return [
        float(rate),
        float(arr.shape[1]),
        float(n * 1000.0 / rate),
        float(np.sqrt(np.mean(mono ** 2))),
        float(np.abs(mono).max()),
        float(np.abs(mono).mean()),
        zc,
        float(mono.mean()),
    ]


def resample_linear(samples, src_rate: int, dst_rate: int):
    """Linear-interpolation resample of a (n, ch) float array. A simple,
    honest resampler (no windowed-sinc anti-aliasing — document the seam
    for a DSP-grade kernel); exact passthrough when rates match."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if src_rate == dst_rate or arr.shape[0] == 0:
        return arr
    n_src = arr.shape[0]
    n_dst = max(1, int(round(n_src * dst_rate / src_rate)))
    # sample-position mapping keeps the first sample aligned and spaces
    # the rest by the rate ratio
    pos = np.arange(n_dst) * (src_rate / dst_rate)
    pos = np.clip(pos, 0, n_src - 1)
    return np.stack(
        [np.interp(pos, np.arange(n_src), arr[:, c]) for c in range(arr.shape[1])],
        axis=1,
    )
