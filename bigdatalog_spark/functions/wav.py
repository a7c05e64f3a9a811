"""Minimal pure-stdlib WAV (RIFF PCM) codec — no ffmpeg.

Implements the subset of the public RIFF/WAVE format (Microsoft/IBM
multimedia spec, as exposed by Python's stdlib ``wave`` module) that the
multimodal operators need: integer PCM at 8/16/32-bit depth and IEEE
float PCM (format code 3) at 32/64-bit, any channel count and sample
rate. This turns the AUDIO branch of the codec boundary in
operators/multimodal.py into a REAL decode: sample rate, duration and
waveform statistics (RMS, peak, zero-crossing rate) run on actual
samples. Compressed audio (MP3/AAC/FLAC) remains stubbed — those
genuinely need ffmpeg-class decoders the container lacks.

Numpy is used for the sample array (already a hard dependency of the
Arrow path); the bytestream handling is stdlib only (wave + io + struct).
"""

from __future__ import annotations

import io
import struct
import wave

_WIDTH_DTYPE = {1: "u1", 2: "<i2", 4: "<i4"}  # wave yields unsigned for 8-bit
# full-scale divisor: 8-bit uses 128 so byte 0 maps to exactly -1.0 and
# every decoded value stays inside [-1, 1] (127.5 would give -1.0039)
_WIDTH_SCALE = {1: 128.0, 2: 32768.0, 4: 2147483648.0}

_FLOAT_DTYPE = {4: "<f4", 8: "<f8"}
WAVE_FORMAT_IEEE_FLOAT = 3


def is_wav(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) >= 12
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"WAVE"
    )


def _parse_riff_chunks(data: bytes):
    """Yield (chunk_id, payload) for each top-level RIFF sub-chunk.
    Raises ValueError on a malformed stream."""
    pos = 12  # past RIFF<size>WAVE
    n = len(data)
    while pos + 8 <= n:
        cid = bytes(data[pos:pos + 4])
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = bytes(data[pos + 8:pos + 8 + size])
        if len(body) < size:
            raise ValueError("truncated RIFF chunk")
        yield cid, body
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _decode_float_wav(data: bytes):
    """Manual decode of WAVE_FORMAT_IEEE_FLOAT (format code 3) — stdlib
    ``wave`` only reads integer PCM, but float WAV is just raw little-
    endian f32/f64 frames after the fmt chunk, parseable with struct."""
    import numpy as np

    fmt = None
    body = None
    for cid, payload in _parse_riff_chunks(data):
        if cid == b"fmt " and fmt is None:
            if len(payload) < 16:
                raise ValueError("malformed fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
        elif cid == b"data" and body is None:
            body = payload
    if fmt is None or body is None:
        raise ValueError("missing fmt/data chunk")
    tag, nch, rate, _byte_rate, _block_align, bits = fmt
    if tag != WAVE_FORMAT_IEEE_FLOAT:
        raise ValueError(f"unsupported WAV format tag: {tag}")
    width = bits // 8
    if width not in _FLOAT_DTYPE or nch < 1:
        raise ValueError(f"unsupported float PCM width: {bits} bits")
    usable = len(body) - len(body) % (width * nch)
    arr = np.frombuffer(body[:usable], dtype=_FLOAT_DTYPE[width]).astype(np.float64)
    return arr.reshape(-1, nch), rate


def decode_wav(data: bytes):
    """WAV bytes → (samples, sample_rate): float64 numpy array shaped
    (n_frames, n_channels) normalized to [-1, 1] (integer PCM) or the
    raw float samples (IEEE-float PCM), plus the sample rate.

    Supports 8/16/32-bit integer PCM (stdlib ``wave``) and 32/64-bit
    IEEE-float PCM (format code 3, parsed manually — stdlib wave rejects
    it). Raises ValueError on compressed codecs or malformed payloads
    (the multimodal operator surfaces that as an unsupported-codec row,
    it does not crash the task)."""
    import numpy as np

    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE byte stream")
    try:
        with wave.open(io.BytesIO(bytes(data))) as w:
            width = w.getsampwidth()
            rate = w.getframerate()
            nch = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except wave.Error as e:
        # float PCM is decodable without ffmpeg; try it before giving up
        try:
            return _decode_float_wav(bytes(data))
        except ValueError as fe:
            # keep the float-path diagnosis (truncated chunk, odd width)
            # visible instead of masking it with the generic wave error
            raise ValueError(
                f"unsupported WAV encoding: {e} (float-PCM path: {fe})"
            ) from fe
    except (EOFError, struct.error) as e:
        # stdlib wave leaks these on truncated RIFF payloads; keep the
        # documented ValueError contract so callers' fallback paths fire
        raise ValueError(f"malformed WAV byte stream: {e}") from e
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
    PCM at ``sampwidth`` bytes). The test-side inverse of decode_wav.
    Values are rounded (not truncated) to the nearest PCM step so the
    full code range — including byte 255 at 8-bit — is reachable."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    scale = _WIDTH_SCALE[sampwidth]
    clipped = np.clip(arr, -1.0, 1.0 - 1.0 / scale)
    if sampwidth == 1:
        pcm = np.clip(np.round(clipped * scale + 128.0), 0, 255).astype("u1")
    else:
        pcm = np.clip(
            np.round(clipped * scale), -scale, scale - 1
        ).astype(_WIDTH_DTYPE[sampwidth])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def encode_wav_float(samples, sample_rate: int, sampwidth: int = 4) -> bytes:
    """(n_frames, n_channels) float array → IEEE-float WAV bytes (format
    code 3, 32- or 64-bit). stdlib ``wave`` cannot write float PCM, so
    the RIFF/fmt/data chunks are emitted manually with struct — the
    test-side inverse of the format-3 branch of decode_wav."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if sampwidth not in _FLOAT_DTYPE:
        raise ValueError(f"float WAV sampwidth must be 4 or 8, got {sampwidth}")
    nch = arr.shape[1]
    body = arr.astype(_FLOAT_DTYPE[sampwidth]).tobytes()
    block_align = sampwidth * nch
    fmt = struct.pack(
        "<HHIIHH",
        WAVE_FORMAT_IEEE_FLOAT, nch, sample_rate,
        sample_rate * block_align, block_align, sampwidth * 8,
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


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
