"""Multimodal (image/audio/video) column operators.

Media are opaque `binary` columns with typed metadata structs. The
Spark-side plumbing — schemas, Arrow-batched Pandas UDF signatures over
mapInPandas, partition sizing — is real and tested.

Codec status: PNG images decode FOR REAL via the pure-stdlib codec in
functions/png.py (zlib + struct; 8-bit grey/RGB/RGBA) — features and
resize run on actual pixels — and WAV PCM audio decodes FOR REAL via
functions/wav.py (stdlib ``wave``; 8/16/32-bit integer PCM) — features
run on actual samples. Compressed image/audio codecs and video remain
STUBBED (they need Pillow/ffmpeg-class libraries this container lacks):
those paths raise NotImplementedError in strict mode or produce a
deterministic byte-derived fake in test mode, behind the same interface,
so wiring a full codec later changes one function body, not the pipeline.

Scale notes: media rows are large (MBs) — operators below repartition by
byte budget, not row count, and mapInPandas streams Arrow batches so a
partition never needs to fit a whole batch of decoded frames in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def _decode_stub(payload: bytes, kind: str, deterministic_fake: bool):
    """Codec boundary. PNG images decode for real (functions/png.py):
    feature = [width, height, channels, mean, std, mean of each of the
    first 3 channels] — 8 dims from actual pixels. WAV PCM audio decodes
    for real too (functions/wav.py, stdlib ``wave``): feature =
    [sample_rate, channels, duration_ms, rms, peak, mean_abs,
    zero_crossing_rate, dc_offset] from actual samples. Everything else
    (compressed image/audio codecs, video) is stubbed:
    deterministic_fake=True yields a stable byte-derived 8-dim feature so
    pipelines are testable; strict mode raises."""
    from ..functions.png import decode_png, is_png
    from ..functions.wav import is_wav, wav_features

    if kind == "audio" and is_wav(payload):
        try:
            return wav_features(payload)
        except ValueError:
            pass  # compressed codec inside a RIFF shell → stub path
    if kind == "image" and is_png(payload):
        import numpy as np

        arr = decode_png(payload)
        h, w, c = arr.shape
        flat = arr.astype(np.float64)
        chan_means = [
            float(flat[:, :, i].mean()) if i < c else 0.0 for i in range(3)
        ]
        return [
            float(w),
            float(h),
            float(c),
            float(flat.mean()),
            float(flat.std()),
            *chan_means,
        ]
    if not deterministic_fake:
        raise NotImplementedError(
            f"media decode for kind={kind!r} requires codec libraries not "
            "present in this container (PNG images and WAV PCM audio are "
            "the natively-decoded formats); wire Pillow/ffmpeg here"
        )
    if payload is None:
        return [0.0] * 8
    # stable, content-derived fake feature: byte histogram over 8 buckets
    hist = [0] * 8
    for b in payload[:4096]:
        hist[b % 8] += 1
    total = max(sum(hist), 1)
    return [h / total for h in hist]


def extract_features(
    media: DataFrame,
    deterministic_fake: bool = True,
    target_partition_bytes: int = 128 << 20,
) -> DataFrame:
    """media table → (media_id, n_bytes, feature) via Arrow-batched
    mapInPandas. Partitioning is by payload byte budget: at 100 TB a
    row-count-based split would put thousands of 10 MB videos in one task."""
    import pandas as pd

    sized = media.withColumn("__bytes", F.coalesce(F.length("payload"), F.lit(0)))
    # partition-count sizing is a heuristic, so prefer the driver-side
    # Catalyst byte estimate (no job) over an exact sum that re-reads
    # every payload byte just to pick a task count (measured: the sizing
    # scan alone was ~25% of q_wav_features); the exact aggregate stays
    # as the fallback for plans with unusable stats (RDD-backed inputs
    # report Long.MaxValue)
    total = None
    try:
        b = int(media._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        if 0 < b < (1 << 50):
            total = b
    except Exception:
        pass
    if total is None:
        total = sized.agg(F.sum("__bytes")).first()[0] or 0
    nparts = max(1, int(total // target_partition_bytes) + 1)
    # decode is CPU-bound per byte: never run below the cluster's core
    # count when the byte budget would give fewer tasks (at scale the
    # byte-derived count exceeds it, so this floor is local-only — the
    # same reasoning as session.ensure_min_parallelism). The repartition
    # hashes media_id either way, so the result set is unchanged.
    nparts = max(nparts, media.sparkSession.sparkContext.defaultParallelism)
    # salt by media_id for uniform byte distribution
    repartitioned = sized.repartition(nparts, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k, deterministic_fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["__bytes"],
                "feature": feats,
            })

    return repartitioned.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  deterministic_fake: bool = True) -> DataFrame:
    """Image resize: PNG payloads are decoded, nearest-neighbor resized,
    and re-encoded FOR REAL (functions/png.py); non-PNG payloads pass
    through unchanged in fake mode (meta rewritten) or raise in strict
    mode — the Pillow seam for other formats."""
    import pandas as pd

    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.png import (
            decode_png,
            encode_png,
            is_png,
            resize_nearest,
        )

        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                if is_png(p):
                    payloads.append(
                        encode_png(resize_nearest(decode_png(p), width, height))
                    )
                elif deterministic_fake:
                    payloads.append(p)  # passthrough stub for non-PNG
                else:
                    raise NotImplementedError(
                        "non-PNG image resize requires Pillow"
                    )
            meta = [
                {"width": width, "height": height, "sample_rate": None,
                 "duration_ms": None, "codec": c.get("codec") if isinstance(c, dict) else None}
                for c in pdf["meta"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": payloads,
                "meta": meta,
            })

    return media.where(F.col("kind") == "image").mapInPandas(run, out_schema)


def resample_audio(media: DataFrame, target_rate: int,
                   deterministic_fake: bool = True) -> DataFrame:
    """Audio resample — the audio counterpart of resize_images: WAV PCM
    payloads are decoded, linear-interpolation resampled to
    ``target_rate``, and re-encoded FOR REAL (functions/wav.py);
    compressed-audio payloads pass through unchanged in fake mode (meta
    rewritten) or raise in strict mode — the ffmpeg seam."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.wav import (
            decode_wav,
            encode_wav,
            is_wav,
            resample_linear,
        )

        for pdf in batches:
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                codec = m.get("codec") if isinstance(m, dict) else None
                if is_wav(p):
                    arr, rate = decode_wav(p)
                    out = resample_linear(arr, rate, target_rate)
                    payloads.append(encode_wav(out, target_rate))
                    dur = int(len(out) * 1000 / target_rate)
                    out_rate = target_rate
                elif deterministic_fake:
                    # passthrough stub for non-WAV: the payload bytes are
                    # unchanged, so the meta must keep the ORIGINAL rate —
                    # claiming target_rate would contradict the encoding
                    payloads.append(p)
                    dur = m.get("duration_ms") if isinstance(m, dict) else None
                    out_rate = m.get("sample_rate") if isinstance(m, dict) else None
                else:
                    raise NotImplementedError(
                        "non-WAV audio resample requires ffmpeg"
                    )
                metas.append({
                    "width": None, "height": None,
                    "sample_rate": out_rate, "duration_ms": dur,
                    "codec": codec,
                })
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": payloads,
                "meta": metas,
            })

    return media.where(F.col("kind") == "audio").mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  deterministic_fake: bool = True) -> DataFrame:
    """video frame sampling plumbing: one output row per sampled timestamp,
    exercising the 1→N mapInPandas shape real frame extraction needs."""
    import pandas as pd

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("frame sampling requires ffmpeg")
            ids, tss, frames = [], [], []
            for mid, meta, payload in zip(pdf["media_id"], pdf["meta"], pdf["payload"]):
                dur = (meta or {}).get("duration_ms") or 0
                for ts in range(0, int(dur), every_ms):
                    ids.append(mid)
                    tss.append(ts)
                    frames.append(payload[:16] if payload is not None else None)
            yield pd.DataFrame({"media_id": ids, "ts_ms": tss, "frame": frames})

    return media.where(F.col("kind") == "video").mapInPandas(run, schema)
