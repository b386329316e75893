"""Multimodal payload plumbing: audio/video as opaque binary columns with
typed metadata, Arrow-batched transform kernels, and clearly-marked stubs
where this container lacks the codec libraries.

The image modality is fully real (operators/images.py + pure-numpy
codecs).  Audio/video columns follow the same table shape -- (id, bytes,
fmt, metadata struct) -- and the Spark-side plumbing (schemas, batch
iteration, partitioning, output contracts) is implemented and tested
end-to-end against a deterministic fake decoder; the real decoders
(ffmpeg/soundfile) slot in behind ``register_decoder`` on a cluster that
has them.  Per the task brief: stub the decode, make the plumbing real.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AUDIO_SCHEMA = (
    "clip_id string, bytes binary, fmt string, sample_rate int, n_samples long, "
    "channels int"
)
VIDEO_SCHEMA = (
    "video_id string, bytes binary, fmt string, w int, h int, fps double, n_frames int"
)

# modality -> fmt -> decoder(bytes, meta_row) -> np.ndarray
_DECODERS: dict[str, dict[str, Callable]] = {"audio": {}, "video": {}}


def register_decoder(modality: str, fmt: str, fn: Callable) -> None:
    _DECODERS[modality][fmt] = fn


def _decode(modality: str, fmt: str, data: bytes, meta) -> np.ndarray:
    try:
        fn = _DECODERS[modality][fmt]
    except KeyError:
        raise NotImplementedError(
            f"no {modality} decoder for fmt={fmt!r}: this container has no "
            "codec libraries; register one via multimodal.register_decoder "
            "(e.g. soundfile/ffmpeg on a real cluster)"
        )
    return fn(data, meta)


# --- deterministic fake codecs (test fixtures; REAL plumbing) ---------------


def fake_pcm_decode(data: bytes, meta) -> np.ndarray:
    """'fake-pcm': int16 little-endian mono samples, shape (n_samples,)."""
    return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0


def fake_video_decode(data: bytes, meta) -> np.ndarray:
    """'fake-yuv': uint8 frames, shape (n_frames, h, w)."""
    return np.frombuffer(data, dtype=np.uint8).reshape(
        meta.n_frames, meta.h, meta.w
    )


register_decoder("audio", "fake-pcm", fake_pcm_decode)
register_decoder("video", "fake-yuv", fake_video_decode)


def synth_audio_table(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic audio clips (sine bursts as fake-pcm)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                ns = 1600 + int(i % 5) * 160
                t = np.arange(ns, dtype=np.float64)
                wave = np.sin(2 * np.pi * (220 + 20 * (i % 7)) * t / 16000.0)
                pcm = (wave * 30000).astype("<i2").tobytes()
                rows.append((f"clip{i:08d}", pcm, "fake-pcm", 16000, ns, 1))
            yield pd.DataFrame(
                rows, columns=["clip_id", "bytes", "fmt", "sample_rate", "n_samples", "channels"]
            )

    return spark.range(n).mapInPandas(gen, schema=AUDIO_SCHEMA)


def audio_features(clips: DataFrame) -> DataFrame:
    """Per-clip features: RMS, peak, zero-crossing rate, duration --
    the feature-extract stage of a training-data pipeline, Arrow-batched."""
    schema = "clip_id string, duration_s double, rms double, peak double, zcr double"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                x = _decode("audio", r.fmt, r.bytes, r)
                zc = float(np.mean(np.abs(np.diff(np.signbit(x)))))
                out.append(
                    (
                        r.clip_id,
                        float(r.n_samples / r.sample_rate),
                        float(np.sqrt(np.mean(x**2))),
                        float(np.abs(x).max()),
                        zc,
                    )
                )
            yield pd.DataFrame(
                out, columns=["clip_id", "duration_s", "rms", "peak", "zcr"]
            )

    return clips.mapInPandas(feats, schema)


def synth_video_table(spark: SparkSession, n: int, w: int = 16, h: int = 12, frames: int = 8) -> DataFrame:
    """Deterministic tiny fake-yuv videos (moving gradient)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                x = np.arange(w)[None, None, :]
                y = np.arange(h)[None, :, None]
                f = np.arange(frames)[:, None, None]
                vid = ((x * 3 + y * 5 + f * 7 + i) % 256).astype(np.uint8)
                rows.append((f"vid{i:08d}", vid.tobytes(), "fake-yuv", w, h, 8.0, frames))
            yield pd.DataFrame(
                rows, columns=["video_id", "bytes", "fmt", "w", "h", "fps", "n_frames"]
            )

    return spark.range(n).mapInPandas(gen, schema=VIDEO_SCHEMA)


def sample_frames(videos: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling: one output row per kept frame with the frame bytes
    -- the video analogue of image decode, same mapInPandas shape."""
    schema = "video_id string, frame_idx int, w int, h int, frame binary, mean double"

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                vid = _decode("video", r.fmt, r.bytes, r)
                for k in range(0, r.n_frames, every):
                    fr = vid[k]
                    out.append(
                        (r.video_id, k, r.w, r.h, fr.tobytes(), float(fr.mean()))
                    )
            if out:
                yield pd.DataFrame(
                    out, columns=["video_id", "frame_idx", "w", "h", "frame", "mean"]
                )

    return videos.mapInPandas(do, schema)
