"""Multimodal plumbing: deterministic fake codecs drive the REAL Spark
plumbing (schemas, Arrow batches, frame explode); unknown formats raise
the documented NotImplementedError."""

from __future__ import annotations

import numpy as np
import pytest

from diagonal_b6_spark.operators import multimodal as mm


def test_audio_features(spark):
    clips = mm.synth_audio_table(spark, 20)
    assert clips.count() == 20
    out = {r["clip_id"]: r for r in mm.audio_features(clips).collect()}
    assert len(out) == 20
    for r in out.values():
        # sine burst: rms ~ amplitude/sqrt(2) = (30000/32768)/1.414 ~ 0.647
        assert r["rms"] == pytest.approx(0.647, abs=0.02)
        assert 0.09 <= r["duration_s"] <= 0.15
        assert 0.0 < r["zcr"] < 0.2


def test_frame_sampling(spark):
    vids = mm.synth_video_table(spark, 5, w=16, h=12, frames=8)
    frames = mm.sample_frames(vids, every=4).collect()
    assert len(frames) == 5 * 2  # frames 0 and 4 of each video
    f0 = [r for r in frames if r["video_id"] == "vid00000000" and r["frame_idx"] == 0][0]
    arr = np.frombuffer(bytes(f0["frame"]), dtype=np.uint8).reshape(12, 16)
    assert arr[0, 0] == 0 and arr[0, 1] == 3 and arr[1, 0] == 5  # gradient formula
    assert f0["mean"] == pytest.approx(arr.mean())


def test_unknown_format_raises(spark):
    from pyspark.sql import functions as F

    clips = mm.synth_audio_table(spark, 2).withColumn("fmt", F.lit("mp3"))
    with pytest.raises(Exception, match="NotImplementedError|no audio decoder"):
        mm.audio_features(clips).collect()


def test_register_decoder_roundtrip():
    mm.register_decoder("audio", "unit-test", lambda b, m: np.zeros(3))
    assert (mm._decode("audio", "unit-test", b"", None) == 0).all()
