"""Streaming decode path: identical results to the batch path, bounded
memory, async-dispatch pipeline."""

import numpy as np
import pytest

from avd_tpu.ingest import probe, video_reader
from avd_tpu.ops import video_features
from tests import fixtures


def test_streaming_matches_batch(tmp_path):
    clip = fixtures.noise_clip(120, 64)
    path = fixtures.write_video(tmp_path / "s.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)
    fb = video_reader.read_sampled(path, meta)

    batch = video_features.compute_features(fb.frames)

    def chunks():
        for c in video_reader.iter_sampled_chunks(path, meta, chunk=3):
            yield c.frames

    stream = video_features.compute_features_streaming(chunks())
    assert stream["total"] == batch["total"]
    assert stream["dup"] == batch["dup"]
    np.testing.assert_allclose(stream["textures"], batch["textures"],
                               rtol=1e-6)
    np.testing.assert_allclose(stream["flow_means"], batch["flow_means"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stream["timeline_ai"], batch["timeline_ai"],
                               atol=1e-6)


def test_streaming_analyzer_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("AVD_STREAM", "1")
    from avd_tpu.analyzers import video as video_an
    clip = fixtures.spliced_clip(90, 64)
    path = fixtures.write_video(tmp_path / "sp.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)
    out_stream = video_an.analyze(path, meta)

    monkeypatch.setenv("AVD_STREAM", "0")
    out_batch = video_an.analyze(path, meta)
    assert out_stream["summary"]["dup_density"] == \
        out_batch["summary"]["dup_density"]
    np.testing.assert_allclose(out_stream["timeline"], out_batch["timeline"],
                               atol=1e-6)


def test_fast_seek_matches_walk(tmp_path, monkeypatch):
    """AVD_FAST_SEEK must yield the exact frames of the grab-walk on the
    fixture encodings."""
    clip = fixtures.gradient_clip(120, 64)
    path = fixtures.write_video(tmp_path / "f.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)
    walk = np.concatenate([c.frames for c in
                           video_reader.iter_sampled_chunks(path, meta)])
    monkeypatch.setenv("AVD_FAST_SEEK", "1")
    seek = np.concatenate([c.frames for c in
                           video_reader.iter_sampled_chunks(path, meta)])
    np.testing.assert_array_equal(walk, seek)


def test_streaming_empty_file(tmp_path, monkeypatch):
    monkeypatch.setenv("AVD_STREAM", "1")
    from avd_tpu.analyzers import video as video_an
    out = video_an.analyze("/nonexistent.mp4", {})
    assert out == {"timeline": [], "summary": {}, "timeline_ai": []}
