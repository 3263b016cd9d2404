"""Ingest layer tests: probe, sampled frame batches, audio loading."""

import numpy as np
import pytest

from avd_tpu.ingest import audio_reader, probe, video_reader
from tests import fixtures


def test_probe_video(tmp_path):
    clip = fixtures.gradient_clip(45, 96)
    path = fixtures.write_video(tmp_path / "g.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)
    assert meta["width"] == 96 and meta["height"] == 96
    assert meta["fps"] == pytest.approx(30.0, rel=1e-3)
    assert meta["duration"] == pytest.approx(1.5, rel=0.1)
    assert meta["bit_rate"] > 0
    assert set(meta.keys()) == {
        "width", "height", "fps", "duration", "bit_rate",
        "vcodec", "acodec", "format_name"}


def test_probe_missing_file():
    meta = probe.probe_basic_meta("/nonexistent/x.mp4")
    assert meta["width"] == 0 and meta["duration"] == 0.0


def test_probe_wav(tmp_path):
    path = fixtures.write_wav(tmp_path / "a.wav", fixtures.sine_wav(2.0))
    meta = probe.probe_basic_meta(path)
    assert meta["duration"] == pytest.approx(2.0, rel=1e-3)
    assert meta["acodec"] == "pcm_s16le"


def test_sampling_step_matches_reference():
    # step = max(1, round((fps or 30)/2)) — video.py:19
    assert video_reader.sampling_step(30.0) == 15
    assert video_reader.sampling_step(0.0) == 15   # fps falsy → 30/2
    assert video_reader.sampling_step(1.0) == 1    # round(0.5) = 0 → max 1
    assert video_reader.sampling_step(5.0) == 2    # round(2.5) = 2 (banker's)
    assert video_reader.sampling_step(60.0) == 30
    assert video_reader.sampling_step(23.976) == 12


def test_read_sampled_cadence(tmp_path):
    clip = fixtures.gradient_clip(60, 96)
    path = fixtures.write_video(tmp_path / "g.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)
    fb = video_reader.read_sampled(path, meta)
    assert fb is not None
    # 60 frames at step 15 → indices 0,15,30,45 → 4 sampled
    assert fb.sampled == 4
    assert fb.frames.shape == (4, 96, 96, 3)
    assert fb.frames.dtype == np.uint8


def test_read_sampled_unopenable():
    assert video_reader.read_sampled("/nonexistent.mp4", {}) is None


def test_chunked_matches_full(tmp_path):
    clip = fixtures.noise_clip(90, 64)
    path = fixtures.write_video(tmp_path / "n.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)
    full = video_reader.read_sampled(path, meta)
    chunks = list(video_reader.iter_sampled_chunks(path, meta, chunk=2))
    got = np.concatenate([c.frames for c in chunks])
    np.testing.assert_array_equal(full.frames, got)


def test_audio_wav_roundtrip(tmp_path):
    wav = fixtures.sine_wav(2.0)
    path = fixtures.write_wav(tmp_path / "a.wav", wav)
    loaded, sr = audio_reader.load_mono_16k(str(path))
    assert sr == 16000
    assert loaded.shape[0] == wav.shape[0]
    np.testing.assert_allclose(loaded, wav, atol=1e-3)


def test_audio_unextractable_raises(tmp_path):
    import shutil
    p = tmp_path / "v.mp4"
    p.write_bytes(b"\x00" * 64)
    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg present; garbage container fails differently")
    with pytest.raises(audio_reader.AudioExtractError):
        audio_reader.load_mono_16k(str(p))
