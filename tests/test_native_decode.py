"""libav* media feeder (avd_tpu/native/src/avd_decode.cc) — bit-exactness vs the cv2
walk, GOP-skip correctness, and the audio extraction path.

The feeder must produce EXACTLY the frames the reference's decode loop
sees (/root/reference/app/analyzers/video.py:27-33): same libavcodec
decode restarted at keyframes is bit-exact by construction; these tests
assert it end to end on the fixture encodings.
"""

import numpy as np
import pytest

from tests import fixtures
from avd_tpu.ingest import probe, video_reader
from avd_tpu.native import decode


pytestmark = pytest.mark.skipif(decode.lib() is None,
                                reason="libav* toolchain unavailable")


def _cv2_walk(path, step):
    import cv2
    cap = cv2.VideoCapture(path)
    out, idx = [], 0
    while True:
        if not cap.grab():
            break
        if idx % step == 0:
            ok, f = cap.retrieve()
            if not ok:
                break
            out.append(f)
        idx += 1
    cap.release()
    return out


@pytest.mark.parametrize("n,fps", [(90, 30.0), (47, 24.0), (10, 5.0)])
def test_sampler_bit_exact_vs_cv2(tmp_path, n, fps):
    clip = fixtures.spliced_clip(n, 96)
    path = fixtures.write_video(tmp_path / "c.mp4", clip, fps=fps)
    step = video_reader.sampling_step(fps)
    ref = _cv2_walk(path, step)

    vs = decode.VideoSampler.open(path, step)
    assert vs is not None
    got, gidx = [], []
    for fr, ix in vs.chunks(4):
        got.append(fr.copy())
        gidx.append(ix.copy())
    vs.close()
    got = np.concatenate(got) if got else np.zeros((0,))
    gidx = np.concatenate(gidx) if gidx else np.zeros((0,))

    assert len(got) == len(ref)
    np.testing.assert_array_equal(gidx, np.arange(0, vs.n_frames, step))
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


def test_read_into_single_call(tmp_path):
    clip = fixtures.gradient_clip(60, 64)
    path = fixtures.write_video(tmp_path / "g.mp4", clip, fps=30.0)
    step = video_reader.sampling_step(30.0)
    ref = _cv2_walk(path, step)
    vs = decode.VideoSampler.open(path, step)
    n_est = (vs.n_frames + step - 1) // step
    out = np.empty((n_est, vs.height, vs.width, 3), np.uint8)
    idx = np.empty(n_est, np.int64)
    k = vs.read_into(out, idx)
    vs.close()
    assert k == len(ref)
    for a, b in zip(out[:k], ref):
        np.testing.assert_array_equal(a, b)


def test_reader_integration_native_vs_cv2(tmp_path, monkeypatch):
    """read_sampled + iter_sampled_chunks must be identical with the
    native feeder on and off."""
    clip = fixtures.noise_clip(75, 64)
    path = fixtures.write_video(tmp_path / "n.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)

    fb_nat = video_reader.read_sampled(path, meta)
    chunks_nat = [c.frames for c in
                  video_reader.iter_sampled_chunks(path, meta, chunk=3)]

    monkeypatch.setenv("AVD_NATIVE_DECODE", "0")
    fb_cv = video_reader.read_sampled(path, meta)
    chunks_cv = [c.frames for c in
                 video_reader.iter_sampled_chunks(path, meta, chunk=3)]

    assert fb_nat.sampled == fb_cv.sampled
    assert fb_nat.fps == fb_cv.fps
    assert fb_nat.duration == pytest.approx(fb_cv.duration)
    np.testing.assert_array_equal(fb_nat.frames, fb_cv.frames)
    np.testing.assert_array_equal(np.concatenate(chunks_nat),
                                  np.concatenate(chunks_cv))


def test_chunk_views_reuse_buffer_safely(tmp_path):
    """copy=False documents buffer reuse; copy=True (default) must return
    stable arrays."""
    clip = fixtures.gradient_clip(90, 64)
    path = fixtures.write_video(tmp_path / "v.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)
    stable = [c.frames for c in
              video_reader.iter_sampled_chunks(path, meta, chunk=2)]
    ref = video_reader.read_sampled(path, meta).frames
    np.testing.assert_array_equal(np.concatenate(stable), ref)


def test_audio_roundtrip_aac(tmp_path):
    """Mux a 440 Hz tone to AAC, extract via the native path, and check
    the tone survives (AAC is lossy — assert frequency, not samples)."""
    sr = 44100
    t = np.arange(int(2.0 * sr)) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    path = str(tmp_path / "tone.m4a")
    assert decode.mux_audio(path, tone, sr)

    got = decode.decode_audio_mono16k(path)
    assert got is not None
    data, rate = got
    assert rate == 16000
    assert 1.5 <= len(data) / rate <= 2.5
    mid = data[len(data) // 4: len(data) // 2]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    freq = np.fft.rfftfreq(len(mid), 1.0 / rate)[np.argmax(spec)]
    assert freq == pytest.approx(440.0, abs=5.0)
    # AAC transient overshoot spikes the max; RMS is the stable measure
    # (0.5-amplitude sine -> RMS 0.354)
    assert float(np.sqrt(np.mean(mid ** 2))) == pytest.approx(0.354,
                                                              abs=0.08)


def test_audio_none_for_video_only(tmp_path):
    clip = fixtures.gradient_clip(30, 64)
    path = fixtures.write_video(tmp_path / "nov.mp4", clip, fps=30.0)
    assert decode.decode_audio_mono16k(path) is None


def test_full_pipeline_av_mp4(tmp_path):
    """End-to-end /analyze flow on an mp4 with BOTH video and audio —
    the configuration the reference serves (phone/social uploads).  The
    audio analyzer must produce a real (non-neutral) result via the
    libav* extraction instead of the no-ffmpeg neutral fallback."""
    from avd_tpu import pipeline

    clip = fixtures.spliced_clip(90, 96)
    vpath = fixtures.write_video(tmp_path / "v.mp4", clip, fps=30.0)
    wav = fixtures.speechy_wav(3.0)
    out_path = str(tmp_path / "av.mp4")
    assert decode.remux_add_audio(vpath, out_path, wav, 16000)

    res = pipeline.analyze_path(out_path)
    assert res["ok"] is True
    assert "audio_error" not in res["hints"]
    # a real audio analysis carries the spectral flags, not the fallback
    assert "tts_like" in res["audio"]["scores"]
    assert res["audio"]["flags_audio"].get("error") is None
    tl = res["audio"]["timeline"]
    assert len(tl) == 3 and any(abs(v - 0.5) > 1e-9 for v in tl)
    assert res["meta"]["acodec"] == "aac"


def test_sampler_bit_exact_with_threaded_decode(tmp_path, monkeypatch):
    """AVD_DECODE_THREADS>1 enables libav frame/slice threading, which
    only adds output delay — the sampled pixels must stay bit-exact
    (libav's threading contract) and the walk must drain the extra
    pipeline depth."""
    monkeypatch.setenv("AVD_DECODE_THREADS", "4")
    clip = fixtures.spliced_clip(90, 96)
    path = fixtures.write_video(tmp_path / "t.mp4", clip, fps=30.0)
    step = video_reader.sampling_step(30.0)
    ref = _cv2_walk(path, step)

    vs = decode.VideoSampler.open(path, step)
    assert vs is not None
    got = []
    for fr, _ in vs.chunks(4):
        got.append(fr.copy())
    vs.close()
    got = np.concatenate(got) if got else np.zeros((0,))
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)
