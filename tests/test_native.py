"""C++ host runtime: build, bit-exact gray conversion, WAV decode,
resampler quality."""

import numpy as np
import pytest

from avd_tpu import native
from tests import fixtures

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="no C++ toolchain")


def test_gray_bit_exact_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (4, 60, 70, 3),
                          dtype=np.int64).astype(np.uint8)
    ours = native.bgr_to_gray(frames)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(ours[i], cv2.cvtColor(
            f, cv2.COLOR_BGR2GRAY))


def test_gray_threaded_large():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, 512, 512, 3),
                          dtype=np.int64).astype(np.uint8)
    ours = native.bgr_to_gray(frames)
    f = frames.astype(np.int64)
    ref = ((f[..., 2] * 9798 + f[..., 1] * 19235 + f[..., 0] * 3735
            + (1 << 14)) >> 15).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_wav_decode_s16_mono(tmp_path):
    wav = fixtures.sine_wav(1.0)
    path = fixtures.write_wav(tmp_path / "a.wav", wav)
    with open(path, "rb") as f:
        decoded = native.wav_decode_mono(f.read())
    assert decoded is not None
    data, sr = decoded
    assert sr == 16000
    np.testing.assert_allclose(data, np.clip(wav, -1, 1), atol=1e-3)


def test_wav_decode_stereo_downmix(tmp_path):
    import wave as wave_mod
    left = fixtures.sine_wav(0.5, freq=440.0)
    right = fixtures.sine_wav(0.5, freq=880.0)
    inter = np.empty(left.size * 2, np.float32)
    inter[0::2] = left
    inter[1::2] = right
    pcm = np.clip(inter * 32767, -32768, 32767).astype("<i2")
    p = tmp_path / "st.wav"
    with wave_mod.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    with open(p, "rb") as f:
        data, sr = native.wav_decode_mono(f.read())
    np.testing.assert_allclose(data, (left + right) / 2, atol=2e-3)


def test_resample_tone_preserved():
    sr_in, sr_out = 48000, 16000
    t = np.arange(int(0.5 * sr_in)) / sr_in
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    from math import gcd
    g = gcd(sr_in, sr_out)
    out = native.resample(tone, sr_out // g, sr_in // g)
    t2 = np.arange(out.shape[0]) / sr_out
    ref = np.sin(2 * np.pi * 440.0 * t2)
    # ignore filter edges
    sl = slice(100, -100)
    assert np.abs(out[sl] - ref[sl]).max() < 0.02


def test_garbage_wav_rejected():
    assert native.wav_decode_mono(b"not a wav file at all") is None


def test_prep320_fused_bit_exact_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(11)
    for (h, w) in [(1080, 1920), (333, 517), (321, 321), (480, 640)]:
        gray = rng.integers(0, 256, (2, h, w), np.uint8)
        out = native.prep320(gray)
        if out is None:
            pytest.skip("native lib unavailable")
        lap, area, lin = out
        for i in range(2):
            np.testing.assert_array_equal(
                lin[i], cv2.resize(gray[i], (320, 320),
                                   interpolation=cv2.INTER_LINEAR))
            ref_area = cv2.resize(gray[i], (32, 32),
                                  interpolation=cv2.INTER_AREA)
            # ±1: cv2's area path accumulates in float32 (and fixed-point
            # for integer ratios); ties can round differently from our
            # float64 sweep.  ai_score parity is gated elsewhere.
            assert np.abs(area[i].astype(int)
                          - ref_area.astype(int)).max() <= 1
            ref_lap = cv2.Laplacian(gray[i], cv2.CV_64F).var()
            assert abs(lap[i] - ref_lap) <= 1e-9 * max(1.0, abs(ref_lap))


def test_prep320_bgr_matches_gray_path():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(13)
    for (h, w) in [(1080, 1920), (720, 1280), (333, 517), (321, 321)]:
        frames = rng.integers(0, 256, (2, h, w, 3), np.uint8)
        out = native.prep320_bgr(frames)
        if out is None:
            pytest.skip("native lib unavailable")
        lap_b, area_b, lin_b = out
        gray = np.stack([cv2.cvtColor(frames[i], cv2.COLOR_BGR2GRAY)
                         for i in range(2)])
        lap_g, area_g, lin_g = native.prep320(gray)
        # the BGR-fused sweep must be bit-identical to gray-then-prep
        np.testing.assert_array_equal(area_b, area_g)
        np.testing.assert_array_equal(lin_b, lin_g)
        np.testing.assert_allclose(lap_b, lap_g, rtol=0, atol=0)
    assert native.prep320_bgr(
        rng.integers(0, 256, (1, 320, 640, 3), np.uint8)) is None


def test_prep320_declines_non_downscale():
    if native.lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(12)
    assert native.prep320(rng.integers(0, 256, (1, 320, 640), np.uint8)) \
        is None
    assert native.prep320(rng.integers(0, 256, (1, 640, 100), np.uint8)) \
        is None
