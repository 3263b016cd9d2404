"""Audio feature parity: batched TPU windows vs the numpy oracle, and the
oracle vs hand-checked values."""

import numpy as np
import pytest

from avd_tpu.oracle import audio_ref
from avd_tpu.ops import audio_features
from tests import fixtures


@pytest.fixture(scope="module", params=["sine", "noise", "speechy", "short"])
def wav(request):
    if request.param == "sine":
        return fixtures.sine_wav(3.7)
    if request.param == "noise":
        return fixtures.noise_wav(4.0)
    if request.param == "speechy":
        return fixtures.speechy_wav(5.3)
    return fixtures.sine_wav(0.3)  # shorter than one window


def test_jax_matches_oracle(wav):
    from avd_tpu.ops import audio_features
    ours = audio_features.analyze_waveform(wav.copy(), 16000)
    ref = audio_ref.analyze_waveform(wav.astype(np.float64), 16000)

    for key in ("speech_ratio", "tts_like"):
        assert abs(ours["scores"][key] - ref["scores"][key]) < 1e-3, key
    for key in ref["flags_audio"]:
        assert abs(ours["flags_audio"][key]
                   - ref["flags_audio"][key]) < 1e-3, key
    assert len(ours["timeline"]) == len(ref["timeline"])
    # Timeline parity: the reference's norm01 (audio.py:22-27) rescales the
    # flatness spread to [0,1] even when that spread is numerical noise —
    # for a pure tone the spread IS noise (≈1e-14 in f64, ≈1e-8 in f32), so
    # the f32 device path cannot reproduce it and the production default is
    # the host float64 path (see avd_tpu.analyzers.audio._backend).
    flat_spread = np.ptp(audio_ref.window_features(
        wav.astype(np.float64), 16000)["flat"])
    if flat_spread > 1e-4:
        np.testing.assert_allclose(ours["timeline"], ref["timeline"],
                                   atol=2e-2)


def test_oracle_window_count():
    wav = fixtures.noise_wav(4.25)  # 8.5 windows → 9 entries
    feats = audio_ref.window_features(wav.astype(np.float64), 16000)
    assert len(feats["rms"]) == 9


def test_sine_is_flat_spectrum_low():
    """A pure tone has near-zero spectral flatness; noise is high."""
    sine = audio_ref.window_features(
        fixtures.sine_wav(2.0).astype(np.float64), 16000)
    noise = audio_ref.window_features(
        fixtures.noise_wav(2.0).astype(np.float64), 16000)
    assert np.mean(sine["flat"]) < 0.05
    assert np.mean(noise["flat"]) > 0.3


def test_timeline_length_follows_duration():
    out = audio_ref.analyze_waveform(
        fixtures.noise_wav(7.4).astype(np.float64), 16000)
    assert len(out["timeline"]) == 7  # round(7.4) = 7


def test_empty_waveform():
    out = audio_ref.analyze_waveform(np.zeros(0), 16000)
    assert out["timeline"] == [0.5]
    # reference semantics: empty → rms_arr = zeros(1) → all windows >= the
    # 0.0 percentile → speech_ratio 1.0 (audio.py:63-70)
    assert out["scores"]["speech_ratio"] == 1.0


def test_device_default_with_tonal_guard(monkeypatch):
    """The jax backend is the default and must hold ~1e-4 timeline parity
    vs the float64 oracle even on spectrally-pure signals — the case that
    breaks a plain f32 FFT (flatness log-magnitudes below the noise
    floor).  The flatness column's host-f64 guard covers it."""
    monkeypatch.delenv("AVD_AUDIO_BACKEND", raising=False)
    from avd_tpu.analyzers import audio as audio_an
    assert audio_an._backend() == "jax"

    sr = 16000
    t = np.arange(4 * sr) / sr
    for wav in (
        np.sin(2 * np.pi * 440.0 * t),                       # pure tone
        np.sin(2 * np.pi * 440.0 * t)
        + np.sin(2 * np.pi * 1313.0 * t),                    # two-tone
        fixtures.speechy_wav(4.0),                           # realistic
    ):
        wav = (np.round(np.asarray(wav, np.float64) * 16384)
               / 32768).astype(np.float32)
        dev = audio_features.analyze_waveform(wav, sr)
        ora = audio_ref.analyze_waveform(wav.astype(np.float64), sr)
        np.testing.assert_allclose(dev["timeline"], ora["timeline"],
                                   atol=2e-4)
        assert dev["scores"]["tts_like"] == pytest.approx(
            ora["scores"]["tts_like"], abs=1e-6)
