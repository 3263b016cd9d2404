"""Reference edge-case semantics: banker's rounding of durations, timeline
padding rules, threshold env overrides (SURVEY.md §7 'hard parts' #2)."""

import os

import numpy as np

from avd_tpu import config as config_mod
from avd_tpu.analyzers import fusion
from avd_tpu.oracle import audio_ref, video_ref


def test_duration_bankers_rounding():
    # round() half-to-even: 0.5→0 (floored to 1 by max), 1.5→2, 2.5→2
    feats = {"dup": 0, "total": 0, "flow_means": [], "flow_vars": [],
             "textures": [], "timeline_ai": []}
    assert len(video_ref.summarize(feats, 0, 0, 0.0, 0.5)["timeline"]) == 1
    assert len(video_ref.summarize(feats, 0, 0, 0.0, 1.5)["timeline"]) == 2
    assert len(video_ref.summarize(feats, 0, 0, 0.0, 2.5)["timeline"]) == 2
    assert len(video_ref.summarize(feats, 0, 0, 0.0, 3.5)["timeline"]) == 4


def test_timeline_truncation_vs_padding():
    feats = {"dup": 0, "total": 3, "flow_means": [0.1, 0.2],
             "flow_vars": [0.0, 0.0], "textures": [10.0, 20.0, 30.0],
             "timeline_ai": [0.1, 0.2, 0.3]}
    # shorter than duration → last-value padding (video.py:73-78)
    out = video_ref.summarize(dict(feats), 64, 64, 30.0, 5.0)
    assert out["timeline"] == [0.1, 0.2, 0.3, 0.3, 0.3]
    # longer than duration → truncation (video.py:79-80)
    out = video_ref.summarize(dict(feats), 64, 64, 30.0, 2.0)
    assert out["timeline"] == [0.1, 0.2]


def test_audio_timeline_rounding():
    wav = np.zeros(int(16000 * 2.5), np.float64)  # round(2.5) = 2
    out = audio_ref.analyze_waveform(wav, 16000)
    assert len(out["timeline"]) == 2


def test_threshold_env_overrides():
    os.environ["THRESH_REAL_MAX"] = "0.6"
    os.environ["THRESH_AI_MIN"] = "0.65"
    config_mod.reset_config()
    try:
        out = fusion.fuse(
            {"timeline": [0.5] * 4, "flags_audio": {}},
            {"timeline": [0.5] * 4, "summary": {}},
            {"compression": "light", "bpp": 0.2})
        # score 0.5 <= 0.6 → "real" under the raised threshold
        assert out["result"]["label"] == "real"
    finally:
        os.environ.pop("THRESH_REAL_MAX")
        os.environ.pop("THRESH_AI_MIN")
        config_mod.reset_config()


def test_ai_score_two_decimal_rounding():
    out = fusion.fuse(
        {"timeline": [0.11111] * 3, "flags_audio": {}},
        {"timeline": [0.11111] * 3, "summary": {}},
        {"compression": "light", "bpp": 0.2})
    # rounded to exactly 2 decimals in the JSON (fusion.py:103-104)
    assert out["result"]["ai_score"] == round(out["result"]["ai_score"], 2)
    assert out["result"]["confidence"] == \
        round(out["result"]["confidence"], 2)


def test_tts_cap_applies():
    """tts_like capped at 0.90 when variability > 0.005 (audio.py:82-84)."""
    rng = np.random.default_rng(0)
    # alternating tones → high flatness variability across windows
    sr = 16000
    parts = []
    for i in range(8):
        t = np.arange(sr // 2) / sr
        freq = 300 + 700 * (i % 3)
        if i % 2:
            parts.append(0.4 * np.sin(2 * np.pi * freq * t))
        else:
            parts.append(0.3 * rng.standard_normal(sr // 2))
    wav = np.concatenate(parts)
    out = audio_ref.analyze_waveform(wav, sr)
    var_sum = (out["flags_audio"]["sc_var"] + out["flags_audio"]["roll_var"]
               + out["flags_audio"]["zcr_var"])
    if var_sum > 0.005:
        assert out["scores"]["tts_like"] <= 0.90
