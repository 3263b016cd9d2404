"""Fusion parity: our fuse() vs the reference's fuse() as a differential
oracle, plus unit checks on the fused contract.

The reference's fusion module is pure numpy (no cv2/soundfile/FastAPI), so
it imports cleanly from the read-only mount and serves as ground truth on
randomized inputs.  This is use-as-oracle, not code reuse.
"""

import copy
import importlib.util
import os
import sys

import numpy as np
import pytest

from avd_tpu.analyzers import fusion
from tests.conftest import REFERENCE_DIR, reference_available


def _load_reference_fusion():
    spec = importlib.util.spec_from_file_location(
        "_ref_fusion", os.path.join(REFERENCE_DIR, "app/analyzers/fusion.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_inputs(rng, n=None):
    n = n or int(rng.integers(1, 40))
    m = int(rng.integers(1, 40))
    audio = {
        "timeline": rng.random(n).tolist(),
        "flags_audio": {
            "speech_ratio": float(rng.random()),
            "tts_like": float(rng.random()),
        },
        "scores": {},
    }
    video = {
        "timeline": rng.random(m).tolist(),
        "timeline_ai": None,
        "summary": {
            "dup_density": float(rng.random() * 0.4),
            "scene_change_rate": float(rng.random()),
            "flow_mean": float(rng.random() * 12),
            "flow_var": float(rng.random()),
            "texture_var": float(rng.random() * 500),
        },
    }
    hints = {
        "compression": str(rng.choice(
            ["very_heavy", "heavy", "normal", "light"])),
        "bpp": float(rng.random() * 0.3),
        "dup_avg": float(rng.choice([0.0, 0.3])),
        "video_has_signal": bool(rng.choice([True, False])),
    }
    return audio, video, hints


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_differential_vs_reference():
    ref = _load_reference_fusion()
    rng = np.random.default_rng(42)
    for _ in range(300):
        audio, video, hints = _random_inputs(rng)
        ours = fusion.fuse(copy.deepcopy(audio), copy.deepcopy(video),
                           copy.deepcopy(hints))
        theirs = ref.fuse(copy.deepcopy(audio), copy.deepcopy(video),
                          copy.deepcopy(hints))
        assert ours["result"]["label"] == theirs["result"]["label"]
        assert ours["result"]["ai_score"] == theirs["result"]["ai_score"]
        assert ours["result"]["confidence"] == theirs["result"]["confidence"]
        assert ours["result"]["reason"] == theirs["result"]["reason"]
        assert ours["peaks"] == theirs["peaks"]
        np.testing.assert_allclose(
            ours["timeline_binned"], theirs["timeline_binned"], atol=1e-12)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_differential_edge_cases():
    ref = _load_reference_fusion()
    cases = [
        # empty timelines
        ({"timeline": []}, {"timeline": []}, {}),
        # constant 0.5 neutral
        ({"timeline": [0.5] * 10, "flags_audio": {}},
         {"timeline": [0.5] * 10, "summary": {}}, {"compression": "normal"}),
        # one-element
        ({"timeline": [1.0], "flags_audio": {"speech_ratio": 0.1,
                                             "tts_like": 0.99}},
         {"timeline": [0.0],
          "summary": {"flow_mean": 9.0, "texture_var": 400.0,
                      "dup_density": 0.0, "scene_change_rate": 0.95}},
         {"compression": "very_heavy", "bpp": 0.01, "dup_avg": 0.0}),
        # video falls back to timeline_ai
        ({"timeline": [0.4, 0.6]},
         {"timeline": None, "timeline_ai": [0.9, 0.9, 0.9], "summary": {}},
         {}),
    ]
    for audio, video, hints in cases:
        ours = fusion.fuse(copy.deepcopy(audio), copy.deepcopy(video),
                           copy.deepcopy(hints))
        theirs = ref.fuse(copy.deepcopy(audio), copy.deepcopy(video),
                          copy.deepcopy(hints))
        assert ours == theirs


def test_in_place_padding_is_observable():
    """fusion must pad the caller's lists like the reference does
    (fusion.py:20-21 mutates, visible in the response JSON)."""
    audio = {"timeline": [0.2]}
    video = {"timeline": [0.8, 0.8, 0.8], "summary": {}}
    fusion.fuse(audio, video, {})
    assert audio["timeline"] == [0.2, 0.2, 0.2]


def test_labels_and_thresholds():
    neutral_summary = {"flow_mean": 0.0, "texture_var": 0.0,
                       "dup_density": 0.0, "scene_change_rate": 0.0}
    low = fusion.fuse({"timeline": [0.0] * 5, "flags_audio": {}},
                      {"timeline": [0.0] * 5, "summary": neutral_summary},
                      {"compression": "light", "bpp": 0.2})
    assert low["result"]["label"] == "real"
    assert low["result"]["reason"] == \
        "segnali audio/video coerenti con ripresa reale"

    high = fusion.fuse({"timeline": [1.0] * 5,
                        "flags_audio": {"tts_like": 0.9,
                                        "speech_ratio": 0.9}},
                       {"timeline": [1.0] * 5, "summary": neutral_summary},
                       {"compression": "light", "bpp": 0.2})
    assert high["result"]["label"] == "ai"
    assert "audio TTS-like elevato" in high["result"]["reason"]

    mid = fusion.fuse({"timeline": [0.5] * 5, "flags_audio": {}},
                      {"timeline": [0.5] * 5, "summary": neutral_summary},
                      {"compression": "light", "bpp": 0.2})
    assert mid["result"]["label"] == "uncertain"
    assert mid["result"]["reason"] == "segnali misti o neutri"
