"""Golden parity suite (BASELINE.json north star).

The TPU video feature path must agree with the reference-faithful cv2/numpy
oracle on deterministic golden clips: |Δai_score| ≤ 1e-3 after fusion,
identical labels and duplicate counts, and closely-tracking summary
statistics.  Decode is shared (both paths consume the same sampled frame
batch from ingest), isolating compute parity.
"""

import copy

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from avd_tpu.analyzers import fusion, heuristics_v2  # noqa: E402
from avd_tpu.oracle import video_ref  # noqa: E402
from avd_tpu.ops import video_features  # noqa: E402
from tests import fixtures  # noqa: E402


def _clips():
    return {
        "solid": fixtures.solid_clip(24, 128),
        "noise": fixtures.noise_clip(24, 128),
        "gradient": fixtures.gradient_clip(24, 128),
        "spliced": fixtures.spliced_clip(24, 128),
    }


def _sampled(frames, fps=30.0):
    """Apply the reference sampling cadence (step=15 at 30 fps)."""
    step = max(1, int(round(fps / 2)))
    return frames[::step]


@pytest.mark.parametrize("name", ["solid", "noise", "gradient", "spliced"])
def test_feature_parity(name):
    frames = _clips()[name]
    sampled = _sampled(frames)
    dur = len(frames) / 30.0

    ours = video_features.analyze_frames(sampled, 128, 128, 30.0, dur)
    ref = video_ref.analyze_frames(sampled, 128, 128, 30.0, dur)

    assert len(ours["timeline"]) == len(ref["timeline"])
    s_o, s_r = ours["summary"], ref["summary"]
    assert s_o["dup_density"] == s_r["dup_density"], name
    # texture variance: relative agreement (f32 vs f64)
    assert abs(s_o["texture_var"] - s_r["texture_var"]) <= \
        1e-3 * max(1.0, s_r["texture_var"]), name
    # flow stats: our Farnebäck vs cv2's (the gradient clip is an
    # aperture-problem case — 75 px aliased shift between sampled frames —
    # where both solvers produce ambiguous flow, hence the 10 % band)
    assert abs(s_o["flow_mean"] - s_r["flow_mean"]) <= \
        0.10 * max(0.2, s_r["flow_mean"]), name
    assert s_o["scene_change_rate"] == pytest.approx(
        s_r["scene_change_rate"], abs=0.35), name
    np.testing.assert_allclose(ours["timeline"], ref["timeline"], atol=0.02)


@pytest.mark.parametrize("name", ["solid", "noise", "gradient", "spliced"])
def test_ai_score_parity(name):
    """End-to-end through fusion: |Δai_score| ≤ 1e-3 + identical label."""
    frames = _clips()[name]
    sampled = _sampled(frames)
    dur = len(frames) / 30.0
    meta = {"width": 128, "height": 128, "fps": 30.0, "bit_rate": 1_000_000}
    hints = heuristics_v2.compute_hints(meta, "")
    neutral_audio = {"scores": {}, "flags_audio": {},
                     "timeline": [0.5] * int(max(1, round(dur)))}

    ours_v = video_features.analyze_frames(sampled, 128, 128, 30.0, dur)
    ref_v = video_ref.analyze_frames(sampled, 128, 128, 30.0, dur)

    fused_ours = fusion.fuse(copy.deepcopy(neutral_audio),
                             copy.deepcopy(ours_v), copy.deepcopy(hints))
    fused_ref = fusion.fuse(copy.deepcopy(neutral_audio),
                            copy.deepcopy(ref_v), copy.deepcopy(hints))

    assert fused_ours["result"]["label"] == fused_ref["result"]["label"]
    # ai_score is rounded to 2dp in the result; compare unrounded means
    t_o = np.mean(fused_ours["timeline_binned"])
    t_r = np.mean(fused_ref["timeline_binned"])
    assert abs(t_o - t_r) <= 1e-3, f"{name}: {t_o} vs {t_r}"
    assert fused_ours["result"]["ai_score"] == fused_ref["result"]["ai_score"]


def test_chunked_equals_unchunked(monkeypatch):
    """Streaming chunks must produce identical features to one batch."""
    frames = _sampled(fixtures.gradient_clip(90, 96))
    full = video_features.compute_features(frames)
    monkeypatch.setattr(video_features, "_DEFAULT_CHUNK", 2)
    video_features._compiled_chunk.cache_clear()
    chunked = video_features.compute_features(frames)
    video_features._compiled_chunk.cache_clear()
    assert full["dup"] == chunked["dup"]
    np.testing.assert_allclose(full["textures"], chunked["textures"],
                               rtol=1e-5)
    # flow is an iterative f32 solver: different batch sizes change XLA's
    # reduction/fusion order, so per-pair stats agree to ~0.5 %, not ulps
    np.testing.assert_allclose(full["flow_means"], chunked["flow_means"],
                               rtol=6e-3, atol=1e-4)
    np.testing.assert_allclose(full["timeline_ai"], chunked["timeline_ai"],
                               atol=2e-3)


def test_empty_batch():
    out = video_features.analyze_frames(
        np.zeros((0, 64, 64, 3), np.uint8), 64, 64, 30.0, 2.0)
    assert out["timeline"] == [0.5, 0.5]
    assert out["summary"]["dup_density"] == 0.0


def test_single_frame():
    frames = fixtures.noise_clip(1, 64)
    ours = video_features.analyze_frames(frames, 64, 64, 30.0, 1.0)
    ref = video_ref.analyze_frames(frames, 64, 64, 30.0, 1.0)
    assert len(ours["timeline"]) == len(ref["timeline"]) == 1
    assert ours["summary"]["flow_mean"] == ref["summary"]["flow_mean"] == 0.0
