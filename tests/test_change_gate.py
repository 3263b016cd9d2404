"""CBinfer-style change gating (AVD_CHANGE_GATE=1) — explicitly
non-parity fast mode (docs/PERFORMANCE.md): flow is skipped for frame
pairs whose 320×320 gray planes barely changed.  Parity mode (gate off,
the default) must be byte-identical to before."""

import numpy as np
import pytest

from tests import fixtures
from avd_tpu.ops import video_features


def test_gate_off_by_default(monkeypatch):
    monkeypatch.delenv("AVD_CHANGE_GATE", raising=False)
    assert not video_features._gate_enabled()


def test_gated_static_clip_skips_flow(monkeypatch):
    """A static clip gates every pair: flow features become exact zeros,
    everything else (dup, texture, totals) matches the ungated path."""
    clip = fixtures.solid_clip(40, 64)
    monkeypatch.setenv("AVD_CHANGE_GATE", "0")
    plain = video_features.compute_features(clip)
    monkeypatch.setenv("AVD_CHANGE_GATE", "1")
    gated = video_features.compute_features(clip)

    assert gated["skipped_pairs"] == 39
    assert gated["total"] == plain["total"]
    assert gated["dup"] == plain["dup"]
    np.testing.assert_allclose(gated["textures"], plain["textures"])
    assert all(v == 0.0 for v in gated["flow_means"])
    # cv2's flow on identical frames is ~0 anyway: timelines stay close
    np.testing.assert_allclose(gated["timeline_ai"], plain["timeline_ai"],
                               atol=5e-3)


def test_gated_dynamic_clip_matches_ungated(monkeypatch):
    """Fully dynamic content never triggers the gate — outputs must equal
    the ungated path exactly (the same device flow program runs)."""
    monkeypatch.setenv("AVD_CP", "0")  # compare against the window path
    clip = fixtures.noise_clip(14, 64)
    monkeypatch.setenv("AVD_CHANGE_GATE", "0")
    plain = video_features.compute_features(clip)
    monkeypatch.setenv("AVD_CHANGE_GATE", "1")
    gated = video_features.compute_features(clip)

    assert gated["skipped_pairs"] == 0
    assert gated["dup"] == plain["dup"]
    np.testing.assert_allclose(gated["flow_means"], plain["flow_means"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gated["flow_vars"], plain["flow_vars"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gated["timeline_ai"], plain["timeline_ai"],
                               atol=1e-6)


def test_gated_mixed_clip(monkeypatch):
    """Half static / half moving: only the moving pairs pay flow."""
    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    frames = np.stack([base] * 10
                      + [np.roll(base, i * 3, axis=1) for i in range(10)])
    monkeypatch.setenv("AVD_CHANGE_GATE", "1")
    gated = video_features.compute_features(frames)
    assert 5 <= gated["skipped_pairs"] <= 12
    moving = gated["flow_means"][10:]
    assert max(moving) > 0.5  # real motion measured on the moving half
