"""Detector scoring integration: disabled by default (parity), attaches a
probability timeline when enabled, blends only when asked."""

import os

import numpy as np
import pytest

from avd_tpu.models import scoring
from tests import fixtures


@pytest.fixture
def small_detector(monkeypatch):
    """Shrink the ViT so CPU tests stay fast."""
    import jax
    from avd_tpu.models import detector

    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=2,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def probs(params, frames):
        import jax.numpy as jnp
        logits = detector.forward(params, frames, cfg)[:, 0]
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    monkeypatch.setattr(scoring, "_bundle",
                        lambda: (cfg, params, probs, "test_init", 1))
    monkeypatch.setenv("AVD_DETECTOR", "1")
    yield


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("AVD_DETECTOR", raising=False)
    assert scoring.detector_timeline(
        np.zeros((3, 64, 64, 3), np.uint8)) is None


def test_probability_timeline(small_detector):
    frames = fixtures.noise_clip(5, 64)
    det = scoring.detector_timeline(frames)
    assert det is not None
    assert len(det["timeline"]) == 5
    assert all(0.0 <= p <= 1.0 for p in det["timeline"])
    assert det["weights"] == "test_init"


def test_shipped_checkpoint_is_default(monkeypatch):
    """The trained serving-size (224px) flagship checkpoint in
    models/weights/detector_full loads without any env configuration and
    separates camera-like from generator-like frames (BASELINE.md
    round-3 flagship eval: 0.998 acc on held-out synthetic)."""
    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.delenv("AVD_DETECTOR_CKPT", raising=False)
    monkeypatch.delenv("AVD_DETECTOR_PRESET", raising=False)
    scoring._bundle.cache_clear()
    try:
        rng = np.random.default_rng(0)
        noisy = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
        smooth = np.full((2, 64, 64, 3), 128, np.uint8)
        out_n = scoring.detector_timeline(noisy)
        out_s = scoring.detector_timeline(smooth)
        # shipped path, tagged with the served calibration temperature
        assert "detector_full" in out_n["weights"]
        # camera-like sensor noise scores less AI-like than flat frames
        assert max(out_n["timeline"]) < min(out_s["timeline"])
    finally:
        scoring._bundle.cache_clear()


def test_blend_zero_keeps_heuristic(monkeypatch):
    monkeypatch.setenv("AVD_DETECTOR_BLEND", "0")
    base = [0.1, 0.9]
    assert scoring.blend(base, [0.5, 0.5]) == base


def test_blend_mixes(monkeypatch):
    monkeypatch.setenv("AVD_DETECTOR_BLEND", "0.5")
    out = scoring.blend([0.0, 1.0], [1.0, 0.0])
    np.testing.assert_allclose(out, [0.5, 0.5])


def test_analyzer_attaches_detector(small_detector, monkeypatch, tmp_path):
    from avd_tpu.analyzers import video as video_an
    from avd_tpu.ingest import probe
    monkeypatch.setenv("AVD_BACKEND", "oracle")
    path = fixtures.write_video(tmp_path / "c.mp4",
                                fixtures.noise_clip(30, 64), fps=30.0)
    meta = probe.probe_basic_meta(path)
    out = video_an.analyze(path, meta)
    assert "detector" in out
    assert len(out["detector"]["timeline"]) == 2  # 30 frames, step 15
    # blend defaults to 0 → heuristic timeline untouched by detector
    assert out["timeline"] is out["timeline_ai"]


@pytest.mark.parametrize("slab", ["256", "2"])
def test_streaming_detector_matches_batch(small_detector, tmp_path,
                                          monkeypatch, slab):
    """AVD_DETECTOR no longer forces whole-clip batch decode: the
    streaming path accumulates per-chunk model-size resizes and scores
    them in bounded slabs — detector timeline and blended heuristic
    timeline must equal the batch path's (per-frame scores are
    independent of batch grouping), including when the clip spans
    multiple slabs (slab=2)."""
    from avd_tpu.analyzers import video
    from avd_tpu.ingest import probe

    monkeypatch.setenv("AVD_DETECTOR_SLAB", slab)
    monkeypatch.setenv("AVD_DETECTOR_BLEND", "0.5")
    clip = fixtures.spliced_clip(90, 96)
    path = fixtures.write_video(tmp_path / "s.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)

    monkeypatch.setenv("AVD_STREAM", "1")
    out_s = video.analyze(path, meta)
    monkeypatch.setenv("AVD_STREAM", "0")
    out_b = video.analyze(path, meta)

    assert "detector" in out_s and "detector" in out_b
    np.testing.assert_allclose(out_s["detector"]["timeline"],
                               out_b["detector"]["timeline"],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(out_s["timeline"], out_b["timeline"],
                               rtol=0, atol=1e-6)
    assert out_s["timeline_ai"] is out_s["timeline"]  # alias contract


@pytest.mark.parametrize("stream", ["1", "0"])
def test_detector_failure_is_additive(tmp_path, monkeypatch, stream):
    """A broken detector config (unloadable checkpoint) must NOT kill the
    heuristic analysis: the timeline stays real, 'detector' is absent,
    and detector_error names the failure — on both paths."""
    from avd_tpu.analyzers import video
    from avd_tpu.ingest import probe

    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.setenv("AVD_DETECTOR_CKPT", str(tmp_path / "nonexistent"))
    monkeypatch.setenv("AVD_STREAM", stream)
    scoring._bundle.cache_clear()
    try:
        clip = fixtures.spliced_clip(90, 96)
        path = fixtures.write_video(tmp_path / "d.mp4", clip, fps=30.0)
        meta = probe.probe_basic_meta(path)
        out = video.analyze(path, meta)
        assert "detector" not in out
        assert "detector_error" in out
        assert len(out["timeline"]) == 3  # real heuristic result
        assert any(abs(v - 0.5) > 1e-9 for v in out["timeline"])
    finally:
        scoring._bundle.cache_clear()


def test_shipped_ckpt_resolution(tmp_path, monkeypatch):
    """Per-(family, preset) shipped-checkpoint lookup: small presets map
    to their family dirs; vit/full maps to detector_full (auto-loads if
    ever trained on a real host); everything else has no shipped ckpt."""
    monkeypatch.setattr(scoring, "_WEIGHTS_DIR", str(tmp_path))
    monkeypatch.setattr(scoring, "_SHIPPED",
                        {a: str(tmp_path / n) for a, n in
                         (("vit", "detector_small"), ("cnn", "cnn_small"),
                          ("temporal", "temporal_small"))})
    assert scoring._shipped_ckpt("vit", "full") is None  # not trained
    (tmp_path / "detector_full").mkdir()
    assert scoring._shipped_ckpt("vit", "full") == str(
        tmp_path / "detector_full")
    assert scoring._shipped_ckpt("cnn", "full") is None
    assert scoring._shipped_ckpt("vit", "small") is None  # dir absent
    (tmp_path / "detector_small").mkdir()
    assert scoring._shipped_ckpt("vit", "small") == str(
        tmp_path / "detector_small")


def test_fit_temperature_recovers_overconfidence():
    """fit_temperature (Guo et al. 2017 post-hoc calibration) recovers a
    known miscalibration scale: labels drawn from sigmoid(z) but logits
    reported as 3z should fit T ~= 3; already-calibrated logits fit
    T ~= 1."""
    from tools.eval_detector import fit_temperature

    rng = np.random.default_rng(0)
    z = rng.normal(0.0, 2.0, 20000)
    y = (rng.random(20000) < 1.0 / (1.0 + np.exp(-z))).astype(np.int32)
    assert abs(fit_temperature(z * 3.0, y) - 3.0) < 0.25
    assert abs(fit_temperature(z, y) - 1.0) < 0.1


def test_temperature_loader_precedence(tmp_path, monkeypatch, recwarn):
    """_temperature: AVD_DETECTOR_TEMP overrides calibration.json
    overrides the 1.0 default; invalid env warns and falls through."""
    import json
    monkeypatch.delenv("AVD_DETECTOR_TEMP", raising=False)
    assert scoring._temperature(None) == 1.0
    assert scoring._temperature(str(tmp_path)) == 1.0  # no file
    (tmp_path / "calibration.json").write_text(
        json.dumps({"temperature": 2.5}))
    assert scoring._temperature(str(tmp_path)) == 2.5
    monkeypatch.setenv("AVD_DETECTOR_TEMP", "4.0")
    assert scoring._temperature(str(tmp_path)) == 4.0
    monkeypatch.setenv("AVD_DETECTOR_TEMP", "bogus")
    assert scoring._temperature(str(tmp_path)) == 2.5
    assert any("AVD_DETECTOR_TEMP" in str(w.message) for w in recwarn.list)


def test_serving_applies_temperature(monkeypatch):
    """A served temperature rescales confidence toward 0.5 while
    preserving the ranking (scoring._bundle divides logits by T before
    the sigmoid; source string gains the +T suffix)."""
    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.delenv("AVD_DETECTOR_CKPT", raising=False)
    monkeypatch.delenv("AVD_DETECTOR_PRESET", raising=False)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (6, 64, 64, 3), dtype=np.uint8)

    def run():
        scoring._bundle.cache_clear()
        try:
            return scoring.detector_timeline(frames)
        finally:
            scoring._bundle.cache_clear()

    monkeypatch.setenv("AVD_DETECTOR_TEMP", "1")
    base = run()
    monkeypatch.setenv("AVD_DETECTOR_TEMP", "10")
    cal = run()
    if base is None or cal is None:
        pytest.skip("no detector bundle available")
    b = np.array(base["timeline"])
    c = np.array(cal["timeline"])
    assert "+T10.00" in cal["weights"] and "+T" not in base["weights"]
    # shrunk toward 0.5, same ranking
    assert np.all(np.abs(c - 0.5) <= np.abs(b - 0.5) + 1e-12)
    assert np.array_equal(np.argsort(b), np.argsort(c))
