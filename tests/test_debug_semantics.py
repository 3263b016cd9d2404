"""DEBUG-mode observability contract (api.py:122-128,134-140,167-169,
269-280): tracebacks attach to hints on analyzer failure, forensic errors
surface, the global handler exposes exception details."""

import json
import os
import threading

import pytest

from avd_tpu import config as config_mod


@pytest.fixture
def debug_env():
    os.environ["DEBUG"] = "1"
    os.environ["AVD_BACKEND"] = "oracle"
    config_mod.reset_config()
    yield
    os.environ.pop("DEBUG", None)
    os.environ.pop("AVD_BACKEND", None)
    config_mod.reset_config()


def test_analyzer_failure_attaches_traceback(debug_env, monkeypatch,
                                             tmp_path):
    from avd_tpu import pipeline
    from avd_tpu.analyzers import video as video_an
    from tests import fixtures

    def boom(path, meta):
        raise ValueError("synthetic failure")

    monkeypatch.setattr(video_an, "analyze", boom)
    path = fixtures.write_video(tmp_path / "v.mp4",
                                fixtures.solid_clip(16, 64), fps=30.0)
    out = pipeline.analyze_path(path)
    assert out["hints"]["video_error"] == "ValueError"
    assert "synthetic failure" in out["hints"]["video_traceback"]
    tlen = len(out["video"]["timeline"])
    assert out["video"]["timeline"] == [0.5] * tlen
    assert out["video"]["summary"] == {"error": "ValueError"}


def test_no_traceback_without_debug(monkeypatch, tmp_path):
    os.environ["AVD_BACKEND"] = "oracle"
    os.environ.pop("DEBUG", None)
    config_mod.reset_config()
    try:
        from avd_tpu import pipeline
        from avd_tpu.analyzers import audio as audio_an
        from tests import fixtures

        def boom(path, meta):
            raise RuntimeError("x")

        monkeypatch.setattr(audio_an, "analyze", boom)
        path = fixtures.write_video(tmp_path / "v.mp4",
                                    fixtures.solid_clip(16, 64), fps=30.0)
        out = pipeline.analyze_path(path)
        assert out["hints"]["audio_error"] == "RuntimeError"
        assert "audio_traceback" not in out["hints"]
    finally:
        os.environ.pop("AVD_BACKEND", None)
        config_mod.reset_config()


def test_global_handler_debug_exposes_exception(debug_env):
    from avd_tpu.serve import app as app_mod
    from avd_tpu.serve.http import BodyStream, Request

    application = app_mod.build_app()

    @application.route("GET", "/explode")
    def explode(req):
        raise KeyError("boom")

    resp = application.dispatch(Request("GET", "/explode", {}, {}, BodyStream(None, 0)))
    assert resp.status == 500
    body = json.loads(resp.body)
    assert body["detail"]["exception"] == "KeyError"
    assert "traceback" in body["detail"]


def test_global_handler_prod_hides_details():
    config_mod.reset_config()
    from avd_tpu.serve import app as app_mod
    from avd_tpu.serve.http import BodyStream, Request

    application = app_mod.build_app()

    @application.route("GET", "/explode")
    def explode(req):
        raise KeyError("boom")

    resp = application.dispatch(Request("GET", "/explode", {}, {}, BodyStream(None, 0)))
    assert resp.status == 500
    body = json.loads(resp.body)
    assert body == {"ok": False, "detail": {"error": "Internal server error"}}


def test_cold_start_grace_extends_analyzer_timeout(monkeypatch):
    """Until a device feature program has executed in this process, the
    analyzer timeout carries the cold-start grace (remote program load
    takes minutes cold); after warmup it is exactly the reference 180 s."""
    from avd_tpu import config, pipeline
    from avd_tpu.ops import video_features

    cfg = config.get_config()
    monkeypatch.setattr(video_features, "_DEVICE_WARM", False)
    assert pipeline._analyzer_timeout(cfg) == \
        cfg.request_timeout_s + cfg.cold_grace_s
    monkeypatch.setattr(video_features, "_DEVICE_WARM", True)
    assert pipeline._analyzer_timeout(cfg) == cfg.request_timeout_s


def test_compute_features_marks_device_warm(monkeypatch):
    import numpy as np

    from avd_tpu.ops import video_features

    monkeypatch.setattr(video_features, "_DEVICE_WARM", False)
    frames = np.random.default_rng(0).integers(
        0, 255, (5, 64, 64, 3)).astype(np.uint8)
    video_features.compute_features(frames)
    assert video_features.device_warmed()
