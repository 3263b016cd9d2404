"""Observability: /metrics counters and AVD_PROFILE stage breakdown."""

import json
import os
import threading

import pytest

from avd_tpu import config as config_mod
from avd_tpu.serve import app as app_mod
from avd_tpu.serve import http as http_mod
from tests import fixtures
from tests.test_serve import _multipart, _request


@pytest.fixture
def server():
    os.environ["AVD_BACKEND"] = "oracle"
    os.environ["AVD_PROFILE"] = "1"
    config_mod.reset_config()
    srv = http_mod.make_server(app_mod.build_app(), "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address[1]
    srv.shutdown()
    os.environ.pop("AVD_BACKEND", None)
    os.environ.pop("AVD_PROFILE", None)
    config_mod.reset_config()


def test_metrics_counters_advance(server, tmp_path):
    path = fixtures.write_video(tmp_path / "m.mp4",
                                fixtures.noise_clip(30, 64), fps=30.0)
    status, _, data = _request(server, "GET", "/metrics")
    before = json.loads(data)["metrics"]

    with open(path, "rb") as f:
        body, headers = _multipart(files={"file": ("m.mp4", f.read())})
    status, _, data = _request(server, "POST", "/analyze", body, headers)
    assert status == 200
    d = json.loads(data)
    # AVD_PROFILE=1 → per-stage wall times in the response
    assert "profile" in d
    assert {"probe", "analyzers", "fusion"} <= set(d["profile"])

    status, _, data = _request(server, "GET", "/metrics")
    after = json.loads(data)["metrics"]
    assert after.get("requests", 0) >= before.get("requests", 0) + 1
    assert after.get("frames_analyzed", 0) > before.get("frames_analyzed", 0)
    assert "frames_per_sec_lifetime" in after


def test_metrics_prometheus_format(server):
    """?format=prometheus (or a text/plain Accept) serves the 0.0.4 text
    exposition so a stock Prometheus scrape job works; JSON stays the
    default."""
    status, headers, data = _request(server, "GET",
                                     "/metrics?format=prometheus")
    assert status == 200
    text = data.decode()
    assert headers.get("Content-Type", "").startswith("text/plain")
    assert "# TYPE avd_uptime_s gauge" in text
    assert any(line.startswith("avd_uptime_s ")
               for line in text.splitlines())

    # Accept-header negotiation
    status, headers, data = _request(server, "GET", "/metrics", None,
                                     {"Accept": "text/plain"})
    assert status == 200 and data.decode().startswith("# TYPE ")

    # default stays JSON
    status, _, data = _request(server, "GET", "/metrics")
    assert json.loads(data)["ok"] is True


def test_profile_absent_by_default(tmp_path):
    os.environ["AVD_BACKEND"] = "oracle"
    os.environ.pop("AVD_PROFILE", None)
    config_mod.reset_config()
    try:
        from avd_tpu import pipeline
        path = fixtures.write_video(tmp_path / "p.mp4",
                                    fixtures.solid_clip(16, 64), fps=30.0)
        out = pipeline.analyze_path(path)
        assert "profile" not in out
    finally:
        os.environ.pop("AVD_BACKEND", None)
        config_mod.reset_config()
