"""URL resolver: native direct-link download path (served from localhost —
no egress), size caps, error mapping (api.py:172-210 semantics)."""

import functools
import http.server
import json
import os
import threading

import pytest

from avd_tpu import config as config_mod
from avd_tpu.ingest import url as url_mod
from avd_tpu.serve.http import HTTPError
from tests import fixtures


@pytest.fixture(scope="module")
def file_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("media")
    clip = fixtures.noise_clip(30, 64)
    fixtures.write_video(root / "clip.mp4", clip, fps=30.0)
    (root / "big.bin").write_bytes(b"\x00" * 300_000)

    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(root))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_direct_download(file_server):
    out = url_mod.resolve(f"{file_server}/clip.mp4", 10_000_000)
    try:
        assert os.path.getsize(out["path"]) > 1000
        assert out["resolved_url"].endswith("/clip.mp4")
        assert out["path"].endswith(".mp4")
    finally:
        os.unlink(out["path"])


def test_direct_download_too_large(file_server):
    with pytest.raises(HTTPError) as ei:
        url_mod.resolve(f"{file_server}/big.bin", 100_000)
    assert ei.value.status == 413
    assert ei.value.detail["error"] == "File troppo grande dal provider"


def test_unsupported_scheme():
    with pytest.raises(HTTPError) as ei:
        url_mod.resolve("ftp://example.com/x.mp4", 1000)
    assert ei.value.status == 415
    assert ei.value.detail["error"] == "URL non supportato"


def test_connection_refused_maps_to_415():
    with pytest.raises(HTTPError) as ei:
        url_mod.resolve("http://127.0.0.1:1/x.mp4", 1000)
    assert ei.value.status == 415


def test_gate_disabled(monkeypatch):
    monkeypatch.setenv("USE_YTDLP", "0")
    config_mod.reset_config()
    try:
        with pytest.raises(HTTPError) as ei:
            url_mod.resolve("http://example.com/x.mp4", 1000)
        assert ei.value.status == 422
        assert ei.value.detail["error"] == "yt-dlp disabilitato"
    finally:
        monkeypatch.delenv("USE_YTDLP")
        config_mod.reset_config()


def test_end_to_end_analyze_url(file_server, monkeypatch):
    """POST /analyze-url with a local direct link → full analysis JSON."""
    monkeypatch.setenv("AVD_BACKEND", "oracle")
    config_mod.reset_config()
    try:
        from avd_tpu.serve import app as app_mod
        from avd_tpu.serve import http as http_mod
        from tests.test_serve import _request
        srv = http_mod.make_server(app_mod.build_app(), "127.0.0.1", 0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            body = f"url={file_server}/clip.mp4".encode()
            status, _, data = _request(
                srv.server_address[1], "POST", "/analyze-url", body,
                {"Content-Type": "application/x-www-form-urlencoded",
                 "Content-Length": str(len(body))})
            assert status == 200
            d = json.loads(data)
            assert d["ok"] is True
            assert d["meta"]["source_url"].endswith("/clip.mp4")
            assert d["meta"]["resolved_url"].endswith("/clip.mp4")
            assert d["result"]["label"] in ("real", "ai", "uncertain")
        finally:
            srv.shutdown()
    finally:
        monkeypatch.delenv("AVD_BACKEND")
        config_mod.reset_config()


def test_cors_origin_restriction(monkeypatch):
    monkeypatch.setenv("ALLOWED_ORIGINS",
                       "https://app.example.com,https://b.example.com")
    config_mod.reset_config()
    try:
        from avd_tpu.serve import app as app_mod
        from avd_tpu.serve.http import BodyStream, Request
        application = app_mod.build_app()
        req = Request("GET", "/healthz", {}, {
            "Origin": "https://app.example.com"}, BodyStream(None, 0))
        resp = application.dispatch(req)
        assert resp.headers["Access-Control-Allow-Origin"] == \
            "https://app.example.com"
        assert resp.headers.get("Vary") == "Origin"
        req = Request("GET", "/healthz", {}, {
            "Origin": "https://evil.example.com"}, BodyStream(None, 0))
        resp = application.dispatch(req)
        # disallowed origin: the header is OMITTED (Starlette
        # CORSMiddleware behavior in the reference), never another origin
        assert "Access-Control-Allow-Origin" not in resp.headers
    finally:
        monkeypatch.delenv("ALLOWED_ORIGINS")
        config_mod.reset_config()
