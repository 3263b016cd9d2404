"""Serving concurrency stress (SURVEY.md §5: the serving queue gets a
stress test in lieu of sanitizers — JAX compute is pure, the shared state
is the HTTP layer, the batcher, and the metrics counters)."""

import concurrent.futures
import json
import os
import threading

import pytest

from avd_tpu import config as config_mod
from avd_tpu.serve import app as app_mod
from avd_tpu.serve import batching
from avd_tpu.serve import http as http_mod
from tests import fixtures
from tests.test_serve import _multipart, _request


@pytest.fixture
def stress_server():
    os.environ["AVD_BACKEND"] = "oracle"
    os.environ["AVD_BATCH_WINDOW_MS"] = "20"
    config_mod.reset_config()
    batching.reset_active()
    srv = http_mod.make_server(app_mod.build_app(), "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address[1]
    srv.shutdown()
    os.environ.pop("AVD_BACKEND", None)
    os.environ.pop("AVD_BATCH_WINDOW_MS", None)
    config_mod.reset_config()
    batching.reset_active()


def test_concurrent_mixed_traffic(stress_server, tmp_path):
    """24 concurrent clients mixing uploads, health checks, bad requests —
    every response well-formed, no cross-request bleed."""
    port = stress_server
    clip_a = fixtures.write_video(tmp_path / "a.mp4",
                                  fixtures.solid_clip(30, 64), fps=30.0)
    clip_b = fixtures.write_video(tmp_path / "b.mp4",
                                  fixtures.noise_clip(30, 64), fps=30.0)
    with open(clip_a, "rb") as f:
        payload_a = f.read()
    with open(clip_b, "rb") as f:
        payload_b = f.read()

    def upload(payload):
        body, headers = _multipart(files={"file": ("c.mp4", payload)})
        status, _, data = _request(port, "POST", "/analyze", body, headers,)
        assert status == 200
        d = json.loads(data)
        assert d["ok"] is True
        return d["video"]["summary"].get("dup_density")

    def health():
        status, _, data = _request(port, "GET", "/healthz")
        assert status == 200
        return None

    def bad():
        status, _, _ = _request(port, "POST", "/analyze", b"junk",
                                {"Content-Type": "text/plain",
                                 "Content-Length": "4"})
        assert status == 422
        return None

    jobs = []
    for i in range(8):
        jobs.append(("a", upload, payload_a))
        jobs.append(("b", upload, payload_b))
        jobs.append(("h", health, None))
        jobs.append(("x", bad, None))

    results = {}
    with concurrent.futures.ThreadPoolExecutor(max_workers=24) as pool:
        futs = {}
        for idx, (tag, fn, arg) in enumerate(jobs):
            futs[pool.submit(fn, arg) if arg is not None
                 else pool.submit(fn)] = (idx, tag)
        for fut, (idx, tag) in futs.items():
            results[(idx, tag)] = fut.result(timeout=180)

    # solid clips always report full duplication; noise clips none —
    # any mixing across requests would corrupt these invariants
    dups_a = [v for (i, t), v in results.items() if t == "a"]
    dups_b = [v for (i, t), v in results.items() if t == "b"]
    assert all(v == 1.0 for v in dups_a), dups_a
    assert all(v == 0.0 for v in dups_b), dups_b


def test_metrics_consistent_after_stress(stress_server):
    status, _, data = _request(stress_server, "GET", "/metrics")
    assert status == 200
    m = json.loads(data)["metrics"]
    assert m.get("requests", 0) >= 0
