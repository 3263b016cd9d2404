"""AOT detector export (models/export.py): jax.export round-trips,
manifest integrity, and serving integration via AVD_DETECTOR_EXPORTED.

The reference deploys Python source (render.yaml boots api.py); the
TPU-native framework ships a version-pinned, weight-embedded StableHLO
artifact instead.  These tests run the whole loop on the CPU mesh:
export → deserialize → parity with the live model, then the scoring
path serving from the artifact with no model construction at all.
"""

import json
import os

import numpy as np
import pytest

from avd_tpu.models import export as export_mod
from avd_tpu.models import scoring

TINY_VIT = dict(image_size=32, patch=16, width=128, depth=2, heads=4)
TINY_TEMPORAL = dict(image_size=32, patch=16, width=64, depth=2,
                     frame_depth=2, heads=2)


def _rand_frames(n, size, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((n, size, size, 3), np.float32)


def test_export_roundtrip_vit(tmp_path):
    """Deserialized program == live forward within the bf16
    re-compilation budget (activations are bf16 — detector.py:7-8 — so
    two independently compiled programs round differently; the repo's
    layout-change parity budget is 2e-2, observed here ~5e-3)."""
    import jax
    import jax.numpy as jnp
    from avd_tpu.models import detector

    out = str(tmp_path / "artifact")
    manifest = export_mod.export_detector(
        out, arch="vit", preset="small", ckpt=None, batch=8,
        platforms=("cpu",), config_overrides=TINY_VIT)
    assert manifest["batch"] == 8
    assert manifest["image_size"] == 32
    assert manifest["source"] == "random_init"

    cfg, params_none, probs, source, min_batch = export_mod.load_bundle(out)
    assert params_none is None
    assert probs.fixed_batch == 8
    assert source.startswith("exported:")

    # live reference computation (same PRNGKey(0) init as _build)
    live_cfg = detector.make_config("small", **TINY_VIT)
    live_params = detector.init_params(jax.random.PRNGKey(0), live_cfg)

    batch = _rand_frames(8, 32)
    got = np.asarray(probs(None, jnp.asarray(batch)))
    logits = detector.forward(live_params, jnp.asarray(batch),
                              live_cfg)[:, 0]
    want = np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_export_temperature_baked_in(tmp_path):
    """A checkpoint dir with calibration.json exports with T embedded:
    the artifact's probabilities are the calibrated ones."""
    import jax
    import jax.numpy as jnp
    from avd_tpu.models import detector

    live_cfg = detector.make_config("small", **TINY_VIT)
    live_params = detector.init_params(jax.random.PRNGKey(0), live_cfg)
    ckpt = str(tmp_path / "ckpt")
    detector.save_checkpoint(ckpt, live_params)
    with open(os.path.join(ckpt, "calibration.json"), "w") as f:
        json.dump({"temperature": 2.0}, f)

    out = str(tmp_path / "artifact")
    manifest = export_mod.export_detector(
        out, arch="vit", preset="small", ckpt=ckpt, batch=4,
        platforms=("cpu",), config_overrides=TINY_VIT)
    assert manifest["temperature"] == 2.0

    _, _, probs, source, _ = export_mod.load_bundle(out)
    assert "+T2.00" in source
    batch = _rand_frames(4, 32, seed=3)
    got = np.asarray(probs(None, jnp.asarray(batch)))
    logits = detector.forward(live_params, jnp.asarray(batch),
                              live_cfg)[:, 0]
    want = np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32) / 2.0))
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_export_temporal_masked_window(tmp_path):
    """Temporal artifacts lower the fixed masked window: padded
    positions do not affect valid scores (same contract as serving)."""
    import jax
    import jax.numpy as jnp
    from avd_tpu.models import temporal

    out = str(tmp_path / "artifact")
    manifest = export_mod.export_detector(
        out, arch="temporal", preset="small", ckpt=None, window=8,
        platforms=("cpu",), config_overrides=TINY_TEMPORAL)
    assert manifest["window"] == 8

    cfg, _, probs, _, _ = export_mod.load_bundle(out)
    assert probs.clip_window == 8

    live_cfg = temporal.make_config("small", **TINY_TEMPORAL)
    live_params = temporal.init_params(jax.random.PRNGKey(0), live_cfg)

    frames = _rand_frames(5, 32, seed=1)
    padded = np.concatenate([frames, np.repeat(frames[-1:], 3, axis=0)])
    got = np.asarray(probs(None, jnp.asarray(padded), jnp.int32(5)))[:5]

    mask = jnp.arange(8) < 5
    logits = temporal.forward_clip(live_params, jnp.asarray(padded),
                                   live_cfg, mask=mask)[:, 0]
    want = np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32)))[:5]
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_tampered_artifact_fails_loudly(tmp_path):
    out = str(tmp_path / "artifact")
    export_mod.export_detector(out, arch="vit", preset="small", ckpt=None,
                               batch=2, platforms=("cpu",),
                               config_overrides=TINY_VIT)
    path = os.path.join(out, export_mod.PROGRAM_FILE)
    with open(path, "r+b") as f:
        f.seek(-1, os.SEEK_END)
        last = f.read(1)
        f.seek(-1, os.SEEK_END)
        f.write(bytes([last[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="sha256 mismatch"):
        export_mod.load_bundle(out)


def test_http_serving_from_artifact(tmp_path, monkeypatch):
    """The live HTTP surface serves detector scores from the artifact:
    AVD_DETECTOR_EXPORTED plumbs through build_app → pipeline →
    analyzer → scoring, and the envelope's detector block carries the
    exported provenance tag."""
    import http.client
    import threading

    from avd_tpu import config as config_mod
    from avd_tpu.serve import app as app_mod
    from avd_tpu.serve import http as http_mod
    from tests import fixtures

    out = str(tmp_path / "artifact")
    export_mod.export_detector(out, arch="vit", preset="small", ckpt=None,
                               batch=4, platforms=("cpu",),
                               config_overrides=TINY_VIT)

    monkeypatch.setenv("AVD_BACKEND", "oracle")
    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.setenv("AVD_DETECTOR_EXPORTED", out)
    config_mod.reset_config()
    scoring._bundle.cache_clear()
    srv = http_mod.make_server(app_mod.build_app(), "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        clip = fixtures.noise_clip(10, 64)
        path = fixtures.write_video(tmp_path / "clip.mp4", clip, fps=30.0)
        with open(path, "rb") as f:
            payload = f.read()
        boundary = "avdexportboundary"
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f"name=\"file\"; filename=\"clip.mp4\"\r\n"
                f"Content-Type: application/octet-stream\r\n\r\n"
                ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/analyze", body=body, headers={
            "Content-Type": f"multipart/form-data; boundary={boundary}",
            "Content-Length": str(len(body))})
        r = conn.getresponse()
        env = json.loads(r.read())
        conn.close()
        assert r.status == 200
        det = env["video"].get("detector")
        assert det and det["weights"].startswith("exported:")
        assert len(det["timeline"]) > 0
    finally:
        srv.shutdown()
        config_mod.reset_config()
        scoring._bundle.cache_clear()


def test_scoring_serves_from_artifact(tmp_path, monkeypatch):
    """AVD_DETECTOR_EXPORTED serves the artifact end-to-end through
    detector_timeline — including the chunk-and-pad path for clip
    lengths that don't divide the lowered batch — and matches the live
    model within the bf16 re-compilation budget."""
    import jax
    import jax.numpy as jnp
    from avd_tpu.models import detector

    out = str(tmp_path / "artifact")
    export_mod.export_detector(out, arch="vit", preset="small", ckpt=None,
                               batch=4, platforms=("cpu",),
                               config_overrides=TINY_VIT)

    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.setenv("AVD_DETECTOR_EXPORTED", out)
    scoring._bundle.cache_clear()
    try:
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)
        det = scoring.detector_timeline(frames)
        assert det is not None
        assert len(det["timeline"]) == 6
        assert det["weights"].startswith("exported:")

        live_cfg = detector.make_config("small", **TINY_VIT)
        live_params = detector.init_params(jax.random.PRNGKey(0), live_cfg)
        batch = frames[..., ::-1].astype(np.float32) / 255.0
        logits = detector.forward(live_params, jnp.asarray(batch),
                                  live_cfg)[:, 0]
        want = np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32)))
        np.testing.assert_allclose(det["timeline"], want, atol=1e-2)
    finally:
        scoring._bundle.cache_clear()
