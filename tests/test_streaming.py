"""Streaming decode path: identical results to the batch path, bounded
memory, async-dispatch pipeline."""

import numpy as np
import pytest

from avd_tpu.ingest import probe, video_reader
from avd_tpu.ops import video_features
from tests import fixtures


def test_streaming_matches_batch(tmp_path):
    clip = fixtures.noise_clip(120, 64)
    path = fixtures.write_video(tmp_path / "s.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)
    fb = video_reader.read_sampled(path, meta)

    batch = video_features.compute_features(fb.frames)

    def chunks():
        for c in video_reader.iter_sampled_chunks(path, meta, chunk=3):
            yield c.frames

    stream = video_features.compute_features_streaming(chunks())
    assert stream["total"] == batch["total"]
    assert stream["dup"] == batch["dup"]
    np.testing.assert_allclose(stream["textures"], batch["textures"],
                               rtol=1e-6)
    np.testing.assert_allclose(stream["flow_means"], batch["flow_means"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stream["timeline_ai"], batch["timeline_ai"],
                               atol=1e-6)


def test_streaming_analyzer_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("AVD_STREAM", "1")
    from avd_tpu.analyzers import video as video_an
    clip = fixtures.spliced_clip(90, 64)
    path = fixtures.write_video(tmp_path / "sp.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)
    out_stream = video_an.analyze(path, meta)

    monkeypatch.setenv("AVD_STREAM", "0")
    out_batch = video_an.analyze(path, meta)
    assert out_stream["summary"]["dup_density"] == \
        out_batch["summary"]["dup_density"]
    np.testing.assert_allclose(out_stream["timeline"], out_batch["timeline"],
                               atol=1e-6)


def test_fast_seek_matches_walk(tmp_path, monkeypatch):
    """AVD_FAST_SEEK must yield the exact frames of the grab-walk on the
    fixture encodings."""
    clip = fixtures.gradient_clip(120, 64)
    path = fixtures.write_video(tmp_path / "f.mp4", clip, fps=30.0)
    meta = probe.probe_basic_meta(path)
    walk = np.concatenate([c.frames for c in
                           video_reader.iter_sampled_chunks(path, meta)])
    monkeypatch.setenv("AVD_FAST_SEEK", "1")
    seek = np.concatenate([c.frames for c in
                           video_reader.iter_sampled_chunks(path, meta)])
    np.testing.assert_array_equal(walk, seek)


def test_streaming_empty_file(tmp_path, monkeypatch):
    monkeypatch.setenv("AVD_STREAM", "1")
    from avd_tpu.analyzers import video as video_an
    out = video_an.analyze("/nonexistent.mp4", {})
    assert out == {"timeline": [], "summary": {}, "timeline_ai": []}


def test_h2d_delta_is_bit_exact(monkeypatch):
    """AVD_H2D_DELTA ships mod-256 temporal deltas and reconstructs on
    device (cumsum mod 256) — EXACT by construction, so every feature
    must be bit-identical with the flag on and off (tools/h2d_probe.py
    measured the tunnel compressing in flight; the delta encoding is
    what makes streaming puts compressible)."""
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (61, 64, 64, 3), dtype=np.uint8)

    def run():
        return video_features.compute_features(frames.copy())

    monkeypatch.setenv("AVD_H2D_DELTA", "1")
    on = run()
    monkeypatch.setenv("AVD_H2D_DELTA", "0")
    off = run()
    assert on["dup"] == off["dup"]
    np.testing.assert_array_equal(on["flow_means"], off["flow_means"])
    np.testing.assert_array_equal(on["flow_vars"], off["flow_vars"])
    np.testing.assert_array_equal(on["timeline_ai"], off["timeline_ai"])


def test_delta_u8_roundtrip_exact():
    """Host encode / device decode round-trip over the full u8 range,
    including wraparound."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    w = rng.integers(0, 256, (49, 17, 13), dtype=np.uint8)
    enc = video_features._delta_u8(w)
    dec = np.asarray(video_features._undelta_u8(jnp.asarray(enc)))
    np.testing.assert_array_equal(dec, w)


def test_h2d_delta_auto_picks_by_motion(monkeypatch):
    """'auto' (default) delta selection: low-motion full windows ship
    deltas, high-motion and tail windows ship raw (calibration table in
    _h2d_delta_mode's docstring / BASELINE.md round 3)."""
    monkeypatch.delenv("AVD_H2D_DELTA", raising=False)
    chunk = video_features._DEFAULT_CHUNK
    full = chunk + 1
    static = np.full((full, 320, 320), 100, np.uint8)
    rng = np.random.default_rng(0)
    moving = rng.integers(0, 256, (full, 320, 320), dtype=np.uint8)
    assert video_features._use_delta(static, full, chunk) is True
    assert video_features._use_delta(moving, full, chunk) is False
    # tails always raw in auto (warm program set stays small)
    assert video_features._use_delta(static[: chunk // 4 + 1],
                                     chunk // 4 + 1, chunk) is False
    # forced modes override the proxy — for FULL windows only; tails
    # stay raw even when forced (only the full bucket's delta variant
    # is warmed, so a forced-delta tail would pay a cold Mosaic program
    # load mid-request)
    monkeypatch.setenv("AVD_H2D_DELTA", "1")
    assert video_features._use_delta(moving, full, chunk) is True
    assert video_features._use_delta(static[: chunk // 4 + 1],
                                     chunk // 4 + 1, chunk) is False
    monkeypatch.setenv("AVD_H2D_DELTA", "0")
    assert video_features._use_delta(static, full, chunk) is False


def test_h2d_delta_proxy_ignores_padding(monkeypatch):
    """_pad_window repeats the last frame (zero deltas), so a short
    high-motion run padded into the full bucket must not slip under the
    motion threshold — the dispatch path evaluates the proxy on the
    valid prefix only."""
    monkeypatch.delenv("AVD_H2D_DELTA", raising=False)
    chunk = video_features._DEFAULT_CHUNK
    full = chunk + 1
    # borderline motion just above the 5-gray-level crossover: frames
    # alternate base / base+6, so every valid delta is exactly 6
    n_valid = 3 * chunk // 4 + 1  # shortest run the full bucket pads
    short = np.full((n_valid, 320, 320), 100, np.uint8)
    short[1::2] += 6
    padded = video_features._pad_window(short, full)
    # padding dilutes the whole-window proxy below the threshold...
    assert video_features._window_motion(padded) \
        < video_features._delta_thresh()
    # ...but the valid prefix is unambiguously above it
    assert video_features._window_motion(padded[: short.shape[0]]) \
        > video_features._delta_thresh()
