"""Frequency-domain forensic kernels: DCT correctness vs scipy, and the
statistics separate compressed/smooth content from noisy camera-like
content."""

import numpy as np
import pytest

import jax.numpy as jnp

from avd_tpu.ops import forensic_freq as ff


def test_dct_matrix_matches_scipy():
    from scipy.fft import dctn
    rng = np.random.default_rng(0)
    block = rng.random((8, 8)).astype(np.float32)
    d = ff.dct8_matrix()
    ours = d @ block @ d.T
    ref = dctn(block, type=2, norm="ortho")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_block_dct_stats_shapes():
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.random((3, 64, 80)).astype(np.float32) * 255)
    out = ff.block_dct_stats(g)
    for k in ("hf_ratio", "ac_energy", "dc_var"):
        assert out[k].shape == (3,)
        assert np.all(np.isfinite(np.asarray(out[k])))


def test_hf_ratio_discriminates_smooth_vs_noise():
    rng = np.random.default_rng(2)
    noise = rng.random((2, 64, 64)).astype(np.float32) * 255
    smooth = np.tile(np.linspace(0, 255, 64, dtype=np.float32), (2, 64, 1))
    hf_noise = float(np.mean(np.asarray(
        ff.block_dct_stats(jnp.asarray(noise))["hf_ratio"])))
    hf_smooth = float(np.mean(np.asarray(
        ff.block_dct_stats(jnp.asarray(smooth))["hf_ratio"])))
    assert hf_noise > 5 * max(hf_smooth, 1e-6)


def test_blockiness_detects_block_structure():
    rng = np.random.default_rng(3)
    base = rng.random((1, 64, 64)).astype(np.float32) * 30
    blocky = base.copy()
    # add per-8x8-block DC offsets → strong boundary gradients
    offs = rng.random((8, 8)).astype(np.float32) * 80
    blocky += np.kron(offs, np.ones((8, 8), np.float32))[None]
    b_plain = float(np.asarray(ff.blockiness(jnp.asarray(base)))[0])
    b_blocky = float(np.asarray(ff.blockiness(jnp.asarray(blocky)))[0])
    assert b_blocky > b_plain * 1.5


def test_noise_residual_separates():
    rng = np.random.default_rng(4)
    noisy = rng.normal(128, 20, (1, 64, 64)).astype(np.float32)
    smooth = np.full((1, 64, 64), 128, np.float32)
    out_n = ff.noise_residual_stats(jnp.asarray(noisy))
    out_s = ff.noise_residual_stats(jnp.asarray(smooth))
    assert float(out_n["residual_var"][0]) > 10.0
    assert float(out_s["residual_var"][0]) < 1e-3


def test_summary_attached_when_enabled(monkeypatch, tmp_path):
    from avd_tpu.analyzers import video as video_an
    from avd_tpu.ingest import probe
    from tests import fixtures
    monkeypatch.setenv("AVD_FREQ_FORENSICS", "1")
    monkeypatch.setenv("AVD_STREAM", "0")
    path = fixtures.write_video(tmp_path / "v.mp4",
                                fixtures.noise_clip(30, 64), fps=30.0)
    meta = probe.probe_basic_meta(path)
    out = video_an.analyze(path, meta)
    assert "freq" in out["summary"]
    assert {"hf_ratio", "ac_energy", "dc_var", "blockiness",
            "residual_var", "residual_kurtosis"} <= \
        set(out["summary"]["freq"])


def test_summary_absent_by_default(monkeypatch, tmp_path):
    from avd_tpu.analyzers import video as video_an
    from avd_tpu.ingest import probe
    from tests import fixtures
    monkeypatch.delenv("AVD_FREQ_FORENSICS", raising=False)
    monkeypatch.setenv("AVD_BACKEND", "oracle")
    path = fixtures.write_video(tmp_path / "v.mp4",
                                fixtures.noise_clip(30, 64), fps=30.0)
    out = video_an.analyze(path, probe.probe_basic_meta(path))
    assert "freq" not in out["summary"]
