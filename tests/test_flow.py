"""Farnebäck flow kernel: agreement with cv2.calcOpticalFlowFarneback.

The reference consumes flow only through per-pair mean/variance of |flow|
and coarse thresholds (video.py:45-48, fusion.py:56-66), so the gate here is
statistical agreement, with pointwise error tracked as a quality metric.
"""

import functools

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@functools.lru_cache(maxsize=1)
def _jitted_flow():
    import jax
    from avd_tpu.ops import flow as flow_ops
    return jax.jit(flow_ops.farneback_flow)


def _ours(a, b):
    import jax.numpy as jnp
    fn = _jitted_flow()
    return np.asarray(fn(jnp.asarray(a, jnp.float32)[None],
                         jnp.asarray(b, jnp.float32)[None]))[0]


def _cv2_flow(a, b):
    return cv2.calcOpticalFlowFarneback(
        a.astype(np.float32), b.astype(np.float32), None,
        0.5, 3, 15, 3, 5, 1.2, 0)


def _textured(seed=0, size=384):
    rng = np.random.default_rng(seed)
    base = rng.random((size, size)).astype(np.float32) * 255
    t = cv2.GaussianBlur(base, (0, 0), 1.5) + \
        0.5 * cv2.GaussianBlur(base, (0, 0), 6)
    t = (t - t.min()) / (t.max() - t.min()) * 255
    return t


def test_identity_pair_near_zero():
    t = _textured()[: 320, : 320]
    ours = _ours(t, t)
    ref = _cv2_flow(t, t)
    assert np.abs(ours).max() < 0.1
    # and track cv2 (its own border pixels reach ~0.12 here)
    assert abs(np.abs(ours).mean() - np.abs(ref).mean()) < 0.01


def test_translation_recovered():
    t = _textured(1, 400)
    a = t[40:360, 40:360]
    b = t[41:361, 42:362]  # true shift: dx=-2, dy=-1 mapping a→b coords
    ours = _ours(a, b)
    ref = _cv2_flow(a, b)
    # interior region (away from border taper)
    sl = (slice(30, -30), slice(30, -30))
    ours_mean = ours[sl].mean(axis=(0, 1))
    ref_mean = ref[sl].mean(axis=(0, 1))
    # both must agree with each other closely
    np.testing.assert_allclose(ours_mean, ref_mean, atol=0.05)
    # and with the true displacement
    np.testing.assert_allclose(ref_mean, [-2.0, -1.0], atol=0.3)
    np.testing.assert_allclose(ours_mean, [-2.0, -1.0], atol=0.3)


def test_magnitude_stats_agree():
    """flow_mean / flow_var — the quantities ai_score consumes — must track
    cv2 closely on realistic pairs."""
    t0 = _textured(2, 384)[:320, :320]
    rng = np.random.default_rng(3)
    warp = (rng.random((2, 320, 320)).astype(np.float32) - 0.5)
    grid_y, grid_x = np.mgrid[0:320, 0:320].astype(np.float32)
    t1 = cv2.remap(t0, grid_x + 1.5 + warp[0], grid_y - 0.7 + warp[1],
                   cv2.INTER_LINEAR)
    ours = _ours(t0, t1)
    ref = _cv2_flow(t0, t1)
    mo = np.sqrt((ours ** 2).sum(-1))
    mr = np.sqrt((ref ** 2).sum(-1))
    assert abs(mo.mean() - mr.mean()) < 0.05 * max(1.0, mr.mean())
    assert abs(mo.var() - mr.var()) < 0.15 * max(1.0, mr.var())


def test_pointwise_agreement():
    t0 = _textured(4, 384)[:320, :320]
    t1 = np.roll(t0, shift=(1, 2), axis=(0, 1))
    ours = _ours(t0, t1)
    ref = _cv2_flow(t0, t1)
    sl = (slice(20, -20), slice(20, -20))
    err = np.abs(ours[sl] - ref[sl])
    assert err.mean() < 0.05, f"mean pointwise err {err.mean()}"
