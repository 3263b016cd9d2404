"""Fused warp+update+blur+solve iteration kernel vs the staged XLA path
(interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from avd_tpu.ops import flow as flow_ops
from avd_tpu.ops.pallas import flow_iter


def _staged(R0, R1, flow):
    """Reference: the three-stage path with Pallas disabled (XLA gather
    warp + pointwise update + conv blur + solve)."""
    M = flow_ops._update_matrices(R0, R1, flow)
    return np.asarray(flow_ops._solve_flow(
        flow_ops._box_blur_mean(M, 15)))


def _fields(seed, b, h, w, flow_scale, smooth=True):
    rng = np.random.default_rng(seed)
    base0 = rng.random((b, h + 10, w + 10)).astype(np.float32) * 255
    base1 = np.roll(base0, (2, 3), axis=(1, 2))
    i0 = jnp.asarray(base0[:, :h, :w])
    i1 = jnp.asarray(base1[:, :h, :w])
    R0 = flow_ops.poly_expansion(i0, 5, 1.2)
    R1 = flow_ops.poly_expansion(i1, 5, 1.2)
    fl = (rng.random((b, 2, h, w)).astype(np.float32) - 0.5) * flow_scale
    if smooth:
        from scipy.ndimage import uniform_filter
        fl = np.stack([[uniform_filter(p, 7) for p in fb]
                       for fb in fl]).astype(np.float32)
    return R0, R1, jnp.asarray(fl)


@pytest.mark.parametrize("shape,scale", [
    ((2, 80, 96), 2.0), ((1, 40, 128), 0.0), ((1, 120, 130), 6.0),
])
def test_matches_staged_path(shape, scale):
    b, h, w = shape
    R0, R1, fl = _fields(0, b, h, w, scale)
    ours = np.asarray(flow_iter.solve_iteration(R0, R1, fl,
                                                interpret=True))
    ref = _staged(R0, R1, fl)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_large_uniform_pan():
    """Large pan: most pixels out of bounds at the edge blocks — the
    in-bounds-only box must stay tight AND the masked update must agree."""
    R0, R1, _ = _fields(1, 1, 80, 128, 0)
    fl = np.empty((1, 2, 80, 128), np.float32)
    fl[:, 0] = 61.0
    fl[:, 1] = 3.0
    fl = jnp.asarray(fl)
    ours = np.asarray(flow_iter.solve_iteration(R0, R1, fl,
                                                interpret=True))
    ref = _staged(R0, R1, fl)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_full_farneback_with_fused_iterations():
    """farneback_flow with the fused iteration forced on matches the
    staged pipeline end-to-end on a realistic moving pair."""
    import os

    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, (200, 220)).astype(np.float32)
    try:
        import cv2
        base = cv2.GaussianBlur(base, (0, 0), 2)
    except ImportError:
        pass
    prev = jnp.asarray(base[:160, :160][None])
    cur = jnp.asarray(base[3:163, 2:162][None])

    ref = np.asarray(flow_ops.farneback_flow(prev, cur))
    os.environ["AVD_PALLAS_ITER"] = "1"
    flow_ops._pallas_iter_enabled.cache_clear()
    orig = flow_iter.solve_iteration_prepared
    try:
        from unittest import mock
        with mock.patch.object(
                flow_iter, "solve_iteration_prepared",
                lambda r0p, r1p, f, width, winsize=15: orig(
                    r0p, r1p, f, width=width, winsize=winsize,
                    interpret=True)):
            ours = np.asarray(flow_ops.farneback_flow(prev, cur))
    finally:
        del os.environ["AVD_PALLAS_ITER"]
        flow_ops._pallas_iter_enabled.cache_clear()
    m_ref, v_ref = flow_ops.flow_magnitude_stats(jnp.asarray(ref))
    m_ours, v_ours = flow_ops.flow_magnitude_stats(jnp.asarray(ours))
    np.testing.assert_allclose(np.asarray(m_ours), np.asarray(m_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_ours), np.asarray(v_ref),
                               rtol=1e-2, atol=1e-4)
