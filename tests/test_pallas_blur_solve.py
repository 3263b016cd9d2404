"""Fused box-blur+solve Pallas kernel vs the XLA path (interpret mode on
the CPU mesh; the real-TPU integration is exercised by bench/flow).

Random unconstrained M fields make the 2×2 solve nearly singular at
scattered pixels (det+1e-3 ≈ 1e-3), where ANY change in f32 accumulation
order is amplified ~1000×; tests therefore compare either the blur on
realistic positive-semidefinite G entries or well-conditioned solves.
All layouts are channels-first [B, 5, H, W] (ops/flow round-3 layout).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from avd_tpu.ops import flow as flow_ops
from avd_tpu.ops.pallas import blur_solve


def _xla(M, winsize=15):
    return np.asarray(flow_ops._solve_flow(
        flow_ops._box_blur_mean(M, winsize)))


def _psd_case(seed, b, h, w):
    """M with the structure the solver actually sees: G entries from
    squared taper'd polynomial fields (g11·g22 − g12² ≥ 0 pointwise)."""
    rng = np.random.default_rng(seed)
    r4 = rng.normal(size=(b, h, w)).astype(np.float32)
    r5 = rng.normal(size=(b, h, w)).astype(np.float32)
    r6 = rng.normal(size=(b, h, w)).astype(np.float32)
    h1 = rng.normal(size=(b, h, w)).astype(np.float32)
    h2 = rng.normal(size=(b, h, w)).astype(np.float32)
    g11 = r4 * r4 + r6 * r6
    g12 = (r4 + r5) * r6
    g22 = r5 * r5 + r6 * r6
    return np.stack([g11, g12, g22, h1, h2], axis=1)


@pytest.mark.parametrize("shape", [(2, 80, 96), (1, 40, 128), (1, 120, 130)])
def test_matches_xla_blur_solve(shape):
    M = jnp.asarray(_psd_case(0, *shape))
    ours = np.asarray(blur_solve.box_blur_solve(M, interpret=True))
    ref = _xla(M)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_well_conditioned_exact():
    """With fixed PD G the solve is linear in h — agreement to f32 eps."""
    rng = np.random.default_rng(1)
    M = rng.normal(size=(1, 5, 80, 96)).astype(np.float32)
    M[:, 0] = 2.0
    M[:, 1] = 0.0
    M[:, 2] = 3.0
    M = jnp.asarray(M)
    ours = np.asarray(blur_solve.box_blur_solve(M, interpret=True))
    np.testing.assert_allclose(ours, _xla(M), atol=1e-6)


def test_replicate_edges():
    """Constant field must blur to itself everywhere incl. borders."""
    M = np.zeros((1, 5, 40, 136), np.float32)
    M[:, 0] = 4.0
    M[:, 2] = 4.0
    M[:, 3] = 2.0
    M[:, 4] = -2.0
    M = jnp.asarray(M)
    out = np.asarray(blur_solve.box_blur_solve(M, interpret=True))
    # g=diag(4,4), h=(2,-2) → flow = h/(g + reg/…) ≈ (0.5, -0.5)
    ref = _xla(M)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    np.testing.assert_allclose(out[:, 0], 2.0 * 4.0 / (16.0 + 1e-3),
                               atol=1e-6)


def test_flow_pipeline_parity_cpu():
    """farneback_flow with the fused kernel forced on matches the XLA
    pipeline end-to-end on a realistic moving pair (the downstream
    consumers are flow-magnitude mean/var)."""
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
    os.environ["AVD_PALLAS_SOLVE"] = "1"
    flow_ops._pallas_solve_enabled.cache_clear()
    orig = blur_solve.box_blur_solve
    try:
        from unittest import mock
        with mock.patch.object(
                blur_solve, "box_blur_solve",
                lambda M, winsize=15: orig(M, winsize=winsize,
                                           interpret=True)):
            ours = np.asarray(flow_ops.farneback_flow(prev, cur))
    finally:
        del os.environ["AVD_PALLAS_SOLVE"]
        flow_ops._pallas_solve_enabled.cache_clear()
    m_ref, v_ref = flow_ops.flow_magnitude_stats(jnp.asarray(ref))
    m_ours, v_ours = flow_ops.flow_magnitude_stats(jnp.asarray(ours))
    np.testing.assert_allclose(np.asarray(m_ours), np.asarray(m_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_ours), np.asarray(v_ref),
                               rtol=1e-3, atol=1e-5)
