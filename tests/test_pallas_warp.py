"""Select-shift Pallas warp vs the XLA gather warp (interpret mode on the
CPU mesh; the real-TPU comparison runs in bench/flow integration)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avd_tpu.ops import flow as flow_ops
from avd_tpu.ops.pallas import warp as pwarp


def _xla_warp(src_bchw, flow_b2hw):
    """Reference: the existing gather-based warp (channels-last API)."""
    src = jnp.transpose(src_bchw, (0, 2, 3, 1))
    flow = jnp.transpose(flow_b2hw, (0, 2, 3, 1))
    warped, _ = flow_ops._warp_poly(src, flow)
    return np.asarray(jnp.transpose(warped, (0, 3, 1, 2)))


def _case(seed, b, h, w, scale, smooth=True):
    rng = np.random.default_rng(seed)
    src = rng.random((b, 5, h, w)).astype(np.float32)
    flow = (rng.random((b, 2, h, w)).astype(np.float32) - 0.5) * scale
    if smooth:
        # box-smooth the flow like the real solver output
        k = np.ones((5, 5)) / 25.0
        from scipy.signal import convolve2d
        flow = np.stack([[convolve2d(f, k, mode="same", boundary="symm")
                          for f in fb] for fb in flow]).astype(np.float32)
    return src, flow


@pytest.mark.parametrize("scale", [0.0, 1.0, 6.0, 40.0])
def test_matches_xla_warp(scale):
    src, flow = _case(0, 2, 80, 128, scale)
    ours = np.asarray(pwarp.warp_bilinear(jnp.asarray(src),
                                          jnp.asarray(flow),
                                          interpret=True))
    ref = _xla_warp(jnp.asarray(src), jnp.asarray(flow))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rough_flow_still_correct():
    src, flow = _case(1, 1, 40, 128, 10.0, smooth=False)
    ours = np.asarray(pwarp.warp_bilinear(jnp.asarray(src),
                                          jnp.asarray(flow),
                                          interpret=True))
    ref = _xla_warp(jnp.asarray(src), jnp.asarray(flow))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_out_of_bounds_clamping():
    """Flow pointing far outside the image must clamp like the XLA path."""
    src, _ = _case(2, 1, 40, 128, 0)
    flow = np.full((1, 2, 40, 128), 500.0, np.float32)
    ours = np.asarray(pwarp.warp_bilinear(jnp.asarray(src),
                                          jnp.asarray(flow),
                                          interpret=True))
    ref = _xla_warp(jnp.asarray(src), jnp.asarray(flow))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    flow = -flow
    ours = np.asarray(pwarp.warp_bilinear(jnp.asarray(src),
                                          jnp.asarray(flow),
                                          interpret=True))
    ref = _xla_warp(jnp.asarray(src), jnp.asarray(flow))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
