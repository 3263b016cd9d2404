"""Select-shift Pallas warp vs the XLA gather warp (interpret mode on the
CPU mesh; the real-TPU comparison runs in bench/flow integration).

Contract (round 3): the kernel matches the XLA path on IN-BOUNDS pixels
(0 <= floor(coord) < size-1) and returns 0 elsewhere — callers mask by
the in-bounds plane, and excluding out-of-bounds pixels keeps each row
block's displacement bounding box tight."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avd_tpu.ops import flow as flow_ops
from avd_tpu.ops.pallas import warp as pwarp


def _xla_warp(src_bchw, flow_b2hw):
    """Reference: the gather-based warp fallback (channels-first API).

    Returns (warped, inb) with inb broadcast over channels."""
    warped, inb = flow_ops._warp_poly(src_bchw, flow_b2hw)
    return np.asarray(warped), np.asarray(inb)[:, None, :, :]


def _check(src, flow, atol=1e-5):
    ours = np.asarray(pwarp.warp_bilinear(jnp.asarray(src),
                                          jnp.asarray(flow),
                                          interpret=True))
    ref, inb = _xla_warp(jnp.asarray(src), jnp.asarray(flow))
    np.testing.assert_allclose(np.where(inb, ours, 0.0),
                               np.where(inb, ref, 0.0), atol=atol)
    # out-of-bounds pixels are 0 by contract
    np.testing.assert_allclose(np.where(inb, 0.0, ours), 0.0, atol=atol)


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
    _check(src, flow)


def test_rough_flow_still_correct():
    src, flow = _case(1, 1, 40, 128, 10.0, smooth=False)
    _check(src, flow)


def test_uniform_pan_tight_box():
    """A large uniform pan (the clamp-tail case the box must NOT widen
    on) stays exact on the in-bounds interior."""
    src, _ = _case(3, 1, 40, 128, 0)
    flow = np.empty((1, 2, 40, 128), np.float32)
    flow[:, 0] = 61.0
    flow[:, 1] = 3.0
    _check(src, flow)


def test_out_of_bounds_zeroed():
    """Flow pointing far outside the image: every pixel is out of bounds,
    so the kernel returns all zeros (and must not scan the clamp range)."""
    src, _ = _case(2, 1, 40, 128, 0)
    flow = np.full((1, 2, 40, 128), 500.0, np.float32)
    ours = np.asarray(pwarp.warp_bilinear(jnp.asarray(src),
                                          jnp.asarray(flow),
                                          interpret=True))
    np.testing.assert_allclose(ours, 0.0, atol=1e-6)
    ours = np.asarray(pwarp.warp_bilinear(jnp.asarray(src),
                                          jnp.asarray(-flow),
                                          interpret=True))
    np.testing.assert_allclose(ours, 0.0, atol=1e-6)
