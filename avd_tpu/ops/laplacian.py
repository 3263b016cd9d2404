"""Laplacian texture variance.

Reference: ``cv2.Laplacian(gray, CV_64F).var()`` per frame
(/root/reference/app/analyzers/video.py:51-52) — ksize=1 kernel
[[0,1,0],[1,-4,1],[0,1,0]] with BORDER_REFLECT_101, population variance over
all pixels.

TPU design: the 5-point stencil is four shifted adds on the VPU (no conv
needed); variance is a two-pass mean/mean-of-squared-deviations reduction in
float32 so only one scalar per frame leaves the device.  Two-pass avoids the
E[x²]−E[x]² cancellation that would break float32 parity with the float64
oracle.
"""

from __future__ import annotations

import jax.numpy as jnp


def laplacian(gray: jnp.ndarray) -> jnp.ndarray:
    """5-point Laplacian over [..., H, W] with reflect-101 borders.

    Implemented as mirrored-concat shifts rather than ``jnp.pad`` + slices:
    the pad+slice form produces odd-sized intermediates that send the XLA
    TPU compiler into a multi-minute tiling search at 1080p (measured 279 s
    vs 1.7 s for this form, identical results)."""
    g = gray
    up = jnp.concatenate([g[..., 1:2, :], g[..., :-1, :]], axis=-2)
    down = jnp.concatenate([g[..., 1:, :], g[..., -2:-1, :]], axis=-2)
    left = jnp.concatenate([g[..., :, 1:2], g[..., :, :-1]], axis=-1)
    right = jnp.concatenate([g[..., :, 1:], g[..., :, -2:-1]], axis=-1)
    return up + down + left + right - 4.0 * g


def texture_variance(gray: jnp.ndarray) -> jnp.ndarray:
    """Per-frame Laplacian variance: [N, H, W] f32 → [N] f32."""
    lap = laplacian(gray)
    mean = jnp.mean(lap, axis=(-2, -1), keepdims=True)
    return jnp.mean((lap - mean) ** 2, axis=(-2, -1))
