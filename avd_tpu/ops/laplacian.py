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
    """5-point Laplacian over [..., H, W] with reflect-101 borders."""
    g = jnp.pad(gray, [(0, 0)] * (gray.ndim - 2) + [(1, 1), (1, 1)],
                mode="reflect")
    center = g[..., 1:-1, 1:-1]
    up = g[..., :-2, 1:-1]
    down = g[..., 2:, 1:-1]
    left = g[..., 1:-1, :-2]
    right = g[..., 1:-1, 2:]
    return up + down + left + right - 4.0 * center


def texture_variance(gray: jnp.ndarray) -> jnp.ndarray:
    """Per-frame Laplacian variance: [N, H, W] f32 → [N] f32."""
    lap = laplacian(gray)
    mean = jnp.mean(lap, axis=(-2, -1), keepdims=True)
    return jnp.mean((lap - mean) ** 2, axis=(-2, -1))
