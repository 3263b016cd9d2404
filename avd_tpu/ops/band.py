"""Separable correlations as banded-matrix matmuls (MXU).

XLA lowers the 1-channel ``conv_general_dilated`` in a separable blur to
VPU work with heavy fixed costs at small spatial sizes (profiled round 2:
poly expansion at 80² costs MORE than at 320², and each coarse pyramid
level's marginal cost exceeded the fine ones).  A 1-D correlation with
any border rule is a linear map, so we precompute the [size, size]
banded matrix on the host and run the correlation as a matmul — which
also lets the pyramid's gaussian-blur + bilinear-resize pair collapse
into ONE composed matrix per axis (both are linear operators).

Matrices are built in float64 and cast to float32 once; device matmuls
run with ``Precision.HIGHEST`` so f32 accuracy survives the MXU's bf16
passes.  Border semantics match the ``jnp.pad`` modes used by
ops/flow._sep_correlate: "edge" (replicate) and "reflect" (mirror
without edge repeat, cv2 BORDER_REFLECT_101).

Matches the blur/expansion structure of cv2.calcOpticalFlowFarneback
(/root/reference/app/analyzers/video.py:43-49 calls it per frame pair).
"""

from __future__ import annotations

import functools

import numpy as np


def _fold_index(p: int, size: int, mode: str) -> int:
    """Map an out-of-range sample index into [0, size) per border mode."""
    if mode == "edge":
        return min(max(p, 0), size - 1)
    if mode == "reflect":  # mirror without repeating the edge sample
        if size == 1:
            return 0
        period = 2 * size - 2
        p %= period
        if p < 0:
            p += period
        return p if p < size else period - p
    raise ValueError(f"unsupported border mode: {mode}")


@functools.lru_cache(maxsize=128)
def correlate_matrix(size: int, kernel: tuple, mode: str) -> np.ndarray:
    """[size, size] matrix K with (K @ v)[i] = Σ_j kernel[j]·v[i + j - n],
    n = (len(kernel)-1)//2, borders folded per ``mode``."""
    k = np.asarray(kernel, np.float64)
    n = (len(k) - 1) // 2
    m = np.zeros((size, size), np.float64)
    for i in range(size):
        for j, kj in enumerate(k):
            m[i, _fold_index(i + j - n, size, mode)] += kj
    return m.astype(np.float32)


@functools.lru_cache(maxsize=64)
def blur_resize_matrix(src: int, dst: int, kernel: tuple,
                       mode: str = "reflect") -> np.ndarray:
    """[dst, src] composed operator: gaussian correlate then bilinear
    resize along one axis (float composition in f64, single f32 cast)."""
    from avd_tpu.ops import resize as resize_ops
    blur = correlate_matrix(src, kernel, mode).astype(np.float64)
    rs = resize_ops.linear_matrix(src, dst, quantize=False).astype(np.float64)
    return (rs @ blur).astype(np.float32)


def apply_separable(img, rows_m: np.ndarray, cols_m: np.ndarray):
    """rows_m @ img @ cols_m.T over the trailing [H, W] axes of ``img``,
    full-f32 MXU matmuls."""
    import jax
    import jax.numpy as jnp
    rm = jnp.asarray(rows_m)
    cm = jnp.asarray(cols_m)
    out = jnp.einsum("...hw,oh->...ow", img, rm,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("...ow,pw->...op", out, cm,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def apply_rows(img, rows_m: np.ndarray):
    """rows_m @ img over the trailing [H, W] axes."""
    import jax
    import jax.numpy as jnp
    return jnp.einsum("...hw,oh->...ow", img, jnp.asarray(rows_m),
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def apply_cols(img, cols_m: np.ndarray):
    """img @ cols_m.T over the trailing [H, W] axes."""
    import jax
    import jax.numpy as jnp
    return jnp.einsum("...hw,pw->...hp", img, jnp.asarray(cols_m),
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
