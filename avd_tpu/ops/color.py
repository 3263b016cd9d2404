"""Color conversion kernels.

``cv2.cvtColor(BGR2GRAY)`` on uint8 uses fixed-point arithmetic:
``gray = (R*9798 + G*19235 + B*3735 + 16384) >> 15`` (OpenCV fixed-point
coefficients at 15-bit scale).  The reference grayscales every frame three
times (/root/reference/app/analyzers/video.py:5,43,51); we compute it once
per frame, batched, bit-exactly, so hashes and Laplacian variances match the
CPU oracle to the last ulp.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV RGB→gray fixed-point coefficients at 15-bit scale (verified
# bit-exact against cv2 5.0 in tests/test_kernels.py::test_gray_bit_exact).
_R_COEF = 9798
_G_COEF = 19235
_B_COEF = 3735
_SHIFT = 15
_ROUND = 1 << (_SHIFT - 1)


def bgr_to_gray_u8(frames: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] uint8 BGR → [...] uint8 gray, bit-exact with cv2."""
    f = frames.astype(jnp.int32)
    b = f[..., 0]
    g = f[..., 1]
    r = f[..., 2]
    acc = r * _R_COEF + g * _G_COEF + b * _B_COEF + _ROUND
    return (acc >> _SHIFT).astype(jnp.uint8)


def bgr_to_gray_f32(frames: jnp.ndarray) -> jnp.ndarray:
    """Same conversion, returned as float32 (kernel inputs)."""
    return bgr_to_gray_u8(frames).astype(jnp.float32)
