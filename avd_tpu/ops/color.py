"""Color conversion kernels.

``cv2.cvtColor(BGR2GRAY)`` on uint8 uses fixed-point arithmetic:
``gray = (R*4899 + G*9617 + B*1868 + 8192) >> 14`` (OpenCV color_lut
coefficients, 14-bit scale).  The reference grayscales every frame three
times (/root/reference/app/analyzers/video.py:5,43,51); we compute it once
per frame, batched, bit-exactly, so hashes and Laplacian variances match the
CPU oracle to the last ulp.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV RGB→gray fixed-point coefficients at 14-bit scale.
_R_COEF = 4899
_G_COEF = 9617
_B_COEF = 1868
_SHIFT = 14
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
