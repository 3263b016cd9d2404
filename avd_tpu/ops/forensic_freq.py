"""Frequency-domain forensic kernels (BASELINE.json north-star item:
"frequency-domain forensic checks (FFT/DCT compression-artifact and
noise-residual stats) become XLA kernels").

The reference has no pixel-level forensics (its "forensic" module is
metadata-only, meta.py); these batched kernels add the classic
signal-level checks used to separate camera footage from renders and
re-encodes:

* **8×8 block-DCT statistics** — JPEG/H.26x quantize in the 8×8 DCT
  domain, leaving energy concentrated in low frequencies and visible
  8-px block boundaries.  DCT is two matmuls with the orthonormal DCT-II
  basis (MXU work), batched over every block of every frame.
* **blockiness** — mean absolute gradient across 8-px block boundaries
  vs within blocks; re-encoded/compressed content scores > 1.
* **noise residual** — high-pass residual (image minus 3×3 box blur)
  variance and kurtosis: camera sensor noise is heavy-tailed and
  omnipresent; diffusion/GAN output is typically over-smooth (low
  variance) or has statistically regular residuals.

Everything is a jittable function over [N, H, W] float32 gray batches;
``summarize`` reduces to per-frame scalars.  Attached to the video
summary under ``summary["freq"]`` when AVD_FREQ_FORENSICS=1 (additive —
parity mode output is unchanged).
"""

from __future__ import annotations

import functools
from typing import Dict

import numpy as np


@functools.lru_cache(maxsize=1)
def dct8_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis, [8, 8]."""
    k = np.arange(8)
    n = np.arange(8)
    m = np.cos(np.pi * (2 * n[None, :] + 1) * k[:, None] / 16.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return (m * 0.5).astype(np.float32)


def block_dct_stats(gray, block: int = 8):
    """[N, H, W] f32 → per-frame DCT-domain statistics.

    Returns dict of [N] arrays:
      hf_ratio    high-frequency (u+v >= 8) energy / total AC energy
      ac_energy   mean AC coefficient magnitude
      dc_var      variance of DC coefficients across blocks (global
                  structure/exposure variation)
    """
    import jax.numpy as jnp

    n, h, w = gray.shape
    hb, wb = h // block, w // block
    g = gray[:, :hb * block, :wb * block]
    blocks = g.reshape(n, hb, block, wb, block)
    d = jnp.asarray(dct8_matrix())
    # coeffs = D @ B @ D^T over each 8x8 block
    c = jnp.einsum("ij,nhjwk,lk->nhiwl", d, blocks, d,
                   preferred_element_type=jnp.float32)
    c = c.transpose(0, 1, 3, 2, 4)  # [N, hb, wb, 8, 8]

    u = np.arange(block)
    hf_mask = jnp.asarray((u[:, None] + u[None, :]) >= block)
    ac_mask = jnp.ones((block, block), bool).at[0, 0].set(False)
    ac_mask = jnp.asarray(ac_mask)

    mag = jnp.abs(c)
    ac_energy = jnp.sum(mag * ac_mask, axis=(-1, -2))      # [N,hb,wb]
    hf_energy = jnp.sum(mag * (hf_mask & ac_mask), axis=(-1, -2))
    dc = c[..., 0, 0]

    total_ac = jnp.sum(ac_energy, axis=(1, 2))
    return {
        "hf_ratio": jnp.sum(hf_energy, axis=(1, 2))
        / jnp.maximum(total_ac, 1e-6),
        "ac_energy": total_ac / (hb * wb * 63.0),
        "dc_var": jnp.var(dc, axis=(1, 2)),
    }


def blockiness(gray, block: int = 8):
    """[N, H, W] f32 → [N] ratio of 8-px-boundary gradients to interior
    gradients (>1 ⇒ visible codec block structure)."""
    import jax.numpy as jnp

    n, h, w = gray.shape
    dx = jnp.abs(gray[:, :, 1:] - gray[:, :, :-1])   # [N, H, W-1]
    dy = jnp.abs(gray[:, 1:, :] - gray[:, :-1, :])
    xb = (jnp.arange(w - 1) % block) == (block - 1)
    yb = (jnp.arange(h - 1) % block) == (block - 1)
    eps = 1e-6
    bx = (jnp.sum(dx * xb[None, None, :], axis=(1, 2))
          / jnp.maximum(jnp.sum(xb), 1))
    ix = (jnp.sum(dx * (~xb)[None, None, :], axis=(1, 2))
          / jnp.maximum(jnp.sum(~xb), 1))
    by = (jnp.sum(dy * yb[None, :, None], axis=(1, 2))
          / jnp.maximum(jnp.sum(yb), 1))
    iy = (jnp.sum(dy * (~yb)[None, :, None], axis=(1, 2))
          / jnp.maximum(jnp.sum(~yb), 1))
    return ((bx + by) / 2.0) / jnp.maximum((ix + iy) / 2.0, eps)


def noise_residual_stats(gray):
    """[N, H, W] f32 → high-pass residual variance and excess kurtosis."""
    import jax.numpy as jnp

    g = gray
    # 3×3 box blur with edge replication (separable concat-shifts)
    def blur1(x, axis):
        lo = jnp.take(x, jnp.asarray([0]), axis=axis)
        hi = jnp.take(x, jnp.asarray([x.shape[axis] - 1]), axis=axis)
        ext = jnp.concatenate([lo, x, hi], axis=axis)
        sl = [slice(None)] * x.ndim
        out = 0.0
        for k in range(3):
            sl[axis] = slice(k, k + x.shape[axis])
            out = out + ext[tuple(sl)]
        return out / 3.0

    blurred = blur1(blur1(g, 1), 2)
    r = g - blurred
    mean = jnp.mean(r, axis=(1, 2), keepdims=True)
    var = jnp.mean((r - mean) ** 2, axis=(1, 2))
    m4 = jnp.mean((r - mean) ** 4, axis=(1, 2))
    kurt = m4 / jnp.maximum(var ** 2, 1e-12) - 3.0
    return {"residual_var": var, "residual_kurtosis": kurt}


def summarize(gray_u8: np.ndarray) -> Dict[str, float]:
    """Per-clip frequency forensic summary from a [N, H, W] uint8 gray
    batch: per-frame stats reduced to means (host f64)."""
    import jax
    import jax.numpy as jnp

    from avd_tpu.utils import jaxtools
    jaxtools.setup()

    @jax.jit
    def stats(g):
        gf = g.astype(jnp.float32)
        out = {}
        out.update(block_dct_stats(gf))
        out["blockiness"] = blockiness(gf)
        out.update(noise_residual_stats(gf))
        return out

    per_frame = {k: np.asarray(v) for k, v in stats(
        jnp.asarray(gray_u8)).items()}
    return {k: float(np.mean(v)) for k, v in per_frame.items()}
