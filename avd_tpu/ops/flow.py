"""Farnebäck dense optical flow, batched for TPU.

The reference calls ``cv2.calcOpticalFlowFarneback(prev, cur, None,
0.5, 3, 15, 3, 5, 1.2, 0)`` per consecutive frame pair on 320×320 grayscale
(/root/reference/app/analyzers/video.py:43-49).  This module reimplements the
algorithm (Farnebäck 2003, "Two-Frame Motion Estimation Based on Polynomial
Expansion") as pure JAX ops batched over ALL frame pairs of a clip at once:

* polynomial expansion = six separable correlations (VPU convs) plus a
  precomputed inverse-Gram contraction;
* pyramid construction = Gaussian blur + bilinear resize expressed as
  interpolation-matrix matmuls (MXU);
* the displacement update = a bilinear warp gather, pointwise normal
  equations, a separable box blur, and a regularized 2×2 solve per pixel.

Every iteration-level structure of the OpenCV implementation is kept
(levels+1 pyramid scales, per-level pre-smoothing with
sigma=(1/scale-1)*0.5, 3 solver iterations with matrix refresh between
them, 5-px border taper, det+1e-3 regularization) so results track cv2
numerically; tests/test_flow.py measures the agreement against cv2 directly.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avd_tpu.ops import resize as resize_ops

DEFAULT_PARAMS = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
                      poly_n=5, poly_sigma=1.2)

# Border taper within 5 px of each edge (OpenCV FarnebackUpdateMatrices).
_BORDER = 5
_BORDER_SCALE = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], np.float32)


# ---------------------------------------------------------------------------
# host-side precomputation
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _poly_exp_kernels(n: int, sigma: float):
    """1D Gaussian basis kernels g, x·g, x²·g and inverse-Gram scalars."""
    k = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(k ** 2) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = k * g
    xxg = (k ** 2) * g

    # 6×6 Gram of basis (1, x, y, x², y², xy) under w(x,y)=g(x)g(y).
    G = np.zeros((6, 6), np.float64)
    for y in k.astype(int):
        for x in k.astype(int):
            w = g[y + n] * g[x + n]
            G[0, 0] += w
            G[1, 1] += w * x * x
            G[2, 2] += w * y * y
            G[3, 3] += w * x * x * x * x
            G[4, 4] += w * y * y * y * y
            G[5, 5] += w * x * x * y * y
            G[0, 3] += w * x * x
            G[0, 4] += w * y * y
            G[3, 4] += w * x * x * y * y
    G[3, 0] = G[0, 3]
    G[4, 0] = G[0, 4]
    G[4, 3] = G[3, 4]
    invG = np.linalg.inv(G)
    ig11 = invG[1, 1]
    ig03 = invG[0, 3]
    ig33 = invG[3, 3]
    ig55 = invG[5, 5]
    return (g.astype(np.float32), xg.astype(np.float32),
            xxg.astype(np.float32), float(ig11), float(ig03),
            float(ig33), float(ig55))


@functools.lru_cache(maxsize=32)
def _gaussian_blur_kernel(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel semantics, incl. the fixed small-kernel table
    used when sigma <= 0 and ksize <= 7."""
    small_tab = {
        1: [1.0],
        3: [0.25, 0.5, 0.25],
        5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
        7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
    }
    if sigma <= 0 and ksize in small_tab:
        return np.asarray(small_tab[ksize], np.float32)
    s = sigma if sigma > 0 else 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    kern = np.exp(-(x ** 2) / (2.0 * s * s))
    kern /= kern.sum()
    return kern.astype(np.float32)


def _cv_round(x: float) -> int:
    """cvRound: round half to even."""
    f = math.floor(x)
    d = x - f
    if d < 0.5:
        return f
    if d > 0.5:
        return f + 1
    return f if f % 2 == 0 else f + 1


# ---------------------------------------------------------------------------
# device-side building blocks (all batched over leading axis B)
# ---------------------------------------------------------------------------

def _sep_correlate(img: jnp.ndarray, kv: np.ndarray, kh: np.ndarray,
                   mode: str) -> jnp.ndarray:
    """Separable 2D correlation over [B, H, W] with the given border mode."""
    n_v = (len(kv) - 1) // 2
    n_h = (len(kh) - 1) // 2
    x = jnp.pad(img, [(0, 0), (n_v, n_v), (n_h, n_h)], mode=mode)
    x = x[:, None]  # [B, 1, H+2nv, W+2nh]
    kvj = jnp.asarray(kv, jnp.float32).reshape(1, 1, -1, 1)
    khj = jnp.asarray(kh, jnp.float32).reshape(1, 1, 1, -1)
    x = jax.lax.conv_general_dilated(x, kvj, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, khj, (1, 1), "VALID")
    return x[:, 0]


def _resize_bilinear(img: jnp.ndarray, dst_h: int, dst_w: int) -> jnp.ndarray:
    """Float bilinear resize (cv2 INTER_LINEAR float path) via matmuls."""
    src_h, src_w = img.shape[-2:]
    if (src_h, src_w) == (dst_h, dst_w):
        return img
    rm = resize_ops.linear_matrix(src_h, dst_h, quantize=False)
    cm = resize_ops.linear_matrix(src_w, dst_w, quantize=False)
    return resize_ops.resize_matmul(img, rm, cm)


def poly_expansion(img: jnp.ndarray, n: int, sigma: float) -> jnp.ndarray:
    """[B, H, W] f32 → [B, 5, H, W] polynomial coefficient planes
    (b_x, b_y, c_xx, c_yy, c_xy) with replicate borders."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_kernels(n, sigma)
    # Vertical then horizontal correlation passes (k·f(y+k)) as banded
    # matmuls: the three distinct vertical passes are shared across the
    # six products — 9 MXU matmuls instead of 12 one-channel convs.
    from avd_tpu.ops import band
    h, w = img.shape[-2:]
    tg, txg, txxg = (tuple(float(v) for v in k) for k in (g, xg, xxg))
    kvg = band.correlate_matrix(h, tg, "edge")
    kvx = band.correlate_matrix(h, txg, "edge")
    kvxx = band.correlate_matrix(h, txxg, "edge")
    khg = band.correlate_matrix(w, tg, "edge")
    khx = band.correlate_matrix(w, txg, "edge")
    khxx = band.correlate_matrix(w, txxg, "edge")
    vg = band.apply_rows(img, kvg)
    vx = band.apply_rows(img, kvx)
    vxx = band.apply_rows(img, kvxx)
    b1 = band.apply_cols(vg, khg)       # smooth
    b2 = band.apply_cols(vg, khx)       # d/dx
    b3 = band.apply_cols(vx, khg)       # d/dy
    b4 = band.apply_cols(vg, khxx)      # x²
    b5 = band.apply_cols(vxx, khg)      # y²
    b6 = band.apply_cols(vx, khx)       # xy
    bx = b2 * ig11
    by = b3 * ig11
    cxx = b1 * ig03 + b4 * ig33
    cyy = b1 * ig03 + b5 * ig33
    cxy = b6 * ig55
    # channels-FIRST [B, 5, H, W]: a 5-wide minor dim fights the TPU's
    # 128-lane tiling — every R[..., c] slice forced a relayout (profiled
    # round 2: the solver's per-iteration XLA glue cost ~12-18 ms at the
    # SMALL pyramid levels).  W-minor planes keep everything tile-aligned.
    return jnp.stack([bx, by, cxx, cyy, cxy], axis=1)


@functools.lru_cache(maxsize=1)
def _pallas_warp_enabled() -> bool:
    """Use the select-shift Pallas kernel on TPU (measured 5.7× faster than
    the XLA gather at [48,320,320,5]); XLA path elsewhere and via
    AVD_PALLAS_WARP=0."""
    import os
    mode = os.getenv("AVD_PALLAS_WARP", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _warp_poly(R1: jnp.ndarray, flow: jnp.ndarray):
    """Bilinear warp of [B,5,H,W] coefficients by [B,2,H,W] flow planes.

    Returns (warped [B,5,H,W], in_bounds [B,H,W]) with the OpenCV
    in-bounds rule 0 <= floor(coord) < size-1.
    """
    B, C, H, W = R1.shape
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    fx = xs + flow[:, 0]
    fy = ys + flow[:, 1]
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    inb = (x1 >= 0) & (x1 <= W - 2) & (y1 >= 0) & (y1 <= H - 2)
    # Pallas on every pyramid level: the XLA element gather is slow even
    # on the small levels (~9 ms at [48,80,80,5], ~5 ms at 40² — measured
    # round 2; the whole 80+40 levels cost more than the 160 one), so the
    # select-shift kernel pays for its one-time Mosaic compile everywhere.
    if _pallas_warp_enabled() and H % 40 == 0 and H >= 40:
        from avd_tpu.ops.pallas import warp as pallas_warp
        return pallas_warp.warp_bilinear(R1, flow), inb

    # XLA fallback (CPU tests/odd sizes): corner-block gather in HWC —
    # layout cost is irrelevant off-TPU, so reuse the channel-minor form.
    a = fx - x1
    b = fy - y1
    x1c = jnp.clip(x1.astype(jnp.int32), 0, W - 2)
    y1c = jnp.clip(y1.astype(jnp.int32), 0, H - 2)
    R1hwc = jnp.transpose(R1, (0, 2, 3, 1))
    # One lax.gather of [2, 2, C] corner blocks per pixel — measured ~2×
    # faster than four take_along_axis element gathers on TPU (the four
    # bilinear corners come back in a single sliced access).
    idx = jnp.stack([y1c, x1c], axis=-1).reshape(B, H * W, 2)
    corners = jax.vmap(lambda op, ix: jax.lax.gather(
        op, ix,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(2, 2, C), mode="clip"))(R1hwc, idx)
    corners = corners.reshape(B, H, W, 2, 2, C)
    wy = jnp.stack([1 - b, b], axis=-1)
    wx = jnp.stack([1 - a, a], axis=-1)
    warped = jnp.einsum("bhwyxc,bhwy,bhwx->bhwc", corners, wy, wx)
    return jnp.transpose(warped, (0, 3, 1, 2)), inb


@functools.lru_cache(maxsize=32)
def _border_taper(h: int, w: int) -> np.ndarray:
    """[H, W] multiplicative taper: border[d] within 5 px of each edge."""
    sx = np.ones(w, np.float32)
    sy = np.ones(h, np.float32)
    for i in range(min(_BORDER, w)):
        sx[i] *= _BORDER_SCALE[i]
        sx[w - 1 - i] *= _BORDER_SCALE[i]
    for i in range(min(_BORDER, h)):
        sy[i] *= _BORDER_SCALE[i]
        sy[h - 1 - i] *= _BORDER_SCALE[i]
    return sy[:, None] * sx[None, :]


def _update_matrices(R0: jnp.ndarray, R1: jnp.ndarray,
                     flow: jnp.ndarray) -> jnp.ndarray:
    """Pointwise normal-equation entries M=[B,5,H,W] (G11,G12,G22,h1,h2)
    from channels-first polynomial fields and flow planes."""
    H, W = R0.shape[2:4]
    R1w, inb = _warp_poly(R1, flow)
    # bf16 field storage (AVD_FLOW_BF16) upcasts here; the converts fuse
    # into the elementwise graph, so the stored array stays half-width
    R0 = R0.astype(jnp.float32)
    R1w = R1w.astype(jnp.float32)

    # averaged quadratic coefficients; cross term carries an extra 1/2
    # because the stored channel is the full cross coefficient.
    r4 = jnp.where(inb, (R0[:, 2] + R1w[:, 2]) * 0.5, R0[:, 2])
    r5 = jnp.where(inb, (R0[:, 3] + R1w[:, 3]) * 0.5, R0[:, 3])
    r6 = jnp.where(inb, (R0[:, 4] + R1w[:, 4]) * 0.25, R0[:, 4] * 0.5)

    b1w = jnp.where(inb, R1w[:, 0], 0.0)
    b2w = jnp.where(inb, R1w[:, 1], 0.0)
    dx = flow[:, 0]
    dy = flow[:, 1]
    r2 = (R0[:, 0] - b1w) * 0.5 + r4 * dx + r6 * dy
    r3 = (R0[:, 1] - b2w) * 0.5 + r6 * dx + r5 * dy

    taper = jnp.asarray(_border_taper(H, W))[None]
    r2 = r2 * taper
    r3 = r3 * taper
    r4 = r4 * taper
    r5 = r5 * taper
    r6 = r6 * taper

    g11 = r4 * r4 + r6 * r6
    g12 = (r4 + r5) * r6
    g22 = r5 * r5 + r6 * r6
    h1 = r4 * r2 + r6 * r3
    h2 = r6 * r2 + r5 * r3
    return jnp.stack([g11, g12, g22, h1, h2], axis=1)


def _box_blur_mean(m: jnp.ndarray, winsize: int) -> jnp.ndarray:
    """Separable box mean over [B,C,H,W] with replicate borders."""
    k = np.ones(winsize, np.float32)
    B, C, H, W = m.shape
    x = _sep_correlate(m.reshape(B * C, H, W), k, k, "edge")
    return x.reshape(B, C, H, W) * (1.0 / (winsize * winsize))


@functools.lru_cache(maxsize=1)
def _pallas_solve_enabled() -> bool:
    """Fuse box-blur+solve in one Pallas kernel on TPU (M read once from
    HBM instead of ~3 round trips); XLA path elsewhere and via
    AVD_PALLAS_SOLVE=0."""
    import os
    mode = os.getenv("AVD_PALLAS_SOLVE", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def _flow_bf16() -> bool:
    """Store the polynomial fields R0/R1 and the normal-equation field M
    in bfloat16 (AVD_FLOW_BF16=1, default off).  Halves the flow stage's
    dominant HBM traffic + VMEM input buffers; every accumulation stays
    f32 inside the kernels.  Numerics bounded by tools/bf16_study.py
    (≤0.026 worst-case |flow| stat delta, zero scene-change-bit flips —
    inside the 1e-3 post-aggregation ai_score budget)."""
    import os
    return os.getenv("AVD_FLOW_BF16", "0") == "1"


@functools.lru_cache(maxsize=1)
def _pallas_iter_enabled() -> bool:
    """Whole-iteration fusion (warp+update+blur+solve in ONE Pallas
    kernel, ops/pallas/flow_iter.py).  OFF by default: the fused kernel
    must recompute warp+update on an 8-row halo per block (the 15-tap
    vertical blur needs it), and the ~1.4× extra warp work outweighs the
    saved M round trip + glue in every measured regime (42.5 vs
    38.2 ms/48-pair run on panning frames, 178 vs 137 on noise —
    round-2 traces).  AVD_PALLAS_ITER=1 opts in."""
    import os
    return os.getenv("AVD_PALLAS_ITER", "0") == "1"


def _blur_solve(M: jnp.ndarray, winsize: int) -> jnp.ndarray:
    """flow = solve(box_blur(M)) on [B,5,H,W] — fused Pallas kernel on
    every pyramid level (the XLA conv blur carries heavy fixed costs at
    the small levels: 80+40 cost more than the 160 level, round-2
    profile)."""
    H, W = M.shape[2:4]
    if (_pallas_solve_enabled() and winsize % 2 == 1 and winsize <= 17
            and H >= 40 and H % 40 == 0 and W >= 40):
        from avd_tpu.ops.pallas import blur_solve
        return blur_solve.box_blur_solve(M, winsize)
    # XLA fallback blurs in f32 regardless of M's storage dtype
    return _solve_flow(_box_blur_mean(M.astype(jnp.float32), winsize))


def _solve_flow(mblur: jnp.ndarray) -> jnp.ndarray:
    """Regularized per-pixel 2×2 solve on [B,5,H,W] → [B,2,H,W] flow."""
    g11 = mblur[:, 0]
    g12 = mblur[:, 1]
    g22 = mblur[:, 2]
    h1 = mblur[:, 3]
    h2 = mblur[:, 4]
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    fx = (g22 * h1 - g12 * h2) * idet
    fy = (g11 * h2 - g12 * h1) * idet
    return jnp.stack([fx, fy], axis=1)


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------

def _level_plan(h: int, w: int, pyr_scale: float, levels: int):
    """Per-level (scale, sigma, ksize, height, width), coarsest first,
    mirroring OpenCV's level clamp and cvRound sizing."""
    # clamp level count so the smallest image stays >= 32 px (OpenCV
    # min_size in calcOpticalFlowFarneback)
    eff = 0
    scale = 1.0
    for k in range(levels):
        scale *= pyr_scale
        if min(h, w) * scale < 32.0:
            break
        eff = k + 1
    plan = []
    for k in range(eff, -1, -1):
        scale = pyr_scale ** k
        sigma = (1.0 / scale - 1.0) * 0.5
        ksize = max(_cv_round(sigma * 5) | 1, 3)
        plan.append((scale, sigma, ksize,
                     _cv_round(h * scale), _cv_round(w * scale)))
    return plan


def farneback_flow(prev: jnp.ndarray, cur: jnp.ndarray,
                   pyr_scale: float = 0.5, levels: int = 3,
                   winsize: int = 15, iterations: int = 3,
                   poly_n: int = 5, poly_sigma: float = 1.2) -> jnp.ndarray:
    """Batched Farnebäck flow: two [B, H, W] f32 stacks → [B, H, W, 2].

    Semantics match cv2.calcOpticalFlowFarneback with flags=0 (box-filter
    aggregation, no initial flow).
    """
    B, H, W = prev.shape
    plan = _level_plan(H, W, pyr_scale, levels)

    from avd_tpu.ops import band

    flow = None
    for li, (scale, sigma, ksize, lh, lw) in enumerate(plan):
        # per-level smooth + downscale collapse into ONE composed matrix
        # per axis (both are linear maps): 2 MXU matmuls per image instead
        # of two convs + two matmuls (band.py rationale)
        gk = tuple(float(x) for x in _gaussian_blur_kernel(ksize, sigma))
        rm = band.blur_resize_matrix(H, lh, gk)
        cm = band.blur_resize_matrix(W, lw, gk)
        i0 = band.apply_separable(prev, rm, cm)
        i1 = band.apply_separable(cur, rm, cm)
        R0 = poly_expansion(i0, poly_n, poly_sigma)
        R1 = poly_expansion(i1, poly_n, poly_sigma)

        if flow is None:
            flow = jnp.zeros((B, 2, lh, lw), jnp.float32)
        else:
            up = _resize_bilinear(
                flow.reshape(B * 2, *flow.shape[2:4]), lh, lw)
            flow = up.reshape(B, 2, lh, lw) * (1.0 / pyr_scale)

        # first solve from the incoming flow's matrices, then
        # (iterations-1) refinement rounds.  The refinement body is a
        # fori_loop so XLA compiles it once, not `iterations` times —
        # compile time of the full program drops several-fold.
        if (_pallas_iter_enabled() and winsize % 2 == 1 and winsize <= 17
                and lh >= 40 and lh % 40 == 0 and lw >= 40):
            from avd_tpu.ops.pallas import flow_iter
            # pads hoisted OUT of the refine fori_loop (loop-invariant,
            # but XLA won't hoist them from the while body itself)
            r0p, r1p = flow_iter.prepare_fields(R0, R1)

            def step(f):
                return flow_iter.solve_iteration_prepared(
                    r0p, r1p, f, width=lw, winsize=winsize)
        else:
            if _flow_bf16():
                # half-width storage of the dominant per-iteration HBM
                # traffic: R0/R1 reads (warp + update) and the M
                # write/read (update → blur_solve); all compute f32
                R0 = R0.astype(jnp.bfloat16)
                R1 = R1.astype(jnp.bfloat16)

            def step(f):
                M = _update_matrices(R0, R1, f)
                if _flow_bf16():
                    M = M.astype(jnp.bfloat16)
                return _blur_solve(M, winsize)

        flow = step(flow)
        if iterations > 1:
            flow = jax.lax.fori_loop(0, iterations - 1,
                                     lambda _, f: step(f), flow)
    # external contract stays [B, H, W, 2] (one transpose at the end)
    return jnp.transpose(flow, (0, 2, 3, 1))


def flow_magnitude_stats(flow: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pair mean and population variance of |flow| — the only flow
    quantities the reference consumes (video.py:45-48)."""
    mag = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    mean = jnp.mean(mag, axis=(-2, -1))
    var = jnp.mean((mag - mean[..., None, None]) ** 2, axis=(-2, -1))
    return mean, var
