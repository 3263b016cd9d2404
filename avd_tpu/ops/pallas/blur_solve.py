"""Fused 15×15 box-blur + 2×2 solve — Pallas TPU kernel.

Farnebäck's flow update (ops/flow.py) ends every iteration with

    flow = _solve_flow(_box_blur_mean(M, winsize))

which XLA executes as two separable box-filter convs plus a pointwise
solve: the [B, H, W, 5] normal-equation field M makes three full HBM
round trips per iteration (~6 array passes at [48, 320, 320, 5] ≈
590 MB).  This kernel keeps a row block of M resident in VMEM and does
the horizontal blur (15 lane-rotations with replicate-edge masking), the
vertical blur (15 sublane-shifted adds over an 8-row halo), and the
regularized solve in one pass — M is read once, only the [B, 2, H, W]
flow is written.

Replicate ("edge") padding semantics match ops/flow._box_blur_mean:
vertically via 8 pre-padded replicate rows (so every dynamic VMEM slice
stays 8-row aligned; the blur needs ±7), horizontally via coordinate
masks that substitute the first/last valid column for out-of-range taps
(the lane padding to 128 multiples can never leak in: a tap outside
[0, W) is replaced by construction).

Matches the reference flow aggregation cv2.calcOpticalFlowFarneback
flags=0 (box filter), /root/reference/app/analyzers/video.py:43-49.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = 5      # M channels: g11, g12, g22, h1, h2
_PAD8 = 8   # vertical replicate pre-pad (≥ half window, 8-row aligned)


def blur_solve_rows(planes, bh: int, w_valid: int, winsize: int):
    """Shared kernel body: 15×15 replicate-edge box mean over five
    [bh + 2·_PAD8, Wp] row buffers (the M channels, vertical halo
    included) + the regularized 2×2 solve → (u, v) planes of shape
    [bh, Wp].  Used by this kernel and by the fused per-iteration kernel
    (ops/pallas/flow_iter.py) so the edge-mask/slice math lives once."""
    half = (winsize - 1) // 2
    rows, wp = planes[0].shape
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
    inv_area = 1.0 / float(winsize * winsize)

    blurred = []
    for v in planes:
        left = v[:, 0:1]
        right = v[:, w_valid - 1:w_valid]
        hacc = v
        for s in range(-half, half + 1):
            if s == 0:
                continue
            sh = pltpu.roll(v, (-s) % wp, 1)  # out[x] = v[x + s] (wrapped)
            src = col + s
            sh = jnp.where(src < 0, left,
                           jnp.where(src > w_valid - 1, right, sh))
            hacc = hacc + sh
        # vertical: out row r (block-relative) sums buf rows
        # (_PAD8 + r - half) .. (_PAD8 + r + half) = (1 + r) .. (15 + r)
        vacc = hacc[_PAD8 - half:_PAD8 - half + bh]
        for j in range(1, winsize):
            vacc = vacc + hacc[_PAD8 - half + j:_PAD8 - half + j + bh]
        blurred.append(vacc * inv_area)

    g11, g12, g22, h1, h2 = blurred
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    return ((g22 * h1 - g12 * h2) * idet,
            (g11 * h2 - g12 * h1) * idet)


def _kernel(mpad_ref, out_ref, *, bh: int, w_valid: int, winsize: int):
    """Grid (B, H // bh).

    mpad_ref: [1, C, H + 16, Wp] — one batch element's padded M
    out_ref:  [1, 2, bh, Wp]
    """
    i = pl.program_id(1)
    r0 = i * bh  # buf rows [r0, r0 + bh + 2*_PAD8); 8-aligned by bh % 8 == 0
    rows = bh + 2 * _PAD8
    # bf16 M storage (AVD_FLOW_BF16) halves the HBM read + VMEM input
    # buffer; the blur/solve always accumulates in f32.
    planes = [mpad_ref[0, c, pl.ds(r0, rows), :].astype(jnp.float32)
              for c in range(_C)]
    u, v = blur_solve_rows(planes, bh, w_valid, winsize)
    out_ref[0, 0] = u
    out_ref[0, 1] = v


@functools.partial(jax.jit,
                   static_argnames=("winsize", "block_rows", "interpret"))
def box_blur_solve(M: jnp.ndarray, winsize: int = 15,
                   block_rows: int = 40,
                   interpret: bool = False) -> jnp.ndarray:
    """[B, 5, H, W] M field (channels-first) → [B, 2, H, W] flow planes.

    Semantically identical (up to f32 accumulation order) to
    ``_solve_flow(_box_blur_mean(M, winsize))`` in ops/flow.py.
    """
    B, C, H, W = M.shape
    assert C == _C
    bh = min(block_rows, H)
    assert H % bh == 0 and bh % 8 == 0, (H, bh)
    assert winsize % 2 == 1 and (winsize - 1) // 2 <= _PAD8

    top = jnp.broadcast_to(M[:, :, :1], (B, _C, _PAD8, W))
    bot = jnp.broadcast_to(M[:, :, -1:], (B, _C, _PAD8, W))
    Mp = jnp.concatenate([top, M, bot], axis=2)
    Wp = -(-W // 128) * 128
    if Wp != W:
        Mp = jnp.concatenate(
            [Mp, jnp.zeros((B, _C, H + 2 * _PAD8, Wp - W), Mp.dtype)],
            axis=3)

    kernel = functools.partial(_kernel, bh=bh, w_valid=W, winsize=winsize)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // bh),
        in_specs=[pl.BlockSpec((1, _C, H + 2 * _PAD8, Wp),
                               lambda bi, ri: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, bh, Wp), lambda bi, ri: (bi, 0, ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, H, Wp), jnp.float32),
        interpret=interpret,
    )(Mp)
    return out[:, :, :, :W]
