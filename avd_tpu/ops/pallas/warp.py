"""Select-shift bilinear warp — Pallas TPU kernel.

Problem: Farnebäck's UpdateMatrices warps the 5-channel polynomial field by
the current flow with per-pixel bilinear sampling.  XLA lowers that to an
element gather: measured ~450 ms per [48, 320, 320, 5] warp on v5e —
~0.3 % of HBM bandwidth — and it runs 12 times per flow solve.

Insight: after the 15×15 box blur, the flow field is locally smooth, so
within a row block the set of *distinct integer displacements* is tiny.
The kernel therefore:

1. loads the whole 5-plane source image into VMEM (320²×5×f32 = 2 MB);
2. per row block, computes the block's integer displacement bounding box
   from the flow (scalar min/max reductions);
3. loops over just that (dy, dx) range with a dynamic-trip-count
   ``fori_loop``, accumulating ``weight(dy,dx) ⊙ shifted(source)`` where
   the weight folds both bilinear fractions and the coordinate-match
   masks — pure VPU work, no random access;
4. out-of-range wraparound reads are masked to zero by construction
   (a wrapped position can never satisfy its coordinate-match mask).

Worst case (spatially chaotic flow) degrades to range-area iterations but
stays correct; typical video is 2-4 iterations per block.  Semantics match
the XLA path bit-for-bit up to f32 accumulation order
(tests/test_pallas_warp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = 5  # polynomial coefficient channels


def _warp_kernel(flow_ref, src_ref, out_ref, rows_ref, acc_ref, *,
                 w_valid: int):
    """Grid: (B, H // BH).

    flow_ref: [1, 2, BH, W] block (dx plane, dy plane)
    src_ref:  [1, C, H, W]  full image for this batch element
    out_ref:  [1, C, BH, W]
    rows_ref: VMEM scratch [C, BH, W]  (row-rotated source window)
    acc_ref:  VMEM scratch [C, BH, W]

    Shifts use ``pltpu.roll`` (tpu.dynamic_rotate) — Mosaic supports
    dynamic rotate amounts, while dynamic ref slices must be tile-aligned.
    Wrapped-around values can never satisfy their coordinate-match mask, so
    rotation wraparound is harmless by construction.
    """
    h = src_ref.shape[2]
    w = src_ref.shape[3]
    bh = flow_ref.shape[2]
    r = pl.program_id(1)
    y0 = r * bh

    dxf = flow_ref[0, 0]
    dyf = flow_ref[0, 1]
    xsi = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
    ysi = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0) + y0
    xs = xsi.astype(jnp.float32)
    ys = ysi.astype(jnp.float32)

    fx = xs + dxf
    fy = ys + dyf
    x1f = jnp.floor(fx)
    y1f = jnp.floor(fy)
    a = fx - x1f
    b = fy - y1f
    x1 = jnp.clip(x1f, 0, w_valid - 2).astype(jnp.int32)
    y1 = jnp.clip(y1f, 0, h - 2).astype(jnp.int32)

    # integer displacement bounding box (relative to output coordinates),
    # restricted to the valid columns — the lane-padding columns carry
    # replicated flow whose clamped rel_x would otherwise widen the box
    rel_y = y1 - ysi
    rel_x = (x1 - xsi)[:, :w_valid]
    dy_lo = jnp.min(rel_y)
    ny = jnp.max(rel_y) + 1 - dy_lo + 1  # +1 row for the y1+1 corner
    dx_lo = jnp.min(rel_x)
    nx = jnp.max(rel_x) + 1 - dx_lo + 1

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body_dy(iy, _):
        dy = dy_lo + iy
        wy = (jnp.where(y1 - ysi == dy, 1.0 - b, 0.0)
              + jnp.where(y1 + 1 - ysi == dy, b, 0.0))
        # rotate rows so source row (y0+dy) lands on block row 0
        vshift = jnp.mod(-(y0 + dy), h)
        for c in range(_C):
            rot = pltpu.roll(src_ref[0, c], vshift, 0)
            rows_ref[c] = rot[0:bh]

        def body_dx(ix, _):
            dx = dx_lo + ix
            wx = (jnp.where(x1 - xsi == dx, 1.0 - a, 0.0)
                  + jnp.where(x1 + 1 - xsi == dx, a, 0.0))
            wgt = wy * wx
            hshift = jnp.mod(-dx, w)
            for c in range(_C):
                acc_ref[c] += wgt * pltpu.roll(rows_ref[c], hshift, 1)
            return 0

        jax.lax.fori_loop(0, nx, body_dx, 0)
        return 0

    jax.lax.fori_loop(0, ny, body_dy, 0)
    out_ref[0] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def warp_bilinear(src: jnp.ndarray, flow: jnp.ndarray,
                  block_rows: int = 40,
                  interpret: bool = False) -> jnp.ndarray:
    """Bilinear warp of [B, C=5, H, W] by [B, 2, H, W] flow (dx, dy planes).

    Samples src at (y + dy, x + dx) with floor coordinates clamped to
    [0, size-2] — identical semantics to the XLA gather path in
    avd_tpu.ops.flow._warp_poly.

    The width is padded to a lane multiple (128) internally because
    tpu.dynamic_rotate requires aligned shapes; wrapped/padded reads are
    nullified by the coordinate-match masks.
    """
    bsz, c, h, w = src.shape
    assert c == _C
    bh = min(block_rows, h)
    assert h % bh == 0, (h, bh)

    w_pad = -(-w // 128) * 128
    if w_pad != w:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, 0), (0, w_pad - w)))
        flow = jnp.pad(flow, ((0, 0), (0, 0), (0, 0), (0, w_pad - w)),
                       mode="edge")

    grid = (bsz, h // bh)
    kernel = functools.partial(_warp_kernel, w_valid=w)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, bh, w_pad), lambda bi, ri: (bi, 0, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _C, h, w_pad), lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _C, bh, w_pad),
                               lambda bi, ri: (bi, 0, ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, _C, h, w_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_C, bh, w_pad), jnp.float32),
            pltpu.VMEM((_C, bh, w_pad), jnp.float32),
        ],
        interpret=interpret,
    )(flow, src)
    return out[..., :w]
