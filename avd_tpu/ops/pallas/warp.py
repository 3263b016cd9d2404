"""Select-shift bilinear warp — Pallas TPU kernel.

Problem: Farnebäck's UpdateMatrices warps the 5-channel polynomial field by
the current flow with per-pixel bilinear sampling.  XLA lowers that to an
element gather: measured ~450 ms per [48, 320, 320, 5] warp on v5e —
~0.3 % of HBM bandwidth — and it runs 12 times per flow solve.

Insight: after the 15×15 box blur, the flow field is locally smooth, so
within a row block the set of *distinct integer displacements* is tiny.
The kernel therefore:

1. loads the 5-plane source image (pre-padded by a block of finite rows
   top/bottom) into VMEM;
2. per row block, computes the block's integer displacement bounding box
   from the flow — over IN-BOUNDS pixels only.  Out-of-bounds pixels'
   clamped coordinates would otherwise widen the box to the full clamp
   tail (e.g. a uniform +61 px pan makes edge blocks scan 60+ columns);
   their warped values are discarded by the caller anyway
   (ops/flow._update_matrices masks on the separately-computed in-bounds
   plane), so this kernel writes 0 there and keeps the box tight;
3. loops over just that (dy, dx) range with a dynamic-trip-count
   ``fori_loop``, accumulating ``weight(dy,dx) ⊙ shifted(source)`` where
   the weight folds the bilinear fractions, the coordinate-match masks,
   and the in-bounds mask — pure VPU work, no random access.  Row
   fetches are an 8-aligned dynamic slice of bh+8 rows plus a sublane
   roll of the small buffer (round 3; previously each dy rotated the
   whole image: ~6.7× more row traffic);
4. if a block has no in-bounds pixel, both trip counts are 0 and the
   block outputs zeros.

Worst case (spatially chaotic flow) degrades to range-area iterations but
stays correct.  Semantics match the XLA path bit-for-bit up to f32
accumulation order ON IN-BOUNDS PIXELS (tests/test_pallas_warp.py);
out-of-bounds pixels are 0 by contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = 5  # polynomial coefficient channels


def _warp_kernel(flow_ref, src_ref, out_ref, rows_ref, acc_ref, *,
                 w_valid: int, h_valid: int, bh: int):
    """Grid: (B, H // BH).

    flow_ref: [1, 2, BH, W] block (dx plane, dy plane)
    src_ref:  [1, C, BH + H + BH + 8, W] — source pre-padded with BH
              finite rows top and BH+8 bottom (never consumed: weights
              are zero there; padding only keeps slices in range)
    out_ref:  [1, C, BH, W]
    rows_ref: VMEM scratch [C·(BH+8), W] — per-channel aligned row
              windows, residue-rolled at write time (a single stacked
              big-tile roll was measured slightly SLOWER: roll element
              volume, not op count, is the limit).
    acc_ref:  VMEM scratch [C, BH, W]
    """
    wp = src_ref.shape[3]
    r = pl.program_id(1)
    y0 = r * bh

    dxf = flow_ref[0, 0]
    dyf = flow_ref[0, 1]
    xsi = jax.lax.broadcasted_iota(jnp.int32, (bh, wp), 1)
    ysi = jax.lax.broadcasted_iota(jnp.int32, (bh, wp), 0) + y0
    xs = xsi.astype(jnp.float32)
    ys = ysi.astype(jnp.float32)

    fx = xs + dxf
    fy = ys + dyf
    x1f = jnp.floor(fx)
    y1f = jnp.floor(fy)
    a = fx - x1f
    b = fy - y1f
    # OpenCV in-bounds rule (0 <= floor < size-1); the caller discards
    # warped values outside it, so the displacement box ignores them.
    inb = ((x1f >= 0) & (x1f <= w_valid - 2)
           & (y1f >= 0) & (y1f <= h_valid - 2)
           & (xsi < w_valid))
    x1 = jnp.clip(x1f, 0, w_valid - 2).astype(jnp.int32)
    y1 = jnp.clip(y1f, 0, h_valid - 2).astype(jnp.int32)

    big = jnp.int32(1 << 20)
    rel_y = y1 - ysi
    rel_x = x1 - xsi
    dy_lo = jnp.min(jnp.where(inb, rel_y, big))
    dy_hi = jnp.max(jnp.where(inb, rel_y, -big))
    dx_lo = jnp.min(jnp.where(inb, rel_x, big))
    dx_hi = jnp.max(jnp.where(inb, rel_x, -big))
    ny = jnp.maximum(dy_hi + 2 - dy_lo, 0)  # +1 row for the y1+1 corner
    nx = jnp.maximum(dx_hi + 2 - dx_lo, 0)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    nbuf = bh + 8

    def body_dy(iy, _):
        dy = dy_lo + iy
        wy = (jnp.where(inb & (rel_y == dy), 1.0 - b, 0.0)
              + jnp.where(inb & (rel_y + 1 == dy), b, 0.0))
        # source rows [y0+dy, y0+dy+bh) in padded coords start at st;
        # fetch the surrounding 8-aligned windows (one per channel, into
        # the stacked scratch), then roll the <8 residue away in ONE op —
        # the residue can't cross a channel segment (nbuf = bh + 8)
        st = y0 + dy + bh  # + top pad
        st8 = (st // 8) * 8
        vshift = (-(st - st8)) % nbuf
        for c in range(_C):
            # upcast BEFORE the rotate: Mosaic's tpu.dynamic_rotate is
            # unimplemented for 16-bit data ("Rotate with non-32-bit
            # data", measured on the real chip — interpret mode can't
            # catch it).  The HBM block read of src_ref stays bf16
            # under AVD_FLOW_BF16 (the bandwidth win); only the VMEM
            # row window widens.
            rows_ref[pl.ds(c * nbuf, nbuf), :] = pltpu.roll(
                src_ref[0, c, pl.ds(st8, nbuf), :].astype(jnp.float32),
                vshift, 0)

        def body_dx(ix, _):
            dx = dx_lo + ix
            wx = (jnp.where(rel_x == dx, 1.0 - a, 0.0)
                  + jnp.where(rel_x + 1 == dx, a, 0.0))
            wgt = wy * wx
            hshift = (-dx) % wp
            for c in range(_C):
                acc_ref[c] += wgt * pltpu.roll(
                    rows_ref[pl.ds(c * nbuf, bh), :], hshift, 1)
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

    Samples src at (y + dy, x + dx) like the XLA gather path in
    avd_tpu.ops.flow._warp_poly, EXCEPT that pixels failing the OpenCV
    in-bounds rule (0 <= floor(coord) < size-1) return 0 — callers mask
    them via the in-bounds plane, and excluding them keeps each block's
    displacement box tight (docstring pt. 2).

    The width is padded to a lane multiple (128) internally because
    tpu.dynamic_rotate requires aligned shapes; wrapped/padded reads are
    nullified by the coordinate-match masks.
    """
    bsz, c, h, w = src.shape
    assert c == _C
    bh = min(block_rows, h)
    assert h % bh == 0 and bh % 8 == 0, (h, bh)

    w_pad = -(-w // 128) * 128
    if w_pad != w:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, 0), (0, w_pad - w)))
        flow = jnp.pad(flow, ((0, 0), (0, 0), (0, 0), (0, w_pad - w)),
                       mode="edge")
    # finite top/bottom row padding so every 8-aligned row window of the
    # dy scan stays in range (values under zero weight, never consumed)
    src = jnp.pad(src, ((0, 0), (0, 0), (bh, bh + 8), (0, 0)))

    grid = (bsz, h // bh)
    kernel = functools.partial(_warp_kernel, w_valid=w, h_valid=h, bh=bh)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, bh, w_pad), lambda bi, ri: (bi, 0, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _C, h + 2 * bh + 8, w_pad),
                         lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _C, bh, w_pad),
                               lambda bi, ri: (bi, 0, ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, _C, h, w_pad), jnp.float32),
        scratch_shapes=[
            # row windows widen to f32 at the copy-in (Mosaic's rotate
            # can't run on 16-bit data); the bf16 win under
            # AVD_FLOW_BF16 is the halved src_ref HBM read, not VMEM
            pltpu.VMEM((_C * (bh + 8), w_pad), jnp.float32),
            pltpu.VMEM((_C, bh, w_pad), jnp.float32),
        ],
        interpret=interpret,
    )(flow, src)
    return out[..., :w]
