"""Fused Farnebäck solver iteration — Pallas TPU kernel.

One iteration of the displacement update is

    M    = update_matrices(R0, warp(R1, flow), flow)   # pointwise + warp
    flow = solve(box_blur(M, 15))                      # 15×15 mean, 2×2

As three separate programs (select-shift warp kernel, XLA pointwise
update, fused blur+solve kernel) the [B, H, W, 5] M field and the warped
R1 each cross HBM once per iteration, and the pointwise glue runs as
separate XLA fusions.  This kernel computes the whole iteration per
(batch, row-block) grid step: warp + update are evaluated on the block
rows PLUS an 8-row halo (the 15-tap vertical blur needs ±7), the blur
and solve consume the halo'd M directly from VMEM, and only the
[B, 2, H, W] flow output is written.

Semantics (matching ops/flow.py stage-by-stage up to f32 accumulation
order):
* warp — select-shift over the in-bounds displacement bounding box
  (ops/pallas/warp.py contract: out-of-bounds pixels contribute 0 and
  are masked out by the in-bounds plane inside the update);
* update — OpenCV FarnebackUpdateMatrices averaging, border taper
  supplied as a pre-padded [H+16, W] plane;
* blur — replicate-edge 15×15 box mean: vertical replication comes from
  the caller pre-padding R0/flow/taper by 8 replicate rows (a duplicate
  input row reproduces the edge row's M exactly), horizontal replication
  via the coordinate masks of ops/pallas/blur_solve;
* solve — det + 1e-3 regularized 2×2.

Halo rows are recomputed by adjacent blocks (hb/bh redundancy, 56/40 at
the default block) — cheaper than a round trip of M through HBM plus a
separate kernel launch per stage.

Matches the iteration structure of cv2.calcOpticalFlowFarneback
(/root/reference/app/analyzers/video.py:43-49 runs it per frame pair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = 5      # polynomial coefficient channels
_PAD8 = 8   # halo rows on each side (≥ blur half-window 7, 8-aligned)


_BORDER_SCALE = (0.14, 0.14, 0.4472, 0.4472, 0.4472)


def _kernel(flowp_ref, r0p_ref, r1p_ref, out_ref,
            rows_ref, wacc_ref, m_ref, *, w_valid: int, h_valid: int,
            bh: int, winsize: int):
    """Grid (B, H // bh).

    flowp_ref: [1, 2, H + 16, Wp]  flow, 8 replicate rows top/bottom
    r0p_ref:   [1, C, H + 16, Wp]  R0, same padding
    r1p_ref:   [1, C, max(H, hb + 8), Wp]  R1, unpadded — the warp's
               row-window fetch is CLAMPED into range; a clamped-away or
               wrapped row can only reach zero-weight slots (any slot
               whose bilinear row is in-image gets it unclamped), so no
               guard rows are needed and VMEM stays inside the scoped
               limit at 320²
    out_ref:   [1, 2, bh, Wp]
    rows_ref:  VMEM scratch [C * (hb + 8), Wp]  warp row windows
    wacc_ref:  VMEM scratch [C, hb, Wp]         warp accumulator
    m_ref:     VMEM scratch [C, hb, Wp]         halo'd M field

    The 5-px border taper is rebuilt from iotas in-kernel (passing the
    plane doubled its VMEM footprint past the scoped limit at 320²).
    Taper at duplicated halo slots uses the CLAMPED row — the edge row's
    factor — which is exactly the replicate-pad semantics of the blur.
    """
    wp = flowp_ref.shape[3]
    hb = bh + 2 * _PAD8
    r = pl.program_id(1)
    y0 = r * bh            # first output row (unpadded coords)
    yh0 = y0 - _PAD8       # first halo slot's unpadded row (may be < 0)

    dxf = flowp_ref[0, 0, pl.ds(y0, hb), :]
    dyf = flowp_ref[0, 1, pl.ds(y0, hb), :]
    xsi = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 1)
    jsi = jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 0)
    ysrow = jsi + yh0                                   # slot position
    ysc = jnp.clip(ysrow, 0, h_valid - 1)               # true coordinate
    xs = xsi.astype(jnp.float32)

    fx = xs + dxf
    fy = ysc.astype(jnp.float32) + dyf
    x1f = jnp.floor(fx)
    y1f = jnp.floor(fy)
    a = fx - x1f
    b = fy - y1f
    inb = ((x1f >= 0) & (x1f <= w_valid - 2)
           & (y1f >= 0) & (y1f <= h_valid - 2)
           & (xsi < w_valid))
    x1 = jnp.clip(x1f, 0, w_valid - 2).astype(jnp.int32)
    y1 = jnp.clip(y1f, 0, h_valid - 2).astype(jnp.int32)

    # displacement box relative to SLOT positions (not clamped coords) so
    # mask and roll delivery stay aligned for the duplicated edge slots;
    # this widens edge blocks' boxes by ≤ 8 rows, interior blocks not at all
    big = jnp.int32(1 << 20)
    rel_y = y1 - ysrow
    rel_x = x1 - xsi
    dy_lo = jnp.min(jnp.where(inb, rel_y, big))
    ny = jnp.maximum(jnp.max(jnp.where(inb, rel_y, -big)) + 2 - dy_lo, 0)
    dx_lo = jnp.min(jnp.where(inb, rel_x, big))
    nx = jnp.maximum(jnp.max(jnp.where(inb, rel_x, -big)) + 2 - dx_lo, 0)

    # ---- warp: R1 sampled at (ysc + dyf, xs + dxf), 0 when not inb ----
    nbuf = hb + 8
    wacc_ref[...] = jnp.zeros_like(wacc_ref)

    hsrc = r1p_ref.shape[2]

    def body_dy(iy, _):
        dy = dy_lo + iy
        wy = (jnp.where(inb & (rel_y == dy), 1.0 - b, 0.0)
              + jnp.where(inb & (rel_y + 1 == dy), b, 0.0))
        # fetch window for source rows [yh0+dy, yh0+dy+hb), clamped into
        # the image: rows a clamp pushes out of the window (or that wrap
        # in the roll) can only land on zero-weight slots
        st = yh0 + dy
        # floor8 LAST so Mosaic can prove 8-alignment of the slice start
        # (hsrc and nbuf are both multiples of 8, so the clamp bound is
        # too and the floor8 commutes with the clip)
        st8 = (jnp.clip(st, 0, hsrc - nbuf) // 8) * 8
        vshift = (-(st - st8)) % nbuf
        for c in range(_C):
            rows_ref[pl.ds(c * nbuf, nbuf), :] = pltpu.roll(
                r1p_ref[0, c, pl.ds(st8, nbuf), :], vshift, 0)

        def body_dx(ix, _):
            dx = dx_lo + ix
            wx = (jnp.where(rel_x == dx, 1.0 - a, 0.0)
                  + jnp.where(rel_x + 1 == dx, a, 0.0))
            wgt = wy * wx
            hshift = (-dx) % wp
            for c in range(_C):
                wacc_ref[c] += wgt * pltpu.roll(
                    rows_ref[pl.ds(c * nbuf, hb), :], hshift, 1)
            return 0

        jax.lax.fori_loop(0, nx, body_dx, 0)
        return 0

    jax.lax.fori_loop(0, ny, body_dy, 0)
    r1w = [wacc_ref[c] for c in range(_C)]

    # ---- update_matrices (ops/flow.py:_update_matrices, CHW planes) ----
    R0 = [r0p_ref[0, c, pl.ds(y0, hb), :] for c in range(_C)]
    r4 = jnp.where(inb, (R0[2] + r1w[2]) * 0.5, R0[2])
    r5 = jnp.where(inb, (R0[3] + r1w[3]) * 0.5, R0[3])
    r6 = jnp.where(inb, (R0[4] + r1w[4]) * 0.25, R0[4] * 0.5)
    b1w = jnp.where(inb, r1w[0], 0.0)
    b2w = jnp.where(inb, r1w[1], 0.0)
    r2 = (R0[0] - b1w) * 0.5 + r4 * dxf + r6 * dyf
    r3 = (R0[1] - b2w) * 0.5 + r6 * dxf + r5 * dyf

    taper = jnp.ones((hb, wp), jnp.float32)
    for i, s in enumerate(_BORDER_SCALE):
        taper = jnp.where((ysc == i) | (ysc == h_valid - 1 - i),
                          taper * s, taper)
        taper = jnp.where((xsi == i) | (xsi == w_valid - 1 - i),
                          taper * s, taper)
    r2 = r2 * taper
    r3 = r3 * taper
    r4 = r4 * taper
    r5 = r5 * taper
    r6 = r6 * taper

    m_ref[0] = r4 * r4 + r6 * r6          # g11
    m_ref[1] = (r4 + r5) * r6             # g12
    m_ref[2] = r5 * r5 + r6 * r6          # g22
    m_ref[3] = r4 * r2 + r6 * r3          # h1
    m_ref[4] = r6 * r2 + r5 * r3          # h2

    # ---- 15×15 box mean (replicate edges) + 2×2 solve ----------------
    # shared body with ops/pallas/blur_solve.py (single source for the
    # edge-mask / halo-slice math)
    from avd_tpu.ops.pallas.blur_solve import blur_solve_rows
    planes = [m_ref[c] for c in range(_C)]
    u, v = blur_solve_rows(planes, bh, w_valid, winsize)
    out_ref[0, 0] = u
    out_ref[0, 1] = v


def prepare_fields(R0: jnp.ndarray, R1: jnp.ndarray,
                   block_rows: int = 40):
    """Pad the per-level constants ONCE: R0 gets 8 replicate rows
    top/bottom (the blur's vertical replicate semantics), R1 gets lane
    padding only.  Hoist this OUT of the refinement loop — rebuilding the
    pads inside a fori_loop body re-writes ~100 MB per iteration at
    [48, 320²] (XLA does not hoist loop-invariant pads out of while
    bodies; measured as the whole fusion win disappearing)."""
    B, C, H, W = R0.shape
    assert C == _C
    bh = min(block_rows, H)
    hb = bh + 2 * _PAD8
    wp = -(-W // 128) * 128
    if wp != W:
        R0 = jnp.pad(R0, ((0, 0), (0, 0), (0, 0), (0, wp - W)))
        R1 = jnp.pad(R1, ((0, 0), (0, 0), (0, 0), (0, wp - W)))
    r0p = jnp.concatenate(
        [jnp.broadcast_to(R0[:, :, :1], (B, _C, _PAD8, wp)), R0,
         jnp.broadcast_to(R0[:, :, -1:], (B, _C, _PAD8, wp))], axis=2)
    # R1 needs no guard rows (clamped fetch window, see kernel doc); only
    # tiny images pad up to one fetch window
    hsrc = max(H, hb + 8)
    r1p = (R1 if hsrc == H else
           jnp.pad(R1, ((0, 0), (0, 0), (0, hsrc - H), (0, 0))))
    return r0p, r1p


@functools.partial(jax.jit,
                   static_argnames=("width", "winsize", "block_rows",
                                    "interpret"))
def solve_iteration_prepared(r0p: jnp.ndarray, r1p: jnp.ndarray,
                             flow: jnp.ndarray, width: int,
                             winsize: int = 15, block_rows: int = 40,
                             interpret: bool = False) -> jnp.ndarray:
    """One fused update→blur→solve iteration on prepare_fields outputs.

    flow: [B, 2, H, W] (unpadded).  Returns the new [B, 2, H, W] flow.
    """
    B, _, H, W = flow.shape
    assert W == width and r0p.shape[2] == H + 2 * _PAD8
    bh = min(block_rows, H)
    assert H % bh == 0 and bh % 8 == 0, (H, bh)
    assert winsize % 2 == 1 and (winsize - 1) // 2 <= _PAD8
    assert H >= 16 and W >= 16  # taper edge bands must not overlap
    hb = bh + 2 * _PAD8

    wp = r0p.shape[3]
    if wp != W:
        flow = jnp.pad(flow, ((0, 0), (0, 0), (0, 0), (0, wp - W)),
                       mode="edge")
    flowp = jnp.concatenate(
        [jnp.broadcast_to(flow[:, :, :1], (B, 2, _PAD8, wp)), flow,
         jnp.broadcast_to(flow[:, :, -1:], (B, 2, _PAD8, wp))], axis=2)
    hsrc = r1p.shape[2]

    kernel = functools.partial(_kernel, w_valid=W, h_valid=H, bh=bh,
                               winsize=winsize)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // bh),
        in_specs=[
            pl.BlockSpec((1, 2, H + 2 * _PAD8, wp),
                         lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _C, H + 2 * _PAD8, wp),
                         lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _C, hsrc, wp),
                         lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, bh, wp), lambda bi, ri: (bi, 0, ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, H, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_C * (hb + 8), wp), jnp.float32),
            pltpu.VMEM((_C, hb, wp), jnp.float32),
            pltpu.VMEM((_C, hb, wp), jnp.float32),
        ],
        # the fused working set (double-buffered full-image R0/R1/flow +
        # halo scratches) tops the conservative 16 MB scoped-vmem default
        # at 320²; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(flowp, r0p, r1p)
    return out[:, :, :, :W]


def solve_iteration(R0: jnp.ndarray, R1: jnp.ndarray, flow: jnp.ndarray,
                    winsize: int = 15, block_rows: int = 40,
                    interpret: bool = False) -> jnp.ndarray:
    """Convenience single-shot form: prepare_fields + one iteration."""
    r0p, r1p = prepare_fields(R0, R1, block_rows)
    return solve_iteration_prepared(r0p, r1p, flow, width=flow.shape[3],
                                    winsize=winsize, block_rows=block_rows,
                                    interpret=interpret)
