"""bf16 flow-field storage (AVD_FLOW_BF16=1) parity on CPU.

Wires the tools/bf16_study.py result into the production path: R0/R1
and M are *stored* bfloat16 while every accumulation stays f32.  The
study bounded the worst-case |flow| stat deltas at ≤0.026 with zero
scene-change-bit flips — these tests assert the same bounds on the real
gated code path (XLA fallback kernels here; the Pallas bf16 variants
are covered in interpret mode below and on-device by the bench A/B).

Reference consumption contract: only |flow| mean/var per pair feed the
product (reference video.py:45-48), with the scene-change bit at
flow_var > 0.5 (video.py:62).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from avd_tpu.ops import flow as flow_ops


def _clear_gate():
    flow_ops._flow_bf16.cache_clear()


def _pairs(kind, n=3, h=160, w=160):
    rng = np.random.default_rng(7)
    if kind == "noise":
        return (rng.random((n, h, w), np.float32) * 255.0,
                rng.random((n, h, w), np.float32) * 255.0)
    base = rng.random((h + 16, w + 16), np.float32) * 255.0
    base = (base[:-1, :-1] + base[1:, :-1] + base[:-1, 1:]
            + base[1:, 1:]) / 4
    prev = np.stack([base[4:4 + h, 4:4 + w]] * n)
    cur = np.stack([base[4 + dy:4 + dy + h, 6:6 + w]
                    for dy in range(1, n + 1)]).astype(np.float32)
    return prev.astype(np.float32), cur


@pytest.mark.parametrize("kind", ["pan", "noise"])
def test_bf16_storage_parity(monkeypatch, kind):
    prev, cur = _pairs(kind)
    ref = np.asarray(flow_ops.farneback_flow(jnp.asarray(prev),
                                             jnp.asarray(cur)))
    monkeypatch.setenv("AVD_FLOW_BF16", "1")
    _clear_gate()
    try:
        assert flow_ops._flow_bf16()
        got = np.asarray(flow_ops.farneback_flow(jnp.asarray(prev),
                                                 jnp.asarray(cur)))
    finally:
        monkeypatch.delenv("AVD_FLOW_BF16")
        _clear_gate()

    rmag = np.sqrt(ref[..., 0] ** 2 + ref[..., 1] ** 2)
    gmag = np.sqrt(got[..., 0] ** 2 + got[..., 1] ** 2)
    rmean, rvar = rmag.mean(axis=(1, 2)), rmag.var(axis=(1, 2))
    gmean, gvar = gmag.mean(axis=(1, 2)), gmag.var(axis=(1, 2))
    # the study's worst-case bound, with slack for the different pair set
    assert np.abs(gmean - rmean).max() < 0.05
    assert np.abs(gvar - rvar).max() < 0.08
    # the product's scene-change bit must not flip
    np.testing.assert_array_equal(rvar > 0.5, gvar > 0.5)


def test_warp_kernel_bf16_interpret():
    """Pallas warp accepts bf16 src; matches the f32 kernel within bf16
    rounding of the source field (in-bounds pixels)."""
    from avd_tpu.ops.pallas import warp as pwarp

    rng = np.random.default_rng(3)
    src = rng.random((2, 5, 80, 80)).astype(np.float32)
    flow = (rng.random((2, 2, 80, 80)).astype(np.float32) - 0.5) * 6.0
    f32 = np.asarray(pwarp.warp_bilinear(jnp.asarray(src),
                                         jnp.asarray(flow),
                                         interpret=True))
    bf = np.asarray(pwarp.warp_bilinear(
        jnp.asarray(src).astype(jnp.bfloat16), jnp.asarray(flow),
        interpret=True))
    assert bf.dtype == np.float32
    np.testing.assert_allclose(bf, f32, atol=8e-3, rtol=8e-3)


def test_blur_solve_kernel_bf16_interpret():
    from avd_tpu.ops.pallas import blur_solve

    rng = np.random.default_rng(4)
    # well-conditioned M: diagonally dominant G, moderate h
    g11 = rng.random((2, 80, 80)).astype(np.float32) + 1.0
    g22 = rng.random((2, 80, 80)).astype(np.float32) + 1.0
    g12 = (rng.random((2, 80, 80)).astype(np.float32) - 0.5) * 0.2
    h1 = (rng.random((2, 80, 80)).astype(np.float32) - 0.5) * 2.0
    h2 = (rng.random((2, 80, 80)).astype(np.float32) - 0.5) * 2.0
    M = np.stack([g11, g12, g22, h1, h2], axis=1)
    f32 = np.asarray(blur_solve.box_blur_solve(jnp.asarray(M),
                                               interpret=True))
    bf = np.asarray(blur_solve.box_blur_solve(
        jnp.asarray(M).astype(jnp.bfloat16), interpret=True))
    assert bf.dtype == np.float32
    np.testing.assert_allclose(bf, f32, atol=2e-2, rtol=2e-2)
