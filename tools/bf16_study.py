"""Parity study: bf16 storage of the Farnebäck polynomial fields.

The remaining round-3 headroom item in docs/PERFORMANCE.md is casting the
poly-expansion fields R0/R1 (5 channels x 320^2 x B f32 — the dominant
HBM traffic of the flow stage) and/or the normal-equation matrices M to
bfloat16.  This tool measures, on CPU, what that storage precision does
to (a) the raw flow field, (b) the only quantities the product consumes
from it — |flow| mean/variance per pair (reference video.py:45-48) and
the scene-change threshold flow_var > 0.5 (video.py:62) — before anyone
touches the production kernels.

Method: monkeypatch ``flow.poly_expansion`` (and optionally
``flow._update_matrices``) with a bf16 round-trip on the output, run
``farneback_flow`` on panning-texture and uncorrelated-noise pairs, and
compare against the untouched f32 path.

Usage: python tools/bf16_study.py  (CPU; no TPU or Pallas compiles)
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np


def _pairs(kind: str, n: int = 4, h: int = 320, w: int = 320):
    rng = np.random.default_rng(0)
    if kind == "noise":
        a = rng.random((n, h, w), np.float32) * 255.0
        b = rng.random((n, h, w), np.float32) * 255.0
        return a, b
    base = rng.random((h + 16, w + 16), np.float32) * 255.0
    # smooth it a little so the pan is trackable texture, not speckle
    base = (base[:-1, :-1] + base[1:, :-1] + base[:-1, 1:] + base[1:, 1:]) / 4
    prev = np.stack([base[4:4 + h, 4:4 + w]] * n)
    cur = np.stack([base[4 + dy:4 + dy + h, 6:6 + w]
                    for dy in range(1, n + 1)]).astype(np.float32)
    return prev.astype(np.float32), cur


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from avd_tpu.ops import flow as flow_mod

    orig_poly = flow_mod.poly_expansion
    orig_update = flow_mod._update_matrices

    def poly_bf16(img, n, sigma):
        r = orig_poly(img, n, sigma)
        return r.astype(jnp.bfloat16).astype(jnp.float32)

    def update_bf16(R0, R1, f):
        m = orig_update(R0, R1, f)
        return m.astype(jnp.bfloat16).astype(jnp.float32)

    variants = {
        "fields_bf16": (poly_bf16, orig_update),
        "fields+M_bf16": (poly_bf16, update_bf16),
    }

    for kind in ("pan", "noise"):
        prev, cur = _pairs(kind)
        ref = np.asarray(flow_mod.farneback_flow(jnp.asarray(prev),
                                                 jnp.asarray(cur)))
        rmag = np.sqrt(ref[..., 0] ** 2 + ref[..., 1] ** 2)
        rmean = rmag.mean(axis=(1, 2))
        rvar = rmag.var(axis=(1, 2))
        print(f"[{kind}] f32 flow_mean={np.round(rmean, 4)} "
              f"flow_var={np.round(rvar, 4)}")
        for name, (p, u) in variants.items():
            flow_mod.poly_expansion = p
            flow_mod._update_matrices = u
            try:
                got = np.asarray(flow_mod.farneback_flow(jnp.asarray(prev),
                                                         jnp.asarray(cur)))
            finally:
                flow_mod.poly_expansion = orig_poly
                flow_mod._update_matrices = orig_update
            gmag = np.sqrt(got[..., 0] ** 2 + got[..., 1] ** 2)
            gmean = gmag.mean(axis=(1, 2))
            gvar = gmag.var(axis=(1, 2))
            dflow = np.abs(got - ref)
            # the product's scene-change bit: flow_var > 0.5 per pair
            bitflips = int(np.sum((rvar > 0.5) != (gvar > 0.5)))
            print(f"[{kind}] {name}: |dflow| max={dflow.max():.4f} "
                  f"mean={dflow.mean():.5f}; "
                  f"|d flow_mean| max={np.abs(gmean - rmean).max():.5f}; "
                  f"|d flow_var| max={np.abs(gvar - rvar).max():.5f}; "
                  f"scene-bit flips={bitflips}")


if __name__ == "__main__":
    main()
