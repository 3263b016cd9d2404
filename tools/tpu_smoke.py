#!/usr/bin/env python
"""Real-chip smoke for the opt-in Pallas paths (ADVICE r4 #5).

Interpret-mode parity tests cannot catch Mosaic LOWERING gaps — that
exact class hid warp.py's 'Rotate with non-32-bit data' failure until
round 4 ran the kernel on hardware.  This tool executes every opt-in
Pallas configuration on the REAL TPU and asserts parity against the
default path, so a flag flip to default-on always has a hardware run
behind it:

  1. fused Pallas attention (ops/pallas/attention.py) at the flagship
     serving shape vs the XLA einsum pair;
  2. bf16 flow-field storage (AVD_FLOW_BF16=1: warp.py + blur_solve.py
     bf16 HBM reads) vs the f32 default through compute_features.

Run: python tools/tpu_smoke.py   (~2 min warm-cache; first execution
per process pays the remote program load — minutes when cold).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def smoke_fused_attention() -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from avd_tpu.models import detector

    cfg = detector.make_config("full")
    fused = dataclasses.replace(cfg, fused_attn=True)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    # batch 64 = the measured serving batch (bench_detector.py) — its
    # Mosaic kernel shape is already in the persistent cache
    x = jnp.asarray(np.random.default_rng(0).random(
        (64, cfg.image_size, cfg.image_size, 3), np.float32))
    ref = np.asarray(jax.jit(
        lambda p, v: detector.forward(p, v, cfg))(params, x))
    got = np.asarray(jax.jit(
        lambda p, v: detector.forward(p, v, fused))(params, x))
    delta = float(np.abs(ref - got).max())
    assert delta < 2e-2, f"fused attention diverges on hardware: {delta}"
    print(f"fused attention: REAL-CHIP PARITY OK (max |Δlogit| {delta:.2e} "
          f"at the bf16 budget)")


_CHILD = """
import sys
sys.path.insert(0, {root!r})
import numpy as np
from avd_tpu.ops import video_features as vf
rng = np.random.default_rng(0)
base = rng.integers(0, 256, (200, 320, 3), dtype=np.int16).astype(np.uint8)
frames = np.stack([np.roll(base, 3 * i, axis=1)[:160, :256]
                   for i in range(49)])
out = vf.compute_features(frames)
np.savez(sys.argv[1],
         flow_means=np.asarray(out["flow_means"], np.float64),
         flow_vars=np.asarray(out["flow_vars"], np.float64),
         timeline_ai=np.asarray(out["timeline_ai"], np.float64))
"""


def smoke_bf16_flow() -> None:
    """Each flag value runs in its OWN subprocess: the jit program
    caches key on shapes only, so an in-process env flip would silently
    reuse the f32 programs and compare nothing."""
    import subprocess
    import tempfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = {}
    for flag in ("0", "1"):
        path = os.path.join(tempfile.gettempdir(),
                            f"avd_smoke_bf16_{flag}.npz")
        env = dict(os.environ, AVD_FLOW_BF16=flag)
        # 1800 s is provably below the bf16 pyramid's COLD Mosaic
        # compile cost (a round-5 run timed out at 30 min mid-compile);
        # warm-cache runs finish in ~2 min either way
        subprocess.run([sys.executable, "-c", _CHILD.format(root=root),
                        path], env=env, check=True, timeout=5400)
        outs[flag] = dict(np.load(path))
    deltas = {k: float(np.max(np.abs(outs["0"][k] - outs["1"][k])))
              for k in ("flow_means", "flow_vars", "timeline_ai")}
    assert deltas["timeline_ai"] < 0.05, deltas
    assert deltas["flow_means"] < 0.1, deltas
    print(f"bf16 flow fields: REAL-CHIP PARITY OK ({deltas})")


def main() -> int:
    import jax
    print(f"devices: {jax.devices()}")
    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — this smoke only means something "
              "on real hardware (Mosaic lowering)")
    smoke_fused_attention()
    smoke_bf16_flow()
    print("tpu_smoke: ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
