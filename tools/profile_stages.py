"""Per-stage × per-pyramid-level device timings with resident inputs,
Pallas vs XLA variants where both exist.  Each timing amortizes one
tunnel RTT (~29 ms) — subtract the printed RTT estimate (solve_flow on
a tiny array) to compare real compute.

Usage: python tools/profile_stages.py [pairs]
"""

import functools
import os
import sys
import time

import numpy as np

# repo root importable when run as a script (PYTHONPATH breaks axon)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3):
    import jax.numpy as jnp
    out = fn(*args)
    float(np.asarray(jnp.sum(out)))
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        best = min(best, time.perf_counter() - t)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from avd_tpu.ops import flow
    from avd_tpu.ops.pallas import blur_solve as pbs
    from avd_tpu.ops.pallas import warp as pwarp
    from avd_tpu.utils import jaxtools
    jaxtools.setup()

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].platform}  pairs={b}")

    tiny = jnp.asarray(rng.normal(size=(1, 5, 8, 128)).astype(np.float32))
    rtt = timeit(jax.jit(flow._solve_flow), tiny)
    print(f"RTT floor (tiny solve): {rtt:6.1f} ms\n")
    print(f"{'stage':26s}" + "".join(f"{h:>9d}" for h in (320, 160, 80, 40)))

    rows = {}
    for h in (320, 160, 80, 40):
        img = jnp.asarray(
            rng.integers(0, 256, (b, h, h)).astype(np.float32))
        pe = jax.jit(functools.partial(flow.poly_expansion,
                                       n=5, sigma=1.2))
        rows.setdefault("poly_expansion", []).append(timeit(pe, img))

        R = pe(img)
        f0 = jnp.asarray(
            (rng.random((b, 2, h, h)) - 0.5).astype(np.float32))
        # warp: XLA gather vs Pallas select-shift
        os.environ["AVD_PALLAS_WARP"] = "0"
        flow._pallas_warp_enabled.cache_clear()
        wx = jax.jit(lambda R, f: flow._warp_poly(R, f)[0])
        rows.setdefault("warp XLA", []).append(timeit(wx, R, f0))
        os.environ["AVD_PALLAS_WARP"] = "1"
        flow._pallas_warp_enabled.cache_clear()
        wp = jax.jit(lambda R, f: pwarp.warp_bilinear(R, f))
        rows.setdefault("warp Pallas", []).append(timeit(wp, R, f0))
        os.environ.pop("AVD_PALLAS_WARP", None)
        flow._pallas_warp_enabled.cache_clear()

        upd = jax.jit(flow._update_matrices)
        rows.setdefault("update (incl warp)", []).append(
            timeit(upd, R, R, f0))

        M = upd(R, R, f0)
        bx = jax.jit(lambda m: flow._solve_flow(flow._box_blur_mean(m, 15)))
        rows.setdefault("blur+solve XLA", []).append(timeit(bx, M))
        bp = jax.jit(lambda m: pbs.box_blur_solve(m, 15))
        rows.setdefault("blur+solve Pallas", []).append(timeit(bp, M))

        gb = jax.jit(functools.partial(flow._gaussian_blur,
                                       ksize=17, sigma=3.5))
        rows.setdefault("gauss k17 @320 (per-lvl)", []).append(
            timeit(gb, jnp.asarray(
                rng.integers(0, 256, (b, 320, 320)).astype(np.float32)))
            if h == 320 else float("nan"))

    for name, vals in rows.items():
        print(f"{name:26s}" + "".join(
            f"{v:9.1f}" for v in vals))


if __name__ == "__main__":
    main()
