"""Device-stage profiler: wall time of each Farnebäck sub-stage on the
real chip with resident inputs, so kernel work targets the true hot spot.

Usage: python tools/profile_flow.py [pairs]

Axon notes (CLAUDE.md): block_until_ready doesn't block through the
tunnel — completion is forced by fetching a scalar; inputs are put once
and reused so H2D never pollutes the timings.
"""

import os
import sys
import time

import numpy as np

# repo root importable when run as a script; do NOT use PYTHONPATH for
# this — an inherited PYTHONPATH breaks the axon plugin's registration
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(label, fn, *args, reps=3):
    import jax.numpy as jnp
    out = fn(*args)  # compile
    leaves = out if isinstance(out, tuple) else (out,)
    float(np.asarray(jnp.sum(leaves[0])))
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        out = fn(*args)
        leaves = out if isinstance(out, tuple) else (out,)
        float(np.asarray(jnp.sum(leaves[0])))
        best = min(best, time.perf_counter() - t)
    print(f"{label:34s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from avd_tpu.ops import flow
    from avd_tpu.utils import jaxtools
    jaxtools.setup()

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    h = w = 320
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (b + 1, h, w)).astype(np.float32)
    prev = jnp.asarray(base[:-1])
    cur = jnp.asarray(base[1:])
    print(f"device: {jax.devices()[0].platform}  pairs={b}  {h}x{w}")

    # full pipeline
    full = jax.jit(flow.farneback_flow)
    t_full = timeit("farneback_flow (full)", full, prev, cur)

    # stage pieces at the top pyramid level
    pe = jax.jit(functools.partial(flow.poly_expansion, n=5, sigma=1.2))
    timeit("poly_expansion 320 (x2/level)", pe, prev)

    R0 = pe(prev)
    R1 = pe(cur)
    f0 = jnp.zeros((b, 2, h, w), jnp.float32)

    upd = jax.jit(flow._update_matrices)
    t_upd = timeit("update_matrices (warp incl.)", upd, R0, R1, f0)

    warp = jax.jit(lambda R, f: flow._warp_poly(R, f)[0])
    t_warp = timeit("  warp alone", warp, R1, f0)

    M = upd(R0, R1, f0)
    blur = jax.jit(functools.partial(flow._box_blur_mean, winsize=15))
    t_blur = timeit("box_blur_mean 15x15", blur, M)

    Mb = blur(M)
    solve = jax.jit(flow._solve_flow)
    t_solve = timeit("solve_flow", solve, Mb)

    bs = jax.jit(lambda m: flow._solve_flow(flow._box_blur_mean(m, 15)))
    timeit("blur+solve (XLA fused)", bs, M)

    gb = jax.jit(functools.partial(flow._gaussian_blur, ksize=11,
                                   sigma=1.5))
    timeit("gaussian_blur k11 (pyramid)", gb, prev)

    rs = jax.jit(functools.partial(flow._resize_bilinear, dst_h=160,
                                   dst_w=160))
    timeit("resize 320->160", rs, prev)

    per_iter = t_upd + t_blur + t_solve
    print(f"\nper-320-iteration (upd+blur+solve): {per_iter * 1e3:.2f} ms"
          f"  x3 iters = {3 * per_iter * 1e3:.2f} ms")
    print(f"full pipeline: {t_full * 1e3:.2f} ms "
          f"({t_full * 1e3 / b:.3f} ms/frame)")


if __name__ == "__main__":
    main()
