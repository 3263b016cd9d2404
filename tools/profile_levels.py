"""Pyramid-level and iteration marginal costs of the full Farnebäck
program on the real chip (each jitted variant amortizes ONE tunnel RTT,
so differences between variants are pure device compute).

Usage: python tools/profile_levels.py [pairs]
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
    from avd_tpu.utils import jaxtools
    jaxtools.setup()

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (b + 1, 320, 320)).astype(np.float32)
    prev = jnp.asarray(base[:-1])
    cur = jnp.asarray(base[1:])
    print(f"device: {jax.devices()[0].platform}  pairs={b}  320x320")

    # levels sweep (levels=N means N+1 images in the OpenCV convention
    # used here: plan includes level 0)
    prev_t = None
    for lv in (0, 1, 2, 3):
        fn = jax.jit(functools.partial(flow.farneback_flow, levels=lv))
        t = timeit(fn, prev, cur)
        marg = "" if prev_t is None else f"  (marginal {t - prev_t:+7.1f})"
        print(f"levels={lv}: {t:7.1f} ms{marg}", flush=True)
        prev_t = t

    # iterations sweep at the full pyramid
    prev_t = None
    for it in (1, 2, 3):
        fn = jax.jit(functools.partial(flow.farneback_flow, iterations=it))
        t = timeit(fn, prev, cur)
        marg = "" if prev_t is None else f"  (marginal {t - prev_t:+7.1f})"
        print(f"iters={it}:  {t:7.1f} ms{marg}", flush=True)
        prev_t = t


if __name__ == "__main__":
    main()
