"""Host-prep profiler: per-frame cost of the fused native sweep and its
parts at 1080p vs 4K, to locate what scales worse than pixel count.

Usage: python tools/profile_prep4k.py [n_frames]
"""

import os
import sys
import time

import numpy as np

# repo root importable when run as a script (PYTHONPATH breaks axon)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avd_tpu import native


def timeit(label, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t)
    return best


def run(h, w, n):
    rng = np.random.default_rng(0)
    bgr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    gray = native.bgr_to_gray(bgr)

    t_full = timeit("prep320_bgr", lambda: native.prep320_bgr(bgr))
    t_gray = timeit("bgr_to_gray", lambda: native.bgr_to_gray(bgr))
    t_prep_g = timeit("prep320(gray)", lambda: native.prep320(gray))
    t_lap = timeit("laplacian_var", lambda: native.laplacian_var(gray))
    t_la = timeit("lap_area32", lambda: native.lap_area32(gray))

    ms = 1e3 / n
    print(f"--- {w}x{h}  ({n} frames, best of 3) ---")
    print(f"prep320_bgr (fused, one sweep) {t_full * ms:8.2f} ms/f")
    print(f"bgr_to_gray alone              {t_gray * ms:8.2f} ms/f")
    print(f"prep320 on gray                {t_prep_g * ms:8.2f} ms/f")
    print(f"laplacian_var alone            {t_lap * ms:8.2f} ms/f")
    print(f"lap_area32 alone               {t_la * ms:8.2f} ms/f")
    return t_full * ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    t1080 = run(1080, 1920, n)
    t4k = run(2160, 3840, max(4, n // 2))
    print(f"\n4K/1080p ratio: {t4k / t1080:.2f} (pure pixel scaling = 4.0)")


if __name__ == "__main__":
    main()
