"""H2D tunnel line-rate probe (BASELINE.md round 3, VERDICT #5).

The 1080p streaming cycle is put-bound: each packed 49-frame window is
~5.07 MB of u8 and costs ~145 ms to ship (docs/PERFORMANCE.md).  This
probe measures what the axon tunnel can actually sustain so we can say
whether the streaming put is at line rate (environment-final) or below
it (tuning headroom: more AVD_DISPATCH_WORKERS / split puts).

Method: per configuration (payload size x concurrent put threads), each
thread loops device_put(buf_i) then dispatches a jitted ``x.sum()`` on
the result.  Device dispatches queue in order and the sum is trivial
compute, so total wall time ~= transfer time.  Completion is forced by
fetching the final scalar per thread (``block_until_ready`` does not
block on axon — BASELINE.md environment note).  Distinct buffers per
iteration prevent any put caching.

The reference has no equivalent (CPU-only, no accelerator transfer
path); this measures the one environment bottleneck that bounds our
streaming number.

Usage: python tools/h2d_probe.py [--sizes-mb 2.5,5,10] [--threads 1,2,3,4]
       [--reps 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(size_bytes: int, n_threads: int, reps: int) -> float:
    """Aggregate achieved H2D MB/s for `n_threads` concurrent putters."""
    import jax
    import jax.numpy as jnp

    ssum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))

    # Distinct payloads per (thread, rep); nonzero so sums are checkable.
    bufs = [[np.random.randint(0, 255, size_bytes, dtype=np.uint8)
             for _ in range(reps)] for _ in range(n_threads)]

    # Warm the program + one put per thread outside the timed region.
    float(np.asarray(ssum(jax.device_put(bufs[0][0][: 1 << 16]))))

    finals = [None] * n_threads

    def run(t: int) -> None:
        last = None
        for r in range(reps):
            dev = jax.device_put(bufs[t][r])
            last = ssum(dev)
        finals[t] = last

    threads = [threading.Thread(target=run, args=(t,))
               for t in range(n_threads)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    # Force completion of every thread's final dispatch (axon:
    # block_until_ready does not block; a scalar fetch does).
    for t in range(n_threads):
        float(np.asarray(finals[t]))
    wall = time.perf_counter() - t0

    total_mb = size_bytes * reps * n_threads / 1e6
    return total_mb / wall


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sizes-mb", default="2.5,5,10")
    ap.add_argument("--threads", default="1,2,3,4")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    sizes = [float(s) for s in args.sizes_mb.split(",")]
    thread_counts = [int(t) for t in args.threads.split(",")]

    import jax
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    print(f"{'size MB':>8} {'threads':>8} {'MB/s':>8}")
    results = {}
    for size in sizes:
        nbytes = int(size * 1e6)
        for nt in thread_counts:
            rate = _measure(nbytes, nt, args.reps)
            results[(size, nt)] = rate
            print(f"{size:8.1f} {nt:8d} {rate:8.1f}", flush=True)

    best = max(results.values())
    single = max(v for (s, t), v in results.items() if t == 1)
    print(f"\nbest aggregate: {best:.1f} MB/s  "
          f"(single-stream best: {single:.1f} MB/s, "
          f"concurrency gain {best / single:.2f}x)")

    # Entropy sensitivity: if the tunnel compresses in flight, a
    # low-entropy payload ships faster — which would make mod-256
    # temporal delta encoding of the streaming windows (near-zero bytes
    # on static content, exact reconstruction by on-device cumsum) a
    # real win.  If rates match, the tunnel is entropy-blind and the
    # idea is dead; record either way.
    import jax
    import jax.numpy as jnp
    ssum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    nbytes = int(5e6)
    for name, buf in (("random", np.random.randint(0, 255, nbytes,
                                                   dtype=np.uint8)),
                      ("zeros", np.zeros(nbytes, np.uint8)),
                      ("video-like delta",
                       np.random.binomial(2, 0.05, nbytes)
                       .astype(np.uint8))):
        # distinct array objects (one byte varied) so no layer can
        # dedupe repeated puts of an identical buffer
        payloads = []
        for r in range(args.reps):
            b = buf.copy()
            b[0] = r
            payloads.append(b)
        t0 = time.perf_counter()
        last = None
        for b in payloads:
            last = ssum(jax.device_put(b))
        float(np.asarray(last))
        rate = nbytes * args.reps / 1e6 / (time.perf_counter() - t0)
        print(f"entropy probe {name:>18}: {rate:8.1f} MB/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
