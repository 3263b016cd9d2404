"""Pre-compile every streaming window bucket's packed prep program into
the persistent XLA cache (~/.cache/avd_tpu_xla) on the real TPU.

Cold Mosaic compiles take minutes per Pallas shape via the remote
helper; running this once after a flow/prep code change keeps serving
warmup and bench runs fast.  Safe to re-run: cached shapes load in
seconds.

Usage: python tools/precompile.py [--stacked]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from avd_tpu.ops import video_features as vf

    chunk = vf._DEFAULT_CHUNK
    for n in vf._window_buckets(chunk):
        t0 = time.time()
        zero320 = np.zeros((n, vf._FLOW_SIZE, vf._FLOW_SIZE), np.uint8)
        zero32 = np.zeros((n, vf._HASH_SIZE, vf._HASH_SIZE), np.uint8)
        packed = vf._pack_prep_window(zero320, zero32)
        out = vf._compiled_prep_packed(n, False)(jnp.asarray(packed))
        float(np.asarray(out).ravel()[0])  # force completion (axon)
        print(f"bucket {n:3d}: {time.time() - t0:7.1f} s", flush=True)
        if n == chunk + 1 and vf._h2d_delta_mode() != "0":
            t0 = time.time()
            out = vf._compiled_prep_packed(n, True)(jnp.asarray(packed))
            float(np.asarray(out).ravel()[0])
            print(f"bucket {n:3d} (delta): {time.time() - t0:7.1f} s",
                  flush=True)

    if "--stacked" in sys.argv:
        full = chunk + 1
        zero320 = np.zeros((full, vf._FLOW_SIZE, vf._FLOW_SIZE), np.uint8)
        zero32 = np.zeros((full, vf._HASH_SIZE, vf._HASH_SIZE), np.uint8)
        d = vf._h2d_delta()
        packed = vf._pack_prep_window(zero320, zero32, delta=d)
        from avd_tpu.serve import batching
        for m in batching._BUCKETS:  # the full warmup ladder incl. 8
            t0 = time.time()
            fm = vf._compiled_prep_stacked_packed(m, full, d)
            sp = np.broadcast_to(packed, (m,) + packed.shape)
            out = fm(jnp.asarray(sp))
            float(np.asarray(out).ravel()[0])
            print(f"stacked {m}x{full}: {time.time() - t0:7.1f} s",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
