#!/usr/bin/env python
"""Detector-family throughput at the serving size (224 px, batch 64).

Measures frames/sec with resident device data (best-of-N), for each
requested family × precision:

    python tools/bench_detector.py [vit vit-int8 cnn cnn-int8]

Axon gotchas respected: one jitted program per config, completion forced
via a scalar fetch (block_until_ready does not block on this backend).
Round-2c reference numbers (BASELINE.md): ViT bf16 2286 f/s, CNN bf16
4436 f/s on the v5e.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from avd_tpu import models
from avd_tpu.models import quant
from avd_tpu.utils import jaxtools

BATCH = 64
REPS = 5
CHAIN = 16


def bench(config: str) -> float:
    arch = config.split("-")[0]
    fam = models.family(arch)
    cfg = fam.make_config("full")
    params = fam.init_params(jax.random.PRNGKey(0), cfg)
    if config.endswith("-int8") and arch not in ("vit", "cnn"):
        raise SystemExit(f"{config}: int8 PTQ supports vit/cnn only")
    if config.endswith("-int8"):
        params = quant.quantize_params(params)
        fwd = jax.jit(lambda p, x: jax.nn.sigmoid(
            quant.forward(p, x, cfg)[:, 0].astype(jnp.float32)))
    elif arch == "temporal":
        # clip-level family: the batch axis IS time (one BATCH-frame clip)
        fwd = jax.jit(lambda p, x: jax.nn.sigmoid(
            fam.forward_clip(p, x, cfg)[:, 0].astype(jnp.float32)))
    else:
        fwd = jax.jit(lambda p, x: jax.nn.sigmoid(
            fam.forward(p, x, cfg)[:, 0].astype(jnp.float32)))
    x = jnp.asarray(np.random.default_rng(0).random(
        (BATCH, cfg.image_size, cfg.image_size, 3), np.float32))
    float(np.asarray(fwd(params, x))[0])  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        # steady-state serving: CHAIN async dispatches queue on the device
        # in order, so one final scalar fetch amortizes the tunnel RTT
        t = time.perf_counter()
        for _ in range(CHAIN):
            out = fwd(params, x)
        float(np.asarray(out)[0])  # force completion (axon)
        best = min(best, (time.perf_counter() - t) / CHAIN)
    return BATCH / best


def main() -> int:
    jaxtools.setup()
    configs = sys.argv[1:] or ["vit", "vit-int8", "cnn", "cnn-int8"]
    print(f"devices: {jax.devices()}")
    for c in configs:
        fps = bench(c)
        print(f"{c:10s} {fps:8.0f} frames/s  ({BATCH / fps * 1e3:.1f} ms/batch)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
