"""avd_tpu — TPU-native video-forensics framework.

A ground-up re-design of the capabilities of ``backtato/ai-video-detector``
(reference mounted at /root/reference) for TPU hardware:

* the per-frame OpenCV/numpy loops of the reference
  (``app/analyzers/video.py:27-58``, ``app/analyzers/audio.py:40-61``) become
  batched JAX/XLA/Pallas feature extraction over ``[N, H, W, C]`` frame
  tensors and ``[W, win]`` audio windows;
* fusion / heuristics / schema reproduce the reference's observable JSON
  contract byte-for-byte (``app/analyzers/fusion.py``, ``api.py:142-170``);
* serving preserves the full HTTP surface (``api.py:213-266``) on a
  stdlib-based server with a pre-fork master (gunicorn-equivalent,
  ``gunicorn_conf.py``);
* scaling is mesh-native: data parallelism over frames and context
  parallelism over time via ``jax.sharding`` + ``shard_map`` (no NCCL/MPI —
  XLA collectives over ICI/DCN).

Package layout:
    analyzers/  public analyzer API mirroring the reference package
    ops/        JAX/XLA/Pallas kernels (color, resize, hash, laplacian,
                optical flow, audio spectral features)
    oracle/     independent numpy reference implementations for parity tests
    ingest/     host-side media IO (probe, frame batches, audio)
    models/     per-frame neural detector (flagship model)
    parallel/   mesh construction, shardings, halo exchange
    serve/      HTTP server, routes, pre-fork master, batching queue
    utils/      env/config/json helpers
"""

from avd_tpu.version import VERSION

__version__ = VERSION
__all__ = ["VERSION"]
