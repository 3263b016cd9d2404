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
* scaling is mesh-native via ``jax.sharding`` + ``shard_map`` (no
  NCCL/MPI — XLA collectives over ICI/DCN): data parallelism over
  frames/batches, tensor + sequence parallelism and a Switch-MoE
  expert-parallel option for the detector, GPipe pipeline parallelism
  over a 'stage' axis, context parallelism over a clip's time axis with
  a one-frame halo, and exact ring/Ulysses sequence-parallel attention.

Package layout:
    analyzers/  public analyzer API mirroring the reference package
    ops/        JAX/XLA/Pallas kernels (color, resize, hash, laplacian,
                optical flow, audio spectral features, freq forensics)
    oracle/     independent numpy reference implementations for parity tests
    ingest/     host-side media IO (probe, frame batches, audio)
    models/     per-frame neural detector families (ViT + CNN), training,
                checkpoints, scoring adapter
    parallel/   mesh construction, shardings, halo exchange, GPipe
                pipeline, ring/Ulysses attention, multi-slice init
    serve/      HTTP server, routes, pre-fork master, batching queue
    utils/      env/config/json helpers
"""

from avd_tpu.version import VERSION

__version__ = VERSION
__all__ = ["VERSION"]
