"""JAX/XLA/Pallas compute kernels.

Every op here is batched over the frame (or audio-window) axis and jittable
with static shapes.  The design inverts the reference's per-frame Python
loops (/root/reference/app/analyzers/video.py:27-58, audio.py:40-61): frames
arrive as one ``[N, H, W, 3]`` tensor; resizes are interpolation-matrix
matmuls (MXU), blurs/gradients are separable convs, reductions stay on
device so only per-frame scalars ever cross back to the host.
"""
