"""Pallas TPU kernels for ops where XLA's default lowering is the
bottleneck.  Currently: the Farnebäck warp (XLA lowers the per-pixel
bilinear gather to element gathers at ~0.3 % of HBM bandwidth; the
select-shift kernel here reformulates it as dynamically-bounded shifted
masked accumulation, which is pure VPU work)."""
