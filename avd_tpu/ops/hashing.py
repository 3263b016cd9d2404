"""Average-hash duplicate detection.

Reference: per frame, 32×32 INTER_AREA grayscale, threshold at the mean,
Hamming distance to the previous frame's hash, exact-zero distance counts a
duplicate (/root/reference/app/analyzers/video.py:4-8,36-41).

TPU design: hashes for ALL frames are computed in one shot from the
[N, 32, 32] area-resized gray stack; consecutive Hamming distances are one
XOR-free comparison (boolean inequality sum) between ``hashes[:-1]`` and
``hashes[1:]``.  No sequential loop — the reference's "previous frame" chain
is just an off-by-one slice.
"""

from __future__ import annotations

import jax.numpy as jnp


def average_hash_bits(small_gray: jnp.ndarray) -> jnp.ndarray:
    """[N, S, S] f32 → [N, S*S] bool: pixel >= frame mean."""
    n = small_gray.shape[0]
    mean = jnp.mean(small_gray, axis=(-2, -1), keepdims=True)
    return (small_gray >= mean).reshape(n, -1)


def consecutive_hamming(bits: jnp.ndarray) -> jnp.ndarray:
    """[N, K] bool → [N-1] int32 Hamming distances between neighbors."""
    diff = bits[1:] != bits[:-1]
    return jnp.sum(diff, axis=-1).astype(jnp.int32)


def duplicate_count(bits: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Number of consecutive pairs with Hamming distance 0 (video.py:37-40).

    ``valid``: optional [N] bool mask for padded batches — a pair counts
    only when both frames are valid.
    """
    ham = consecutive_hamming(bits)
    dup = ham == 0
    if valid is not None:
        dup = dup & valid[1:] & valid[:-1]
    return jnp.sum(dup.astype(jnp.int32))
