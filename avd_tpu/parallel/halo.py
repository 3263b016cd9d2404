"""Context parallelism over the time axis with a one-frame halo.

The reference's only inter-frame dependencies are *previous-frame*
comparisons: duplicate hashing and optical flow each look back exactly one
sampled frame (reference video.py:37-49), and the audio deltas look back
one window (audio.py:86-87).  That makes the time axis shardable with a
halo of ONE frame: each device computes its local frames' features plus the
pairs that straddle its right boundary, after receiving its successor's
first frame via ``ppermute`` over ICI.

This is the long-context strategy for this workload (SURVEY.md §5
"long-context"): a 1-hour clip's 7200 sampled frames spread over a slice,
with one frame of ICI traffic per boundary instead of gathering the clip
anywhere.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P


def with_next_halo(local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """[n_local, ...] → [n_local+1, ...] appending the next shard's first
    frame (the last shard gets its own last frame repeated — producing one
    self-pair that callers mask out).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i - 1) % n) for i in range(n)]
    recv = jax.lax.ppermute(local[:1], axis_name, perm)
    is_last = (idx == n - 1)
    tail = jnp.where(
        jnp.reshape(is_last, (1,) * local.ndim), local[-1:], recv)
    return jnp.concatenate([local, tail], axis=0)


def pair_valid_mask(n_local: int, axis_name: str) -> jnp.ndarray:
    """[n_local] bool: which boundary-inclusive pairs are real (the last
    shard's final pair is the self-pair artifact)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    mask = jnp.ones((n_local,), bool)
    return mask.at[-1].set(idx != n - 1)


def cp_consecutive_pairs(mesh: Mesh, fn: Callable, axis: str = "time"):
    """Lift a pairwise feature fn into a time-sharded computation.

    ``fn(prev_frames, cur_frames) -> [k, ...]`` maps k frame pairs to k
    feature rows.  Returns a jitted function ``frames [N, ...] →
    (features [N, ...], valid [N])`` where row i is the feature of pair
    (i, i+1); the last row is padding (valid[i]=False).  N must divide by
    the mesh's time-axis size.
    """

    @partial(shard_map, mesh=mesh,
             in_specs=P(axis),
             out_specs=(P(axis), P(axis)),
             check_vma=False)
    def sharded(local):
        ext = with_next_halo(local, axis)
        feats = fn(ext[:-1], ext[1:])
        return feats, pair_valid_mask(local.shape[0], axis)

    return jax.jit(sharded)


def cp_frame_deltas(mesh: Mesh, axis: str = "time"):
    """Time-sharded mean |frame difference| — the cheap neighbor feature
    used by tests and the multichip dry run."""
    def pair_fn(prev, cur):
        d = jnp.abs(cur.astype(jnp.float32) - prev.astype(jnp.float32))
        return jnp.mean(d, axis=tuple(range(1, d.ndim)))
    return cp_consecutive_pairs(mesh, pair_fn, axis)


def cp_video_pair_features(mesh: Mesh, axis: str = "time"):
    """Time-sharded PRODUCTION pair-feature program.

    This is the serving pipeline's actual device work
    (ops/video_features._prep_body): consecutive-hash Hamming on the
    [N, 32, 32] hash planes and Farnebäck flow magnitude stats on the
    [N, 320, 320] flow planes — each device computing its local pairs
    after the one-frame ``ppermute`` halo.  Matches the inter-frame
    dependency of reference video.py:37-49.

    Returns jitted ``(flow_u8 [N,320,320], hash_u8 [N,32,32]) →
    (ham [N], fmean [N], fvar [N], valid [N])`` with row i the feature of
    pair (i, i+1); N must divide by the mesh's time-axis size.
    """
    from avd_tpu.ops import flow as flow_ops
    from avd_tpu.ops import hashing

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis)),
             out_specs=(P(axis), P(axis), P(axis), P(axis)),
             check_vma=False)
    def sharded(flow_u8, hash_u8):
        f = with_next_halo(flow_u8, axis).astype(jnp.float32)
        h8 = with_next_halo(hash_u8, axis).astype(jnp.float32)
        bits = hashing.average_hash_bits(h8)
        ham = hashing.consecutive_hamming(bits)
        fl = flow_ops.farneback_flow(f[:-1], f[1:])
        fmean, fvar = flow_ops.flow_magnitude_stats(fl)
        return (ham.astype(jnp.float32), fmean, fvar,
                pair_valid_mask(flow_u8.shape[0], axis))

    return jax.jit(sharded)
