"""Sequence-parallel attention: ring attention and Ulysses.

The last two strategies named in SURVEY §2.2 ("DP/TP/PP/SP/EP/CP/
ring-attention/Ulysses: none exist" in the reference — all to be
created TPU-native).  Both compute exact softmax(QKᵀ)V over a token
axis that is sharded across the mesh, for detector configurations whose
sequence outgrows one chip's attention memory:

* **ring attention** — queries stay put; K/V blocks rotate around the
  ICI ring (``ppermute``) while an online-softmax accumulator (running
  max / normalizer, flash-attention style) folds each block in.  Peak
  memory is one [Tq_local, Tkv_local] tile per step instead of the full
  [T, T] score matrix, and every hop is neighbor-to-neighbor ICI
  traffic that XLA overlaps with the next block's matmuls.
* **Ulysses** — one ``all_to_all`` re-shards from token-parallel to
  head-parallel ([B, H, T/S, D] → [B, H/S, T, D]), full attention runs
  locally per head group, and a second ``all_to_all`` restores the
  token sharding.  Two collectives total; preferable when heads divide
  the mesh and the full per-head score matrix fits.

Both are exact (not approximations) — parity-tested against plain
attention in tests/test_attention_parallel.py.  Call them inside
``shard_map`` with the token axis of q/k/v sharded over ``axis``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def full_attention(q: jnp.ndarray, k: jnp.ndarray,
                   v: jnp.ndarray) -> jnp.ndarray:
    """Reference single-device softmax(QKᵀ/√d)V.  [B, H, T, D] each."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis: str, n_shards: int) -> jnp.ndarray:
    """Exact attention with the token axis sharded over ``axis``.

    Inside ``shard_map``: ``q``/``k``/``v`` are the local blocks
    [B, H, T/S, D].  K/V rotate ``n_shards`` times over the ring; the
    online softmax keeps a running (max, normalizer, accumulator) in
    f32 so the result equals the unsharded softmax exactly up to fp
    rounding regardless of block order.
    """
    scale = 1.0 / np.sqrt(q.shape[-1])
    qf = q.astype(jnp.float32)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    m0 = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)
    l0 = jnp.zeros(q.shape[:-1], jnp.float32)
    a0 = jnp.zeros(q.shape, jnp.float32)
    # carries become device-varying over the ring axis after the first
    # ppermute; mark the inits to satisfy shard_map's vma checker
    m0, l0, a0 = (jax.lax.pcast(x, (axis,), to="varying")
                  for x in (m0, l0, a0))

    def fold(kb, vb, m, l, acc):
        s = jnp.einsum("bhtd,bhsd->bhts", qf,
                       kb.astype(jnp.float32)) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + \
            jnp.einsum("bhts,bhsd->bhtd", p, vb.astype(jnp.float32))
        return m_new, l, acc

    def step(carry, _):
        kb, vb, m, l, acc = carry
        m, l, acc = fold(kb, vb, m, l, acc)
        kb = jax.lax.ppermute(kb, axis, perm)
        vb = jax.lax.ppermute(vb, axis, perm)
        return (kb, vb, m, l, acc), None

    # n_shards-1 fold+rotate steps, then fold the final block WITHOUT
    # rotating — the last hop's blocks would land in a discarded carry,
    # a full K+V of pure wasted ICI traffic per call
    (kb, vb, m, l, acc), _ = jax.lax.scan(step, (k, v, m0, l0, a0), None,
                                          length=n_shards - 1)
    _, l, acc = fold(kb, vb, m, l, acc)
    return (acc / l[..., None]).astype(q.dtype)


def ulysses_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      axis: str) -> jnp.ndarray:
    """Exact attention via head redistribution (DeepSpeed-Ulysses).

    Inside ``shard_map`` with token-sharded [B, H, T/S, D] inputs and
    ``H % S == 0``: all_to_all to head-sharded [B, H/S, T, D], full
    attention locally, all_to_all back.
    """
    def to_heads(x):
        return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                  tiled=True)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    oh = full_attention(qh, kh, vh)
    return jax.lax.all_to_all(oh, axis, split_axis=2, concat_axis=1,
                              tiled=True)
