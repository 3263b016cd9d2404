"""Fused multi-head self-attention — Pallas TPU kernel (inference).

Problem: the ViT detector's attention (models/detector.py::
block_forward_aux) lowers under XLA to two batched matmuls with the
f32 score tensor ``[B, H, T, T]`` MATERIALIZED in HBM between them
(XLA cannot fuse across two MXU contractions).  At the flagship
serving shape (224 px → T=197, H=6, bf16) the per-layer score traffic
is ``B·6·197²·4 B`` written + read ≈ 1.9 MB/frame/layer — the single
largest HBM round-trip in the model and the obvious fused-attention
candidate (VERDICT round-3 #4).

Shape regime: T=197 is TINY by flash-attention standards — Q, K, V
and the full f32 score matrix for one (batch, head) cell together are
< 350 KB, a comfortable VMEM resident.  So this is NOT a streaming
flash kernel with running-max rescaling: each grid cell computes the
whole ``softmax(QKᵀ/√d)V`` for one (b, h) pair in one pass — two MXU
contractions and an exact f32 row softmax, with the scores never
leaving VMEM.  Numerics match the XLA path: bf16 matmul inputs, f32
accumulation (``preferred_element_type``), f32 softmax, bf16 output.

Inference-only by design: the training step keeps the XLA einsum path
(autodiff through a pallas_call needs a custom VJP, and training runs
at 128 px under scan/remat where the score tensor is smaller and
batches are compile-time-fixed anyway).  Serving opts in via
``AVD_ATTN_FUSED=1`` (models/scoring.py) — kept opt-in until the
same-session A/B on the real chip lands (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Grid: (B, H).  Block = one (batch, head) cell.

    q_ref/k_ref/v_ref: [1, 1, T, D] bf16 VMEM blocks
    o_ref:             [1, 1, T, D] bf16
    """
    q = q_ref[0, 0]                                   # [T, D] bf16
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [T, T] f32
    s = s * scale
    # exact softmax: T rows are VMEM-resident, no streaming rescale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [T, D] f32
    o_ref[0, 0] = o.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        interpret: bool = False) -> jnp.ndarray:
    """softmax(QKᵀ/√D)·V per head, scores VMEM-resident.

    q, k, v: [B, H, T, D] bf16 (head-major — the caller transposes from
    its [B, T, H, D] reshape; XLA folds that transpose into the
    producing matmul's output layout).  Returns [B, H, T, D] bf16.
    """
    b, h, t, d = q.shape
    scale = float(1.0 / np.sqrt(d))
    spec = pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0))
    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """Drop-in for the detector's einsum pair: takes the block's
    [B, T, H, D] q/k/v and returns [B, T, H·D] bf16 (pre-proj)."""
    b, t, h, d = q.shape
    o = mha(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), interpret=interpret)
    return o.transpose(0, 2, 1, 3).reshape(b, t, h * d)
