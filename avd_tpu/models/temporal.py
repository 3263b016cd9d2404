"""Temporal detector family — per-frame scores with temporal context.

The per-frame families (ViT, CNN) score each sampled frame in
isolation; AI-spliced content, frame interpolation, and looped segments
are fundamentally *temporal* artifacts.  This family encodes each frame
cheaply, then runs a transformer over the FRAME SEQUENCE so every
timeline entry sees its neighbors:

    [B, T, H, W, 3] → per-frame patch embed + token mean-pool
                    → [B, T, width] + sinusoidal time encoding
                    → temporal transformer (pre-LN blocks)
                    → per-frame logits [B, T, 1]

TPU-first design notes:

* the frame encoder is one matmul per frame (patchify → project →
  mean-pool) — all MXU, no conv;
* sinusoidal (not learned) time encoding: a pure function of the global
  frame index, so a sequence shard can reconstruct its positions from
  ``axis_index`` alone — no parameter slicing across the mesh;
* **sequence parallelism over time** (``forward_time_sharded``): for
  clips whose sampled-frame count outgrows one chip's attention memory,
  the time axis shards over a ``time`` mesh axis and attention runs as
  **ring attention** (K/V ppermute ring + f32 online softmax) or
  **Ulysses** (all_to_all head redistribution) — the two exact
  sequence-parallel algorithms in ``parallel/attention.py``, which this
  family makes load-bearing (SURVEY §2.2: "ring-attention/Ulysses only
  become relevant if we adopt a temporal-attention detector");
* same precision recipe as the other families: bf16 matmul stream,
  f32 norms/softmax/loss.

The reference has no model at all (its per-frame score is the
closed-form heuristic at /root/reference/app/analyzers/video.py:54-57,
and its only temporal feature is the previous-frame flow/hash);
this is a north-star addition in the BASELINE.json detector slot.
Serving: ``AVD_DETECTOR=1 AVD_DETECTOR_ARCH=temporal`` scores the
sampled-frame sequence as one clip (models/scoring.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from avd_tpu.models.detector import (  # shared family helpers
    _bce,
    _ln,
    make_optimizer,
    patchify,
    save_checkpoint,
)
from avd_tpu.models.detector import load_checkpoint as _load_checkpoint

__all__ = [
    "TemporalConfig", "Config", "PRESETS", "make_config", "init_params",
    "forward", "forward_clip", "forward_time_sharded", "loss_fn",
    "make_train_step", "param_specs", "make_optimizer",
    "save_checkpoint", "load_checkpoint", "synthetic_sequences",
]


@dataclasses.dataclass(frozen=True)
class TemporalConfig:
    image_size: int = 64
    patch: int = 16
    width: int = 256          # temporal stream dim
    depth: int = 4            # temporal blocks (attention over frames)
    frame_depth: int = 4      # spatial blocks per frame (over patches)
    heads: int = 4
    mlp_ratio: int = 4
    n_classes: int = 1        # per-frame binary: AI-generated?
    # Auxiliary per-frame supervision weight: BCE on a linear head read
    # directly off the frame embedding (before any cross-frame
    # attention).  Round-4 transfer diagnosis: the blobs+geo+cellular
    # temporal run scored BOTH classes of the held-out 'texture' family
    # z~-2.2 even on repeated-single-frame clips — the spatial trunk
    # (then frame_depth=2, supervised only through 4 temporal blocks)
    # had collapsed to family-signature features instead of the
    # smooth-vs-noisy meta-cue the per-frame ViT learns (same data, same
    # 64px/patch-16 grid, unseen AUC 0.978).  Supervising the trunk
    # directly (like the ViT) + frame_depth 4 closes that gap; the aux
    # head is unused at serving time.
    aux_frame_loss: float = 0.5

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def mlp_width(self) -> int:
        return self.width * self.mlp_ratio


Config = TemporalConfig

PRESETS = {
    "small": {},  # the defaults above
    "full": dict(image_size=224, width=384, depth=6, heads=6),
}


def make_config(preset: str = "small", **over) -> TemporalConfig:
    if preset not in PRESETS:
        raise ValueError(f"unknown temporal preset {preset!r}; "
                         f"choose from {sorted(PRESETS)}")
    kw = dict(PRESETS[preset])
    kw.update(over)
    return TemporalConfig(**kw)


def param_specs(cfg: TemporalConfig) -> Dict[str, Any]:
    """No tensor parallelism for this family (the temporal stream is
    narrow); every leaf replicates — the parallel axis is TIME, handled
    by forward_time_sharded's shard_map, not by GSPMD param sharding."""
    layer = {k: P() for k in
             ("ln1_scale", "ln1_bias", "qkv_w", "qkv_b", "proj_w",
              "proj_b", "ln2_scale", "ln2_bias", "mlp_in_w", "mlp_in_b",
              "mlp_out_w", "mlp_out_b")}
    return {
        "frame_w": P(), "frame_b": P(),
        "frame_layers": [dict(layer) for _ in range(cfg.frame_depth)],
        "in_w": P(), "in_b": P(),
        "layers": [dict(layer) for _ in range(cfg.depth)],
        "ln_f_scale": P(), "ln_f_bias": P(),
        "head_w": P(), "head_b": P(),
        "aux_w": P(), "aux_b": P(),
    }


def _init_block(lk, d, mlp_width):
    def dense(key, fan_in, shape):
        return (jax.random.normal(key, shape, jnp.float32)
                * (1.0 / np.sqrt(fan_in)))
    return {
        "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
        "qkv_w": dense(lk[0], d, (d, 3 * d)),
        "qkv_b": jnp.zeros((3 * d,)),
        "proj_w": dense(lk[1], d, (d, d)),
        "proj_b": jnp.zeros((d,)),
        "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
        "mlp_in_w": dense(lk[2], d, (d, mlp_width)),
        "mlp_in_b": jnp.zeros((mlp_width,)),
        "mlp_out_w": dense(lk[3], mlp_width, (mlp_width, d)),
        "mlp_out_b": jnp.zeros((d,)),
    }


def init_params(key: jax.Array, cfg: TemporalConfig) -> Dict[str, Any]:
    k = jax.random.split(key, 3 + cfg.depth + cfg.frame_depth)
    d = cfg.width
    patch_dim = cfg.patch * cfg.patch * 3

    def dense(key, fan_in, shape):
        return (jax.random.normal(key, shape, jnp.float32)
                * (1.0 / np.sqrt(fan_in)))

    params: Dict[str, Any] = {
        "frame_w": dense(k[0], patch_dim, (patch_dim, d)),
        "frame_b": jnp.zeros((d,), jnp.float32),
        "frame_layers": [
            _init_block(jax.random.split(k[3 + cfg.depth + i], 4), d,
                        cfg.mlp_width) for i in range(cfg.frame_depth)],
        "in_w": dense(k[1], d, (d, d)),
        "in_b": jnp.zeros((d,), jnp.float32),
        "layers": [],
        "ln_f_scale": jnp.ones((d,), jnp.float32),
        "ln_f_bias": jnp.zeros((d,), jnp.float32),
        "head_w": dense(k[2], d, (d, cfg.n_classes)),
        "head_b": jnp.zeros((cfg.n_classes,), jnp.float32),
        # auxiliary per-frame head (training-only; see
        # TemporalConfig.aux_frame_loss)
        "aux_w": dense(jax.random.fold_in(k[2], 1), d,
                       (d, cfg.n_classes)),
        "aux_b": jnp.zeros((cfg.n_classes,), jnp.float32),
    }
    for i in range(cfg.depth):
        params["layers"].append(
            _init_block(jax.random.split(k[3 + i], 4), d, cfg.mlp_width))
    return params


def load_checkpoint(path: str, like):
    """Template-guarded checkpoint restore for the temporal family.

    Round 4 changed the temporal parameter template (frame_depth 2 → 4
    plus the ``aux_w``/``aux_b`` per-frame trunk head — see
    ``TemporalConfig.aux_frame_loss``); pre-round-4 checkpoints no
    longer match the restore template, and a bare orbax restore
    surfaces that as a raw tree-structure stack trace.  Probe for that
    exact legacy shape on failure and raise a one-line, actionable
    error instead (VERDICT r4 #7)."""
    try:
        return _load_checkpoint(path, like)
    except Exception as err:
        if isinstance(like, dict) and "aux_w" in like \
                and len(like.get("frame_layers", ())) > 2:
            legacy = {kk: vv for kk, vv in like.items()
                      if kk not in ("aux_w", "aux_b")}
            legacy["frame_layers"] = like["frame_layers"][:2]
            try:
                _load_checkpoint(path, legacy)
            except Exception:
                raise err
            raise ValueError(
                f"{path} holds a pre-round-4 temporal checkpoint "
                "(template v1: frame_depth 2, no aux per-frame head). "
                "The round-4 transfer fix changed the template "
                "(frame_depth 4 + aux_w/aux_b — models/temporal.py); "
                "retrain it with `python -m avd_tpu.models.train --arch "
                "temporal`, or serve it with a pre-round-4 build."
            ) from None
        raise


def _time_encoding(t0: jnp.ndarray, n: int, d: int) -> jnp.ndarray:
    """Sinusoidal encoding for global frame indices [t0, t0+n) → [n, d].
    A pure function of the index, so a time shard rebuilds its slice
    from ``axis_index * n`` with no parameter movement."""
    pos = (t0 + jnp.arange(n)).astype(jnp.float32)[:, None]
    dim = jnp.arange(d // 2, dtype=jnp.float32)[None, :]
    ang = pos / jnp.power(10000.0, 2.0 * dim / d)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _encode_frames(params, frames: jnp.ndarray,
                   cfg: TemporalConfig) -> jnp.ndarray:
    """[B, T, H, W, 3] → [B, T, width]: patchify each frame, project,
    run ``frame_depth`` SPATIAL transformer blocks over the patch
    tokens, mean-pool, project.

    Nonlinear processing *before* the pool is load-bearing:
    mean-of-linear equals linear-of-mean, so a linear encoder collapses
    to a function of the frame's patch-average — blind to the
    second-order statistics (sensor-noise energy vs generator
    smoothness) the detection cues live in (a trained run with a linear
    encoder sat exactly at chance).  The spatial blocks give the
    per-frame branch ViT-grade cue extraction; no intra-frame position
    encoding is needed — the texture cues are position-invariant and
    the pooled output is a set function of the patches."""
    b, t = frames.shape[:2]
    x = frames.reshape((b * t,) + frames.shape[2:]).astype(jnp.bfloat16)
    toks = patchify(x, cfg.patch)                      # [B·T, Pt, pd]
    toks = toks @ params["frame_w"].astype(jnp.bfloat16) + \
        params["frame_b"].astype(jnp.bfloat16)
    from avd_tpu.parallel import attention as pa
    for lp in params["frame_layers"]:                  # spatial attention
        toks = _block(toks, lp, cfg, pa.full_attention)
    emb = jnp.mean(toks.astype(jnp.float32), axis=1)   # [B·T, d]
    emb = emb.astype(jnp.bfloat16) @ params["in_w"].astype(jnp.bfloat16) \
        + params["in_b"].astype(jnp.bfloat16)
    return emb.reshape(b, t, cfg.width)


def masked_attention(mask: jnp.ndarray):
    """Full attention with invalid KEY positions masked out of the
    softmax (``mask``: [B, T] bool, True = real frame).  Queries at
    padded positions still produce (garbage) outputs — callers discard
    them — but real frames' scores are unaffected by the padding."""
    def attn(q, k, v):
        scale = 1.0 / np.sqrt(q.shape[-1])
        s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        s = jnp.where(mask[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhts,bhsd->bhtd", p,
                          v.astype(jnp.float32)).astype(q.dtype)
    return attn


def _block(x: jnp.ndarray, lp: Dict[str, Any], cfg: TemporalConfig,
           attn_fn) -> jnp.ndarray:
    """Pre-LN transformer block on the [B, T, d] bf16 stream.  The
    attention core is injected: full softmax on one device, ring/Ulysses
    inside shard_map."""
    h = _ln(x.astype(jnp.float32), lp["ln1_scale"],
            lp["ln1_bias"]).astype(jnp.bfloat16)
    qkv = h @ lp["qkv_w"].astype(jnp.bfloat16) + \
        lp["qkv_b"].astype(jnp.bfloat16)
    b, t, _ = qkv.shape
    qkv = qkv.reshape(b, t, 3, cfg.heads, cfg.head_dim)
    # [B, H, T, D] — the parallel/attention.py layout
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    o = attn_fn(q, k, v)                               # [B, H, T, D]
    o = o.transpose(0, 2, 1, 3).reshape(b, t, cfg.width) \
         .astype(jnp.bfloat16)
    x = x + o @ lp["proj_w"].astype(jnp.bfloat16) + \
        lp["proj_b"].astype(jnp.bfloat16)

    h = _ln(x.astype(jnp.float32), lp["ln2_scale"],
            lp["ln2_bias"]).astype(jnp.bfloat16)
    h = jax.nn.gelu(h @ lp["mlp_in_w"].astype(jnp.bfloat16) +
                    lp["mlp_in_b"].astype(jnp.bfloat16))
    return x + h @ lp["mlp_out_w"].astype(jnp.bfloat16) + \
        lp["mlp_out_b"].astype(jnp.bfloat16)


def _head(params, x: jnp.ndarray) -> jnp.ndarray:
    x = _ln(x.astype(jnp.float32), params["ln_f_scale"],
            params["ln_f_bias"])
    return x @ params["head_w"] + params["head_b"]


def forward(params: Dict[str, Any], frames: jnp.ndarray,
            cfg: TemporalConfig, t0: int = 0,
            mask: jnp.ndarray | None = None,
            return_aux: bool = False) -> jnp.ndarray:
    """[B, T, H, W, 3] float in [0,1] → [B, T, n_classes] f32 logits
    (one score per frame, attention over the whole sequence).

    ``mask`` ([B, T] bool, True = real frame) excludes padded positions
    from every attention softmax, so real frames' scores are independent
    of how much tail padding a bucketed batch carries.

    ``return_aux`` additionally returns the auxiliary per-frame logits
    read straight off the frame embedding (training-only — see
    TemporalConfig.aux_frame_loss); serving ignores them."""
    from avd_tpu.parallel import attention as pa

    x = _encode_frames(params, frames, cfg)
    aux = x.astype(jnp.float32) @ params["aux_w"] + params["aux_b"]
    x = x + _time_encoding(jnp.int32(t0), x.shape[1],
                           cfg.width).astype(x.dtype)[None]
    attn = pa.full_attention if mask is None else masked_attention(mask)
    for lp in params["layers"]:
        x = _block(x, lp, cfg, attn)
    out = _head(params, x)
    return (out, aux) if return_aux else out


def forward_clip(params: Dict[str, Any], frames: jnp.ndarray,
                 cfg: TemporalConfig,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Family-API adapter for serving: [N, H, W, 3] sampled frames of
    ONE clip → [N, n_classes] logits (the batch axis is time here).
    ``mask``: [N] bool validity (see ``forward``)."""
    return forward(params, frames[None], cfg,
                   mask=None if mask is None else mask[None])[0]


def forward_time_sharded(params: Dict[str, Any], frames: jnp.ndarray,
                         cfg: TemporalConfig, mesh,
                         impl: str = "ring") -> jnp.ndarray:
    """Sequence-parallel forward: the time axis shards over the mesh's
    ``time`` axis; attention runs as ring attention (K/V ppermute ring,
    f32 online softmax) or Ulysses (all_to_all head redistribution).
    Exact — parity with ``forward`` up to fp rounding.  T must divide by
    the axis size (and heads too for Ulysses)."""
    from jax import shard_map

    from avd_tpu.parallel import attention as pa

    n_shards = mesh.shape["time"]
    T = frames.shape[1]
    if T % n_shards:
        raise ValueError(f"T {T} not divisible by time axis {n_shards}")
    if impl == "ulysses" and cfg.heads % n_shards:
        raise ValueError(f"heads {cfg.heads} not divisible by "
                         f"{n_shards} (ulysses)")
    if impl not in ("ring", "ulysses"):
        raise ValueError(f"unknown impl {impl!r}")
    t_local = T // n_shards

    if impl == "ring":
        def attn(q, k, v):
            return pa.ring_attention(q, k, v, "time", n_shards)
    else:
        def attn(q, k, v):
            return pa.ulysses_attention(q, k, v, "time")

    def local_fwd(p, fl):
        # fl: [B, T/S, H, W, 3] — this shard's frames
        x = _encode_frames(p, fl, cfg)
        t0 = jax.lax.axis_index("time") * t_local
        x = x + _time_encoding(t0, t_local,
                               cfg.width).astype(x.dtype)[None]
        for lp in p["layers"]:
            x = _block(x, lp, cfg, attn)
        return _head(p, x)

    pspec = jax.tree_util.tree_map(lambda _: P(), params)
    run = shard_map(local_fwd, mesh=mesh,
                    in_specs=(pspec, P(None, "time")),
                    out_specs=P(None, "time"))
    return run(params, frames)


def loss_fn(params, frames, labels, cfg: TemporalConfig,
            sharded: bool = False, logit_l2: float = 0.0) -> jnp.ndarray:
    """Per-frame sigmoid BCE; ``labels``: [B, T] in {0,1}.  ``sharded``
    is accepted for family-API parity (GSPMD has nothing to shard here —
    time parallelism goes through forward_time_sharded).  ``logit_l2``
    adds the score-scale regularizer (detector._logit_l2)."""
    del sharded
    from avd_tpu.models.detector import _logit_l2
    out, aux = forward(params, frames, cfg, return_aux=True)
    z = out[..., 0].reshape(-1)
    y = labels.reshape(-1)
    loss = _bce(z, y)
    if logit_l2:
        loss = loss + _logit_l2(z, logit_l2)
    if cfg.aux_frame_loss:
        # Supervise the spatial trunk directly (per-frame, before any
        # cross-frame attention) so it must carry the transferable
        # smooth-vs-noisy cue itself — without this the trunk can emit
        # mere family signatures and let the temporal blocks decide,
        # which measured BELOW CHANCE on the held-out family (AUC 0.586,
        # both classes z~-2.2; BASELINE.md round 4).
        za = aux[..., 0].reshape(-1)
        loss = loss + cfg.aux_frame_loss * _bce(za, y)
        if logit_l2:
            loss = loss + cfg.aux_frame_loss * _logit_l2(za, logit_l2)
    return loss


def make_train_step(cfg: TemporalConfig, optimizer, sharded: bool = False,
                    logit_l2: float = 0.0):
    from avd_tpu.models import detector
    return detector.make_train_step(cfg, optimizer, sharded, loss=loss_fn,
                                    logit_l2=logit_l2)


def synthetic_sequences(rng: np.random.Generator, batch: int, t: int,
                        size: int, families=("blobs",)):
    """Procedural spliced sequences: each clip is camera-like frames
    with a random contiguous AI-like span (or none / all) — per-frame
    labels [batch, t].  Reuses the per-frame curriculum's generators
    (models/train.py::synthetic_batch) so the temporal family learns the
    same cue distribution plus the transition structure."""
    from avd_tpu.models.train import synthetic_batch

    frames = np.empty((batch, t, size, size, 3), np.float32)
    labels = np.zeros((batch, t), np.int32)
    # draw a pool of frames of each class, then splice.  Consumption
    # wraps with modulo, so ~60% of the total per class suffices; top up
    # in need-proportional chunks (a 32-frame top-up loop on the single
    # shared host core was measured as hundreds of extra generator calls)
    need = max(8, (batch * t * 3) // 5)
    pool_f, pool_l = synthetic_batch(rng, 2 * need, size, families)
    ai_pool = pool_f[pool_l == 1]
    cam_pool = pool_f[pool_l == 0]
    while len(ai_pool) < need or len(cam_pool) < need:
        short = need - min(len(ai_pool), len(cam_pool))
        f2, l2 = synthetic_batch(rng, max(32, 2 * short), size, families)
        ai_pool = np.concatenate([ai_pool, f2[l2 == 1]])
        cam_pool = np.concatenate([cam_pool, f2[l2 == 0]])
    ai_i = cam_i = 0
    for b in range(batch):
        kind = rng.random()
        if kind < 0.25:          # all camera
            s0, s1 = 0, 0
        elif kind < 0.5:         # all AI
            s0, s1 = 0, t
        else:                    # spliced span
            s0 = int(rng.integers(0, t))
            s1 = int(rng.integers(s0 + 1, t + 1))
        for i in range(t):
            if s0 <= i < s1:
                frames[b, i] = ai_pool[ai_i % len(ai_pool)]
                ai_i += 1
                labels[b, i] = 1
            else:
                frames[b, i] = cam_pool[cam_i % len(cam_pool)]
                cam_i += 1
    return frames, labels
