"""Detector → analyzer integration (north-star neural scoring slot).

The reference's per-frame "detector" is a closed-form heuristic
(video.py:54-57); BASELINE.json's north star adds batched per-frame
CNN/ViT forwards.  This module adapts either model family (ViT default,
``AVD_DETECTOR_ARCH=cnn`` for the ConvNeXt-style CNN) to the analyzer
contract:

* ``AVD_DETECTOR=1`` attaches ``video["detector"] = {"timeline": [...]}``
  (per-sampled-frame AI probabilities) to the video analyzer output —
  additive, parity-preserving;
* ``AVD_DETECTOR_BLEND=x`` (0..1) additionally blends the detector
  probability into ``timeline_ai`` (0 keeps pure heuristic parity mode);
* ``AVD_DETECTOR_CKPT`` loads orbax weights; absent, the model runs with
  seeded random init (useful for wiring/latency tests, labeled as such);
* ``AVD_DETECTOR_QUANT=1`` serves the int8 W8A8 path (models/quant.py),
  single-chip (it takes precedence over mesh sharding — the TP specs
  describe the f32 tree; vit/cnn only);
* ``AVD_DETECTOR_ARCH=temporal`` scores the sampled frames as a
  sequence (models/temporal.py::forward_clip) — each frame's score sees
  its neighbors.  Scoring runs in fixed ``AVD_TEMPORAL_WINDOW`` windows
  (default 32 frames ≈ 16 s at the 2 fps sampling — the trained
  sequence-length range) with padded tail positions MASKED out of
  attention, so scores are on-distribution, independent of clip length,
  and serving compiles exactly one scoring shape.  Streaming slabs
  (AVD_DETECTOR_SLAB, a multiple of the window by default) subdivide
  into the same windows, so streaming and batch paths agree exactly.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional

import numpy as np


def enabled() -> bool:
    return os.getenv("AVD_DETECTOR", "0") == "1"


def blend_factor() -> float:
    try:
        return min(1.0, max(0.0, float(os.getenv("AVD_DETECTOR_BLEND", "0"))))
    except ValueError:
        return 0.0


# trained-on-synthetic-curriculum checkpoints shipped with the repo
# (models/train.py; eval numbers in BASELINE.md), one per family
_WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "weights")
_DEFAULT_CKPT = os.path.join(_WEIGHTS_DIR, "detector_small")
_SHIPPED = {
    "vit": _DEFAULT_CKPT,
    "cnn": os.path.join(_WEIGHTS_DIR, "cnn_small"),
    "temporal": os.path.join(_WEIGHTS_DIR, "temporal_small"),
}


def _arch() -> str:
    """Model family: 'vit' (default), 'cnn', or 'temporal'
    (models/__init__.py)."""
    return os.getenv("AVD_DETECTOR_ARCH", "vit")


def _default_preset(arch: str) -> str:
    """Prefer the trained serving-size (224px) flagship when its shipped
    checkpoint exists; else the trained small; else the 'full'
    architecture slot random-init — ViT only; the other families
    default small."""
    if arch != "vit":
        return "small"
    if os.path.isdir(os.path.join(_WEIGHTS_DIR, "detector_full")):
        return "full"
    return "small" if os.path.isdir(_DEFAULT_CKPT) else "full"


def _shipped_ckpt(arch: str, preset: str):
    if preset == "small":
        path = _SHIPPED.get(arch)
    elif arch == "vit" and preset == "full":
        # the serving-size 224px ViT also ships trained
        path = os.path.join(_WEIGHTS_DIR, "detector_full")
    elif arch == "vit" and preset == "moe_small":
        # the expert-parallel Switch-MoE variant also ships trained
        path = os.path.join(_WEIGHTS_DIR, "moe_small")
    else:
        return None
    return path if path and os.path.isdir(path) else None


def _temperature(ckpt) -> float:
    """Post-hoc calibration temperature for the served checkpoint.

    `tools/eval_detector.py --write-calibration` fits a scalar T on the
    training families (Guo et al. 2017) and writes it to
    <ckpt>/calibration.json; serving divides logits by T before the
    sigmoid, so reported P(ai) matches empirical frequency instead of
    the raw overconfident score.  AVD_DETECTOR_TEMP overrides (any
    float; "1" disables).  Ranking (AUC, label at the 0.5 threshold
    when T>0) is unchanged — only confidence is rescaled."""
    env = os.getenv("AVD_DETECTOR_TEMP")
    if env:
        try:
            t = float(env)
            if t > 0:
                return t
        except ValueError:
            pass
        import warnings
        warnings.warn(f"AVD_DETECTOR_TEMP={env!r} invalid — using the "
                      "checkpoint calibration (or 1.0)", stacklevel=2)
    if ckpt:
        path = os.path.join(ckpt, "calibration.json")
        try:
            import json
            with open(path) as f:
                t = float(json.load(f)["temperature"])
            if t > 0:
                return t
        except (OSError, ValueError, KeyError):
            pass
    return 1.0


@functools.lru_cache(maxsize=1)
def _bundle():
    import jax
    import jax.numpy as jnp

    from avd_tpu import models
    from avd_tpu.utils import jaxtools
    jaxtools.setup()

    exported = os.getenv("AVD_DETECTOR_EXPORTED")
    if exported:
        # AOT deployment artifact (models/export.py): the serving
        # computation was lowered ahead of time with weights +
        # calibration embedded; no model code or checkpoint IO runs
        # here.  Takes precedence over every build-a-model knob below
        # (arch/preset/ckpt/quant/fused-attn are baked into the
        # artifact); serves single-chip.
        from avd_tpu.models import export as export_mod
        return export_mod.load_bundle(exported)

    arch = _arch()
    detector = models.family(arch)
    preset = os.getenv("AVD_DETECTOR_PRESET", _default_preset(arch))
    cfg = detector.make_config(preset)
    if os.getenv("AVD_ATTN_FUSED", "0") == "1":
        # fused Pallas attention (ops/pallas/attention.py): inference-
        # only, single-device programs.  ViT family only; the sharded
        # path below overrides it (GSPMD can't partition a pallas_call).
        if arch != "vit":
            raise ValueError(
                f"AVD_ATTN_FUSED=1 supports the vit family, not {arch!r}")
        if os.getenv("AVD_DETECTOR_QUANT", "0") == "1":
            raise ValueError("AVD_ATTN_FUSED=1 and AVD_DETECTOR_QUANT=1 "
                             "are mutually exclusive (the int8 forward "
                             "has its own attention)")
        import dataclasses as _dc
        cfg = _dc.replace(cfg, fused_attn=True)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    ckpt = os.getenv("AVD_DETECTOR_CKPT") or _shipped_ckpt(arch, preset)
    source = "random_init"
    if ckpt:
        params = detector.load_checkpoint(ckpt, params)
        source = ckpt
    temp = _temperature(ckpt)
    if temp != 1.0:
        source = f"{source}+T{temp:.2f}"

    # clip-based families (temporal) score the sampled-frame axis as
    # TIME through forward_clip; they serve single-chip here (their
    # scale axis is time — forward_time_sharded — not data/model)
    clip_based = hasattr(detector, "forward_clip")

    if os.getenv("AVD_DETECTOR_QUANT", "0") == "1" and arch not in (
            "vit", "cnn"):
        # silently serving bf16 while the operator believes int8 is on
        # would corrupt capacity planning; fail loudly (the detector
        # slot is additive — analysis proceeds with detector_error)
        raise ValueError(
            f"AVD_DETECTOR_QUANT=1 supports vit/cnn, not {arch!r}")
    if os.getenv("AVD_DETECTOR_QUANT", "0") == "1":
        # int8 W8A8 serving mode (models/quant.py): per-channel int8
        # weights + dynamic per-token int8 activations on the MXU.
        # Takes precedence over mesh sharding — the TP specs describe
        # the f32 tree, so the quantized model serves single-chip.
        if len(jax.devices()) > 1:
            import warnings
            warnings.warn(
                "AVD_DETECTOR_QUANT=1 serves SINGLE-CHIP: the int8 "
                f"tree has no TP/DP specs, so the other "
                f"{len(jax.devices()) - 1} visible device(s) sit idle "
                "for detector scoring. Unset AVD_DETECTOR_QUANT to "
                "shard bf16 inference over the mesh.", stacklevel=2)
        from avd_tpu.models import quant
        params = quant.quantize_params(params)
        source = f"{source}+int8"

        @jax.jit
        def probs(params, frames_f32):
            logits = quant.forward(params, frames_f32, cfg)[:, 0]
            return jax.nn.sigmoid(logits.astype(jnp.float32) / temp)

        return cfg, params, probs, source, 1

    # Inference shards over the device mesh when one exists (SURVEY §7.4:
    # detector forward under pjit, frame axis over 'data', hidden over
    # 'model'); single-chip serving is the plain jit path.
    mesh = None
    if len(jax.devices()) > 1 and not clip_based:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from avd_tpu.parallel import mesh as mesh_mod
        if getattr(cfg, "fused_attn", False):
            import dataclasses as _dc
            import warnings
            warnings.warn("AVD_ATTN_FUSED=1 is single-device-only; the "
                          "sharded detector program keeps the XLA "
                          "einsum attention", stacklevel=2)
            cfg = _dc.replace(cfg, fused_attn=False)
        mesh = mesh_mod.make_mesh(None, axes=("data", "model"))
        params = mesh_mod.shard_params(mesh, params,
                                       detector.param_specs(cfg))

        @jax.jit
        def probs_sharded(params, frames_f32):
            logits = detector.forward(params, frames_f32, cfg,
                                      sharded=True)[:, 0]
            return jax.nn.sigmoid(logits.astype(jnp.float32) / temp)

        def probs(params, frames_f32):
            frames_f32 = jax.device_put(
                frames_f32, NamedSharding(mesh, P("data")))
            with mesh:
                return probs_sharded(params, frames_f32)

        return cfg, params, probs, source, mesh.shape["data"]

    if clip_based:
        # fixed-window scoring: attention runs over AVD_TEMPORAL_WINDOW
        # frames (default 32 — the trained sequence-length range) with
        # padded tail positions MASKED out of the softmax, so scores are
        # on-distribution and independent of clip length / padding, and
        # serving compiles exactly one scoring shape.
        window = max(1, int(os.getenv("AVD_TEMPORAL_WINDOW", "32")))

        @jax.jit
        def probs(params, frames_f32, n_valid):
            mask = jnp.arange(frames_f32.shape[0]) < n_valid
            logits = detector.forward_clip(params, frames_f32, cfg,
                                           mask=mask)[:, 0]
            return jax.nn.sigmoid(logits.astype(jnp.float32) / temp)

        probs.clip_window = window
        return cfg, params, probs, source, 1

    @jax.jit
    def probs(params, frames_f32):
        logits = detector.forward(params, frames_f32, cfg)[:, 0]
        return jax.nn.sigmoid(logits.astype(jnp.float32) / temp)

    return cfg, params, probs, source, 1


def input_size() -> int:
    """Model input resolution (loads the bundle)."""
    return _bundle()[0].image_size


def clip_window():
    """Fixed scoring-window length for clip-based families (None for
    per-frame families, whose scores don't depend on grouping)."""
    return getattr(_bundle()[2], "clip_window", None)


def resize_frames(frames_bgr: np.ndarray, size: int) -> np.ndarray:
    """[N, H, W, 3] BGR uint8 → [N, size, size, 3] BGR uint8 — the
    resize half of the input prep, split out so the streaming path can
    shrink each decode chunk as it passes (bounded memory) and score
    once at the end with numerics identical to the batch path."""
    try:
        import cv2
        return np.stack([cv2.resize(f, (size, size),
                                    interpolation=cv2.INTER_AREA)
                         for f in frames_bgr])
    except ImportError:
        # nearest-neighbor fallback
        n, h, w, _ = frames_bgr.shape
        yi = (np.arange(size) * h // size)
        xi = (np.arange(size) * w // size)
        return frames_bgr[:, yi][:, :, xi]


def _prep_frames(frames_bgr: np.ndarray, size: int) -> np.ndarray:
    """[N, H, W, 3] BGR uint8 → [N, size, size, 3] RGB f32 in [0,1]."""
    rgb = resize_frames(frames_bgr, size)[..., ::-1].astype(np.float32) \
        / 255.0
    return rgb


def detector_timeline_resized(resized_bgr: np.ndarray) -> Optional[dict]:
    """detector_timeline for frames already resized to ``input_size()``
    (BGR uint8) — the streaming path's accumulation format."""
    if not enabled() or resized_bgr.shape[0] == 0:
        return None
    batch = resized_bgr[..., ::-1].astype(np.float32) / 255.0
    return _score_prepped(batch)


def detector_timeline(frames_bgr: np.ndarray) -> Optional[dict]:
    """Per-frame AI probabilities for a sampled-frame batch, or None when
    the detector is disabled or no frames exist."""
    if not enabled() or frames_bgr.shape[0] == 0:
        return None
    return _score_prepped(_prep_frames(frames_bgr, input_size()))


def _score_prepped(batch: np.ndarray) -> dict:
    """Score a prepped [N, size, size, 3] RGB f32 batch."""
    import jax.numpy as jnp

    cfg, params, probs_fn, source, min_batch = _bundle()
    window = getattr(probs_fn, "clip_window", None)
    if window:
        # clip-based family: fixed-size masked windows (one compile
        # shape; padded positions excluded from attention)
        outs = []
        for s in range(0, batch.shape[0], window):
            chunk = batch[s:s + window]
            k = chunk.shape[0]
            if k < window:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], window - k, axis=0)])
            p = np.asarray(probs_fn(params, jnp.asarray(chunk),
                                    jnp.int32(k)))[:k]
            outs.append(p)
        return {"timeline": [float(x) for x in np.concatenate(outs)],
                "weights": source}
    fixed = getattr(probs_fn, "fixed_batch", None)
    if fixed:
        # AOT-exported per-frame program: ONE lowered batch shape.
        # Chunk and pad — scores are per-frame, so grouping is
        # numerics-neutral (same property the streaming slabs rely on).
        outs = []
        for s in range(0, batch.shape[0], fixed):
            chunk = batch[s:s + fixed]
            k = chunk.shape[0]
            if k < fixed:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], fixed - k, axis=0)])
            outs.append(np.asarray(probs_fn(params, jnp.asarray(chunk)))[:k])
        return {"timeline": [float(x) for x in np.concatenate(outs)],
                "weights": source}
    # pad to a power-of-two bucket for stable compile shapes (and to a
    # multiple of the mesh's data axis when inference is sharded)
    n = batch.shape[0]
    bucket = min_batch
    while bucket < n:
        bucket *= 2
    if bucket != n:
        batch = np.concatenate(
            [batch, np.repeat(batch[-1:], bucket - n, axis=0)])
    p = np.asarray(probs_fn(params, jnp.asarray(batch)))[:n]
    return {"timeline": [float(x) for x in p], "weights": source}


def blend(timeline_ai: List[float], det: List[float]) -> List[float]:
    """Convex blend of heuristic and detector per-frame scores."""
    f = blend_factor()
    if f <= 0.0 or len(timeline_ai) != len(det):
        return timeline_ai
    return [float((1.0 - f) * h + f * d)
            for h, d in zip(timeline_ai, det)]
