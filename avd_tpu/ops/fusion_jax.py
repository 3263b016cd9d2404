"""Jittable fusion core.

The production fusion runs on host in float64 (avd_tpu/analyzers/fusion.py
— exact, and timelines are tiny), but fully-on-device batched serving and
the detector training objective want the same math as a differentiable,
vmappable JAX function.  This mirrors the numeric part of the reference's
fuse (fusion.py:16-107): weights, penalties, real-footage bonuses, the
fused timeline, score, spread-based confidence and the 3-tap binning.
Label/reason strings (host-side string logic) stay out.

Scalars arrive as a flat feature vector so the whole thing vmaps over a
batch of clips.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusionInputs:
    """Per-clip scalar features consumed by the mixture logic."""

    speech_ratio: jnp.ndarray   # []
    tts_like: jnp.ndarray       # []
    compression_heavy: jnp.ndarray  # [] bool: heavy/very_heavy
    bpp: jnp.ndarray            # []
    dup_avg: jnp.ndarray        # []
    flow_mean: jnp.ndarray      # []
    texture_var: jnp.ndarray    # []
    scene_change_rate: jnp.ndarray  # []
    dup_density: jnp.ndarray    # []


def fuse_timelines(a: jnp.ndarray, v: jnp.ndarray,
                   f: FusionInputs) -> Dict[str, jnp.ndarray]:
    """Fuse equal-length audio/video timelines [T] → fused quantities.

    Returns {"timeline", "timeline_binned", "ai_score", "confidence",
    "peaks_mask"} with the reference's arithmetic (fusion.py:26-107);
    ai_score/confidence are unrounded (host rounds for the JSON).
    """
    w_audio = jnp.float32(0.65)
    w_video = jnp.float32(0.25)
    agree = jnp.sign(jnp.mean(a) - 0.5) == jnp.sign(jnp.mean(v) - 0.5)
    bonus_agree = jnp.where(agree, 0.10, 0.0)

    low_speech = f.speech_ratio < 0.25
    w_audio = jnp.where(low_speech, w_audio * 0.6, w_audio)
    w_video = jnp.where(
        low_speech, jnp.maximum(0.2, 1.0 - w_audio - bonus_agree), w_video)

    penalties = (jnp.where(f.compression_heavy, 0.05, 0.0)
                 + jnp.where(f.bpp < 0.07, 0.05, 0.0)
                 + jnp.where(f.dup_avg > 0.2, 0.05, 0.0))

    real_bonus = (
        jnp.where((f.flow_mean > 5.0) & (f.texture_var > 200.0)
                  & (f.dup_density < 0.05), -0.10, 0.0)
        + jnp.where(f.scene_change_rate > 0.7, -0.05, 0.0)
        + jnp.where((f.scene_change_rate >= 0.9) & (f.texture_var > 300.0)
                    & (f.dup_density < 0.02), -0.08, 0.0))

    damp = ((f.tts_like >= 0.95) & (f.flow_mean > 8.0)
            & (f.texture_var > 300.0) & (f.dup_density < 0.05))
    w_audio = jnp.where(damp, w_audio * 0.55, w_audio)
    w_video = jnp.where(
        damp, jnp.maximum(0.25, 1.0 - w_audio - bonus_agree), w_video)

    fused = (w_audio * a + w_video * v + bonus_agree * (a + v) / 2.0
             - penalties + real_bonus)
    fused = jnp.clip(fused, 0.0, 1.0)

    peaks_mask = (fused <= 0.25) | (fused >= 0.75)

    score = jnp.mean(fused)
    spread = jnp.std(fused)
    disagree = jnp.abs(jnp.mean(a) - jnp.mean(v))
    confidence = jnp.clip(
        0.20 + 2.2 * spread - penalties
        - 0.5 * jnp.maximum(0.0, 0.3 - disagree),
        0.10, 0.99)

    binned = bin_timeline(fused)
    return {"timeline": fused, "timeline_binned": binned,
            "ai_score": score, "confidence": confidence,
            "peaks_mask": peaks_mask}


def bin_timeline(t: jnp.ndarray) -> jnp.ndarray:
    """3-tap zero-padded moving average (fusion.py:7-14) for T >= 3;
    shorter timelines pass through like the reference."""
    if t.shape[0] < 3:
        return jnp.clip(t, 0.0, 1.0)
    left = jnp.concatenate([jnp.zeros(1, t.dtype), t[:-1]])
    right = jnp.concatenate([t[1:], jnp.zeros(1, t.dtype)])
    return jnp.clip((left + t + right) / 3.0, 0.0, 1.0)
