"""Jittable fusion vs the host float64 fusion on randomized inputs."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avd_tpu.analyzers import fusion as host_fusion
from avd_tpu.ops import fusion_jax


def _random_case(rng, t=None):
    t = t or int(rng.integers(3, 40))
    a = rng.random(t)
    v = rng.random(t)
    comp = str(rng.choice(["very_heavy", "heavy", "normal", "light"]))
    feats = dict(
        speech_ratio=float(rng.random()),
        tts_like=float(rng.random()),
        compression=comp,
        bpp=float(rng.random() * 0.3),
        dup_avg=float(rng.choice([0.0, 0.3])),
        flow_mean=float(rng.random() * 12),
        texture_var=float(rng.random() * 500),
        scene_change_rate=float(rng.random()),
        dup_density=float(rng.random() * 0.4),
    )
    return a, v, feats


def _host(a, v, feats):
    audio = {"timeline": a.tolist(),
             "flags_audio": {"speech_ratio": feats["speech_ratio"],
                             "tts_like": feats["tts_like"]}}
    video = {"timeline": v.tolist(),
             "summary": {k: feats[k] for k in
                         ("flow_mean", "texture_var", "scene_change_rate",
                          "dup_density")}}
    hints = {"compression": feats["compression"], "bpp": feats["bpp"],
             "dup_avg": feats["dup_avg"]}
    return host_fusion.fuse(copy.deepcopy(audio), copy.deepcopy(video),
                            hints)


def _device(a, v, feats):
    fin = fusion_jax.FusionInputs(
        speech_ratio=jnp.float32(feats["speech_ratio"]),
        tts_like=jnp.float32(feats["tts_like"]),
        compression_heavy=jnp.asarray(
            feats["compression"] in ("heavy", "very_heavy")),
        bpp=jnp.float32(feats["bpp"]),
        dup_avg=jnp.float32(feats["dup_avg"]),
        flow_mean=jnp.float32(feats["flow_mean"]),
        texture_var=jnp.float32(feats["texture_var"]),
        scene_change_rate=jnp.float32(feats["scene_change_rate"]),
        dup_density=jnp.float32(feats["dup_density"]),
    )
    out = jax.jit(fusion_jax.fuse_timelines)(
        jnp.asarray(a, jnp.float32), jnp.asarray(v, jnp.float32), fin)
    return {k: np.asarray(x) for k, x in out.items()}


def test_matches_host_fusion():
    rng = np.random.default_rng(7)
    for _ in range(50):
        a, v, feats = _random_case(rng)
        h = _host(a, v, feats)
        d = _device(a, v, feats)
        np.testing.assert_allclose(
            d["timeline_binned"], h["timeline_binned"], atol=1e-5)
        # the host rounds ai_score/confidence for the JSON
        assert abs(round(float(d["ai_score"]), 2)
                   - h["result"]["ai_score"]) <= 0.01
        assert abs(round(float(d["confidence"]), 2)
                   - h["result"]["confidence"]) <= 0.01
        peaks = np.nonzero(d["peaks_mask"])[0].tolist()
        assert peaks == h["peaks"]


def test_vmap_over_clips():
    rng = np.random.default_rng(1)
    T, B = 12, 5
    a = rng.random((B, T)).astype(np.float32)
    v = rng.random((B, T)).astype(np.float32)
    fin = fusion_jax.FusionInputs(*[jnp.zeros(B, jnp.float32)
                                    for _ in range(2)],
                                  jnp.zeros(B, bool),
                                  *[jnp.zeros(B, jnp.float32)
                                    for _ in range(6)])
    out = jax.vmap(fusion_jax.fuse_timelines)(jnp.asarray(a),
                                              jnp.asarray(v), fin)
    assert out["ai_score"].shape == (B,)
    assert out["timeline"].shape == (B, T)


def test_short_timeline_binning_passthrough():
    t = jnp.asarray([0.2, 0.8], jnp.float32)
    np.testing.assert_allclose(np.asarray(fusion_jax.bin_timeline(t)),
                               [0.2, 0.8])
