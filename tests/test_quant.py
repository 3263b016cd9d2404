"""Int8 PTQ path (models/quant.py): arithmetic correctness, accuracy vs
the f32 forwards for both families (incl. the shipped checkpoints), MoE
rejection, and the scoring integration flag."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avd_tpu.models import cnn, detector, quant
from avd_tpu.models.train import synthetic_batch


def test_qdense_matches_manual_dequant():
    """The int8 dot must equal the explicit dequantized-integer product
    (same rounding) — verifies the arithmetic path, not just 'close'."""
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1.5, (5, 7, 64)).astype(np.float32)
    w = rng.normal(0, 0.3, (64, 48)).astype(np.float32)
    b = rng.normal(0, 0.1, (48,)).astype(np.float32)

    qw = quant.quantize_weight(jnp.asarray(w))
    got = np.asarray(quant.qdense(jnp.asarray(x), qw, jnp.asarray(b)))

    s_w = np.max(np.abs(w), axis=0) / 127.0
    w_i8 = np.round(w / s_w)
    s_x = np.max(np.abs(x), axis=-1, keepdims=True) / 127.0
    x_i8 = np.round(x / s_x)
    want = (x_i8 @ w_i8) * s_x * s_w + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.asarray(qw["w_i8"]).dtype == np.int8


def test_quantize_weight_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.5, (128, 96)).astype(np.float32)
    qw = quant.quantize_weight(jnp.asarray(w))
    deq = np.asarray(qw["w_i8"], np.float32) * np.asarray(qw["scale"])
    # per-channel symmetric int8: error ≤ scale/2 per element
    assert np.all(np.abs(deq - w) <= np.asarray(qw["scale"]) / 2 + 1e-7)


def _prob_agreement(fam, cfg, params, n=96):
    """(MAE of probabilities, label agreement) f32 vs int8 on held-out
    synthetic frames."""
    qp = quant.quantize_params(params)
    frames, _ = synthetic_batch(np.random.default_rng(123), n,
                                cfg.image_size)
    fb = jnp.asarray(frames)
    p_f32 = np.asarray(jax.nn.sigmoid(
        fam.forward(params, fb, cfg)[:, 0].astype(jnp.float32)))
    p_i8 = np.asarray(jax.nn.sigmoid(
        quant.forward(qp, fb, cfg)[:, 0].astype(jnp.float32)))
    mae = float(np.mean(np.abs(p_f32 - p_i8)))
    agree = float(np.mean((p_f32 > 0.5) == (p_i8 > 0.5)))
    return mae, agree


def test_vit_quant_tracks_f32():
    cfg = detector.make_config("small", depth=2)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    mae, agree = _prob_agreement(detector, cfg, params)
    assert mae < 0.05, mae
    assert agree >= 0.95, agree


def test_cnn_quant_tracks_f32():
    cfg = cnn.make_config("small")
    params = cnn.init_params(jax.random.PRNGKey(0), cfg)
    mae, agree = _prob_agreement(cnn, cfg, params)
    assert mae < 0.05, mae
    assert agree >= 0.95, agree


@pytest.mark.parametrize("arch", ["vit", "cnn"])
def test_shipped_checkpoint_quant_accuracy(arch):
    """The int8 path on the shipped trained checkpoints PRESERVES the
    f32 accuracy — the quantization claim is "no accuracy loss", so the
    assertion is relative to the same checkpoint's f32 accuracy on the
    checkpoint's own training distribution (train_meta.json provenance,
    written by the round-4 trainer, falling back to TRAIN_FAMILIES; the
    round-3 multi-family retrain traded a little single-family accuracy
    for transfer, so an absolute blobs-only floor no longer describes
    the shipped weights)."""
    import json
    import os

    from avd_tpu.models import scoring
    from avd_tpu.models.train import TRAIN_FAMILIES
    ckpt = scoring._shipped_ckpt(arch, "small")
    if ckpt is None:
        pytest.skip("no shipped checkpoint")
    meta_path = os.path.join(ckpt, "train_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            TRAIN_FAMILIES = tuple(json.load(f)["families"])
    from avd_tpu import models
    fam = models.family(arch)
    cfg = fam.make_config("small")
    params = fam.load_checkpoint(
        ckpt, fam.init_params(jax.random.PRNGKey(0), cfg))
    qp = quant.quantize_params(params)

    rng = np.random.default_rng(999)
    frames, labels = synthetic_batch(rng, 128, cfg.image_size,
                                     families=TRAIN_FAMILIES)
    fb = jnp.asarray(frames)
    p32 = np.asarray(jax.nn.sigmoid(
        fam.forward(params, fb, cfg)[:, 0].astype(jnp.float32)))
    p8 = np.asarray(jax.nn.sigmoid(
        quant.forward(qp, fb, cfg)[:, 0].astype(jnp.float32)))
    acc32 = float(np.mean((p32 > 0.5) == (labels == 1)))
    acc8 = float(np.mean((p8 > 0.5) == (labels == 1)))
    assert acc32 >= 0.90, acc32  # the checkpoint itself still works
    assert acc8 >= acc32 - 0.03, (acc8, acc32)  # int8 preserves it


def test_moe_rejected():
    cfg = detector.ViTConfig(image_size=32, patch=16, width=64, depth=1,
                             heads=2, n_experts=2)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="MoE"):
        quant.quantize_params(params)


def test_unknown_tree_rejected():
    with pytest.raises(ValueError, match="unrecognized"):
        quant.quantize_params({"foo": jnp.zeros((2, 2))})


def test_scoring_integration_int8(monkeypatch):
    """AVD_DETECTOR_QUANT=1 serves the quantized model and labels the
    weights source."""
    from avd_tpu.models import scoring
    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.setenv("AVD_DETECTOR_QUANT", "1")
    scoring._bundle.cache_clear()
    try:
        frames = np.random.default_rng(0).integers(
            0, 255, (3, 48, 64, 3)).astype(np.uint8)
        out = scoring.detector_timeline(frames)
        assert out is not None and len(out["timeline"]) == 3
        assert all(0.0 <= p <= 1.0 for p in out["timeline"])
        assert out["weights"].endswith("+int8")
    finally:
        scoring._bundle.cache_clear()
