"""Fused Pallas attention (ops/pallas/attention.py) — interpret-mode
parity against the detector's XLA einsum attention, plus the serving
gate semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avd_tpu.ops.pallas import attention as pattn


def _reference(q, k, v):
    """The exact einsum pair from models/detector.py::block_forward_aux
    ([B, T, H, D] inputs, [B, T, H*D] bf16 output)."""
    b, t, h, d = q.shape
    att = jnp.einsum("bthd,bshd->bhts", q, k,
                     preferred_element_type=jnp.float32)
    att = jax.nn.softmax(att / np.sqrt(d), axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", att.astype(jnp.bfloat16), v,
                   preferred_element_type=jnp.float32)
    return o.reshape(b, t, h * d).astype(jnp.bfloat16)


@pytest.mark.parametrize("shape", [(2, 17, 3, 8), (1, 197, 6, 64)])
def test_mha_matches_einsum_reference(shape):
    b, t, h, d = shape
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(0, 1, (b, t, h, d)),
                           jnp.bfloat16) for _ in range(3))
    got = np.asarray(pattn.attention(q, k, v, interpret=True),
                     np.float32)
    want = np.asarray(_reference(q, k, v), np.float32)
    # same dtypes and accumulation precision; only reduction order may
    # differ inside the dots
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_block_forward_fused_flag_parity():
    """block_forward with cfg.fused_attn produces the same output as the
    einsum path (interpret-mode pallas under the hood on CPU)."""
    import dataclasses

    from avd_tpu.models import detector

    cfg = detector.ViTConfig(image_size=32, patch=16, width=64, depth=2,
                             heads=2)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(
        np.random.default_rng(1).random((3, 32, 32, 3), np.float32))
    want = np.asarray(detector.forward(params, frames, cfg))

    fused_cfg = dataclasses.replace(cfg, fused_attn=True)
    # CPU backend: route the kernel through interpret mode
    import functools
    orig = pattn.attention
    try:
        pattn.attention = functools.partial(orig, interpret=True)
        got = np.asarray(detector.forward(params, frames, fused_cfg))
    finally:
        pattn.attention = orig
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_scoring_gate_rejects_non_vit(monkeypatch):
    from avd_tpu.models import scoring
    monkeypatch.setenv("AVD_ATTN_FUSED", "1")
    monkeypatch.setenv("AVD_DETECTOR_ARCH", "cnn")
    scoring._bundle.cache_clear()
    with pytest.raises(ValueError, match="AVD_ATTN_FUSED"):
        scoring._bundle()
    scoring._bundle.cache_clear()


def test_scoring_gate_rejects_quant_combo(monkeypatch):
    from avd_tpu.models import scoring
    monkeypatch.setenv("AVD_ATTN_FUSED", "1")
    monkeypatch.setenv("AVD_DETECTOR_QUANT", "1")
    monkeypatch.delenv("AVD_DETECTOR_ARCH", raising=False)
    scoring._bundle.cache_clear()
    with pytest.raises(ValueError, match="mutually exclusive"):
        scoring._bundle()
    scoring._bundle.cache_clear()
