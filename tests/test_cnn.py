"""CNN detector family (models/cnn.py): forward contract, training,
TP/DP sharded parity, checkpoint roundtrip, scoring integration.

Mirrors the ViT coverage in tests/test_parallel.py /
test_detector_scoring.py — the reference has no model (SURVEY §2); this
is the north-star slot's second architecture family.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg():
    from avd_tpu.models import cnn
    return cnn.make_config("small", image_size=32, widths=(32, 64),
                           depths=(1, 1))


def test_forward_shape_and_finite():
    from avd_tpu.models import cnn
    cfg = _tiny_cfg()
    params = cnn.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).random((5, 32, 32, 3),
                                                    np.float32))
    logits = np.asarray(cnn.forward(params, x, cfg))
    assert logits.shape == (5, 1)
    assert np.isfinite(logits).all()


def test_train_step_learns():
    from avd_tpu.models import cnn
    cfg = _tiny_cfg()
    params = cnn.init_params(jax.random.PRNGKey(0), cfg)
    opt = cnn.make_optimizer(3e-3)
    opt_state = opt.init(params)
    step = jax.jit(cnn.make_train_step(cfg, opt))
    x = jnp.asarray(np.random.default_rng(1).random((8, 32, 32, 3),
                                                    np.float32))
    y = jnp.asarray(np.arange(8) % 2)
    first = None
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, x, y)
        first = first if first is not None else float(loss)
    assert float(loss) < first


def test_sharded_forward_matches_single():
    """dp×tp forward under the (data, model) mesh == single-device, to
    bf16 tolerance (same contract as the ViT test in test_parallel.py)."""
    from avd_tpu.models import cnn
    from avd_tpu.parallel import mesh as mesh_mod

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    cfg = _tiny_cfg()
    params = cnn.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(np.random.default_rng(2).random((8, 32, 32, 3),
                                                         np.float32))
    single = np.asarray(cnn.forward(params, frames, cfg))

    mesh = mesh_mod.make_mesh(8, axes=("data", "model"))
    sp = cnn.param_specs(cfg)
    sparams = mesh_mod.shard_params(mesh, params, sp)
    sframes = jax.device_put(frames, mesh_mod.batch_sharding(mesh))
    with mesh:
        out = jax.jit(lambda p, f: cnn.forward(p, f, cfg,
                                               sharded=True))(sparams,
                                                              sframes)
        out = np.asarray(out)
    np.testing.assert_allclose(single, out, atol=2e-2)


def test_sharded_train_step_runs():
    from avd_tpu.models import cnn
    from avd_tpu.parallel import mesh as mesh_mod

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    cfg = _tiny_cfg()
    mesh = mesh_mod.make_mesh(8, axes=("data", "model"))
    params = mesh_mod.shard_params(
        mesh, cnn.init_params(jax.random.PRNGKey(1), cfg),
        cnn.param_specs(cfg))
    opt = cnn.make_optimizer(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(cnn.make_train_step(cfg, opt, sharded=True))
    bs = mesh_mod.batch_sharding(mesh)
    x = jax.device_put(jnp.asarray(np.random.default_rng(3).random(
        (8, 32, 32, 3), np.float32)), bs)
    y = jax.device_put(jnp.asarray(np.arange(8) % 2), bs)
    with mesh:
        params, opt_state, loss = step(params, opt_state, x, y)
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip(tmp_path):
    from avd_tpu.models import cnn
    cfg = _tiny_cfg()
    params = cnn.init_params(jax.random.PRNGKey(4), cfg)
    path = str(tmp_path / "cnn_ckpt")
    cnn.save_checkpoint(path, jax.device_get(params))
    like = cnn.init_params(jax.random.PRNGKey(5), cfg)
    restored = cnn.load_checkpoint(path, like)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_family_registry():
    from avd_tpu import models
    assert models.family("cnn").__name__.endswith("cnn")
    assert models.family("vit").__name__.endswith("detector")
    # uniform API surface
    for name in models.FAMILIES:
        fam = models.family(name)
        for attr in ("Config", "make_config", "init_params", "forward",
                     "loss_fn", "make_train_step", "param_specs",
                     "make_optimizer", "save_checkpoint",
                     "load_checkpoint", "PRESETS"):
            assert hasattr(fam, attr), (name, attr)


def test_scoring_uses_cnn_arch(monkeypatch):
    """AVD_DETECTOR_ARCH=cnn routes the analyzer detector slot through
    the CNN family, loading the shipped cnn_small checkpoint when it
    exists (random init otherwise, labeled as such)."""
    import os

    from avd_tpu.models import scoring

    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.setenv("AVD_DETECTOR_ARCH", "cnn")
    monkeypatch.delenv("AVD_DETECTOR_CKPT", raising=False)
    monkeypatch.delenv("AVD_DETECTOR_PRESET", raising=False)
    scoring._bundle.cache_clear()
    try:
        frames = np.random.default_rng(0).integers(
            0, 255, (3, 48, 64, 3)).astype(np.uint8)
        out = scoring.detector_timeline(frames)
        assert out is not None
        assert len(out["timeline"]) == 3
        assert all(0.0 <= p <= 1.0 for p in out["timeline"])
        if os.path.isdir(scoring._SHIPPED["cnn"]):
            # shipped path, optionally tagged with the served
            # calibration temperature (scoring._temperature)
            assert "cnn_small" in out["weights"]
        else:
            assert out["weights"] == "random_init"
    finally:
        scoring._bundle.cache_clear()


def test_train_driver_cnn_arch():
    """One real optimizer step through the train driver with --arch cnn
    semantics (tiny shapes, no checkpoint)."""
    from avd_tpu.models import train as train_mod
    _, losses = train_mod.train(steps=2, batch=4, image_size=32,
                                log_every=0, cache_samples=8,
                                arch="cnn")
    assert len(losses) == 2 and all(np.isfinite(losses))
