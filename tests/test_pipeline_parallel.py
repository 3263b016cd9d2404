"""Pipeline parallelism (parallel/pipeline.py + detector.forward_pipelined):
GPipe schedule over the 'stage' mesh axis, alone and composed with data
parallelism, vs the single-device forward.

The reference has no model and no parallelism (SURVEY §2.2 — every
strategy "absent → to be created"); this covers the framework's PP
component on the virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _setup():
    from avd_tpu.models import detector
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=4,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(np.random.default_rng(0).random((8, 32, 32, 3),
                                                         np.float32))
    return detector, cfg, params, frames


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_pp_forward_matches_single():
    from avd_tpu.parallel import mesh as mesh_mod
    detector, cfg, params, frames = _setup()
    ref = np.asarray(detector.forward(params, frames, cfg))
    mesh = mesh_mod.make_mesh(4, axes=("stage",))
    with mesh:
        out = jax.jit(lambda p, f: detector.forward_pipelined(
            p, f, cfg, mesh, n_micro=4))(params, frames)
    np.testing.assert_allclose(ref, np.asarray(out), atol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_dp_x_pp_forward_matches_single():
    """data=2 × stage=4 composition: microbatch batch dim sharded over
    'data' while activations ring over 'stage'."""
    from avd_tpu.parallel import mesh as mesh_mod
    detector, cfg, params, frames = _setup()
    ref = np.asarray(detector.forward(params, frames, cfg))
    mesh = mesh_mod.make_mesh(8, axes=("data", "stage"), shape=(2, 4))
    with mesh:
        out = jax.jit(lambda p, f: detector.forward_pipelined(
            p, f, cfg, mesh, n_micro=4))(params, frames)
    np.testing.assert_allclose(ref, np.asarray(out), atol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_pp_backward_finite():
    """jax.grad through the GPipe scan (ppermute transposes to the
    reverse ring) — trainable, not just servable."""
    from avd_tpu.parallel import mesh as mesh_mod
    detector, cfg, params, frames = _setup()
    mesh = mesh_mod.make_mesh(4, axes=("stage",))

    def loss(p, f):
        return jnp.mean(detector.forward_pipelined(
            p, f, cfg, mesh, n_micro=4) ** 2)

    with mesh:
        g = jax.jit(jax.grad(loss))(params, frames)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # layer grads must be non-trivial (the pipeline actually ran)
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree_util.tree_leaves(g["layers"]))


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_pp_more_microbatches_than_stages():
    """n_micro > S (the bubble-amortized regime)."""
    from avd_tpu.parallel import mesh as mesh_mod
    detector, cfg, params, frames = _setup()
    ref = np.asarray(detector.forward(params, frames, cfg))
    mesh = mesh_mod.make_mesh(2, axes=("stage",))
    with mesh:
        out = jax.jit(lambda p, f: detector.forward_pipelined(
            p, f, cfg, mesh, n_micro=8))(params, frames)
    np.testing.assert_allclose(ref, np.asarray(out), atol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_pp_with_moe_layers():
    """PP over a Switch-MoE layer stack: the pre-gating features ride
    the GPipe ring as a second pytree leaf (pipeline.gpipe pytree
    state), so every stage routes on the same layout-stable f32
    features as the GSPMD path — no router boost needed (see
    tests/test_moe.py)."""
    from avd_tpu.models import detector
    from avd_tpu.parallel import mesh as mesh_mod
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=4,
                             heads=4, n_experts=4)
    params = detector.init_params(jax.random.PRNGKey(5), cfg)
    frames = jnp.asarray(np.random.default_rng(5).random((8, 32, 32, 3),
                                                         np.float32))
    ref = np.asarray(detector.forward(params, frames, cfg))
    mesh = mesh_mod.make_mesh(4, axes=("stage",))
    with mesh:
        out = jax.jit(lambda p, f: detector.forward_pipelined(
            p, f, cfg, mesh, n_micro=4))(params, frames)
    np.testing.assert_allclose(ref, np.asarray(out), atol=2e-2)


def test_pp_shape_validation():
    from avd_tpu.models import detector
    from avd_tpu.parallel import mesh as mesh_mod
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=6,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.zeros((8, 32, 32, 3), jnp.float32)
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = mesh_mod.make_mesh(4, axes=("stage",))
    with pytest.raises(ValueError, match="not divisible"):
        detector.forward_pipelined(params, frames, cfg, mesh)  # 6 % 4
    cfg2 = detector.ViTConfig(image_size=32, patch=16, width=256, depth=4,
                              heads=4)
    params2 = detector.init_params(jax.random.PRNGKey(0), cfg2)
    with pytest.raises(ValueError, match="not divisible"):
        detector.forward_pipelined(params2, jnp.zeros((6, 32, 32, 3)),
                                   cfg2, mesh, n_micro=4)  # 6 % 4


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_dp_x_pp_x_tp_forward_matches_single():
    """The full 3-D composition (data=2 × stage=2 × model=2): microbatch
    batch dim over 'data', layer stack over 'stage' (GPipe ring), each
    stage's blocks Megatron-sharded over 'model' via block_forward_tp's
    manual psums."""
    from avd_tpu.models import detector
    from avd_tpu.parallel import mesh as mesh_mod
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=4,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(np.random.default_rng(0).random((8, 32, 32, 3),
                                                         np.float32))
    ref = np.asarray(detector.forward(params, frames, cfg))
    mesh = mesh_mod.make_mesh(8, axes=("data", "stage", "model"),
                              shape=(2, 2, 2))
    with mesh:
        out = jax.jit(lambda p, f: detector.forward_pipelined(
            p, f, cfg, mesh, n_micro=4, tp=True))(params, frames)
    np.testing.assert_allclose(ref, np.asarray(out), atol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_pp_x_tp_forward_matches_single():
    """stage=2 × model=4, no data axis."""
    from avd_tpu.models import detector
    from avd_tpu.parallel import mesh as mesh_mod
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=2,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(1), cfg)
    frames = jnp.asarray(np.random.default_rng(1).random((4, 32, 32, 3),
                                                         np.float32))
    ref = np.asarray(detector.forward(params, frames, cfg))
    mesh = mesh_mod.make_mesh(8, axes=("stage", "model"), shape=(2, 4))
    with mesh:
        out = jax.jit(lambda p, f: detector.forward_pipelined(
            p, f, cfg, mesh, n_micro=2, tp=True))(params, frames)
    np.testing.assert_allclose(ref, np.asarray(out), atol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_pp_x_tp_backward_finite():
    """Gradients flow through both the GPipe ring AND the TP psums."""
    from avd_tpu.models import detector
    from avd_tpu.parallel import mesh as mesh_mod
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=4,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(np.random.default_rng(0).random((8, 32, 32, 3),
                                                         np.float32))
    mesh = mesh_mod.make_mesh(8, axes=("data", "stage", "model"),
                              shape=(2, 2, 2))

    def loss(p, f):
        return jnp.mean(detector.forward_pipelined(
            p, f, cfg, mesh, n_micro=4, tp=True) ** 2)

    with mesh:
        g = jax.jit(jax.grad(loss))(params, frames)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree_util.tree_leaves(g["layers"]))


def test_pp_tp_validation():
    from avd_tpu.models import detector
    from avd_tpu.parallel import mesh as mesh_mod
    if len(jax.devices()) < 8:
        pytest.skip("needs >=8 devices")
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=4,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.zeros((8, 32, 32, 3), jnp.float32)
    mesh = mesh_mod.make_mesh(4, axes=("stage",))
    with pytest.raises(ValueError, match="model"):
        detector.forward_pipelined(params, frames, cfg, mesh, tp=True)
    mesh3 = mesh_mod.make_mesh(8, axes=("stage", "model"), shape=(1, 8))
    with pytest.raises(ValueError, match="not divisible"):
        detector.forward_pipelined(params, frames, cfg, mesh3, tp=True)
