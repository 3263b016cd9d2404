"""Mesh/sharding/halo tests on the virtual 8-device CPU mesh, plus the
graft entry points (SURVEY.md §4.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avd_tpu.parallel import halo, mesh as mesh_mod


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_factor2():
    assert mesh_mod.factor2(8) == (4, 2)
    assert mesh_mod.factor2(4) == (2, 2)
    assert mesh_mod.factor2(6) == (3, 2)
    assert mesh_mod.factor2(1) == (1, 1)


def test_make_mesh_axes():
    m = mesh_mod.make_mesh(8, axes=("data", "model"))
    assert m.shape == {"data": 4, "model": 2}
    t = mesh_mod.make_mesh(8, axes=("time",))
    assert t.shape == {"time": 8}


def test_cp_frame_deltas_matches_numpy():
    m = mesh_mod.make_mesh(8, axes=("time",))
    clip = np.random.default_rng(0).random((32, 6, 6)).astype(np.float32)
    fn = halo.cp_frame_deltas(m)
    feats, valid = fn(jnp.asarray(clip))
    feats = np.asarray(feats)[np.asarray(valid)]
    ref = np.abs(np.diff(clip, axis=0)).mean(axis=(1, 2))
    np.testing.assert_allclose(feats, ref, rtol=1e-5)
    assert feats.shape[0] == 31  # N-1 real pairs


def test_cp_halo_various_device_counts():
    for n in (2, 4, 8):
        m = mesh_mod.make_mesh(n, axes=("time",))
        clip = np.random.default_rng(n).random((8 * n, 4, 4)) \
            .astype(np.float32)
        feats, valid = halo.cp_frame_deltas(m)(jnp.asarray(clip))
        got = np.asarray(feats)[np.asarray(valid)]
        ref = np.abs(np.diff(clip, axis=0)).mean(axis=(1, 2))
        np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_graft_entry_forward():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_forward_matches_single_device():
    """TP+DP sharded forward must equal the unsharded forward."""
    from avd_tpu.models import detector
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=2,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(
        np.random.default_rng(0).random((4, 32, 32, 3), np.float32))

    single = np.asarray(detector.forward(params, frames, cfg))

    mesh = mesh_mod.make_mesh(8, axes=("data", "model"))
    sp = detector.param_specs(cfg)
    sharded_params = mesh_mod.shard_params(mesh, params, sp)
    fb = jax.device_put(frames, mesh_mod.batch_sharding(mesh))
    with mesh:
        out = jax.jit(lambda p, f: detector.forward(p, f, cfg,
                                                    sharded=True))(
            sharded_params, fb)
    np.testing.assert_allclose(single, np.asarray(out), atol=2e-2)


def test_seq_parallel_forward_matches_single_device():
    """TP + Megatron sequence parallelism (residual token axis sharded
    over 'model' between TP regions; GSPMD lowers the region exits to
    reduce-scatter and entries to all-gather) must stay numerically
    equal to the unsharded forward — including the non-divisible token
    count (5 tokens over the model axis → GSPMD padding)."""
    from avd_tpu.models import detector
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=2,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(
        np.random.default_rng(0).random((4, 32, 32, 3), np.float32))

    single = np.asarray(detector.forward(params, frames, cfg))

    mesh = mesh_mod.make_mesh(8, axes=("data", "model"))
    sp = detector.param_specs(cfg)
    sharded_params = mesh_mod.shard_params(mesh, params, sp)
    fb = jax.device_put(frames, mesh_mod.batch_sharding(mesh))
    with mesh:
        out = jax.jit(lambda p, f: detector.forward(
            p, f, cfg, sharded=True, seq_sharded=True))(sharded_params, fb)
        # gradients must flow through the rs/ag layout too
        g = jax.jit(jax.grad(lambda p, f: jnp.mean(detector.forward(
            p, f, cfg, sharded=True, seq_sharded=True) ** 2)))(
            sharded_params, fb)
    np.testing.assert_allclose(single, np.asarray(out), atol=2e-2)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_train_step_reduces_loss():
    from avd_tpu.models import detector
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=2,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(1), cfg)
    opt = detector.make_optimizer(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(detector.make_train_step(cfg, opt))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((8, 32, 32, 3), np.float32))
    labels = jnp.asarray((np.arange(8) % 2))
    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, frames, labels)
        losses.append(float(loss))
    # overfitting 8 fixed samples must drive the loss down decisively
    assert np.mean(losses[-3:]) < losses[0] * 0.8, losses
    assert np.isfinite(losses[-1])


def test_cp_video_pair_features_matches_single_device(monkeypatch):
    """The PRODUCTION pair program (Farnebäck + hash Hamming) sharded
    over the time axis with a one-frame halo must match the single-device
    window path through the public compute_features() API — the serving
    pipeline's real multi-chip configuration (VERDICT r1 item 2)."""
    from avd_tpu.ops import video_features

    frames = np.random.default_rng(3).integers(
        0, 255, (19, 96, 128, 3)).astype(np.uint8)

    monkeypatch.setenv("AVD_CP", "1")
    cp = video_features.compute_features(frames)
    monkeypatch.setenv("AVD_CP", "0")
    single = video_features.compute_features(frames)

    assert cp["total"] == single["total"] == 19
    assert cp["dup"] == single["dup"]
    np.testing.assert_allclose(cp["flow_means"], single["flow_means"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cp["flow_vars"], single["flow_vars"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cp["timeline_ai"], single["timeline_ai"],
                               atol=1e-6)


def test_cp_mesh_gating(monkeypatch):
    from avd_tpu.parallel import distributed
    monkeypatch.setenv("AVD_CP", "0")
    assert distributed.cp_mesh() is None
    monkeypatch.setenv("AVD_CP", "1")
    mesh = distributed.cp_mesh()
    assert mesh is not None and mesh.shape["time"] == 8
