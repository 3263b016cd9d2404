"""ZeRO-1 optimizer-state sharding (parallel/zero.py) on the virtual
8-device mesh: spec derivation, actual moment placement, and step-for-step
parity with the plain replicated-optimizer path.

The reference has no training at all (SURVEY §2.2/§5 — TPU-native
framework completeness); parity here is vs our own dp/tp train step.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from avd_tpu.models import detector
from avd_tpu.models.train import synthetic_batch
from avd_tpu.parallel import mesh as mesh_mod, zero


def test_zero_spec_picks_largest_free_dim():
    # dim1 is taken by TP; dim0 (64) divides data=4 -> sharded
    assert zero.zero_spec(P(None, "model"), (64, 192), 4) \
        == P("data", "model")
    # both free: the larger one (dim1) gets the data axis
    assert zero.zero_spec(P(), (16, 64), 4) == P(None, "data")
    # tie breaks toward the leading dim
    assert zero.zero_spec(P(), (64, 64), 4) == P("data", None)
    # nothing divides evenly -> unchanged (stays replicated, not padded)
    assert zero.zero_spec(P(), (3, 5), 4) == P()
    # scalar/1-d occupied
    assert zero.zero_spec(P("model"), (8,), 4) == P("model")


def _setup(seed=0):
    mesh = mesh_mod.make_mesh(8, axes=("data", "model"))  # 4 x 2
    cfg = detector.make_config("small", width=64, depth=2, heads=2)
    params = detector.init_params(jax.random.PRNGKey(seed), cfg)
    specs = detector.param_specs(cfg)
    opt = detector.make_optimizer(1e-3)
    return mesh, cfg, params, specs, opt


def test_moments_actually_sharded_counters_replicated():
    mesh, cfg, params, specs, opt = _setup()
    opt_state = opt.init(params)
    sh = zero.zero1_state_shardings(opt_state, params, specs, mesh)

    flat_sh = jax.tree_util.tree_flatten_with_path(sh)[0]
    names = ["/".join(str(k) for k in p) for p, s in flat_sh
             if s.spec and "data" in tuple(s.spec)]
    # mu AND nu trees of the per-layer matrices ride the data axis
    assert len(names) >= 2 * 2 * 3  # >= mu+nu x depth x (qkv,proj,mlp)
    assert any("qkv_w" in n for n in names)

    # the step counter stays replicated
    placed = zero.shard_opt_state(opt_state, params, specs, mesh)
    counts = [leaf for leaf in jax.tree_util.tree_leaves(placed)
              if getattr(leaf, "ndim", None) == 0]
    assert counts, "optax adamw state should carry a step counter"
    for c in counts:
        assert c.sharding.spec == P()

    # a big moment leaf is physically split: its addressable shard is
    # 1/4 of the global array along the data-sharded dim
    flat_placed = jax.tree_util.tree_flatten_with_path(placed)[0]
    for path, leaf in flat_placed:
        if getattr(leaf, "ndim", 0) == 2 and "data" in tuple(
                leaf.sharding.spec or ()):
            shard = leaf.addressable_shards[0]
            assert shard.data.size == leaf.size // 8 or \
                shard.data.size == leaf.size // 4
            break
    else:
        raise AssertionError("no 2-d data-sharded moment found")


def test_zero1_step_matches_plain_path():
    mesh, cfg, params, specs, opt = _setup()
    step = detector.make_train_step(cfg, opt, sharded=True)

    # plain path: replicated optimizer state
    p_a = mesh_mod.shard_params(mesh, params, specs)
    s_a = opt.init(p_a)
    plain = jax.jit(step)

    # zero-1 path: moments sharded over data
    p_b = mesh_mod.shard_params(mesh, params, specs)
    s_b = zero.shard_opt_state(opt.init(p_b), p_b, specs, mesh)
    z1 = zero.zero1_jit_train_step(step, p_b, s_b, specs, mesh)

    rng = np.random.default_rng(7)
    bs = mesh_mod.batch_sharding(mesh)
    with mesh:
        for i in range(3):
            frames, labels = synthetic_batch(rng, 8, cfg.image_size,
                                             ("blobs",))
            fb = jax.device_put(jnp.asarray(frames), bs)
            lb = jax.device_put(jnp.asarray(labels), bs)
            p_a, s_a, loss_a = plain(p_a, s_a, fb, lb)
            p_b, s_b, loss_b = z1(p_b, s_b, fb, lb)
            np.testing.assert_allclose(float(loss_a), float(loss_b),
                                       rtol=1e-5, atol=1e-6)

    # moments stayed sharded across steps (out_shardings pinned)
    any_sharded = any(
        "data" in tuple(getattr(leaf, "sharding", None).spec or ())
        for leaf in jax.tree_util.tree_leaves(s_b)
        if getattr(leaf, "ndim", 0) >= 1)
    assert any_sharded

    flat_a = jax.tree_util.tree_leaves(jax.device_get(p_a))
    flat_b = jax.tree_util.tree_leaves(jax.device_get(p_b))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_train_entrypoint_zero1():
    # the CLI path end-to-end: a few steps, no checkpoint
    from avd_tpu.models import train as train_mod
    params, losses = train_mod.train(
        steps=3, batch=8, lr=1e-3, image_size=32, width=64, depth=2,
        heads=2, log_every=0, cache_samples=0, zero1=True)
    assert len(losses) == 3 and np.isfinite(losses).all()


def test_fsdp_param_specs_extend_tp():
    mesh, cfg, params, specs, opt = _setup()
    fspecs = zero.fsdp_param_specs(params, specs, mesh.shape["data"])
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_leaves(
        fspecs, is_leaf=lambda x: isinstance(x, P))
    n_data = 0
    for (path, leaf), spec in zip(flat_p, flat_s):
        if "data" in tuple(spec):
            n_data += 1
            # the data axis landed on a dim that divides evenly
            dim = tuple(spec).index("data")
            assert leaf.shape[dim] % mesh.shape["data"] == 0
    assert n_data >= 6  # qkv/proj/mlp weights in both layers


def test_fsdp_step_matches_plain_path():
    """ZeRO-3/FSDP: parameters sharded over the data axis, trained with
    the UNCHANGED step under pinned shardings — identical loss/params to
    the replicated path."""
    mesh, cfg, params, specs, opt = _setup(seed=2)
    step = detector.make_train_step(cfg, opt, sharded=True)
    fspecs = zero.fsdp_param_specs(params, specs, mesh.shape["data"])

    p_a = mesh_mod.shard_params(mesh, params, specs)
    s_a = opt.init(p_a)
    plain = jax.jit(step)

    p_b = mesh_mod.shard_params(mesh, params, fspecs)
    s_b = zero.shard_opt_state(opt.init(p_b), p_b, fspecs, mesh)
    fsdp_step = zero.zero1_jit_train_step(step, p_b, s_b, fspecs, mesh)

    rng = np.random.default_rng(11)
    bs = mesh_mod.batch_sharding(mesh)
    with mesh:
        for _ in range(2):
            frames, labels = synthetic_batch(rng, 8, cfg.image_size,
                                             ("blobs",))
            fb = jax.device_put(jnp.asarray(frames), bs)
            lb = jax.device_put(jnp.asarray(labels), bs)
            p_a, s_a, loss_a = plain(p_a, s_a, fb, lb)
            p_b, s_b, loss_b = fsdp_step(p_b, s_b, fb, lb)
            # FSDP reshapes the forward's weight layout -> bf16-level
            # loss noise (the repo's standard 2e-2 resharding budget;
            # observed 1.6e-3 on the 4-device dryrun mesh)
            np.testing.assert_allclose(float(loss_a), float(loss_b),
                                       atol=2e-2)

    # the params REALLY live sharded: a weight's addressable shard is a
    # fraction of the global array
    found = False
    for leaf in jax.tree_util.tree_leaves(p_b):
        if getattr(leaf, "ndim", 0) == 2 and "data" in tuple(
                leaf.sharding.spec or ()):
            assert leaf.addressable_shards[0].data.size < leaf.size
            found = True
            break
    assert found

    # Adam sign-normalizes first-step updates, so bf16 grad noise from
    # the layout change moves params by up to ~lr per element
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p_a)),
                    jax.tree_util.tree_leaves(jax.device_get(p_b))):
        np.testing.assert_allclose(a, b, atol=6e-3)


def test_train_entrypoint_fsdp_accum():
    """CLI path: --fsdp composed with --accum and a cosine schedule."""
    from avd_tpu.models import train as train_mod
    params, losses = train_mod.train(
        steps=4, batch=8, lr=1e-3, image_size=32, width=64, depth=2,
        heads=2, log_every=0, cache_samples=0, fsdp=True, accum=2,
        schedule="cosine", warmup=1, grad_clip=1.0, ema=0.9)
    assert len(losses) == 4 and np.isfinite(losses).all()
