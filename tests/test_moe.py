"""Mixture-of-experts ViT MLP (detector.ViTConfig(n_experts>0)):
Switch-style top-1 routing with per-example capacity, expert parallelism
over the 'model' mesh axis, load-balancing aux loss.

The reference has no model (SURVEY §2.2 lists EP as "absent → to be
created"); this covers the framework's EP component.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _cfg(**over):
    from avd_tpu.models import detector
    kw = dict(image_size=32, patch=16, width=256, depth=2, heads=4,
              n_experts=4)
    kw.update(over)
    return detector.ViTConfig(**kw)


def test_moe_forward_finite_and_aux():
    from avd_tpu.models import detector
    cfg = _cfg()
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(np.random.default_rng(0).random((4, 32, 32, 3),
                                                         np.float32))
    logits, aux = detector.forward(params, frames, cfg, with_aux=True)
    assert logits.shape == (4, 1)
    assert np.isfinite(np.asarray(logits)).all()
    # Switch aux loss is ≥ 1 (== 1 iff perfectly balanced) per layer
    assert float(aux) >= 0.9 * cfg.depth


def test_moe_dispatch_combine_vs_numpy_reference():
    """_moe_mlp's einsum dispatch/combine must equal a direct per-token
    loop implementing the same top-1-with-capacity semantics."""
    from avd_tpu.models import detector

    B, T, D, E, H = 2, 5, 8, 4, 16
    rng = np.random.default_rng(1)
    h = rng.standard_normal((B, T, D)).astype(np.float32)
    lp = {
        # decisive margins so fp noise can't flip the routing
        "router_w": jnp.asarray(
            10.0 * rng.standard_normal((D, E)).astype(np.float32)),
        "moe_in_w": jnp.asarray(
            rng.standard_normal((E, D, H)).astype(np.float32) * 0.3),
        "moe_in_b": jnp.zeros((E, H), jnp.float32),
        "moe_out_w": jnp.asarray(
            rng.standard_normal((E, H, D)).astype(np.float32) * 0.3),
        "moe_out_b": jnp.zeros((E, D), jnp.float32),
    }
    cfg = _cfg(n_experts=E, capacity_factor=1.25)
    # cfg.tokens is 5 for 32px/16patch, matching T
    C = cfg.expert_capacity

    y, aux = detector._moe_mlp(jnp.asarray(h, jnp.bfloat16), lp, cfg,
                               lambda x, s: x)
    y = np.asarray(y, np.float32)

    # reference loop (f32, same bf16 input quantization)
    hq = np.asarray(jnp.asarray(h, jnp.bfloat16), np.float32)
    ref = np.zeros((B, T, D), np.float32)
    for b in range(B):
        counts = {e: 0 for e in range(E)}
        logits = hq[b] @ np.asarray(lp["router_w"])
        gate = np.exp(logits - logits.max(-1, keepdims=True))
        gate /= gate.sum(-1, keepdims=True)
        for t in range(T):
            e = int(np.argmax(gate[t]))
            if counts[e] >= C:
                continue  # dropped: residual passes through, delta 0
            counts[e] += 1
            z = hq[b, t] @ np.asarray(lp["moe_in_w"][e])
            z = z * 0.5 * (1 + np.vectorize(math.erf)(
                z / np.sqrt(2)))  # exact gelu
            o = z @ np.asarray(lp["moe_out_w"][e])
            ref[b, t] = gate[t, e] * o
    np.testing.assert_allclose(y, ref, atol=0.15, rtol=0.05)


def test_moe_train_step_learns():
    from avd_tpu.models import detector
    cfg = _cfg()
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    opt = detector.make_optimizer(3e-3)
    opt_state = opt.init(params)
    step = jax.jit(detector.make_train_step(cfg, opt))
    x = jnp.asarray(np.random.default_rng(2).random((8, 32, 32, 3),
                                                    np.float32))
    y = jnp.asarray(np.arange(8) % 2)
    first = None
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, x, y)
        first = first if first is not None else float(loss)
    assert float(loss) < first


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_moe_expert_parallel_matches_single():
    """EP-sharded forward (experts over 'model') == single device, to the
    same ~2e-2 bf16 budget as the dense parity tests — NO router-margin
    boost.  Layout stability comes from the model: routing is pre-gated
    on a layout-stable function of the embedding and the f32 logits snap
    to a coarse grid before the argmax (detector._moe_mlp), so the
    discrete top-1 decision cannot be flipped by bf16 reduction-order
    noise between layouts."""
    from avd_tpu.models import detector
    from avd_tpu.parallel import mesh as mesh_mod

    cfg = _cfg()
    mesh = mesh_mod.make_mesh(8, axes=("data", "model"))
    for seed in range(3):
        params = detector.init_params(jax.random.PRNGKey(seed), cfg)
        frames = jnp.asarray(np.random.default_rng(seed).random(
            (4, 32, 32, 3), np.float32))
        single = np.asarray(detector.forward(params, frames, cfg))
        shp = mesh_mod.shard_params(mesh, params, detector.param_specs(cfg))
        fb = jax.device_put(frames, mesh_mod.batch_sharding(mesh))
        with mesh:
            out = jax.jit(lambda p, f: detector.forward(
                p, f, cfg, sharded=True))(shp, fb)
        np.testing.assert_allclose(single, np.asarray(out), atol=2e-2)


def test_moe_routing_is_layout_stable():
    """The top-1 expert assignment itself (not just the output) must be
    identical between the single-device and EP-sharded layouts — the
    pre-gating input is bitwise layout-stable, so the discrete decision
    is exactly reproducible."""
    from avd_tpu.models import detector
    from avd_tpu.parallel import mesh as mesh_mod

    cfg = _cfg()

    def assignments(params, frames, sharded):
        rx = detector._router_features(params, frames, cfg)
        out = []
        for lp in params["layers"]:
            logits = rx @ lp["router_w"]
            out.append(jnp.argmax(jnp.round(
                logits * detector._ROUTER_GRID), axis=-1))
        return jnp.stack(out)

    mesh = mesh_mod.make_mesh(8, axes=("data", "model"))
    for seed in range(3):
        params = detector.init_params(jax.random.PRNGKey(seed), cfg)
        frames = jnp.asarray(np.random.default_rng(seed).random(
            (4, 32, 32, 3), np.float32))
        single = np.asarray(assignments(params, frames, cfg))
        shp = mesh_mod.shard_params(mesh, params, detector.param_specs(cfg))
        fb = jax.device_put(frames, mesh_mod.batch_sharding(mesh))
        with mesh:
            sharded = np.asarray(jax.jit(
                lambda p, f: assignments(p, f, cfg))(shp, fb))
        np.testing.assert_array_equal(single, sharded)


def test_moe_capacity_drops_are_passthrough():
    """With capacity 1 and a router forced to a single expert, all but
    one token per example must be dropped — their block output equals
    the attention-only residual (MoE delta exactly zero)."""
    from avd_tpu.models import detector

    cfg = _cfg(capacity_factor=1e-9)  # floor → capacity 1
    assert cfg.expert_capacity == 1
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    lp = params["layers"][0]
    lp["router_w"] = jnp.zeros_like(lp["router_w"])
    # uniform (all-zero) router logits → argmax picks expert 0 everywhere
    h = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, cfg.tokens, cfg.width)), jnp.bfloat16)
    y, _ = detector._moe_mlp(h, lp, cfg, lambda x, s: x)
    y = np.asarray(y, np.float32)
    nonzero_tokens = int(np.sum(np.abs(y).sum(-1) > 1e-6))
    assert nonzero_tokens == 1  # only the first routed token fits
