"""Detector training loop: loss goes down on the synthetic task and the
train → checkpoint → reload → infer roundtrip works (SURVEY.md §5
checkpoint/resume: weight loading for the detector)."""

import numpy as np
import pytest

from avd_tpu.models import detector, train


def test_synthetic_batch_shapes():
    rng = np.random.default_rng(0)
    frames, labels = train.synthetic_batch(rng, 8, 32)
    assert frames.shape == (8, 32, 32, 3)
    assert frames.dtype == np.float32
    assert set(np.unique(labels)) <= {0, 1}
    assert 0.0 <= frames.min() and frames.max() <= 1.0


def test_training_learns_synthetic_task():
    params, losses = train.train(steps=60, batch=16, lr=1e-3,
                                 image_size=32, width=256, depth=2,
                                 heads=4, log_every=0)
    # fresh random batches each step → compare window means, not endpoints
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), losses[::10]
    assert np.isfinite(losses[-1])


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=2,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(3), cfg)
    ckpt = str(tmp_path / "ckpt")
    detector.save_checkpoint(ckpt, params)

    fresh = detector.init_params(jax.random.PRNGKey(99), cfg)
    restored = detector.load_checkpoint(ckpt, fresh)

    frames = jnp.asarray(
        np.random.default_rng(0).random((2, 32, 32, 3), np.float32))
    out_orig = np.asarray(detector.forward(params, frames, cfg))
    out_rest = np.asarray(detector.forward(restored, frames, cfg))
    np.testing.assert_allclose(out_orig, out_rest, atol=1e-6)
    # and differs from the unrelated fresh init
    out_fresh = np.asarray(detector.forward(fresh, frames, cfg))
    assert np.abs(out_fresh - out_orig).max() > 1e-4


def test_checkpoint_restore_sharded(tmp_path):
    """load_checkpoint_sharded restores each leaf straight onto its
    mesh shards (no replicated host copy) with values intact."""
    import jax
    import pytest

    from avd_tpu.parallel import mesh as mesh_mod

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=2,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(3), cfg)
    ckpt = str(tmp_path / "ckpt_sharded")
    detector.save_checkpoint(ckpt, jax.device_get(params))

    mesh = mesh_mod.make_mesh(8, axes=("data", "model"))
    specs = detector.param_specs(cfg)
    restored = detector.load_checkpoint_sharded(ckpt, params, mesh, specs)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    qkv = restored["layers"][0]["qkv_w"]
    assert "model" in str(qkv.sharding.spec)


def test_train_driver_pipeline_parallel():
    """--pp: GPipe pipeline-parallel training through the real driver
    on the (data, stage) virtual mesh."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from avd_tpu.models import train as train_mod
    _, losses = train_mod.train(steps=2, batch=8, image_size=32,
                                log_every=0, cache_samples=8,
                                pp_stages=4)
    assert len(losses) == 2 and all(np.isfinite(losses))


def test_remat_gradients_identical():
    """cfg.remat recomputes block forwards in the backward pass — the
    gradients must be identical to the non-remat path (same ops)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=2,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).random((4, 32, 32, 3),
                                                    np.float32))
    y = jnp.asarray(np.arange(4) % 2)
    l1, g1 = jax.value_and_grad(detector.loss_fn)(params, x, y, cfg)
    l2, g2 = jax.value_and_grad(detector.loss_fn)(
        params, x, y, dataclasses.replace(cfg, remat=True))
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_scan_forward_matches_unrolled():
    """cfg.scan rolls the layer stack into one lax.scan over stacked
    parameters — same blocks in the same order, so the forward and its
    gradients must agree with the unrolled Python loop to the usual
    ~2e-2 bf16 budget (XLA fuses the two programs differently, so
    bitwise equality is not expected on the bf16 activation path)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = detector.ViTConfig(image_size=32, patch=16, width=256, depth=3,
                             heads=4)
    params = detector.init_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.default_rng(1).random((4, 32, 32, 3),
                                                    np.float32))
    y = jnp.asarray(np.arange(4) % 2)
    base = np.asarray(detector.forward(params, x, cfg))
    for scan_cfg in (dataclasses.replace(cfg, scan=True),
                     dataclasses.replace(cfg, scan=True, remat=True)):
        out = np.asarray(detector.forward(params, x, scan_cfg))
        np.testing.assert_allclose(base, out, atol=2e-2)
    l1, g1 = jax.value_and_grad(detector.loss_fn)(params, x, y, cfg)
    l2, g2 = jax.value_and_grad(detector.loss_fn)(
        params, x, y, dataclasses.replace(cfg, scan=True, remat=True))
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=0.05)


def test_interpolate_pos_emb_resolution_transfer(tmp_path):
    """128px → 224px transfer: interpolate_pos_emb resizes ONLY the
    pos-emb grid (bilinear), keeps the cls slot, and the adapted params
    run at the new resolution; same-grid input is a no-op.  This is the
    recipe that ships the 224px flagship checkpoint past the remote
    compile blocker (train at 128, adapt, fine-tune/eval at 224)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg128 = detector.ViTConfig(image_size=128, patch=16, width=256,
                                depth=2, heads=4)
    cfg224 = dataclasses.replace(cfg128, image_size=224)
    params = detector.init_params(jax.random.PRNGKey(0), cfg128)
    adapted = detector.interpolate_pos_emb(params, cfg224)
    assert adapted["pos_emb"].shape == (cfg224.tokens, cfg128.width)
    # cls row preserved exactly; every other leaf untouched
    np.testing.assert_array_equal(np.asarray(adapted["pos_emb"][0]),
                                  np.asarray(params["pos_emb"][0]))
    assert adapted["patch_w"] is params["patch_w"]
    # runs at the new resolution
    x = jnp.asarray(np.random.default_rng(0).random((2, 224, 224, 3),
                                                    np.float32))
    out = np.asarray(detector.forward(adapted, x, cfg224))
    assert out.shape == (2, 1) and np.isfinite(out).all()
    # same grid → no-op
    same = detector.interpolate_pos_emb(params, cfg128)
    assert same is params

    # end-to-end through the train driver: a 128px checkpoint warm-starts
    # a 224px fine-tune via --init-from (grid probed automatically)
    ck = str(tmp_path / "ck128")
    detector.save_checkpoint(ck, jax.device_get(params))
    params224, losses = train.train(
        steps=2, batch=4, image_size=224, width=256, depth=2, heads=4,
        log_every=0, cache_samples=4, scan=True, init_from=ck)
    assert params224["pos_emb"].shape[0] == cfg224.tokens
    assert np.isfinite(losses).all()


@pytest.mark.parametrize("arch,preset,n,floor,acc_floor", [
    # round-4 retrains (3 families + codec aug + logit-L2 2e-2);
    # measured at n=512 in BASELINE.md round 4:
    ("vit", "small", 128, 0.80, 0.0),     # measured unseen AUC 0.978
    ("vit", "moe_small", 128, 0.70, 0.0),  # measured 0.908 (VERDICT r3 #6)
    ("vit", "full", 64, 0.90, 0.75),   # measured 0.997, acc 0.920
    ("cnn", "small", 128, 0.85, 0.0),  # measured 0.974
    # round-4 trunk-supervision fix (aux_frame_loss); measured 0.998,
    # acc 0.977 — sequences, so n counts clips of 8 frames
    ("temporal", "small", 64, 0.90, 0.80),
])
def test_shipped_detector_transfers_to_unseen_family(arch, preset, n,
                                                     floor, acc_floor):
    """Every SHIPPED per-frame checkpoint (trained on the TRAIN_FAMILIES
    curriculum) must score better than chance on the held-out 'texture'
    generator family it never saw — the generalization claim behind the
    detector slot (full table: tools/eval_detector.py, BASELINE.md).
    Floors leave sampling margin below the measured AUCs at these n.

    The flagship additionally asserts unseen-family ACCURACY at the
    shipped 0.5 threshold — the round-4 threshold-transfer claim
    (logit-L2 2e-2; BASELINE.md round 4): scores must SEPARATE at 0.5
    on out-of-family content, not merely rank."""
    import os

    from avd_tpu.models import scoring
    from tools.eval_detector import eval_checkpoint

    ckpt = scoring._shipped_ckpt(arch, preset)
    if ckpt is None or not os.path.isdir(ckpt):
        pytest.skip(f"no shipped {preset} checkpoint")
    _, fams, _, _calib, _ = eval_checkpoint(arch, preset, ckpt, n=n,
                                            jpeg_qualities=(),
                                            h264_crfs=())
    acc, auc, _ece, _ece_t = fams[train.HELDOUT_FAMILY]
    assert auc > floor, (acc, auc)
    assert acc > acc_floor, (acc, auc)
    # and it actually learned its training families
    assert fams["blobs"][1] > 0.9 and fams["geometric"][1] > 0.9, fams
    # shipped artifacts carry their provenance + calibration sidecars
    assert os.path.exists(os.path.join(ckpt, "calibration.json"))
    assert os.path.exists(os.path.join(ckpt, "train_meta.json"))


def test_train_driver_3d_pp_tp():
    """--pp 2 --pp-tp 2: the 3-D dp×pp×tp mesh through the real driver
    (GPipe ring over 'stage', manual Megatron psums over 'model')."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from avd_tpu.models import train as train_mod
    _, losses = train_mod.train(steps=2, batch=8, image_size=32,
                                log_every=0, cache_samples=8,
                                pp_stages=2, pp_tp=2)
    assert len(losses) == 2 and all(np.isfinite(losses))


def test_train_driver_temporal():
    """--arch temporal: sequence training through the real driver,
    per-frame eval helper included."""
    from avd_tpu.models import train as train_mod
    params, losses = train_mod.train(steps=2, batch=4, image_size=32,
                                     width=128, depth=2, log_every=0,
                                     cache_samples=32, arch="temporal",
                                     seq_len=4)
    assert len(losses) == 2 and all(np.isfinite(losses))
    from avd_tpu.models import temporal
    cfg = temporal.make_config("small", image_size=32, width=128, depth=2,
                               heads=4)
    acc, auc = train_mod.evaluate_sequences(params, cfg, n=16, t=4,
                                            batch=8)
    assert 0.0 <= acc <= 1.0 and 0.0 <= auc <= 1.0


def test_frame_cellular_family():
    """Family D (round 4): deterministic, in-range, and the AI/camera
    cue separation holds (camera frames carry far more high-frequency
    energy than posterized+smoothed AI frames)."""
    rng = np.random.default_rng(5)
    ai = np.stack([train._frame_cellular(np.random.default_rng(i), 64,
                                         True) for i in range(8)])
    cam = np.stack([train._frame_cellular(np.random.default_rng(i), 64,
                                          False) for i in range(8)])
    assert ai.shape == cam.shape == (8, 64, 64, 3)
    again = train._frame_cellular(np.random.default_rng(3), 64, True)
    np.testing.assert_array_equal(ai[3], again)

    def hf_energy(x):
        return float(np.mean(np.abs(np.diff(x, axis=1)))
                     + np.mean(np.abs(np.diff(x, axis=2))))

    assert hf_energy(cam) > 1.5 * hf_energy(ai)
    # and it is wired into the curriculum
    assert "cellular" in train.GENERATOR_FAMILIES
    assert "cellular" in train.TRAIN_FAMILIES
    assert train.HELDOUT_FAMILY == "texture"
    frames, labels = train.synthetic_batch(rng, 8, 32,
                                           families=("cellular",))
    assert frames.shape == (8, 32, 32, 3)


def test_logit_l2_regularizer():
    """loss_fn(logit_l2=c) == loss_fn() + c * mean(z^2) for all three
    families' losses."""
    import jax
    import jax.numpy as jnp

    cfg = detector.ViTConfig(image_size=32, patch=16, width=64, depth=1,
                             heads=2)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(
        np.random.default_rng(0).random((4, 32, 32, 3), np.float32))
    labels = jnp.asarray(np.array([0, 1, 0, 1], np.int32))
    z = np.asarray(detector.forward(params, frames, cfg))[:, 0]
    base = float(detector.loss_fn(params, frames, labels, cfg))
    reg = float(detector.loss_fn(params, frames, labels, cfg,
                                 logit_l2=0.5))
    np.testing.assert_allclose(reg - base,
                               0.5 * np.mean(z.astype(np.float64) ** 2),
                               rtol=1e-4)


def test_augment_pool_codec_selective():
    """augment_pool_codec touches exactly the selected fraction and
    leaves the rest bit-identical."""
    from avd_tpu.ingest import codec
    if not codec.available():
        pytest.skip("libav* encoder unavailable")
    rng = np.random.default_rng(0)
    frames, _ = train.synthetic_batch(rng, 16, 32,
                                      families=("blobs", "cellular"))
    out = train.augment_pool_codec(frames, 0.5, np.random.default_rng(1))
    assert out.shape == frames.shape
    changed = np.array([not np.array_equal(out[i], frames[i])
                        for i in range(16)])
    assert changed.sum() == 8
    # severity sanity: changed frames stay close-ish (no corruption)
    assert float(np.mean((out[changed] - frames[changed]) ** 2)) < 0.05
    # frac=0 is the identity
    np.testing.assert_array_equal(
        train.augment_pool_codec(frames, 0.0, rng), frames)


def test_resume_bit_compatible(tmp_path):
    """SURVEY §5 checkpoint/resume, built: a run killed after k steps
    and resumed with --resume produces BIT-IDENTICAL final params to an
    uninterrupted run (per-step derived rng + saved optimizer state)."""
    import jax

    kw = dict(batch=8, lr=1e-3, image_size=16, width=32, depth=1,
              heads=2, log_every=0, cache_samples=64, seed=11,
              families=("blobs",))
    straight, _ = train.train(steps=6, **kw)

    out = str(tmp_path / "ckpt_resume")
    train.train(steps=3, out=out, **kw)          # "killed" after 3 steps
    resumed, _ = train.train(steps=6, out=out, resume=True, **kw)

    for a, b in zip(jax.tree_util.tree_leaves(straight),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_schedule_horizon_makes_phased_cosine_match_straight(tmp_path):
    """--schedule-horizon pins the cosine decay to the TOTAL curriculum
    step count: a run split into --resume phases (each of which rebuilds
    the optimizer) follows the SAME global warmup+cosine as an
    uninterrupted run — bit-identical final params.  Without the flag
    each phase would restart its own cosine over its own --steps
    (LR sawtooth; the round-5 temporal retrain suspect)."""
    import json
    import jax

    kw = dict(batch=8, lr=1e-3, image_size=16, width=32, depth=1,
              heads=2, log_every=0, cache_samples=64, seed=13,
              families=("blobs",), schedule="cosine", warmup=2)
    straight, _ = train.train(steps=6, **kw)

    out = str(tmp_path / "ckpt_horizon")
    train.train(steps=3, out=out, schedule_horizon=6, **kw)
    resumed, _ = train.train(steps=6, out=out, resume=True,
                             schedule_horizon=6, **kw)

    for a, b in zip(jax.tree_util.tree_leaves(straight),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with open(f"{out}/train_meta.json") as f:
        assert json.load(f)["schedule_horizon"] == 6


def test_accum_k_matches_mean_grad_step():
    """optax.MultiSteps accumulation: K update() calls with micro-grads
    equal ONE inner-optimizer step with their mean — exact at the optax
    level.  (Model-level bit-parity with a true K*B batch is NOT
    attainable here: the bf16 backward's cotangents are rounded at
    1/B-dependent scales, so micro-batch grads differ from big-batch
    grads by ~bf16 eps, and Adam's first-step sign normalization
    amplifies that to lr-scale — measured, see git history.)"""
    import jax
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.asarray(np.random.default_rng(0)
                               .random((8, 8), np.float32)),
              "b": jnp.zeros((8,), jnp.float32)}
    g = [jax.tree_util.tree_map(
        lambda x, i=i: jnp.asarray(
            np.random.default_rng(10 + i).standard_normal(x.shape)
            .astype(np.float32)), params) for i in range(2)]

    tx_a = detector.make_optimizer(1e-3, accum=2)
    s_a = tx_a.init(params)
    p_a = params
    for gi in g:
        up, s_a = tx_a.update(gi, s_a, p_a)
        p_a = optax.apply_updates(p_a, up)

    tx_b = detector.make_optimizer(1e-3)
    gm = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *g)
    up, _ = tx_b.update(gm, tx_b.init(params), params)
    p_b = optax.apply_updates(params, up)

    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_accum_end_to_end_trains():
    """model-level sanity: --accum training converges on the synthetic
    task like the plain path does."""
    _, losses = train.train(steps=24, batch=8, lr=3e-3, image_size=16,
                            width=32, depth=1, heads=2, log_every=0,
                            cache_samples=64, seed=9, accum=4)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-6:]) < np.mean(losses[:6])


def test_warmup_schedule_first_step_is_identity():
    """warmup starts the LR at 0: the first optimizer step must leave
    the parameters untouched (AdamW's weight decay also rides the LR)."""
    import jax
    import jax.numpy as jnp

    cfg = detector.make_config("small", image_size=16, width=32,
                               depth=1, heads=2)
    params = detector.init_params(jax.random.PRNGKey(4), cfg)
    opt = detector.make_optimizer(1e-3, steps=10, warmup=4,
                                  schedule="cosine", grad_clip=1.0)
    step = jax.jit(detector.make_train_step(cfg, opt))
    f, y = train.synthetic_batch(np.random.default_rng(6), 4, 16,
                                 ("blobs",))
    p1, s1, loss = step(params, opt.init(params), jnp.asarray(f),
                        jnp.asarray(y))
    assert np.isfinite(float(loss))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7)
    # ...and by mid-schedule the LR is live: params move
    p, s = p1, s1
    for _ in range(4):
        p, s, _ = step(p, s, jnp.asarray(f), jnp.asarray(y))
    moved = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree_util.tree_leaves(p1),
                                jax.tree_util.tree_leaves(p)))
    assert moved > 1e-5


def test_grad_clip_bounds_update_norm():
    """with clip_by_global_norm(c) the pre-Adam grads are rescaled; a
    pathological high-LR step stays bounded instead of exploding."""
    import jax
    import jax.numpy as jnp

    cfg = detector.make_config("small", image_size=16, width=32,
                               depth=1, heads=2)
    params = detector.init_params(jax.random.PRNGKey(5), cfg)
    f, y = train.synthetic_batch(np.random.default_rng(7), 8, 16,
                                 ("blobs",))
    outs = {}
    for name, clip in (("clipped", 1e-4), ("raw", 0.0)):
        opt = detector.make_optimizer(1.0, grad_clip=clip)
        step = jax.jit(detector.make_train_step(cfg, opt))
        p, s, _ = step(params, opt.init(params), jnp.asarray(f),
                       jnp.asarray(y))
        outs[name] = p
    # Adam normalizes per-element scale, but the tiny clip floor keeps
    # the very first moments (and thus the update direction) finite and
    # different from the raw run — and both stay finite
    for p in outs.values():
        assert all(np.isfinite(np.asarray(leaf)).all()
                   for leaf in jax.tree_util.tree_leaves(p))
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(outs["clipped"]),
                             jax.tree_util.tree_leaves(outs["raw"]))]
    assert max(diffs) > 0


def test_ema_saved_and_tracks(tmp_path):
    """--ema keeps a Polyak average: saved to <out>.ema, restored by
    --resume, and numerically between init and the trained params."""
    import jax

    import os

    out = str(tmp_path / "ckpt_ema")
    kw = dict(batch=8, lr=3e-3, image_size=16, width=32, depth=1,
              heads=2, log_every=0, cache_samples=64, seed=13,
              families=("blobs",), ema=0.5)

    # killed-after-3 + resume must replay the EMA stream bit-compatibly
    straight, _ = train.train(steps=6, out=str(tmp_path / "ref"), **kw)
    ema_straight = detector.load_checkpoint(
        str(tmp_path / "ref") + ".ema", jax.device_get(straight))
    train.train(steps=3, out=out, **kw)
    resumed, _ = train.train(steps=6, out=out, resume=True, **kw)
    assert os.path.isdir(out + ".ema")
    ema_resumed = detector.load_checkpoint(out + ".ema",
                                           jax.device_get(resumed))
    for a, b in zip(jax.tree_util.tree_leaves(ema_straight),
                    jax.tree_util.tree_leaves(ema_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # EMA lags the trained params (not identical), and is finite
    flat_p = jax.tree_util.tree_leaves(jax.device_get(resumed))
    flat_e = jax.tree_util.tree_leaves(ema_resumed)
    assert any(np.abs(a - b).max() > 1e-7 for a, b in
               zip(flat_p, flat_e))
    assert all(np.isfinite(e).all() for e in flat_e)
