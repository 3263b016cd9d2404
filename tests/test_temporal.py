"""Temporal detector family (models/temporal.py): per-frame scores with
temporal context, sequence parallelism over time via ring attention /
Ulysses (the workload that makes parallel/attention.py load-bearing,
SURVEY §2.2), training, and the scoring integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avd_tpu.models import temporal


def _cfg(**over):
    kw = dict(image_size=32, patch=16, width=128, depth=2, heads=4)
    kw.update(over)
    return temporal.TemporalConfig(**kw)


def _setup(b=2, t=8, seed=0, **over):
    cfg = _cfg(**over)
    params = temporal.init_params(jax.random.PRNGKey(seed), cfg)
    frames = jnp.asarray(np.random.default_rng(seed).random(
        (b, t, cfg.image_size, cfg.image_size, 3), np.float32))
    return cfg, params, frames


def test_forward_shape_and_finite():
    cfg, params, frames = _setup()
    out = np.asarray(temporal.forward(params, frames, cfg))
    assert out.shape == (2, 8, 1)
    assert np.isfinite(out).all()


def test_forward_clip_is_batchless_forward():
    cfg, params, frames = _setup(b=1)
    a = np.asarray(temporal.forward(params, frames, cfg)[0])
    b = np.asarray(temporal.forward_clip(params, frames[0], cfg))
    np.testing.assert_array_equal(a, b)


def test_aux_head_per_frame_and_serving_unchanged():
    """return_aux yields the training-only per-frame logits read off the
    frame embedding (the round-4 transfer fix: the spatial trunk is
    supervised directly, BASELINE.md round 4).  The aux branch must not
    perturb the serving output, and — because it sits BEFORE any
    cross-frame attention — a frame's aux logit must be independent of
    the rest of the clip (the main logits are not)."""
    cfg, params, frames = _setup()
    main = np.asarray(temporal.forward(params, frames, cfg))
    out, aux = temporal.forward(params, frames, cfg, return_aux=True)
    np.testing.assert_array_equal(main, np.asarray(out))
    assert aux.shape == main.shape and np.isfinite(np.asarray(aux)).all()
    # swap the OTHER frames: aux for frame 0 unchanged, main moves
    shuffled = jnp.concatenate([frames[:, :1], frames[:, ::-1][:, :-1]],
                               axis=1)
    out2, aux2 = temporal.forward(params, shuffled, cfg, return_aux=True)
    np.testing.assert_allclose(np.asarray(aux)[:, 0],
                               np.asarray(aux2)[:, 0], rtol=1e-6)
    assert not np.allclose(np.asarray(out)[:, 0], np.asarray(out2)[:, 0])


def test_aux_loss_contributes():
    """cfg.aux_frame_loss adds the trunk-supervision BCE term: zeroing
    it must change the loss, and both variants stay finite under grad."""
    import dataclasses
    cfg, params, frames = _setup(b=2, t=4)
    labels = jnp.asarray(np.array([[0, 1, 1, 0], [1, 0, 0, 1]], np.int32))
    cfg0 = dataclasses.replace(cfg, aux_frame_loss=0.0)
    l_aux = float(temporal.loss_fn(params, frames, labels, cfg))
    l_no = float(temporal.loss_fn(params, frames, labels, cfg0))
    assert np.isfinite(l_aux) and np.isfinite(l_no) and l_aux != l_no
    g = jax.grad(lambda p: temporal.loss_fn(p, frames, labels, cfg))(params)
    # the aux head only gets gradient through its own term
    assert np.abs(np.asarray(g["aux_w"])).sum() > 0
    g0 = jax.grad(lambda p: temporal.loss_fn(p, frames, labels, cfg0))(params)
    assert np.abs(np.asarray(g0["aux_w"])).sum() == 0


def test_temporal_context_matters():
    """The same frame in a different sequence must (generically) score
    differently — the whole point of the family."""
    cfg, params, frames = _setup(b=1, t=8)
    other = jnp.asarray(np.random.default_rng(9).random(
        frames.shape, np.float32))
    mixed = jnp.concatenate([frames[:, :1], other[:, 1:]], axis=1)
    s_a = float(temporal.forward(params, frames, cfg)[0, 0, 0])
    s_b = float(temporal.forward(params, mixed, cfg)[0, 0, 0])
    assert abs(s_a - s_b) > 1e-6


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
@pytest.mark.parametrize("impl,shards", [("ring", 8), ("ulysses", 4)])
def test_time_sharded_matches_single(impl, shards):
    from avd_tpu.parallel import mesh as mesh_mod
    cfg, params, frames = _setup(b=2, t=16)
    ref = np.asarray(temporal.forward(params, frames, cfg))
    mesh = mesh_mod.make_mesh(shards, axes=("time",))
    with mesh:
        out = jax.jit(lambda p, f: temporal.forward_time_sharded(
            p, f, cfg, mesh, impl=impl))(params, frames)
    np.testing.assert_allclose(ref, np.asarray(out), atol=2e-2)


def test_time_sharded_validation():
    from avd_tpu.parallel import mesh as mesh_mod
    if len(jax.devices()) < 8:
        pytest.skip("needs >=8 devices")
    cfg, params, frames = _setup(b=1, t=10)  # 10 % 8 != 0
    mesh = mesh_mod.make_mesh(8, axes=("time",))
    with pytest.raises(ValueError, match="not divisible"):
        temporal.forward_time_sharded(params, frames, cfg, mesh)
    cfg2, params2, frames2 = _setup(b=1, t=16, heads=4)
    with pytest.raises(ValueError, match="heads"):
        temporal.forward_time_sharded(params2, frames2, cfg2, mesh,
                                      impl="ulysses")  # 4 % 8
    with pytest.raises(ValueError, match="unknown impl"):
        mesh2 = mesh_mod.make_mesh(4, axes=("time",))
        temporal.forward_time_sharded(params2, frames2, cfg2, mesh2,
                                      impl="flash")


def test_synthetic_sequences_structure():
    rng = np.random.default_rng(0)
    frames, labels = temporal.synthetic_sequences(rng, 16, 10, 32)
    assert frames.shape == (16, 10, 32, 32, 3)
    assert labels.shape == (16, 10)
    assert set(np.unique(labels)) <= {0, 1}
    # every label row must be 0*, 1*, or a single contiguous 1-span
    for row in labels:
        d = np.diff(row.astype(int))
        assert np.sum(d == 1) <= 1 and np.sum(d == -1) <= 1


def test_training_reduces_loss():
    cfg = _cfg(width=128, depth=2)
    params = temporal.init_params(jax.random.PRNGKey(0), cfg)
    optimizer = temporal.make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(temporal.make_train_step(cfg, optimizer))

    rng = np.random.default_rng(0)
    frames, labels = temporal.synthetic_sequences(rng, 8, 6, 32)
    fb, lb = jnp.asarray(frames), jnp.asarray(labels)
    losses = []
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, fb, lb)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_scoring_integration_temporal(monkeypatch):
    from avd_tpu.models import scoring
    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.setenv("AVD_DETECTOR_ARCH", "temporal")
    scoring._bundle.cache_clear()
    try:
        frames = np.random.default_rng(0).integers(
            0, 255, (5, 48, 64, 3)).astype(np.uint8)
        out = scoring.detector_timeline(frames)
        assert out is not None and len(out["timeline"]) == 5
        assert all(0.0 <= p <= 1.0 for p in out["timeline"])
    finally:
        scoring._bundle.cache_clear()


def test_temporal_streaming_matches_batch_single_slab(tmp_path,
                                                      monkeypatch):
    """With the whole clip inside one scoring slab, the streaming path
    feeds the temporal model the identical frame sequence — detector
    timelines must match the batch path exactly.  (Across multiple
    slabs the temporal context is the slab window by design —
    models/scoring.py docstring.)"""
    from avd_tpu.analyzers import video
    from avd_tpu.ingest import probe
    from avd_tpu.models import scoring
    from tests import fixtures

    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.setenv("AVD_DETECTOR_ARCH", "temporal")
    monkeypatch.setenv("AVD_DETECTOR_SLAB", "256")
    scoring._bundle.cache_clear()
    try:
        clip = fixtures.spliced_clip(90, 96)
        path = fixtures.write_video(tmp_path / "t.mp4", clip, fps=30.0)
        meta = probe.probe_basic_meta(path)
        monkeypatch.setenv("AVD_STREAM", "1")
        out_s = video.analyze(path, meta)
        monkeypatch.setenv("AVD_STREAM", "0")
        out_b = video.analyze(path, meta)
        assert "detector" in out_s and "detector" in out_b
        np.testing.assert_allclose(out_s["detector"]["timeline"],
                                   out_b["detector"]["timeline"],
                                   rtol=0, atol=1e-6)
    finally:
        scoring._bundle.cache_clear()


def test_masked_forward_ignores_padding():
    """Real frames' scores must be identical whether the sequence is
    padded (with the pad masked out of attention) or not."""
    cfg, params, frames = _setup(b=1, t=6)
    ref = np.asarray(temporal.forward(params, frames, cfg))[:, :6]
    pad = jnp.concatenate([frames, frames[:, -1:].repeat(4, axis=1)],
                          axis=1)
    mask = jnp.arange(10) < 6
    out = np.asarray(temporal.forward(params, pad, cfg,
                                      mask=mask[None]))[:, :6]
    np.testing.assert_allclose(ref, out, atol=1e-5)
    # and WITHOUT the mask the padding contaminates real scores
    out_nomask = np.asarray(temporal.forward(params, pad, cfg))[:, :6]
    assert np.abs(ref - out_nomask).max() > 1e-5


def test_quant_rejected_for_temporal(monkeypatch):
    from avd_tpu.models import scoring
    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.setenv("AVD_DETECTOR_ARCH", "temporal")
    monkeypatch.setenv("AVD_DETECTOR_QUANT", "1")
    scoring._bundle.cache_clear()
    try:
        with pytest.raises(ValueError, match="vit/cnn"):
            scoring._bundle()
    finally:
        scoring._bundle.cache_clear()


def test_window_scoring_independent_of_clip_length(monkeypatch):
    """Fixed-window scoring: the first window's scores must be identical
    whether the clip has 40 or 72 frames (with AVD_TEMPORAL_WINDOW=8) —
    i.e. no cross-window or padding leakage."""
    from avd_tpu.models import scoring
    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.setenv("AVD_DETECTOR_ARCH", "temporal")
    monkeypatch.setenv("AVD_TEMPORAL_WINDOW", "8")
    scoring._bundle.cache_clear()
    try:
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 255, (72, 48, 64, 3)).astype(np.uint8)
        short = scoring.detector_timeline(frames[:40])
        long = scoring.detector_timeline(frames)
        np.testing.assert_allclose(short["timeline"][:40],
                                   long["timeline"][:40],
                                   rtol=0, atol=1e-6)
    finally:
        scoring._bundle.cache_clear()


def test_legacy_checkpoint_template_guard(tmp_path):
    """A pre-round-4 temporal checkpoint (frame_depth 2, no aux head)
    raises a one-line actionable error, not a raw orbax tree-structure
    stack trace (VERDICT r4 #7)."""
    cfg = temporal.make_config("small")
    new = temporal.init_params(jax.random.PRNGKey(0), cfg)
    legacy = {k: v for k, v in new.items() if k not in ("aux_w", "aux_b")}
    legacy["frame_layers"] = new["frame_layers"][:2]
    path = str(tmp_path / "old_ckpt")
    temporal.save_checkpoint(path, jax.device_get(legacy))

    with pytest.raises(ValueError, match="pre-round-4 temporal checkpoint"):
        temporal.load_checkpoint(path, new)


def test_template_guard_preserves_other_errors(tmp_path):
    """A checkpoint that is NOT the legacy template (e.g. a different
    family's tree) keeps its original restore error."""
    cfg = temporal.make_config("small")
    new = temporal.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "not_temporal")
    temporal.save_checkpoint(path, {"completely": np.zeros(3),
                                    "different": np.ones(2)})
    with pytest.raises(Exception) as ei:
        temporal.load_checkpoint(path, new)
    assert "pre-round-4" not in str(ei.value)


def test_current_template_roundtrip_unaffected(tmp_path):
    cfg = temporal.make_config("small")
    p = temporal.init_params(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "ok_ckpt")
    temporal.save_checkpoint(path, jax.device_get(p))
    r = temporal.load_checkpoint(path, p)
    np.testing.assert_allclose(np.asarray(r["aux_w"]),
                               np.asarray(p["aux_w"]))
