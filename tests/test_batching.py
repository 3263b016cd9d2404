"""Cross-request micro-batching: concurrent submissions share one device
call and produce results identical to the unbatched path
(SURVEY.md §4.5)."""

import concurrent.futures
import os
import threading

import numpy as np
import pytest

from avd_tpu import config as config_mod
from avd_tpu.serve import batching


@pytest.fixture
def batch_env():
    os.environ["AVD_BATCH_WINDOW_MS"] = "150"
    config_mod.reset_config()
    batching.reset_active()
    yield
    os.environ.pop("AVD_BATCH_WINDOW_MS", None)
    config_mod.reset_config()
    batching.reset_active()


def _window(seed, n=5, h=32, w=32):
    return np.random.default_rng(seed).integers(
        0, 256, (n, h, w), dtype=np.int64).astype(np.uint8)


def test_batched_matches_unbatched(batch_env):
    from avd_tpu.ops import video_features
    windows = [_window(i) for i in range(4)]

    # unbatched ground truth
    batching.reset_active()
    os.environ["AVD_BATCH_WINDOW_MS"] = "0"
    config_mod.reset_config()
    plain = [video_features.run_window(w) for w in windows]

    os.environ["AVD_BATCH_WINDOW_MS"] = "150"
    config_mod.reset_config()
    batching.reset_active()
    b = batching.active_batcher()
    assert b is not None
    futures = [b.submit(w) for w in windows]
    fused = [f.result(timeout=120) for f in futures]

    for p, q in zip(plain, fused):
        for pa, qa in zip(p, q):
            np.testing.assert_allclose(pa, qa, rtol=2e-5, atol=1e-5)


def test_concurrent_requests_fuse(batch_env, monkeypatch):
    """Concurrent HOST-PREP windows (the serving default) fuse into one
    stacked device call; only full-bucket lengths fuse (warmup covers
    exactly that m ladder)."""
    from avd_tpu.ops import video_features
    monkeypatch.setattr(video_features, "_DEFAULT_CHUNK", 4)  # full n = 5
    batching.reset_active()
    b = batching.active_batcher()
    rng = np.random.default_rng(7)
    barrier = threading.Barrier(4)

    def client(seed):
        w320 = rng.integers(0, 256, (5, 320, 320), np.int64) \
            .astype(np.uint8)
        w32 = rng.integers(0, 256, (5, 32, 32), np.int64).astype(np.uint8)
        barrier.wait()
        return b.submit_prep(w320, w32).result(timeout=120)

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(client, range(4)))
    assert len(results) == 4
    # all four arrived inside one batch window → they must have fused
    assert b.fused_jobs >= 2, (b.batches_formed, b.fused_jobs)
    assert b.jobs_in == 4


def test_device_prep_windows_never_fuse(batch_env):
    """Gray (device-prep) windows dispatch singly: their stacked
    programs' shapes include the clip resolution, which warmup cannot
    enumerate — fusing them would hit a minutes-long cold compile inside
    live requests (review finding)."""
    b = batching.active_batcher()
    barrier = threading.Barrier(3)

    def client(seed):
        barrier.wait()
        return b.submit(_window(seed)).result(timeout=120)

    with concurrent.futures.ThreadPoolExecutor(max_workers=3) as pool:
        results = list(pool.map(client, range(3)))
    assert len(results) == 3
    assert b.fused_jobs == 0
    assert b.jobs_in == 3


def test_prep_jobs_fuse_and_match(batch_env, monkeypatch):
    """Host-prep window pairs batch correctly too (the serving default).

    Only FULL-bucket windows fuse (tail lengths would hit unwarmed
    stacked device programs mid-request) — shrink the chunk so the test
    windows are the full bucket."""
    from avd_tpu.ops import video_features
    monkeypatch.setattr(video_features, "_DEFAULT_CHUNK", 4)  # full n = 5
    rng = np.random.default_rng(0)
    pairs = [(rng.integers(0, 256, (5, 320, 320), dtype=np.int64)
              .astype(np.uint8),
              rng.integers(0, 256, (5, 32, 32), dtype=np.int64)
              .astype(np.uint8)) for _ in range(3)]

    batching.reset_active()
    os.environ["AVD_BATCH_WINDOW_MS"] = "0"
    config_mod.reset_config()
    plain = [video_features.run_prep_window(a, b) for a, b in pairs]

    os.environ["AVD_BATCH_WINDOW_MS"] = "150"
    config_mod.reset_config()
    batching.reset_active()
    b = batching.active_batcher()
    futures = [b.submit_prep(x, y) for x, y in pairs]
    fused = [f.result(timeout=120) for f in futures]
    for p, q in zip(plain, fused):
        for pa, qa in zip(p, q):
            np.testing.assert_allclose(pa, qa, rtol=2e-5, atol=1e-5)
    assert b.fused_jobs >= 2


def test_tail_windows_do_not_fuse(batch_env):
    """Tail-length prep windows dispatch singly through the warmed
    non-stacked program — fusing them would compile a cold stacked
    shape inside live requests."""
    from avd_tpu.ops import video_features
    rng = np.random.default_rng(1)
    n = 5
    assert n != video_features._DEFAULT_CHUNK + 1
    pairs = [(rng.integers(0, 256, (n, 320, 320), dtype=np.int64)
              .astype(np.uint8),
              rng.integers(0, 256, (n, 32, 32), dtype=np.int64)
              .astype(np.uint8)) for _ in range(3)]
    plain = [video_features.run_prep_window(a, b) for a, b in pairs]
    os.environ["AVD_BATCH_WINDOW_MS"] = "150"
    config_mod.reset_config()
    batching.reset_active()
    b = batching.active_batcher()
    futures = [b.submit_prep(x, y) for x, y in pairs]
    fused = [f.result(timeout=120) for f in futures]
    for p, q in zip(plain, fused):
        for pa, qa in zip(p, q):
            np.testing.assert_allclose(pa, qa, rtol=2e-5, atol=1e-5)
    assert b.fused_jobs == 0  # every tail job ran solo


def test_disabled_returns_none():
    os.environ["AVD_BATCH_WINDOW_MS"] = "0"
    config_mod.reset_config()
    batching.reset_active()
    assert batching.active_batcher() is None
    config_mod.reset_config()
