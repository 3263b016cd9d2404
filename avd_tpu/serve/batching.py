"""Cross-request micro-batching queue (BASELINE.json config #5).

The reference serves one request at a time (1 worker × 1 thread,
gunicorn_conf.py:4-5); concurrent clients queue at the socket.  Here,
concurrent requests' frame windows — same (frames, H, W) signature — are
fused into a single ``[m, n, H, W]`` device program call so one chip's
forward passes are shared across HTTP requests.

Enable with ``AVD_BATCH_WINDOW_MS > 0``: a request's first window waits up
to that long for co-batchable windows from other requests before launch;
follow-up windows of an already-streaming clip keep the pipeline full, so
the added latency is at most one batch window per request.
"""

from __future__ import annotations

import concurrent.futures
import threading
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from avd_tpu.config import get_config

_BUCKETS = (1, 2, 4, 8)


def _bucket(m: int) -> int:
    for b in _BUCKETS:
        if m <= b:
            return b
    return _BUCKETS[-1]


class _Job:
    def __init__(self, windows: tuple):
        self.windows = windows  # one or more same-length window arrays
        self.future: concurrent.futures.Future = concurrent.futures.Future()


class WindowBatcher:
    """Groups feature windows by shape and runs them fused."""

    def __init__(self, window_ms: float, max_batch: int = 8):
        self.window_s = window_ms / 1000.0
        self.max_batch = max_batch
        self._lock = threading.Condition()
        self._queues: Dict[Tuple[int, int, int], List[_Job]] = {}
        self._threads: Dict[Tuple[int, int, int], threading.Thread] = {}
        self.batches_formed = 0
        self.jobs_in = 0
        self.fused_jobs = 0  # jobs that shared a device call
        self._closed = False

    def submit(self, window: np.ndarray) -> concurrent.futures.Future:
        """Device-prep job: one [N, H, W] gray window."""
        return self._enqueue(("gray",) + tuple(window.shape), (window,))

    def submit_prep(self, w320: np.ndarray,
                    w32: np.ndarray) -> concurrent.futures.Future:
        """Host-prep job: ([N,320,320], [N,32,32]) window pair."""
        return self._enqueue(("prep", w320.shape[0]), (w320, w32))

    def _enqueue(self, key, windows: tuple) -> concurrent.futures.Future:
        job = _Job(windows)
        with self._lock:
            self.jobs_in += 1
            self._queues.setdefault(key, []).append(job)
            if key not in self._threads:
                t = threading.Thread(target=self._worker, args=(key,),
                                     daemon=True, name=f"avd-batch-{key}")
                self._threads[key] = t
                t.start()
            self._lock.notify_all()
        return job.future

    def close(self) -> None:
        with self._lock:
            self._closed = True
            self._lock.notify_all()

    def _max_batch_for(self, key) -> int:
        """Fuse only full-bucket HOST-PREP windows: each (m, n) pair is a
        distinct stacked device program, and serving warmup
        (master._warmup) can only afford to precompile the full bucket's
        m ladder — a tail-length fused batch would hit a minutes-long
        cold Mosaic compile inside live requests.  Tail windows dispatch
        singly through the warmed non-stacked program.  Device-prep
        ('gray') windows never fuse at all: their stacked programs'
        shapes include the clip resolution, which warmup cannot
        enumerate, so a fused batch would hit the same mid-request
        cold-compile cliff the prep guard exists to prevent."""
        if key[0] == "prep":
            from avd_tpu.ops import video_features
            if key[1] != video_features._DEFAULT_CHUNK + 1:
                return 1
            return self.max_batch
        return 1

    # ------------------------------------------------------------------
    _IDLE_EXIT_S = 30.0  # idle workers retire; _enqueue respawns on demand

    def _worker(self, key: Tuple[int, int, int]) -> None:
        while True:
            with self._lock:
                idle_deadline = time.monotonic() + self._IDLE_EXIT_S
                while not self._queues.get(key) and not self._closed:
                    if time.monotonic() >= idle_deadline:
                        # retire instead of polling forever — device-prep
                        # keys are per-resolution, so a long-lived worker
                        # would otherwise leak one waking thread per
                        # resolution ever seen.  Deregistering under the
                        # lock makes the race with _enqueue safe: either
                        # it sees us gone and respawns, or we see its job.
                        self._threads.pop(key, None)
                        self._queues.pop(key, None)
                        return
                    self._lock.wait(timeout=1.0)
                if self._closed and not self._queues.get(key):
                    self._threads.pop(key, None)
                    return
                deadline = time.monotonic() + self.window_s
                maxb = self._max_batch_for(key)
                while (len(self._queues[key]) < maxb
                       and time.monotonic() < deadline):
                    self._lock.wait(timeout=max(
                        0.001, deadline - time.monotonic()))
                jobs = self._queues[key][:maxb]
                self._queues[key] = self._queues[key][len(jobs):]
            if jobs:
                self._run(key, jobs)

    def _run(self, key, jobs: List[_Job]) -> None:
        import jax.numpy as jnp

        from avd_tpu.ops import video_features

        m = len(jobs)
        mb = _bucket(m)

        def stack_arg(idx):
            s = np.stack([j.windows[idx] for j in jobs])
            if mb != m:
                s = np.concatenate([s, np.repeat(s[-1:], mb - m, axis=0)])
            return jnp.asarray(s)

        try:
            if key[0] == "prep":
                # packed: ONE put + ONE fetch per batch (~24 ms per
                # tunnel round trip otherwise)
                n = key[1]
                d = video_features._h2d_delta()
                packed = np.stack([video_features._pack_prep_window(
                    *j.windows, delta=d) for j in jobs])
                if m == 1 and n != video_features._DEFAULT_CHUNK + 1:
                    # tail windows ride the warmed non-stacked program
                    fn = video_features._compiled_prep_packed(n, d)
                    res = np.asarray(fn(jnp.asarray(packed[0])))[None]
                else:
                    fn = video_features._compiled_prep_stacked_packed(
                        mb, n, d)
                    if mb != m:
                        packed = np.concatenate(
                            [packed, np.repeat(packed[-1:], mb - m,
                                               axis=0)])
                    res = np.asarray(fn(jnp.asarray(packed)))  # [mb, 3(n-1)]
                self.batches_formed += 1
                if m > 1:
                    self.fused_jobs += m
                for i, job in enumerate(jobs):
                    job.future.set_result(
                        video_features._unpack_prep_out(res[i], n))
                return
            _, n, h, w = key
            fn = video_features._compiled_chunk_stacked(mb, n, h, w)
            outs = fn(stack_arg(0))
            outs = tuple(np.asarray(x) for x in outs)
            self.batches_formed += 1
            if m > 1:
                self.fused_jobs += m
            for i, job in enumerate(jobs):
                job.future.set_result(tuple(o[i] for o in outs))
        except BaseException as e:
            for job in jobs:
                if not job.future.done():
                    job.future.set_exception(e)


_ACTIVE: Optional[WindowBatcher] = None
_ACTIVE_LOCK = threading.Lock()


def active_batcher() -> Optional[WindowBatcher]:
    """Process-wide batcher, constructed on first use when enabled."""
    global _ACTIVE
    cfg = get_config()
    if cfg.batch_window_ms <= 0:
        return None
    with _ACTIVE_LOCK:
        if _ACTIVE is None:
            _ACTIVE = WindowBatcher(cfg.batch_window_ms)
        return _ACTIVE


def reset_active() -> None:
    global _ACTIVE
    with _ACTIVE_LOCK:
        if _ACTIVE is not None:
            _ACTIVE.close()
        _ACTIVE = None
