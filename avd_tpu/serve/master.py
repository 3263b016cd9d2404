"""Pre-fork worker master — the reference's Gunicorn role (gunicorn_conf.py).

Reproduced semantics:
* ``WEB_CONCURRENCY`` workers × ``GUNICORN_THREADS`` threads
  (gunicorn_conf.py:4-5; our worker is a threading server, so threads are a
  connection-concurrency cap);
* worker recycling after ``GUNICORN_MAX_REQUESTS ± jitter`` requests
  (gunicorn_conf.py:13-14) — guards against leaks on long-lived processes;
* graceful shutdown window ``GUNICORN_GRACEFUL_TIMEOUT`` then SIGKILL;
* dead workers are respawned (Gunicorn master behavior);
* access/error logs to stdout (gunicorn_conf.py:16-17).

Workers share the listening port via SO_REUSEPORT — the kernel load
balances accepts, no fd passing needed.  Each worker owns its own TPU
client; the XLA persistent compile cache (utils.jaxtools) makes respawned
workers start hot.

Run: ``python -m avd_tpu.serve.master``
"""

from __future__ import annotations

import os
import random
import signal
import sys
import time

from avd_tpu.config import get_config


def _warmup() -> None:
    """Pre-compile the default device programs before accepting traffic.

    A cold XLA/Mosaic compile of the feature program takes minutes on the
    first-ever run (then lands in the persistent cache); warming at boot
    keeps the first request inside REQUEST_TIMEOUT_S.  AVD_WARMUP=0 skips.
    """
    if os.getenv("AVD_WARMUP", "1") != "1":
        return
    if os.getenv("AVD_BACKEND", "jax") == "oracle":
        return  # CPU-only serving has nothing to precompile
    try:
        import numpy as np

        from avd_tpu.ops import video_features as vf
        if vf._prep_mode() == "host":
            import jax.numpy as jnp

            # every quarter-chunk window bucket: a cold Mosaic compile of
            # one bucket's Pallas kernels takes ~10 min — a mid-request
            # first encounter would blow REQUEST_TIMEOUT_S and produce a
            # neutral result, so tails must be warmed too.  Also flips
            # the warm flag so live requests keep the exact 180 s.
            vf.warm_device()
            if get_config().batch_window_ms > 0:
                # also warm the cross-request stacked buckets (packed)
                full = vf._DEFAULT_CHUNK + 1
                zero320 = np.zeros((full, vf._FLOW_SIZE, vf._FLOW_SIZE),
                                   np.uint8)
                zero32 = np.zeros((full, vf._HASH_SIZE, vf._HASH_SIZE),
                                  np.uint8)
                packed = vf._pack_prep_window(zero320, zero32)
                for m in (1, 2, 4):
                    fm = vf._compiled_prep_stacked_packed(m, full)
                    sp = np.broadcast_to(packed, (m,) + packed.shape)
                    np.asarray(fm(jnp.asarray(sp)))
        print(f"[worker {os.getpid()}] warmup complete", flush=True)
    except Exception as e:  # warmup must never kill a worker
        print(f"[worker {os.getpid()}] warmup skipped: {e!r}", flush=True)


def _worker_main(max_requests: int) -> None:
    """Child process: serve until the request budget is exhausted."""
    from avd_tpu.serve import app as app_mod
    from avd_tpu.serve import http as http_mod

    cfg = get_config()
    _warmup()
    host, _, port = cfg.bind.rpartition(":")
    application = app_mod.build_app()
    server = http_mod.make_server(application, host or "0.0.0.0", int(port),
                                  reuse_port=True)
    served = 0
    orig_dispatch = application.dispatch

    def counting_dispatch(req):
        nonlocal served
        served += 1
        resp = orig_dispatch(req)
        if max_requests and served >= max_requests:
            # recycle: stop accepting, master will respawn
            import threading
            threading.Thread(target=server.shutdown, daemon=True).start()
        return resp

    application.dispatch = counting_dispatch

    def term(_sig, _frm):
        import threading
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, term)
    print(f"[worker {os.getpid()}] serving on {cfg.bind} "
          f"(max_requests={max_requests})", flush=True)
    server.serve_forever()
    print(f"[worker {os.getpid()}] exiting after {served} requests",
          flush=True)
    sys.exit(0)


class Master:
    def __init__(self) -> None:
        self.cfg = get_config()
        self.workers: dict[int, float] = {}
        self.running = True

    def _budget(self) -> int:
        base = self.cfg.max_requests
        if base <= 0:
            return 0
        return base + random.randint(0, max(0, self.cfg.max_requests_jitter))

    def spawn(self) -> None:
        budget = self._budget()
        pid = os.fork()
        if pid == 0:
            try:
                _worker_main(budget)
            finally:
                os._exit(0)
        self.workers[pid] = time.time()
        print(f"[master] spawned worker {pid}", flush=True)

    def run(self) -> int:
        cfg = self.cfg

        def stop(_sig, _frm):
            self.running = False

        signal.signal(signal.SIGTERM, stop)
        signal.signal(signal.SIGINT, stop)

        for _ in range(max(1, cfg.workers)):
            self.spawn()

        while self.running:
            try:
                pid, _status = os.waitpid(-1, os.WNOHANG)
            except ChildProcessError:
                pid = 0
            if pid:
                self.workers.pop(pid, None)
                if self.running:
                    self.spawn()  # respawn recycled/dead worker
            else:
                time.sleep(0.5)

        # graceful drain (gunicorn_conf.py:10)
        deadline = time.time() + cfg.graceful_timeout_s
        for pid in list(self.workers):
            try:
                os.kill(pid, signal.SIGTERM)
            except ProcessLookupError:
                pass
        while self.workers and time.time() < deadline:
            try:
                pid, _ = os.waitpid(-1, os.WNOHANG)
            except ChildProcessError:
                break
            if pid:
                self.workers.pop(pid, None)
            else:
                time.sleep(0.2)
        for pid in list(self.workers):
            try:
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        print("[master] shutdown complete", flush=True)
        return 0


def main() -> int:
    return Master().run()


if __name__ == "__main__":
    raise SystemExit(main())
