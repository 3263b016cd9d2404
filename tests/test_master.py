"""Pre-fork master: spawn, serve, recycle after max_requests, graceful
shutdown, and Gunicorn's runtime signal surface (SIGTTIN/SIGTTOU scale,
SIGHUP zero-downtime rolling restart) — gunicorn_conf.py semantics."""

import http.client
import json
import os
import signal
import subprocess
import sys
import time

import pytest


def _spawn_master(port, logfile, **env_over):
    env = dict(os.environ)
    env.update({
        "GUNICORN_BIND": f"127.0.0.1:{port}",
        "WEB_CONCURRENCY": "1",
        "GUNICORN_MAX_REQUESTS": "0",
        "GUNICORN_GRACEFUL_TIMEOUT": "5",
        "AVD_BACKEND": "oracle",
        "JAX_PLATFORMS": "cpu",
    })
    env.update(env_over)
    proc = subprocess.Popen(
        [sys.executable, "-m", "avd_tpu.serve.master"],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=logfile, stderr=subprocess.STDOUT, text=True)
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            status, _ = _get(port, "/healthz", timeout=1)
            if status == 200:
                return proc
        except OSError:
            time.sleep(0.3)
    proc.terminate()
    pytest.fail("master did not become ready")


def _wait_log(path, needle, timeout=20):
    deadline = time.time() + timeout
    while time.time() < deadline:
        with open(path) as f:
            text = f.read()
        if needle in text:
            return text
        time.sleep(0.2)
    pytest.fail(f"{needle!r} not seen in master log:\n{text}")


def _get(port, path, timeout=5):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("GET", path)
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, json.loads(data)


@pytest.fixture
def master_proc(tmp_path):
    port = 18472
    env = dict(os.environ)
    env.update({
        "GUNICORN_BIND": f"127.0.0.1:{port}",
        "WEB_CONCURRENCY": "2",
        "GUNICORN_MAX_REQUESTS": "5",
        "GUNICORN_MAX_REQUESTS_JITTER": "0",
        "GUNICORN_GRACEFUL_TIMEOUT": "5",
        "AVD_BACKEND": "oracle",
        "JAX_PLATFORMS": "cpu",
    })
    proc = subprocess.Popen(
        [sys.executable, "-m", "avd_tpu.serve.master"],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # wait for readiness
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            status, _ = _get(port, "/healthz", timeout=1)
            if status == 200:
                break
        except OSError:
            time.sleep(0.3)
    else:
        proc.terminate()
        pytest.fail("master did not become ready")
    yield proc, port
    if proc.poll() is None:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_master_serves_and_recycles(master_proc):
    proc, port = master_proc
    # more requests than one worker's budget: recycling + respawn must keep
    # the service available throughout
    ok = 0
    for _ in range(25):
        try:
            status, d = _get(port, "/healthz")
            if status == 200 and d["ok"]:
                ok += 1
        except OSError:
            time.sleep(0.3)
    assert ok >= 20
    assert proc.poll() is None  # master still alive


def test_master_graceful_shutdown(master_proc):
    proc, port = master_proc
    proc.send_signal(signal.SIGTERM)
    proc.wait(timeout=15)
    assert proc.returncode == 0


def test_zero_downtime_recycle():
    """ONE worker with a tiny budget: the replacement must be bound and
    warm BEFORE the old worker retires, so a continuous probe sees no
    connection failures at all (Gunicorn's recycle would gap here)."""
    port = 18473
    env = dict(os.environ)
    env.update({
        "GUNICORN_BIND": f"127.0.0.1:{port}",
        "WEB_CONCURRENCY": "1",
        "GUNICORN_MAX_REQUESTS": "3",
        "GUNICORN_MAX_REQUESTS_JITTER": "0",
        "GUNICORN_GRACEFUL_TIMEOUT": "5",
        "AVD_BACKEND": "oracle",
        "JAX_PLATFORMS": "cpu",
    })
    proc = subprocess.Popen(
        [sys.executable, "-m", "avd_tpu.serve.master"],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                status, _ = _get(port, "/healthz", timeout=1)
                if status == 200:
                    break
            except OSError:
                time.sleep(0.3)
        else:
            pytest.fail("master did not become ready")
        # a SYN hashed to the retiring socket during its final close can
        # be reset by the kernel (SO_REUSEPORT has no graceful leave);
        # one immediate retry — standard client behavior — must always
        # succeed because the replacement is already in the accept group
        hard_failures = 0
        retried = 0
        ok = 0
        for _ in range(30):  # 10 recycle cycles at budget 3
            try:
                status, d = _get(port, "/healthz", timeout=5)
            except OSError:
                retried += 1
                try:
                    status, d = _get(port, "/healthz", timeout=5)
                except OSError:
                    hard_failures += 1
                    continue
            if status == 200 and d["ok"]:
                ok += 1
            time.sleep(0.05)
        assert hard_failures == 0, \
            f"{hard_failures} hard failures during recycling"
        assert ok == 30
        assert retried <= 3, f"{retried} resets — blackhole too wide"
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
    out = proc.stdout.read()
    assert "zero-downtime recycle" in out, out


def test_sigttin_sigttou_scale(tmp_path):
    """SIGTTIN adds a worker, SIGTTOU drains one (never below 1), and
    the service stays available throughout (shared accept group)."""
    port = 18474
    log = tmp_path / "master.log"
    with open(log, "w") as lf:
        proc = _spawn_master(port, lf)
        try:
            proc.send_signal(signal.SIGTTIN)
            _wait_log(log, "scale-up to 2 workers")
            deadline = time.time() + 20
            while time.time() < deadline:
                with open(log) as f:
                    text = f.read()
                if text.count("serving on") == 2:
                    break
                time.sleep(0.2)
            assert text.count("serving on") == 2, text

            proc.send_signal(signal.SIGTTOU)
            _wait_log(log, "scale-down to 1 workers")
            _wait_log(log, "retired (scale-down)")

            proc.send_signal(signal.SIGTTOU)
            _wait_log(log, "scale-down ignored (already at 1 worker)")

            status, d = _get(port, "/healthz")
            assert status == 200 and d["ok"]
        finally:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                proc.kill()
    assert proc.returncode == 0


def test_sighup_rolling_restart(tmp_path):
    """SIGHUP replaces every worker zero-downtime: new pids serve, old
    pids retire through the recycle path, probes never hard-fail."""
    port = 18475
    log = tmp_path / "master.log"
    with open(log, "w") as lf:
        proc = _spawn_master(port, lf, WEB_CONCURRENCY="2")
        try:
            text = _wait_log(log, "serving on")
            import re
            before = set(re.findall(r"\[worker (\d+)\] serving on", text))
            assert len(before) == 2

            proc.send_signal(signal.SIGHUP)
            # continuous availability probe while the roll happens.  The
            # shared host vCPU carries 2-5x load noise (CLAUDE.md) and the
            # full suite runs other servers concurrently, so one probe is
            # allowed a few attempts before it counts as a hard failure —
            # a real availability gap fails every retry.
            hard_failures = 0
            for _ in range(40):
                for attempt in range(4):
                    try:
                        status, d = _get(port, "/healthz", timeout=5)
                        assert status == 200 and d["ok"]
                        break
                    except OSError:
                        if attempt == 3:
                            hard_failures += 1
                time.sleep(0.05)
            assert hard_failures == 0

            text = _wait_log(log, "SIGHUP: config reloaded, rolling 2 "
                                  "workers (zero-downtime, staggered")
            # both original workers retired, two replacements serving
            deadline = time.time() + 30
            while time.time() < deadline:
                with open(log) as f:
                    text = f.read()
                retired = set(re.findall(
                    r"\[master\] worker (\d+) retired \(zero-downtime",
                    text))
                if before <= retired:
                    break
                time.sleep(0.2)
            assert before <= retired, text
            after = set(re.findall(r"\[worker (\d+)\] serving on", text))
            assert len(after - before) == 2
            status, d = _get(port, "/healthz")
            assert status == 200 and d["ok"]
        finally:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                proc.kill()
    assert proc.returncode == 0


def test_warmup_covers_detector(monkeypatch):
    """AVD_DETECTOR=1 at boot: warmup must load/compile the scoring
    bundle so the first live request doesn't pay model load."""
    from avd_tpu.models import scoring
    from avd_tpu.serve import master

    calls = []
    monkeypatch.setenv("AVD_DETECTOR", "1")
    monkeypatch.setenv("AVD_WARMUP", "1")
    monkeypatch.delenv("AVD_BACKEND", raising=False)
    monkeypatch.setattr(scoring, "detector_timeline",
                        lambda frames: calls.append(frames.shape))
    master._warmup()
    assert calls == [(1, 64, 64, 3)]


def test_warmup_skips_detector_when_disabled(monkeypatch):
    from avd_tpu.models import scoring
    from avd_tpu.serve import master

    calls = []
    monkeypatch.delenv("AVD_DETECTOR", raising=False)
    monkeypatch.setenv("AVD_WARMUP", "1")
    monkeypatch.delenv("AVD_BACKEND", raising=False)
    monkeypatch.setattr(scoring, "detector_timeline",
                        lambda frames: calls.append(frames.shape))
    master._warmup()
    assert calls == []


def test_reap_stuck_kills_stale_heartbeat(monkeypatch, tmp_path):
    """GUNICORN_TIMEOUT: a worker whose heartbeat file is stale gets
    SIGKILLed; a fresh one survives; 0 disables the timer."""
    import os as _os
    import time as _time

    from avd_tpu.serve import master as m

    killed = []
    monkeypatch.setattr(m.os, "kill",
                        lambda pid, sig: killed.append((pid, sig)))
    monkeypatch.setattr(m, "_hb_path",
                        lambda pid: str(tmp_path / f"hb_{pid}"))

    mm = m.Master.__new__(m.Master)
    mm.cfg = type("C", (), {"worker_timeout_s": 10})()
    now = _time.time()
    mm.workers = {111: now - 300.0, 222: now - 300.0, 333: now - 3.0}
    # 111: stale beat; 222: fresh beat; 333: no beat but just spawned
    for pid, age in ((111, 60.0), (222, 1.0)):
        p = tmp_path / f"hb_{pid}"
        p.write_text("x")
        _os.utime(p, (now - age, now - age))

    mm._reap_stuck()
    assert [(pid, sig) for pid, sig in killed] == [(111, m.signal.SIGKILL)]

    killed.clear()
    mm.cfg = type("C", (), {"worker_timeout_s": 0})()
    mm._reap_stuck()
    assert killed == []


def test_config_warns_on_malformed_env(monkeypatch, capsys):
    from avd_tpu import config as cfg_mod
    monkeypatch.setenv("MAX_UPLOAD_BYTES", "100M")
    cfg_mod.reset_config()
    try:
        c = cfg_mod.get_config()
        assert c.max_upload_bytes == 50 * 1024 * 1024  # default kept
        assert "MAX_UPLOAD_BYTES" in capsys.readouterr().err
    finally:
        monkeypatch.delenv("MAX_UPLOAD_BYTES")
        cfg_mod.reset_config()
