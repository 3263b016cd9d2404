"""Request orchestration: probe → hints → audio ∥ video → fusion → forensic.

Mirrors the reference's ``_analyze_path`` sequence and its error-isolation
contract (/root/reference/api.py:118-170):

* each analyzer runs under a timeout; any failure substitutes the neutral
  result (0.5 timeline of ``round(duration)`` entries) and records
  ``hints.audio_error`` / ``hints.video_error`` with the exception class
  name (+ traceback when DEBUG);
* forensic failure silently drops the ``forensic`` key (api.py:167-169);
* the response dict preserves the reference's key order byte-for-byte.

Improvement over the reference: audio and video genuinely run concurrently
(the reference awaits audio before even starting video, api.py:145-146).
"""

from __future__ import annotations

import concurrent.futures
import traceback
from typing import Any, Dict, Optional

from avd_tpu.analyzers import audio as audio_an
from avd_tpu.analyzers import fusion as fusion_an
from avd_tpu.analyzers import heuristics_v2 as hx
from avd_tpu.analyzers import meta as meta_an
from avd_tpu.analyzers import video as video_an
from avd_tpu.config import get_config
from avd_tpu.ingest import probe

import threading


class _DaemonTask:
    """Run a callable on a daemon thread with a result()/timeout API.

    Daemon threads mean a timed-out analyzer (e.g. a long first-compile)
    cannot keep the process alive after the response was already produced
    with the neutral fallback.
    """

    def __init__(self, fn, *args):
        self._done = threading.Event()
        self._result = None
        self._exc: BaseException | None = None

        def runner():
            try:
                self._result = fn(*args)
            except BaseException as e:  # re-raised in result()
                self._exc = e
            finally:
                self._done.set()

        self._thread = threading.Thread(target=runner, daemon=True,
                                        name="avd-analyzer")
        self._thread.start()

    def result(self, timeout: float | None = None):
        if not self._done.wait(timeout):
            raise concurrent.futures.TimeoutError()
        if self._exc is not None:
            raise self._exc
        return self._result


def _neutral_timeline_len(meta: dict) -> int:
    return int(max(1, round(meta.get("duration") or 0.0)))


def _neutral_audio(meta: dict, exc: BaseException) -> Dict[str, Any]:
    tlen = _neutral_timeline_len(meta)
    return {"scores": {}, "flags_audio": {"error": str(exc.__class__.__name__)},
            "timeline": [0.5] * tlen}


def _neutral_video(meta: dict, exc: BaseException) -> Dict[str, Any]:
    tlen = _neutral_timeline_len(meta)
    return {"timeline": [0.5] * tlen,
            "summary": {"error": str(exc.__class__.__name__)},
            "timeline_ai": [0.5] * tlen}


def _spawn_safe(fn, path: str, meta: dict):
    """Start an analyzer on its own daemon thread.  Spawn failure (thread
    exhaustion under load) is part of the error-isolation contract — it
    must produce the neutral fallback, not fail the request — so it is
    returned as a value for _finish_safe to translate."""
    try:
        return _DaemonTask(fn, path, meta)
    except Exception as e:  # e.g. RuntimeError("can't start new thread")
        return e


def _finish_safe(task, meta: dict, neutral, err_key: str,
                 tb_key: str, deadline: float):
    """Collect an analyzer result with timeout + neutral-fallback
    (api.py:118-140).  ``deadline`` is shared by both analyzers: they
    start together, so each still gets the full per-analyzer window the
    reference grants its sequential awaits."""
    import time

    cfg = get_config()
    hints_extra: Dict[str, Any] = {}
    try:
        if isinstance(task, BaseException):
            raise task
        return task.result(
            timeout=max(0.0, deadline - time.monotonic())), hints_extra
    except Exception as e:
        hints_extra[err_key] = f"{e.__class__.__name__}"
        if cfg.debug:
            hints_extra[tb_key] = traceback.format_exc()
        return neutral(meta, e), hints_extra


def _analyzer_timeout(cfg) -> float:
    """Per-analyzer timeout: the reference's 180 s, plus a cold-start
    grace while no device feature program has executed in this process —
    first execution pays the remote program load (minutes when the
    remote compile cache is cold, measured 224 s for the 49-frame
    bucket), and timing out mid-load would silently return the neutral
    fallback.  Serving warmup flips the warm flag at boot, so live
    requests keep the exact reference behavior."""
    base = float(cfg.request_timeout_s)
    import os
    if os.getenv("AVD_BACKEND", "jax") == "oracle":
        return base  # no device programs → no load to amortize
    try:
        from avd_tpu.ops import video_features
        if not video_features.device_warmed():
            return base + float(cfg.cold_grace_s)
    except Exception:
        pass
    return base


def analyze_path(path: str, source_url: Optional[str] = None,
                 resolved_url: Optional[str] = None) -> Dict[str, Any]:
    """Full analysis of a media file → response dict (api.py:142-170)."""
    from avd_tpu.utils.metrics import COUNTERS, StageTimer

    cfg = get_config()
    timer = StageTimer()
    COUNTERS.inc("requests")

    with timer.stage("probe"):
        meta = probe.probe_basic_meta(path)
        hints = hx.compute_hints(meta, path)

    with timer.stage("analyzers"):
        import time as _time
        deadline = _time.monotonic() + _analyzer_timeout(cfg)
        # one daemon thread per analyzer (they run concurrently — an
        # improvement over the reference's sequential awaits); the shared
        # deadline still grants each the full per-analyzer window
        audio_t = _spawn_safe(audio_an.analyze, path, meta)
        video_t = _spawn_safe(video_an.analyze, path, meta)
        audio, a_hint = _finish_safe(audio_t, meta, _neutral_audio,
                                     "audio_error", "audio_traceback",
                                     deadline)
        video, v_hint = _finish_safe(video_t, meta, _neutral_video,
                                     "video_error", "video_traceback",
                                     deadline)
    hints.update(a_hint)
    hints.update(v_hint)
    COUNTERS.inc("frames_analyzed",
                 len(video.get("timeline_ai") or []))

    with timer.stage("fusion"):
        fused = fusion_an.fuse(audio, video, hints)
    out: Dict[str, Any] = {
        "ok": True,
        "meta": {**meta, "source_url": source_url,
                 "resolved_url": resolved_url},
        "hints": hints,
        "video": video,
        "audio": audio,
        "result": fused["result"],
        "timeline_binned": fused["timeline_binned"],
        "peaks": fused["peaks"],
    }
    try:
        with timer.stage("forensic"):
            forensic = meta_an.forensic_summary(path)
        if forensic:
            out["forensic"] = forensic
    except Exception:
        if cfg.debug:
            out["forensic_error"] = traceback.format_exc()
    if cfg.profile:
        out["profile"] = timer.report()
    return out
