"""Video analyzer — public entry point.

Contract from /root/reference/app/analyzers/video.py: ``analyze(path, meta)``
returns ``{"timeline": [...], "summary": {...}, "timeline_ai": [...]}`` with
``timeline`` and ``timeline_ai`` being the *same list object* (video.py:83 —
observable because fusion pads in place), and the empty result
``{"timeline": [], "summary": {}, "timeline_ai": []}`` when the container
cannot be opened (video.py:12-13).

Architecture (TPU-first, SURVEY.md §7): the host decodes the reference's
sampled frames into one ``[N, H, W, 3]`` uint8 batch
(``avd_tpu.ingest.video_reader``); a single jitted program computes every
per-frame feature batched (``avd_tpu.ops.video_features``); summary
aggregation and timeline padding run on host in float64.

Backends (env ``AVD_BACKEND``):
    ``jax``     batched XLA/Pallas path (default)
    ``oracle``  reference-faithful numpy/cv2 loop (parity + CPU baseline)
"""

from __future__ import annotations

import os
from typing import Any, Dict

from avd_tpu.ingest import video_reader


def _empty_result() -> Dict[str, Any]:
    return {"timeline": [], "summary": {}, "timeline_ai": []}


def _backend() -> str:
    return os.getenv("AVD_BACKEND", "jax")


def analyze(path: str, meta: dict) -> Dict[str, Any]:
    # features needing the full decoded batch (freq forensics, change
    # gating) use the batch path; plain analysis — including the neural
    # detector, which accumulates per-chunk model-input-size resizes —
    # streams with bounded memory
    whole_batch_features = (os.getenv("AVD_FREQ_FORENSICS", "0") == "1"
                            or os.getenv("AVD_CHANGE_GATE", "0") == "1")
    if _backend() != "oracle" and os.getenv("AVD_STREAM", "1") == "1" \
            and not whole_batch_features:
        return _analyze_streaming(path, meta)
    fb = video_reader.read_sampled(path, meta)
    if fb is None:
        return _empty_result()
    return analyze_batch(fb)


def _detector_on() -> bool:
    from avd_tpu.models import scoring
    return scoring.enabled()


class _DetAccum:
    """Bounded-memory detector scoring for the streaming path: resized
    chunks accumulate up to one slab (AVD_DETECTOR_SLAB frames, default
    256 — ~38 MB u8 at 224 px), which is scored while the stream keeps
    draining.  Numerically identical to the batch path for BOTH family
    kinds: per-frame families are independent of grouping, and
    clip-based families score in fixed masked windows (scoring.py)
    whose boundaries this accumulator aligns to by flushing only whole
    windows mid-stream.  Host memory and each device put stay O(slab),
    not O(clip)."""

    def __init__(self):
        self.slab = max(1, int(os.getenv("AVD_DETECTOR_SLAB", "256")))
        self.error: str | None = None
        self._parts: list = []
        self._n = 0
        self._timeline: list = []
        self._weights = None

    def add(self, frames_bgr) -> None:
        if self.error:
            return
        try:
            from avd_tpu.models import scoring
            part = scoring.resize_frames(frames_bgr, scoring.input_size())
            self._parts.append(part)
            self._n += part.shape[0]
            if self._n >= self.slab:
                self._flush(final=False)
        except Exception as e:  # detector is additive — never kill the
            self.error = e.__class__.__name__  # heuristic analysis
            self._parts = []

    def _flush(self, final: bool = True) -> None:
        if not self._parts:
            return
        import numpy as np

        from avd_tpu.models import scoring
        acc = np.concatenate(self._parts)
        # clip-based families score in fixed windows (scoring.py); only
        # flush whole windows mid-stream so slab boundaries land on
        # window boundaries and streaming == batch exactly
        win = scoring.clip_window()
        if not final and win and acc.shape[0] % win:
            cut = (acc.shape[0] // win) * win
            if cut == 0:
                return
            acc, rest = acc[:cut], acc[cut:]
            self._parts, self._n = [rest], rest.shape[0]
        else:
            self._parts, self._n = [], 0
        det = scoring.detector_timeline_resized(acc)
        if det is not None:
            self._timeline.extend(det["timeline"])
            self._weights = det["weights"]

    def result(self):
        try:
            self._flush(final=True)
        except Exception as e:
            self.error = e.__class__.__name__
        if self.error or not self._timeline:
            return None
        return {"timeline": self._timeline, "weights": self._weights}


def _analyze_streaming(path: str, meta: dict) -> Dict[str, Any]:
    """File path analysis with chunked decode overlapped against async
    device dispatch — memory-bounded for long/4K clips.  When the neural
    detector is on, each chunk's frames are resized to the model input
    size as they pass (small u8 tiles instead of holding full-res
    frames) and scored in bounded slabs (_DetAccum, which keeps the
    result numerically identical to the batch path — see its
    docstring)."""
    from avd_tpu.ops import video_features
    from avd_tpu.oracle import video_ref

    holder: Dict[str, Any] = {}
    det = _DetAccum() if _detector_on() else None

    def chunks():
        for fb in video_reader.iter_sampled_chunks(path, meta, chunk=32,
                                                   copy=False):
            holder.setdefault("fb", fb)
            if det is not None and fb.frames.shape[0]:
                det.add(fb.frames)
            yield fb.frames

    try:
        feats = video_features.compute_features_streaming(chunks())
    except Exception:
        # a mid-stream native-decode failure restarts on the cv2 batch
        # path from scratch (rare; bit-exact either way)
        fb = video_reader.read_sampled(path, meta)
        if fb is None:
            return _empty_result()
        return analyze_batch(fb)
    fb = holder.get("fb")
    if fb is None:
        # no frames came out — distinguish "container can't be opened"
        # (reference returns the EMPTY result, video.py:12-13) from
        # "opened but zero decodable frames".  Probing only on this rare
        # path keeps the hot path at zero extra container opens.
        import cv2
        c = video_reader.open_capture(path)
        if c is None:
            return _empty_result()
        fps = meta.get("fps") or c.get(cv2.CAP_PROP_FPS) or 0.0
        w = meta.get("width") or int(c.get(cv2.CAP_PROP_FRAME_WIDTH) or 0)
        h = meta.get("height") or int(c.get(cv2.CAP_PROP_FRAME_HEIGHT) or 0)
        duration = meta.get("duration") or (
            c.get(cv2.CAP_PROP_FRAME_COUNT) / fps if fps > 0 else 0.0)
        c.release()
        out = video_ref.summarize(feats, w, h, fps, duration)
    else:
        out = video_ref.summarize(feats, fb.width, fb.height, fb.fps,
                                  fb.duration)
    if det is not None:
        _apply_detector(out, det.result())
        if det.error:
            out["detector_error"] = det.error
    out["timeline_ai"] = out["timeline"]
    return out


def _apply_detector(out: Dict[str, Any], det) -> None:
    """Attach the detector timeline and blend it into the heuristic
    timeline (shared by the batch and streaming paths).  Alignment uses
    the reference's last-value/truncate padding rule (video.py:73-81)."""
    from avd_tpu.models import scoring
    if det is None:
        return
    out["detector"] = det
    det_t = list(det["timeline"])
    tlen = len(out["timeline"])
    if len(det_t) < tlen:
        det_t += [det_t[-1] if det_t else 0.5] * (tlen - len(det_t))
    else:
        det_t = det_t[:tlen]
    out["timeline"] = scoring.blend(out["timeline"], det_t)


def analyze_batch(fb: video_reader.FrameBatch) -> Dict[str, Any]:
    """Analyze a pre-decoded frame batch (also used by the serving
    micro-batcher, which shares one device program across requests)."""
    if _backend() == "oracle":
        from avd_tpu.oracle import video_ref
        out = video_ref.analyze_frames(
            fb.frames, fb.width, fb.height, fb.fps, fb.duration)
    else:
        from avd_tpu.ops import video_features
        out = video_features.analyze_frames(
            fb.frames, fb.width, fb.height, fb.fps, fb.duration)

    # optional frequency-domain forensics (north-star FFT/DCT kernels;
    # additive summary key, parity output untouched when disabled)
    if os.getenv("AVD_FREQ_FORENSICS", "0") == "1" and fb.frames.size:
        from avd_tpu.ops import forensic_freq, video_features
        gray = video_features._to_gray_host(fb.frames)
        out["summary"]["freq"] = forensic_freq.summarize(gray)

    # optional neural detector (north-star slot; parity mode bypasses it;
    # additive — a detector failure must not kill the heuristic analysis)
    from avd_tpu.models import scoring
    if scoring.enabled():
        try:
            _apply_detector(out, scoring.detector_timeline(fb.frames))
        except Exception as e:
            out["detector_error"] = e.__class__.__name__

    # timeline and timeline_ai must alias (video.py:83).
    out["timeline_ai"] = out["timeline"]
    return out
