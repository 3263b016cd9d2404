"""Sampled-frame extraction.

The reference decodes every frame with ``cap.grab()`` and retrieves every
``step``-th one (step = max(1, round(fps/2)), ~2 analyzed fps —
/root/reference/app/analyzers/video.py:19,27-33).  We keep the exact sampling
cadence and pixel source (OpenCV decode, BGR uint8) but invert the
architecture: instead of computing features inside the decode loop, all
sampled frames are stacked into one ``[N, H, W, 3]`` batch that a single
jitted TPU program consumes.  The host does decode only.

For long/4K clips a chunked iterator keeps host memory bounded and lets
decode overlap device compute (double buffering happens in the pipeline).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional

import numpy as np


@dataclasses.dataclass
class FrameBatch:
    """A batch of sampled frames plus decode bookkeeping."""

    frames: np.ndarray  # [N, H, W, 3] uint8, BGR (matches cv2 decode)
    sampled: int        # frames retrieved (== N)
    fps: float
    width: int
    height: int
    duration: float


def sampling_step(fps: float) -> int:
    """step = max(1, round((fps or 30)/2)) — video.py:19."""
    return max(1, int(round((fps or 30) / 2)))


def open_capture(path: str):
    import cv2
    cap = cv2.VideoCapture(path)
    return cap if cap.isOpened() else None


def read_sampled(path: str, meta: dict,
                 max_frames: Optional[int] = None) -> Optional[FrameBatch]:
    """Decode and return the reference-sampled frames as one batch.

    Returns None when the container cannot be opened (the analyzer then
    emits the reference's empty result, video.py:12-13).
    """
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None
    try:
        fps = meta.get("fps") or cap.get(cv2.CAP_PROP_FPS) or 0.0
        w = meta.get("width") or int(cap.get(cv2.CAP_PROP_FRAME_WIDTH) or 0)
        h = meta.get("height") or int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT) or 0)
        duration = meta.get("duration") or (
            cap.get(cv2.CAP_PROP_FRAME_COUNT) / fps if fps > 0 else 0.0)

        step = sampling_step(fps)
        frames: List[np.ndarray] = []
        index = 0
        while True:
            if not cap.grab():
                break
            if index % step == 0:
                ok, frame = cap.retrieve()
                if not ok:
                    break
                frames.append(frame)
                if max_frames is not None and len(frames) >= max_frames:
                    break
            index += 1
    finally:
        cap.release()

    if frames:
        stacked = np.stack(frames)
    else:
        stacked = np.zeros((0, h or 1, w or 1, 3), dtype=np.uint8)
    return FrameBatch(
        frames=stacked, sampled=len(frames), fps=float(fps),
        width=int(w), height=int(h), duration=float(duration),
    )


def iter_sampled_chunks(path: str, meta: dict,
                        chunk: int = 64) -> Iterator[FrameBatch]:
    """Yield sampled frames in fixed-size chunks (streaming decode).

    Used by the pipelined analyzer for long clips: each yielded batch can be
    uploaded to device while the next chunk decodes.  The final chunk may be
    short; metadata fields repeat on each batch.

    ``AVD_FAST_SEEK=1`` replaces the reference's grab-every-frame walk
    (video.py:27-33) with CAP_PROP_POS_FRAMES seeking to the sampled
    indices only.  Frame-exact (tested), but NOT generally faster: on
    long-GOP encodes the decoder re-decodes from the previous keyframe per
    seek (measured 40 s vs 23 s walk on a 60 s mp4v clip) — it only wins
    on all-intra/short-GOP material.  Default remains the walk.
    """
    import os

    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return
    try:
        fps = meta.get("fps") or cap.get(cv2.CAP_PROP_FPS) or 0.0
        w = meta.get("width") or int(cap.get(cv2.CAP_PROP_FRAME_WIDTH) or 0)
        h = meta.get("height") or int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT) or 0)
        duration = meta.get("duration") or (
            cap.get(cv2.CAP_PROP_FRAME_COUNT) / fps if fps > 0 else 0.0)
        step = sampling_step(fps)
        fast_seek = os.getenv("AVD_FAST_SEEK", "0") == "1" and step > 1

        buf: List[np.ndarray] = []
        if fast_seek:
            index = 0
            while True:
                cap.set(cv2.CAP_PROP_POS_FRAMES, index)
                ok, frame = cap.read()
                if not ok:
                    break
                buf.append(frame)
                if len(buf) >= chunk:
                    yield FrameBatch(np.stack(buf), len(buf), float(fps),
                                     int(w), int(h), float(duration))
                    buf = []
                index += step
        else:
            index = 0
            while True:
                if not cap.grab():
                    break
                if index % step == 0:
                    ok, frame = cap.retrieve()
                    if not ok:
                        break
                    buf.append(frame)
                    if len(buf) >= chunk:
                        yield FrameBatch(np.stack(buf), len(buf), float(fps),
                                         int(w), int(h), float(duration))
                        buf = []
                index += 1
        if buf:
            yield FrameBatch(np.stack(buf), len(buf), float(fps),
                             int(w), int(h), float(duration))
    finally:
        cap.release()
