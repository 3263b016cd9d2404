"""ctypes loader for the libav* media feeder (avd_tpu/native/src/avd_decode.cc).

Separate from the main host-kernel library because it links against the
system libavformat/libavcodec/libswscale/libswresample — deployments
without those degrade per-component: video falls back to the cv2 walk,
audio to the neutral-timeline contract (exactly what the reference does
when its ffmpeg subprocess fails, audio.py:112-118).

Why this exists (reference parity + latency):

* video: the reference decodes EVERY frame to sample ~2 fps
  (video.py:27-33).  The feeder demuxes the packet index without
  decoding, then decodes only the [keyframe .. sample] prefix of GOPs
  that contain sampled frames — bit-exact frames (same libavcodec) at a
  fraction of the decode work on keyframed streams.
* audio: the reference shells out to `ffmpeg -ac 1 -ar 16000`
  (audio.py:10-13).  This image has no ffmpeg binary; the feeder links
  the same libraries the CLI wraps, so mp4/AAC audio analysis works
  instead of hitting the neutral fallback.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from avd_tpu.native._build import SRC_DIR, ensure_so, so_site

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(SRC_DIR, "avd_decode.cc")
_SO = so_site("libavd_decode.so")

_AV_LIBS = ["-lavformat", "-lavcodec", "-lavutil", "-lswscale",
            "-lswresample"]


class MediaInfoStruct(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("fps", ctypes.c_double),
        ("n_frames", ctypes.c_int64),
        ("duration", ctypes.c_double),
        ("has_audio", ctypes.c_int32),
        ("reserved", ctypes.c_int32),
    ]


class ProbeInfoStruct(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("fps", ctypes.c_double),
        ("duration", ctypes.c_double),
        ("bit_rate", ctypes.c_int64),
        ("vcodec", ctypes.c_char * 32),
        ("acodec", ctypes.c_char * 32),
        ("format_name", ctypes.c_char * 64),
    ]


def _cmd(out: str):
    return (["g++", "-O2", "-fPIC", "-std=c++17", "-shared", "-o", out,
             _SRC] + _AV_LIBS)


def _build(force: bool = False) -> bool:
    return ensure_so(_SRC, _SO, _cmd, timeout=180, force=force)


def lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None when libav*/toolchain are unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.getenv("AVD_NATIVE_DECODE", "1") != "1":
            return None
        if not _build():
            return None
        try:
            L = _bind(ctypes.CDLL(_SO))
        except (OSError, AttributeError):
            # Truncated/corrupt cached artifact, or a stale one missing a
            # newly-added export (AttributeError): force one rebuild.
            if not _build(force=True):
                return None
            try:
                L = _bind(ctypes.CDLL(_SO))
            except (OSError, AttributeError):
                return None
        _LIB = L
        return _LIB


def _bind(L):
    """Register exports; AttributeError on a stale artifact is handled by
    lib()'s rebuild."""
    if True:
        L.avd_vdec_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.POINTER(MediaInfoStruct)]
        L.avd_vdec_open.restype = ctypes.c_void_p
        L.avd_vdec_read_sampled.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p]
        L.avd_vdec_read_sampled.restype = ctypes.c_int64
        L.avd_vdec_close.argtypes = [ctypes.c_void_p]
        L.avd_vdec_close.restype = None
        L.avd_adec_open.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                    ctypes.POINTER(ctypes.c_double)]
        L.avd_adec_open.restype = ctypes.c_void_p
        L.avd_adec_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64]
        L.avd_adec_read.restype = ctypes.c_int64
        L.avd_adec_close.argtypes = [ctypes.c_void_p]
        L.avd_adec_close.restype = None
        L.avd_mux_audio.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_int32]
        L.avd_mux_audio.restype = ctypes.c_int32
        L.avd_remux_add_audio.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32]
        L.avd_remux_add_audio.restype = ctypes.c_int32
        L.avd_probe.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ProbeInfoStruct)]
        L.avd_probe.restype = ctypes.c_int32
        L.avd_venc_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_char_p]
        L.avd_venc_write.restype = ctypes.c_int32
    return L


class VideoSampler:
    """Sampled-frame reader over the native feeder.

    Usage:
        vs = VideoSampler.open(path, step)   # None when unusable
        for frames, indices in vs.chunks(32): ...
    """

    def __init__(self, handle, info: MediaInfoStruct, step: int):
        self._h = handle
        self.width = int(info.width)
        self.height = int(info.height)
        self.fps = float(info.fps)
        self.n_frames = int(info.n_frames)
        self.duration = float(info.duration)
        self.step = step
        self._buf = None   # persistent decode target (see read())
        self._idx = None

    @classmethod
    def open(cls, path: str, step: int) -> Optional["VideoSampler"]:
        L = lib()
        if L is None:
            return None
        info = MediaInfoStruct()
        h = L.avd_vdec_open(path.encode(), step, ctypes.byref(info))
        if not h:
            return None
        if info.width <= 0 or info.height <= 0:
            L.avd_vdec_close(h)
            return None
        return cls(h, info, step)

    def read(self, max_out: int):
        """-> ([k, H, W, 3] BGR u8, [k] int64 indices) or None on error.
        k == 0 signals EOF.

        The returned frame array is a VIEW into a buffer reused by the
        next read() call — consume (or copy) it before reading again.  A
        fresh 200 MB allocation per chunk costs ~2 s of page faults over
        a 60 s 1080p clip; reuse keeps the pages warm."""
        L = lib()
        if self._buf is None or self._buf.shape[0] < max_out:
            self._buf = np.empty((max_out, self.height, self.width, 3),
                                 np.uint8)
            self._idx = np.empty(max_out, np.int64)
        k = L.avd_vdec_read_sampled(self._h, max_out, self._buf.ctypes.data,
                                    self._idx.ctypes.data)
        if k < 0:
            return None
        return self._buf[:k], self._idx[:k]

    def read_into(self, out: np.ndarray, idx: np.ndarray):
        """Decode up to out.shape[0] sampled frames directly into the
        caller's [n, H, W, 3] uint8 buffer.  Returns the count or None on
        error (caller falls back to the cv2 walk)."""
        L = lib()
        assert out.flags["C_CONTIGUOUS"] and out.dtype == np.uint8
        k = L.avd_vdec_read_sampled(self._h, out.shape[0],
                                    out.ctypes.data, idx.ctypes.data)
        return None if k < 0 else int(k)

    def chunks(self, chunk: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            got = self.read(chunk)
            if got is None:
                raise RuntimeError("native decode error")
            frames, idx = got
            if frames.shape[0] == 0:
                return
            yield frames, idx

    def close(self) -> None:
        L = lib()
        if self._h and L is not None:
            L.avd_vdec_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC safety net
        try:
            self.close()
        except Exception:
            pass


def decode_audio_mono16k(path: str, rate: int = 16000):
    """First audio stream → (float32 mono [-1,1), rate) or None.

    Matches the reference's `ffmpeg -ac 1 -ar 16000` → WAV → soundfile
    pipeline: libswresample converts to s16 with the same defaults the
    CLI uses; the float values are s16/32768 exactly like soundfile's
    read of the 16-bit WAV."""
    L = lib()
    if L is None:
        return None
    dur = ctypes.c_double(0.0)
    h = L.avd_adec_open(path.encode(), rate, ctypes.byref(dur))
    if not h:
        return None
    try:
        chunks = []
        buf = np.empty(rate * 60, np.float32)  # 60 s per native call
        while True:
            k = L.avd_adec_read(h, buf.ctypes.data, buf.size)
            if k < 0:
                return None
            if k == 0:
                break
            chunks.append(buf[:k].copy())
    finally:
        L.avd_adec_close(h)
    if not chunks:
        return None
    return np.concatenate(chunks), rate


def mux_audio(path: str, samples: np.ndarray, rate: int) -> bool:
    """Write an AAC audio file (test fixture helper; no ffmpeg binary)."""
    L = lib()
    if L is None:
        return False
    samples = np.ascontiguousarray(samples, np.float32)
    rc = L.avd_mux_audio(path.encode(), samples.ctypes.data,
                         samples.size, rate)
    return rc == 0


def encode_video(path: str, frames_bgr: np.ndarray, fps: float = 30.0,
                 codec: str = "libx264", crf: int = -1, gop: int = 0,
                 preset: str = "veryfast") -> bool:
    """Encode [T, H, W, 3] BGR u8 frames to a real video file.

    Drives libavcodec's libx264/libx265/mpeg4 encoders directly (this
    image has no ffmpeg binary) — the encode side of the compression
    round-trips the detector robustness eval and training augmentation
    run (tools/eval_detector.py; the reference's whole input domain is
    compressed uploads, heuristics_v2.py:9-12).  crf >= 0 selects
    constant-rate-factor mode (mapped to qscale for mpeg4); gop > 0 pins
    the keyframe interval.  Dimensions must be even (yuv420p)."""
    L = lib()
    if L is None:
        return False
    frames_bgr = np.ascontiguousarray(frames_bgr, np.uint8)
    t, h, w = frames_bgr.shape[:3]
    rc = L.avd_venc_write(path.encode(), frames_bgr.ctypes.data, t, w, h,
                          float(fps), codec.encode(), int(crf), int(gop),
                          preset.encode())
    return rc == 0


def probe(path: str):
    """Container metadata via libavformat (ffprobe-field-compatible) or
    None when the library/file is unusable."""
    L = lib()
    if L is None:
        return None
    info = ProbeInfoStruct()
    if L.avd_probe(path.encode(), ctypes.byref(info)) != 0:
        return None
    return {
        "width": int(info.width),
        "height": int(info.height),
        "fps": float(info.fps),
        "duration": float(info.duration),
        "bit_rate": int(info.bit_rate),
        "vcodec": info.vcodec.decode() or None,
        "acodec": info.acodec.decode() or None,
        "format_name": info.format_name.decode() or None,
    }


def remux_add_audio(video_path: str, out_path: str, samples: np.ndarray,
                    rate: int) -> bool:
    """Stream-copy the video of `video_path` into `out_path` and add an
    AAC track with the given mono f32 samples (A/V test fixtures)."""
    L = lib()
    if L is None:
        return False
    samples = np.ascontiguousarray(samples, np.float32)
    rc = L.avd_remux_add_audio(video_path.encode(), out_path.encode(),
                               samples.ctypes.data, samples.size, rate)
    return rc == 0
