"""ctypes loader for the C++ host runtime (avd_tpu/native/src/avd_native.cc).

Builds lazily with g++ on first use (cached next to the sources and keyed
by source mtime); every caller must handle ``lib() is None`` — the
framework degrades to the pure-Python/cv2 paths when no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

from avd_tpu.native._build import SRC_DIR, ensure_so, so_site

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(SRC_DIR, "avd_native.cc")
_SO = so_site("libavd_native.so")


def _cmd(out: str):
    return ["g++", "-O3", "-march=native", "-funroll-loops", "-fPIC",
            "-std=c++17", "-pthread", "-shared", "-o", out, _SRC]


def _build(force: bool = False) -> bool:
    return ensure_so(_SRC, _SO, _cmd, timeout=120, force=force)


def lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None when unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.getenv("AVD_NATIVE", "1") != "1":
            return None
        if not _build():
            return None
        try:
            L = _bind(ctypes.CDLL(_SO))
        except (OSError, AttributeError):
            # Truncated/corrupt cached artifact (a killed compile), or a
            # stale one missing a newly-added export (AttributeError at
            # symbol bind): force one rebuild, then give up cleanly —
            # callers degrade to the cv2/numpy paths on None.
            if not _build(force=True):
                return None
            try:
                L = _bind(ctypes.CDLL(_SO))
            except (OSError, AttributeError):
                return None
        _LIB = L
        return _LIB


def _bind(L):
    """Register every export's signature; raises AttributeError when the
    artifact predates an export (handled by lib()'s rebuild)."""
    if True:
        L.avd_bgr_to_gray_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        L.avd_bgr_to_gray_u8.restype = None
        L.avd_wav_info.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_void_p]
        L.avd_wav_info.restype = ctypes.c_int
        L.avd_wav_decode_mono.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.c_void_p]
        L.avd_wav_decode_mono.restype = ctypes.c_int
        L.avd_resample.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64]
        L.avd_resample.restype = None
        L.avd_laplacian_var.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int]
        L.avd_laplacian_var.restype = None
        L.avd_lap_area32_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        L.avd_lap_area32_batch.restype = None
        L.avd_prep320_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        L.avd_prep320_batch.restype = None
        L.avd_prep320_bgr_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        L.avd_prep320_bgr_batch.restype = None
    return L


class WavInfoStruct(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("bits", ctypes.c_int32),
        ("format", ctypes.c_int32),
        ("n_frames", ctypes.c_int64),
        ("data_offset", ctypes.c_int64),
    ]


def bgr_to_gray(frames) -> Optional["np.ndarray"]:
    """[..., 3] uint8 BGR → [...] uint8 gray, threaded; None if no lib."""
    import numpy as np
    L = lib()
    if L is None:
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    out = np.empty(frames.shape[:-1], np.uint8)
    n = out.size
    threads = min(os.cpu_count() or 1, 16)
    L.avd_bgr_to_gray_u8(frames.ctypes.data, out.ctypes.data, n, threads)
    return out


def wav_decode_mono(data: bytes):
    """WAV bytes → (float32 mono array, sample_rate) or None."""
    import numpy as np
    L = lib()
    if L is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    info = WavInfoStruct()
    rc = L.avd_wav_info(buf.ctypes.data, len(data), ctypes.byref(info))
    if rc != 0 or info.n_frames <= 0:
        return None
    out = np.empty(info.n_frames, np.float32)
    rc = L.avd_wav_decode_mono(buf.ctypes.data, len(data), out.ctypes.data)
    if rc != 0:
        return None
    return out, int(info.sample_rate)


def lap_area32(gray):
    """[N, H, W] uint8 → (lap_var [N] f64, area32 [N,32,32] u8) in one
    fused sweep per frame; None if no lib."""
    import numpy as np
    L = lib()
    if L is None:
        return None
    gray = np.ascontiguousarray(gray, np.uint8)
    n, h, w = gray.shape
    if h < 32 or w < 32:
        return None  # area path assumes downscale (sx, sy >= 1)
    lap = np.empty(n, np.float64)
    area = np.empty((n, 32, 32), np.uint8)
    threads = min(os.cpu_count() or 1, 16)
    L.avd_lap_area32_batch(gray.ctypes.data, n, h, w, lap.ctypes.data,
                           area.ctypes.data, threads)
    return lap, area


def prep320(gray):
    """[N, H, W] uint8 → (lap_var [N] f64, area32 [N,32,32] u8,
    lin320 [N,320,320] u8) in one fused sweep per frame — the complete
    host-prep feature set.  Downscale only (H, W > 320); None otherwise
    or when no lib (callers fall back to the cv2 path)."""
    import numpy as np
    L = lib()
    if L is None:
        return None
    gray = np.ascontiguousarray(gray, np.uint8)
    n, h, w = gray.shape
    if h <= 320 or w <= 320:
        return None
    lap = np.empty(n, np.float64)
    area = np.empty((n, 32, 32), np.uint8)
    lin = np.empty((n, 320, 320), np.uint8)
    threads = min(os.cpu_count() or 1, 16)
    L.avd_prep320_batch(gray.ctypes.data, n, h, w, lap.ctypes.data,
                        area.ctypes.data, lin.ctypes.data, threads)
    return lap, area, lin


def prep320_bgr(frames_bgr):
    """[N, H, W, 3] BGR uint8 → (lap_var [N] f64, area32 [N,32,32] u8,
    lin320 [N,320,320] u8) in one fused sweep — grayscale rows live in a
    3-row ring, the full gray plane is never materialized.  Downscale
    only (H, W > 320); None otherwise or when no lib."""
    import numpy as np
    L = lib()
    if L is None:
        return None
    frames_bgr = np.ascontiguousarray(frames_bgr, np.uint8)
    n, h, w, _ = frames_bgr.shape
    if h <= 320 or w <= 320:
        return None
    lap = np.empty(n, np.float64)
    area = np.empty((n, 32, 32), np.uint8)
    lin = np.empty((n, 320, 320), np.uint8)
    threads = min(os.cpu_count() or 1, 16)
    L.avd_prep320_bgr_batch(frames_bgr.ctypes.data, n, h, w,
                            lap.ctypes.data, area.ctypes.data,
                            lin.ctypes.data, threads)
    return lap, area, lin


def laplacian_var(gray) -> Optional["np.ndarray"]:
    """[N, H, W] uint8 → [N] float64 Laplacian variances (cv2 CV_64F
    semantics), threaded across frames; None if no lib."""
    import numpy as np
    L = lib()
    if L is None:
        return None
    gray = np.ascontiguousarray(gray, np.uint8)
    n, h, w = gray.shape
    if h < 1 or w < 1:
        return None  # no pixels to stencil over
    out = np.empty(n, np.float64)
    threads = min(os.cpu_count() or 1, 16)
    L.avd_laplacian_var(gray.ctypes.data, n, h, w, out.ctypes.data, threads)
    return out


def resample(x, up: int, down: int):
    """float32 [n] → float32 [ceil(n*up/down)] windowed-sinc resample."""
    import numpy as np
    L = lib()
    if L is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n_out = -(-x.shape[0] * up // down)
    out = np.empty(n_out, np.float32)
    L.avd_resample(x.ctypes.data, x.shape[0], up, down,
                   out.ctypes.data, n_out)
    return out
