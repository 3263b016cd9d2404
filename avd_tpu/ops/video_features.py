"""Batched per-frame video features — the TPU replacement for the
reference's decode-loop compute (/root/reference/app/analyzers/video.py:27-58).

One jitted program per (chunk, H, W) consumes a uint8 frame window and
returns ONLY per-frame scalars:

    texture[k]     Laplacian variance at full resolution
    hamming[k]     Hamming distance between consecutive 32×32 avg-hashes
    flow_mean[k]   mean |Farnebäck flow| on 320×320 gray, pair (k, k+1)
    flow_var[k]    population variance of |flow| per pair

so HBM traffic is one pass over the frames and the host↔device transfer is
O(frames), not O(pixels).  Clips longer than the chunk stream through the
same compiled program with a one-frame lead-in (consecutive-pair features
need the previous frame), giving static shapes for XLA while supporting any
clip length.  Aggregation/timeline assembly runs on host in float64 via the
same code path as the oracle (``avd_tpu.oracle.video_ref.summarize``) —
parity by construction for everything downstream of the per-frame features.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import numpy as np

from avd_tpu.oracle import video_ref

# Frames per device chunk (excluding the 1-frame lead-in).  48 frames at
# 1080p keeps the f32 gray + Laplacian intermediates well under 1 GB HBM.
_DEFAULT_CHUNK = int(os.getenv("AVD_VIDEO_CHUNK", "48"))

_FLOW_SIZE = 320  # reference flow resolution (video.py:43)
_HASH_SIZE = 32   # reference hash resolution (video.py:4)


def _feature_body(gray_u8, h: int, w: int):
    """Per-window feature computation over a [N, H, W] uint8 gray window.

    Grayscale happens on the host (cv2's fixed-point conversion, bit-exact
    with the reference and ~1 ms/frame next to a ~10 ms decode): every
    feature the reference computes consumes gray only (video.py:5,43,51),
    so shipping BGR to the device would triple H2D traffic for nothing.
    """
    import jax.numpy as jnp

    from avd_tpu.ops import flow, hashing, laplacian, resize

    area_r = resize.area_matrix(h, _HASH_SIZE)
    area_c = resize.area_matrix(w, _HASH_SIZE)
    lin_r = resize.linear_matrix(h, _FLOW_SIZE, quantize=True)
    lin_c = resize.linear_matrix(w, _FLOW_SIZE, quantize=True)

    gray = gray_u8.astype(jnp.float32)  # [N, H, W]

    tex = laplacian.texture_variance(gray)

    # hash on rounded 32×32 area-average (cv2 resizes to uint8)
    small = resize.resize_matmul(gray, area_r, area_c)
    small = jnp.round(small)
    bits = hashing.average_hash_bits(small)
    ham = hashing.consecutive_hamming(bits)

    # flow input: cv2 INTER_LINEAR uint8 resize to 320×320
    fsmall = resize.resize_matmul(gray, lin_r, lin_c)
    fsmall = jnp.clip(jnp.round(fsmall), 0.0, 255.0)
    fl = flow.farneback_flow(fsmall[:-1], fsmall[1:])
    fmean, fvar = flow.flow_magnitude_stats(fl)

    return tex, ham, fmean, fvar


@functools.lru_cache(maxsize=16)
def _compiled_chunk(n_frames: int, h: int, w: int):
    """jit program over one [n_frames, H, W] uint8 gray window."""
    import jax
    from avd_tpu.utils import jaxtools
    jaxtools.setup()
    return jax.jit(functools.partial(_feature_body, h=h, w=w))


@functools.lru_cache(maxsize=16)
def _compiled_chunk_stacked(m: int, n_frames: int, h: int, w: int):
    """jit program over [m, n_frames, H, W] — m windows from different
    requests fused into one device call (cross-request micro-batching,
    BASELINE.json config #5)."""
    import jax
    from avd_tpu.utils import jaxtools
    jaxtools.setup()
    return jax.jit(jax.vmap(functools.partial(_feature_body, h=h, w=w)))


def run_window(window_gray_u8: np.ndarray):
    """Execute the feature program for one window, via the cross-request
    batcher when serving has one enabled."""
    import jax.numpy as jnp

    from avd_tpu.serve import batching
    b = batching.active_batcher()
    if b is not None:
        return b.submit(window_gray_u8).result()
    n, h, w = window_gray_u8.shape
    fn = _compiled_chunk(n, h, w)
    return tuple(np.asarray(x) for x in fn(jnp.asarray(window_gray_u8)))


def _chunk_size(h: int, w: int) -> int:
    # shrink the chunk for very large frames to bound HBM intermediates
    pixels = h * w
    if pixels > 1920 * 1080:
        return max(8, _DEFAULT_CHUNK // 4)
    return _DEFAULT_CHUNK


def _to_gray_host(frames: np.ndarray) -> np.ndarray:
    """[N, H, W, 3] BGR uint8 → [N, H, W] uint8, cv2 fixed-point exact.

    Prefers the threaded C++ batch converter (native/avd_native.cc, one
    call for the whole window) over per-frame cv2 calls; both produce
    identical bytes."""
    from avd_tpu import native
    gray = native.bgr_to_gray(frames)
    if gray is not None:
        return gray
    try:
        import cv2
        return np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
                         for f in frames])
    except ImportError:
        f = frames.astype(np.int32)
        acc = (f[..., 2] * 9798 + f[..., 1] * 19235 + f[..., 0] * 3735
               + (1 << 14))
        return (acc >> 15).astype(np.uint8)


def compute_features(frames: np.ndarray) -> Dict:
    """Per-frame feature lists for a [N, H, W, 3] uint8 BGR batch.

    Output dict matches ``oracle.video_ref.compute_features`` so the same
    summarize() assembles the analyzer result.
    """
    import jax.numpy as jnp

    n = frames.shape[0]
    feats = {"dup": 0, "total": n, "flow_means": [], "flow_vars": [],
             "textures": [], "timeline_ai": []}
    if n == 0:
        return feats

    frames = _to_gray_host(frames)
    h, w = frames.shape[1:3]
    chunk = _chunk_size(h, w)

    tex_all: list = []
    ham_all: list = []
    fmean_all: list = []
    fvar_all: list = []

    start = 0
    while start < n:
        valid = min(chunk, n - start)
        # window = lead-in frame + `chunk` frames (padded by repetition)
        lead = frames[start - 1] if start > 0 else frames[0]
        body = frames[start:start + valid]
        window = np.concatenate([lead[None], body])
        if valid < chunk:
            pad = np.repeat(window[-1:], chunk - valid, axis=0)
            window = np.concatenate([window, pad])

        tex, ham, fmean, fvar = run_window(window)

        # window index 0 is the lead-in: drop its texture; pair i is
        # (window[i], window[i+1]) → global pair (start-1+i, start+i).
        tex_all.extend(tex[1:1 + valid].tolist())
        if start == 0:
            # lead-in duplicates frame 0 → pair 0 is (f0, f0): drop it.
            ham_all.extend(ham[1:valid].tolist())
            fmean_all.extend(fmean[1:valid].tolist())
            fvar_all.extend(fvar[1:valid].tolist())
        else:
            ham_all.extend(ham[:valid].tolist())
            fmean_all.extend(fmean[:valid].tolist())
            fvar_all.extend(fvar[:valid].tolist())
        start += valid

    feats["textures"] = [float(t) for t in tex_all]
    feats["flow_means"] = [float(x) for x in fmean_all]
    feats["flow_vars"] = [float(x) for x in fvar_all]
    feats["dup"] = int(sum(1 for hm in ham_all if hm == 0))

    # per-frame AI suspicion (video.py:54-57), float64 on host
    timeline = []
    for i in range(n):
        tex = feats["textures"][i]
        mot = feats["flow_means"][i - 1] if i > 0 else 0.0
        timeline.append(float(np.clip(
            1.0 - (tex / (tex + 1000.0)) * (1.0 + mot), 0.0, 1.0)))
    feats["timeline_ai"] = timeline
    return feats


def analyze_frames(frames: np.ndarray, w: int, h: int, fps: float,
                   duration: float) -> Dict:
    """Full TPU video analysis over a decoded batch (mirrors
    oracle.video_ref.analyze_frames)."""
    feats = compute_features(frames)
    return video_ref.summarize(feats, w, h, fps, duration)


def compute_features_streaming(chunk_iter) -> Dict:
    """Streaming variant: consume an iterator of [k, H, W, 3] BGR chunks.

    Device calls are dispatched asynchronously as windows fill, so decode
    (host) overlaps feature extraction (device) — the double-buffered
    pipeline for long/4K clips (BASELINE.json config #3).  Results are
    identical to compute_features() on the concatenated frames.
    """
    import jax.numpy as jnp

    pend: list = []      # (device_outs, valid, is_first)
    held: np.ndarray | None = None
    prev_last: np.ndarray | None = None
    chunk = None
    fn = None
    n_total = 0

    def dispatch(body: np.ndarray):
        nonlocal prev_last
        valid = body.shape[0]
        lead = prev_last if prev_last is not None else body[0]
        window = np.concatenate([lead[None], body])
        if window.shape[0] < chunk + 1:
            pad = np.repeat(window[-1:], chunk + 1 - window.shape[0], axis=0)
            window = np.concatenate([window, pad])
        outs = fn(jnp.asarray(window))  # async — do not fetch yet
        pend.append((outs, valid, prev_last is None))
        prev_last = body[-1]

    for frames in chunk_iter:
        if frames.shape[0] == 0:
            continue
        gray = _to_gray_host(frames)
        if chunk is None:
            h, w = gray.shape[1:3]
            chunk = _chunk_size(h, w)
            fn = _compiled_chunk(chunk + 1, h, w)
        buf = gray if held is None else np.concatenate([held, gray])
        held = None
        while buf.shape[0] >= chunk:
            dispatch(buf[:chunk])
            n_total += chunk
            buf = buf[chunk:]
        held = buf if buf.shape[0] else None
    if held is not None and held.shape[0]:
        n_total += held.shape[0]
        dispatch(held)

    feats = {"dup": 0, "total": n_total, "flow_means": [], "flow_vars": [],
             "textures": [], "timeline_ai": []}
    if n_total == 0:
        return feats

    tex_all: list = []
    ham_all: list = []
    fmean_all: list = []
    fvar_all: list = []
    for outs, valid, is_first in pend:
        tex, ham, fmean, fvar = (np.asarray(x) for x in outs)
        tex_all.extend(tex[1:1 + valid].tolist())
        lo = 1 if is_first else 0
        ham_all.extend(ham[lo:valid].tolist())
        fmean_all.extend(fmean[lo:valid].tolist())
        fvar_all.extend(fvar[lo:valid].tolist())

    feats["textures"] = [float(t) for t in tex_all]
    feats["flow_means"] = [float(x) for x in fmean_all]
    feats["flow_vars"] = [float(x) for x in fvar_all]
    feats["dup"] = int(sum(1 for hm in ham_all if hm == 0))
    timeline = []
    for i in range(n_total):
        tex = feats["textures"][i]
        mot = feats["flow_means"][i - 1] if i > 0 else 0.0
        timeline.append(float(np.clip(
            1.0 - (tex / (tex + 1000.0)) * (1.0 + mot), 0.0, 1.0)))
    feats["timeline_ai"] = timeline
    return feats
