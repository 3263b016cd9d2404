"""Batched per-frame video features — the TPU replacement for the
reference's decode-loop compute (/root/reference/app/analyzers/video.py:27-58).

Per window of sampled frames the pipeline produces ONLY per-frame scalars:

    texture[k]     Laplacian variance at full resolution (video.py:51-52)
    hamming[k]     Hamming distance between consecutive 32×32 avg-hashes
    flow_mean[k]   mean |Farnebäck flow| on 320×320 gray, pair (k, k+1)
    flow_var[k]    population variance of |flow| per pair

Two preprocessing placements (``AVD_PREP``):

``host`` (default)
    The host performs the *reference's own* cheap cv2 ops — grayscale,
    320×320 INTER_LINEAR, 32×32 INTER_AREA (bit-identical to
    video.py:5,43) — plus the Laplacian variance in threaded C++
    (avd_tpu/native/src/avd_native.cc, cv2 CV_64F semantics).  Only ~105 KB/frame
    ships to the device, which runs the one genuinely expensive stage:
    batched Farnebäck flow over all pairs.  A single device program shape
    serves every video resolution.

``device``
    Full-resolution gray ships to the device; resizes become MXU matmuls
    and the Laplacian a fused stencil.  Right when host CPU is scarce and
    the host↔device link is wide (PCIe); ~2 MB/frame at 1080p.

Clips longer than the chunk stream through the same compiled program with
a one-frame lead-in (consecutive-pair features need the previous frame).
Aggregation/timeline assembly runs on host in float64 via the same code
path as the oracle (``avd_tpu.oracle.video_ref.summarize``) — parity by
construction for everything downstream of the per-frame features.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import numpy as np

from avd_tpu.oracle import video_ref

# Frames per device chunk (excluding the 1-frame lead-in).
_DEFAULT_CHUNK = int(os.getenv("AVD_VIDEO_CHUNK", "48"))

_FLOW_SIZE = 320  # reference flow resolution (video.py:43)
_HASH_SIZE = 32   # reference hash resolution (video.py:4)


def _prep_mode() -> str:
    return os.getenv("AVD_PREP", "host")


# True once any device feature program has completed an execution in this
# process.  First execution of a program pays the remote Mosaic/XLA load
# (minutes when the remote compile cache is cold — measured 224 s for the
# 49-frame bucket) even on a persistent-cache hit, so the pipeline's
# analyzer timeout grants a cold-start grace until this flips
# (pipeline._analyzer_timeout).  Serving warmup flips it at boot.
_DEVICE_WARM = False


def device_warmed() -> bool:
    return _DEVICE_WARM


def mark_device_warm() -> None:
    global _DEVICE_WARM
    _DEVICE_WARM = True


def warm_device(log=None) -> None:
    """Execute every streaming window bucket's packed prep program once
    (zero input), so the remote program load happens HERE instead of
    inside a timed analyzer call.  Serving warmup and the CLI entry both
    use this.

    No-op when already warm — and in device-prep mode (AVD_PREP=device),
    whose program shapes include the clip's full resolution and are
    unknowable at boot; there the first request runs under the
    cold-start grace and flips the warm flag when its program completes
    (the streaming fetch path calls mark_device_warm)."""
    if _DEVICE_WARM or _prep_mode() != "host":
        return
    import jax.numpy as jnp
    for n in _window_buckets(_DEFAULT_CHUNK):
        if log is not None:
            log(f"warming {n}-frame device window (first run per process "
                "can take minutes on a cold remote compile cache)...")
        zero320 = np.zeros((n, _FLOW_SIZE, _FLOW_SIZE), np.uint8)
        zero32 = np.zeros((n, _HASH_SIZE, _HASH_SIZE), np.uint8)
        packed = _pack_prep_window(zero320, zero32)
        np.asarray(_compiled_prep_packed(n, False)(jnp.asarray(packed)))
        if n == _DEFAULT_CHUNK + 1 and _h2d_delta_mode() != "0":
            # 'auto' can pick the delta variant for any low-motion full
            # window — warm it too so no request pays the program load
            np.asarray(_compiled_prep_packed(n, True)(jnp.asarray(packed)))
    mark_device_warm()


def _window_buckets(chunk: int):
    """Window lengths (incl. the 1-frame lead-in) the tail may round up to.

    A clip tail of a few frames used to pay a full (chunk+1)-frame device
    window — 145 frames = 3×48 + 1 ran 4 full windows (33% padding waste).
    Quarter-chunk buckets cap the waste at chunk/4−1 frames per clip at the
    cost of three extra compiled shapes (one-time, persistently cached)."""
    q = max(1, chunk // 4)
    return tuple(sorted({q + 1, 2 * q + 1, 3 * q + 1, chunk + 1}))


def _bucket_len(n_window: int, chunk: int) -> int:
    """Smallest bucketed window length >= n_window."""
    for b in _window_buckets(chunk):
        if n_window <= b:
            return b
    return chunk + 1


# ---------------------------------------------------------------------------
# device programs
# ---------------------------------------------------------------------------

def _feature_body(gray_u8, h: int, w: int):
    """Device-prep variant: full feature set from a [N, H, W] uint8 gray
    window (resizes as matmuls on the MXU)."""
    import jax.numpy as jnp

    from avd_tpu.ops import flow, hashing, laplacian, resize

    area_r = resize.area_matrix(h, _HASH_SIZE)
    area_c = resize.area_matrix(w, _HASH_SIZE)
    lin_r = resize.linear_matrix(h, _FLOW_SIZE, quantize=True)
    lin_c = resize.linear_matrix(w, _FLOW_SIZE, quantize=True)

    gray = gray_u8.astype(jnp.float32)  # [N, H, W]

    tex = laplacian.texture_variance(gray)

    small = jnp.round(resize.resize_matmul(gray, area_r, area_c))
    bits = hashing.average_hash_bits(small)
    ham = hashing.consecutive_hamming(bits)

    fsmall = resize.resize_matmul(gray, lin_r, lin_c)
    fsmall = jnp.clip(jnp.round(fsmall), 0.0, 255.0)
    fl = flow.farneback_flow(fsmall[:-1], fsmall[1:])
    fmean, fvar = flow.flow_magnitude_stats(fl)

    return tex, ham, fmean, fvar


def _prep_body(flow_u8, hash_u8):
    """Host-prep variant: pair features from pre-resized windows
    ([N, 320, 320] and [N, 32, 32] uint8)."""
    import jax.numpy as jnp

    from avd_tpu.ops import flow, hashing

    bits = hashing.average_hash_bits(hash_u8.astype(jnp.float32))
    ham = hashing.consecutive_hamming(bits)
    fs = flow_u8.astype(jnp.float32)
    fl = flow.farneback_flow(fs[:-1], fs[1:])
    fmean, fvar = flow.flow_magnitude_stats(fl)
    return ham, fmean, fvar


@functools.lru_cache(maxsize=16)
def _compiled_chunk(n_frames: int, h: int, w: int):
    """jit program over one [n_frames, H, W] uint8 gray window."""
    import jax
    from avd_tpu.utils import jaxtools
    jaxtools.setup()
    return jax.jit(functools.partial(_feature_body, h=h, w=w))


@functools.lru_cache(maxsize=8)
def _compiled_prep_packed(n_frames: int, delta: bool = False):
    """Tunnel-friendly host-prep program: ONE uint8 input vector (the
    320×320 flow window and 32×32 hash window concatenated flat) and ONE
    float32 output vector (ham ‖ fmean ‖ fvar).  Each host↔device round
    trip costs ~24 ms RTT on the axon tunnel regardless of size, so
    collapsing 2 puts + 3 fetches per window into 1 + 1 is worth ~3 ms
    per frame of streaming throughput.  With ``delta`` the input is
    mod-256 frame deltas (_pack_prep_window(delta=True)) and the body
    reconstructs the exact frames first (see _h2d_delta)."""
    import jax
    import jax.numpy as jnp

    from avd_tpu.utils import jaxtools
    jaxtools.setup()
    n_flow = n_frames * _FLOW_SIZE * _FLOW_SIZE

    def body(packed_u8):
        f = packed_u8[:n_flow].reshape(n_frames, _FLOW_SIZE, _FLOW_SIZE)
        h8 = packed_u8[n_flow:].reshape(n_frames, _HASH_SIZE, _HASH_SIZE)
        if delta:
            f, h8 = _undelta_u8(f), _undelta_u8(h8)
        ham, fmean, fvar = _prep_body(f, h8)
        return jnp.concatenate([ham.astype(jnp.float32),
                                fmean.astype(jnp.float32),
                                fvar.astype(jnp.float32)])

    return jax.jit(body)


_FETCH_GROUP = 4  # packed windows fetched per D2H round trip


@functools.lru_cache(maxsize=1)
def _dispatch_pool():
    """Executor that owns the H2D put + device dispatch.

    Shipping one packed 49-frame window over the axon tunnel costs
    ~145 ms (~5 MB at 30-40 MB/s) and blocks the calling thread; moving
    the put off the streaming thread lets decode + host prep of chunk
    k+1 overlap the transfer of chunk k.  Result order is carried by the
    caller's future list, so workers > 1 stays correct.  Default 4:
    tools/h2d_probe.py measures the tunnel sustaining 33 MB/s for one
    putter but 53 MB/s aggregate for four (1.6x — per-stream windows,
    not a shared cap), and the 1080p bench holds the gain end-to-end
    (~355 -> ~365-370 fps; AVD_DISPATCH_WORKERS to override)."""
    import concurrent.futures
    workers = int(os.getenv("AVD_DISPATCH_WORKERS", "4"))
    return concurrent.futures.ThreadPoolExecutor(
        max_workers=max(1, workers), thread_name_prefix="avd-dispatch")


@functools.lru_cache(maxsize=4)
def _compiled_stack_fetch(m: int):
    """Stack m same-shape packed outputs into one array — one D2H round
    trip fetches m windows' results."""
    import jax
    import jax.numpy as jnp

    from avd_tpu.utils import jaxtools
    jaxtools.setup()
    return jax.jit(lambda *xs: jnp.stack(xs))


def _h2d_delta_mode() -> str:
    """Temporal-delta H2D encoding mode: 'auto' (default), '1', '0'.

    The axon tunnel compresses in flight (tools/h2d_probe.py: 5 MB
    random u8 ships at ~4-19 MB/s, zeros at ~150 MB/s, sparse
    video-like deltas at ~94 MB/s), and the 1080p streaming cycle is
    put-bound — so shipping mod-256 frame deltas instead of raw frames
    makes transfer cost proportional to temporal CHANGE instead of
    resolution.  Reconstruction on device (cumsum mod 256) is exact, so
    every downstream bit is identical.

    Measured 49-frame put+compute cycle on real windows (BASELINE.md
    round 3): static 82 vs 109 ms, slow motion 91 vs 136, brightness
    drift 87 vs 112 — but full-motion-every-frame panning texture LOSES
    (136 vs 108: shifted texture deltas are noise-like).  'auto' decides
    per window with a cheap host motion proxy (_window_motion, crossover
    ≈ AVD_H2D_DELTA_THRESH=5 gray levels of mean wrapped |Δ|); tails and
    the cross-request batcher stay raw so the warm program set stays
    small."""
    v = os.getenv("AVD_H2D_DELTA", "auto")
    return v if v in ("0", "1") else "auto"


def _h2d_delta() -> bool:
    """Static (non-adaptive) view of the delta flag — used by paths that
    must pick one program for heterogeneous content (cross-request
    batcher): delta only when forced on."""
    return _h2d_delta_mode() == "1"


def _delta_thresh() -> float:
    try:
        return float(os.getenv("AVD_H2D_DELTA_THRESH", "5"))
    except ValueError:
        return 5.0


def _window_motion(w320: np.ndarray) -> float:
    """Mean wrapped |frame delta| on an 8×-strided subsample of the flow
    window — the cheap host proxy for whether delta encoding will
    compress (≈30 µs for a 49-frame window)."""
    s = w320[:, ::8, ::8].astype(np.int16)
    d = np.abs(np.diff(s, axis=0))
    if d.size == 0:
        return 0.0
    return float(np.minimum(d, 256 - d).mean())


def _use_delta(w320: np.ndarray, target: int, chunk: int) -> bool:
    """Per-window delta decision (see _h2d_delta_mode)."""
    mode = _h2d_delta_mode()
    if mode == "0":
        return False
    if target != chunk + 1:
        # Tails ride the raw programs in EVERY mode (small puts anyway):
        # only the full bucket's delta variant is warmed (warm_device,
        # tools/precompile.py), so a forced-delta tail would pay a cold
        # Mosaic program load — minutes — mid-request.
        return False
    if mode == "1":
        return True
    return _window_motion(w320) < _delta_thresh()


def _delta_u8(w: np.ndarray) -> np.ndarray:
    """[n, ...] u8 → same shape: d[0]=w[0], d[i]=w[i]-w[i-1] mod 256."""
    d = np.empty_like(w)
    d[0] = w[0]
    np.subtract(w[1:], w[:-1], out=d[1:])  # uint8 wraparound
    return d


def _undelta_u8(x, axis: int = 0):
    """Device-side exact inverse of _delta_u8 (cumsum mod 256)."""
    import jax.numpy as jnp
    return (jnp.cumsum(x.astype(jnp.int32), axis=axis) & 0xFF) \
        .astype(jnp.uint8)


def _pack_prep_window(w320: np.ndarray, w32: np.ndarray,
                      delta: bool = False) -> np.ndarray:
    if delta:
        w320, w32 = _delta_u8(w320), _delta_u8(w32)
    return np.concatenate([w320.reshape(-1), w32.reshape(-1)])


def _unpack_prep_out(vec: np.ndarray, n_frames: int):
    k = n_frames - 1
    return vec[:k], vec[k:2 * k], vec[2 * k:3 * k]


@functools.lru_cache(maxsize=16)
def _compiled_chunk_stacked(m: int, n_frames: int, h: int, w: int):
    """jit program over [m, n_frames, H, W] — m windows from different
    requests fused into one device call (cross-request micro-batching,
    BASELINE.json config #5)."""
    import jax
    from avd_tpu.utils import jaxtools
    jaxtools.setup()
    return jax.jit(jax.vmap(functools.partial(_feature_body, h=h, w=w)))


@functools.lru_cache(maxsize=8)
def _compiled_prep_stacked_packed(m: int, n_frames: int,
                                  delta: bool = False):
    """Stacked + packed host-prep program: [m, N·(320²+32²)] uint8 in,
    [m, 3·(N−1)] float32 out — one put and one fetch per cross-request
    batch regardless of batch size (the tunnel charges ~24 ms per round
    trip; see _compiled_prep_packed).  ``delta`` as in
    _compiled_prep_packed."""
    import jax
    import jax.numpy as jnp

    from avd_tpu.utils import jaxtools
    jaxtools.setup()
    n_flow = n_frames * _FLOW_SIZE * _FLOW_SIZE

    def one(packed_u8):
        f = packed_u8[:n_flow].reshape(n_frames, _FLOW_SIZE, _FLOW_SIZE)
        h8 = packed_u8[n_flow:].reshape(n_frames, _HASH_SIZE, _HASH_SIZE)
        if delta:
            f, h8 = _undelta_u8(f), _undelta_u8(h8)
        ham, fmean, fvar = _prep_body(f, h8)
        return jnp.concatenate([ham.astype(jnp.float32),
                                fmean.astype(jnp.float32),
                                fvar.astype(jnp.float32)])

    return jax.jit(jax.vmap(one))


def run_prep_window(w320: np.ndarray, w32: np.ndarray):
    """Execute the host-prep pair program for one window, via the
    cross-request batcher when enabled."""
    import jax.numpy as jnp

    from avd_tpu.serve import batching
    b = batching.active_batcher()
    if b is not None:
        return b.submit_prep(w320, w32).result()
    n = w320.shape[0]
    d = _use_delta(w320, n, _DEFAULT_CHUNK)
    fn = _compiled_prep_packed(n, d)
    vec = np.asarray(fn(jnp.asarray(_pack_prep_window(w320, w32,
                                                      delta=d))))
    mark_device_warm()
    return _unpack_prep_out(vec, n)


def run_window(window_gray_u8: np.ndarray):
    """Execute the device-prep feature program for one window, via the
    cross-request batcher when serving has one enabled."""
    import jax.numpy as jnp

    from avd_tpu.serve import batching
    b = batching.active_batcher()
    if b is not None:
        return b.submit(window_gray_u8).result()
    n, h, w = window_gray_u8.shape
    fn = _compiled_chunk(n, h, w)
    out = tuple(np.asarray(x) for x in fn(jnp.asarray(window_gray_u8)))
    mark_device_warm()
    return out


# ---------------------------------------------------------------------------
# host preprocessing
# ---------------------------------------------------------------------------

def _chunk_size(h: int, w: int) -> int:
    # shrink the device-prep chunk for very large frames to bound HBM
    pixels = h * w
    if pixels > 1920 * 1080:
        return max(8, _DEFAULT_CHUNK // 4)
    return _DEFAULT_CHUNK


def _to_gray_host(frames: np.ndarray) -> np.ndarray:
    """[N, H, W, 3] BGR uint8 → [N, H, W] uint8, cv2 fixed-point exact.

    The C++ SSSE3 converter (pshufb deinterleave + pmaddwd fixed point,
    bit-exact vs cv2, ≈1.8 ms/frame at 1080p vs cv2's ≈2.6) goes first;
    cv2 and a numpy formula cover toolchain-less deployments."""
    from avd_tpu import native
    gray = native.bgr_to_gray(frames)
    if gray is not None:
        return gray
    try:
        import cv2
        n, h, w = frames.shape[:3]
        gray = np.empty((n, h, w), np.uint8)
        for i in range(n):
            cv2.cvtColor(frames[i], cv2.COLOR_BGR2GRAY, dst=gray[i])
        return gray
    except ImportError:
        pass
    f = frames.astype(np.int32)
    acc = (f[..., 2] * 9798 + f[..., 1] * 19235 + f[..., 0] * 3735
           + (1 << 14))
    return (acc >> 15).astype(np.uint8)


def _lap_var_host(gray: np.ndarray) -> np.ndarray:
    """[N, H, W] uint8 → [N] float64, cv2.Laplacian(CV_64F).var()
    semantics; threaded C++ with numpy fallback."""
    from avd_tpu import native
    out = native.laplacian_var(gray)
    if out is not None:
        return out
    g = gray.astype(np.float64)
    up = np.concatenate([g[:, 1:2], g[:, :-1]], axis=1)
    dn = np.concatenate([g[:, 1:], g[:, -2:-1]], axis=1)
    lf = np.concatenate([g[:, :, 1:2], g[:, :, :-1]], axis=2)
    rt = np.concatenate([g[:, :, 1:], g[:, :, -2:-1]], axis=2)
    lap = up + dn + lf + rt - 4.0 * g
    return lap.var(axis=(1, 2))


def _host_prep(frames_bgr: np.ndarray):
    """Reference-exact host preprocessing for a BGR frame batch →
    (flow_input [N,320,320] u8, hash_input [N,32,32] u8, tex [N] f64)."""
    import concurrent.futures

    from avd_tpu import native

    # fully fused C++ pass straight from BGR: gray ring + Laplacian
    # variance + 32×32 area bins + 320×320 bilinear in ONE sweep
    # (bit-exact vs cv2; downscale inputs only)
    fused_bgr = native.prep320_bgr(frames_bgr)
    if fused_bgr is not None:
        tex, small32, small320 = fused_bgr
        return small320, small32, tex

    gray = _to_gray_host(frames_bgr)
    tex = None
    n = gray.shape[0]

    # fused C++ pass over pre-materialized gray (same outputs)
    fused3 = native.prep320(gray)
    if fused3 is not None:
        tex, small32, small320 = fused3
        return small320, small32, tex

    small320 = np.empty((n, _FLOW_SIZE, _FLOW_SIZE), np.uint8)
    small32 = np.empty((n, _HASH_SIZE, _HASH_SIZE), np.uint8)

    # fused C++ pass: Laplacian variance + 32×32 area bins ride one sweep
    fused = native.lap_area32(gray)
    if fused is not None:
        tex, small32 = fused

    try:
        import cv2

        def work(i):
            small320[i] = cv2.resize(gray[i], (_FLOW_SIZE, _FLOW_SIZE),
                                     interpolation=cv2.INTER_LINEAR)
            if fused is None:
                small32[i] = cv2.resize(gray[i], (_HASH_SIZE, _HASH_SIZE),
                                        interpolation=cv2.INTER_AREA)

        n_threads = min(8, os.cpu_count() or 1)
        if n > 4 and n_threads > 1:
            with concurrent.futures.ThreadPoolExecutor(n_threads) as pool:
                list(pool.map(work, range(n)))
        else:
            for i in range(n):
                work(i)
    except ImportError:
        from avd_tpu.ops import resize as rz
        g = gray.astype(np.float32)
        lr = rz.linear_matrix(gray.shape[1], _FLOW_SIZE, quantize=True)
        lc = rz.linear_matrix(gray.shape[2], _FLOW_SIZE, quantize=True)
        small320[:] = np.clip(np.round(
            np.einsum("nhw,oh,pw->nop", g, lr, lc)), 0, 255)
        if fused is None:  # keep the native pass's bit-exact area bins
            ar = rz.area_matrix(gray.shape[1], _HASH_SIZE)
            ac = rz.area_matrix(gray.shape[2], _HASH_SIZE)
            small32[:] = np.clip(np.round(
                np.einsum("nhw,oh,pw->nop", g, ar, ac)), 0, 255)
    if tex is None:
        tex = _lap_var_host(gray)
    return small320, small32, tex


# ---------------------------------------------------------------------------
# feature assembly
# ---------------------------------------------------------------------------

def _assemble(feats: Dict, tex_all, ham_all, fmean_all, fvar_all) -> Dict:
    n = feats["total"]
    feats["textures"] = [float(t) for t in tex_all]
    feats["flow_means"] = [float(x) for x in fmean_all]
    feats["flow_vars"] = [float(x) for x in fvar_all]
    feats["dup"] = int(sum(1 for hm in ham_all if hm == 0))
    timeline = []
    for i in range(n):
        tex = feats["textures"][i]
        mot = feats["flow_means"][i - 1] if i > 0 else 0.0
        timeline.append(float(np.clip(
            1.0 - (tex / (tex + 1000.0)) * (1.0 + mot), 0.0, 1.0)))
    feats["timeline_ai"] = timeline
    return feats


def _window_slices(start: int, valid: int, tex, ham, fmean, fvar,
                   sinks) -> None:
    """Distribute one window's outputs into the global feature lists.

    Window index 0 is the lead-in; pair i is (window[i], window[i+1]).
    For the first window the lead-in duplicates frame 0, so pair 0 is the
    (f0, f0) artifact and is dropped."""
    tex_all, ham_all, fmean_all, fvar_all = sinks
    if tex is not None:
        tex_all.extend(np.asarray(tex)[1:1 + valid].tolist())
    lo = 1 if start == 0 else 0
    ham_all.extend(np.asarray(ham)[lo:valid].tolist())
    fmean_all.extend(np.asarray(fmean)[lo:valid].tolist())
    fvar_all.extend(np.asarray(fvar)[lo:valid].tolist())


def _pad_window(window: np.ndarray, target: int) -> np.ndarray:
    if window.shape[0] < target:
        pad = np.repeat(window[-1:], target - window.shape[0], axis=0)
        window = np.concatenate([window, pad])
    return window


def _gate_enabled() -> bool:
    """CBinfer-style change gating (docs/PERFORMANCE.md): skip the flow
    solve for frame pairs whose 320×320 planes barely changed.  OFF by
    default — semantics diverge from the reference (cv2 still reports
    tiny non-zero flow on near-static pairs), so it is an explicitly
    opt-in fast mode for static-heavy content (dashcams, talking heads,
    surveillance)."""
    return os.getenv("AVD_CHANGE_GATE", "0") == "1"


def _gate_threshold() -> float:
    """Mean |Δgray| per pixel (0..255) below which a pair is 'static'."""
    return float(os.getenv("AVD_CHANGE_GATE_THR", "0.5"))


_PAIR_BUCKETS = (12, 24, 36, 48)  # == window-path flow batch shapes, so
                                  # the Pallas warp kernels are already
                                  # compiled (each new shape costs minutes)


@functools.lru_cache(maxsize=4)
def _compiled_flow_pairs(b: int):
    """jit program over b explicit (prev, cur) 320×320 pairs, packed into
    one u8 vector; returns fmean ‖ fvar."""
    import jax
    import jax.numpy as jnp

    from avd_tpu.ops import flow
    from avd_tpu.utils import jaxtools
    jaxtools.setup()
    n_px = _FLOW_SIZE * _FLOW_SIZE

    def body(packed_u8):
        prev = packed_u8[:b * n_px].reshape(
            b, _FLOW_SIZE, _FLOW_SIZE).astype(jnp.float32)
        cur = packed_u8[b * n_px:].reshape(
            b, _FLOW_SIZE, _FLOW_SIZE).astype(jnp.float32)
        fl = flow.farneback_flow(prev, cur)
        m, v = flow.flow_magnitude_stats(fl)
        return jnp.concatenate([m.astype(jnp.float32),
                                v.astype(jnp.float32)])

    return jax.jit(body)


def _compute_features_gated(feats: Dict, s320: np.ndarray,
                            s32: np.ndarray, tex) -> Dict:
    """Change-gated feature path: hash/duplicates on host (exact integer
    math, cheap), per-pair mean |Δ| gate on host, Farnebäck only for the
    pairs that actually moved."""
    import jax.numpy as jnp

    n = s320.shape[0]
    # average-hash Hamming on host — float64 mean and >= exactly like the
    # reference (video.py:4-8) and the device kernel (hashing.py)
    m32 = s32.reshape(n, -1).astype(np.float64).mean(axis=1)
    bits = s32.astype(np.float64) >= m32[:, None, None]
    ham = (bits[1:] ^ bits[:-1]).sum(axis=(1, 2)) if n > 1 else \
        np.zeros((0,), np.int64)

    # the gate: mean |Δ| of consecutive 320×320 planes
    if n > 1:
        deltas = np.abs(s320[1:].astype(np.int16)
                        - s320[:-1].astype(np.int16)).mean(axis=(1, 2))
        dynamic = np.nonzero(deltas >= _gate_threshold())[0]
    else:
        dynamic = np.zeros((0,), np.int64)

    fmean = np.zeros(max(0, n - 1), np.float64)
    fvar = np.zeros(max(0, n - 1), np.float64)
    if dynamic.size:
        start = 0
        while start < dynamic.size:
            take = dynamic[start:start + _PAIR_BUCKETS[-1]]
            b = next(x for x in _PAIR_BUCKETS if x >= take.size)
            idx = take
            if take.size < b:  # pad with the first pair of the group
                idx = np.concatenate(
                    [take, np.repeat(take[:1], b - take.size)])
            packed = np.concatenate([s320[idx].reshape(-1),
                                     s320[idx + 1].reshape(-1)])
            out = np.asarray(_compiled_flow_pairs(b)(jnp.asarray(packed)))
            fmean[take] = out[:take.size]
            fvar[take] = out[b:b + take.size]
            start += take.size
        mark_device_warm()  # a real device program completed

    feats["skipped_pairs"] = int((n - 1) - dynamic.size) if n > 1 else 0
    return _assemble(feats, list(tex), ham.tolist(), fmean.tolist(),
                     fvar.tolist())


@functools.lru_cache(maxsize=2)
def _cp_fn(mesh):
    from avd_tpu.parallel import halo
    return halo.cp_video_pair_features(mesh)


def _cp_features(s320: np.ndarray, s32: np.ndarray):
    """Run the pair features time-sharded over the serving mesh
    (context parallelism, SURVEY §2.2/§7.7) — None on a single device or
    for clips too short to shard."""
    from avd_tpu.parallel import distributed
    mesh = distributed.cp_mesh()
    n = s320.shape[0]
    if mesh is None or n < 2 * mesh.shape["time"]:
        return None
    import jax.numpy as jnp

    d = mesh.shape["time"]
    # pad to power-of-two multiples of the mesh size so clip lengths map
    # to a handful of compiled shapes
    per = -(-n // d)
    bucket = 1
    while bucket < per:
        bucket *= 2
    n_pad = bucket * d
    if n_pad != n:
        s320 = np.concatenate([s320, np.repeat(s320[-1:], n_pad - n, 0)])
        s32 = np.concatenate([s32, np.repeat(s32[-1:], n_pad - n, 0)])
    fn = _cp_fn(mesh)
    ham, fmean, fvar, _valid = fn(jnp.asarray(s320), jnp.asarray(s32))
    k = n - 1  # real consecutive pairs; padded rows are self-pairs
    out = (np.asarray(ham)[:k], np.asarray(fmean)[:k],
           np.asarray(fvar)[:k])
    mark_device_warm()  # a real device program completed
    return out


def compute_features(frames: np.ndarray) -> Dict:
    """Per-frame feature lists for a [N, H, W, 3] uint8 BGR batch.

    Output dict matches ``oracle.video_ref.compute_features`` so the same
    summarize() assembles the analyzer result.
    """
    n = frames.shape[0]
    feats = {"dup": 0, "total": n, "flow_means": [], "flow_vars": [],
             "textures": [], "timeline_ai": []}
    if n == 0:
        return feats

    sinks = ([], [], [], [])
    if _prep_mode() == "host":
        if _gate_enabled():
            small320, small32, tex = _host_prep(frames)
            return _compute_features_gated(feats, small320, small32, tex)
        from avd_tpu.parallel import distributed
        if distributed.cp_mesh() is not None:
            small320, small32, tex = _host_prep(frames)
            cp = _cp_features(small320, small32)
            if cp is not None:
                return _assemble(feats, list(tex), *(list(x) for x in cp))
        # windowed dispatch via the streaming path: host prep of window
        # k+1 overlaps the tunnel put of window k on the dispatch worker
        # (identical results by construction; a CP mesh too small for this
        # clip falls through here and just re-preps the few frames)
        return compute_features_streaming(
            frames[i:i + _DEFAULT_CHUNK]
            for i in range(0, n, _DEFAULT_CHUNK))
    else:
        gray = _to_gray_host(frames)
        h, w = gray.shape[1:3]
        chunk = _chunk_size(h, w)
        start = 0
        while start < n:
            valid = min(chunk, n - start)
            lead = gray[start - 1] if start > 0 else gray[0]
            window = _pad_window(
                np.concatenate([lead[None], gray[start:start + valid]]),
                chunk + 1)
            tex, ham, fmean, fvar = run_window(window)
            _window_slices(start, valid, tex, ham, fmean, fvar, sinks)
            start += valid

    return _assemble(feats, *sinks)


def compute_features_streaming(chunk_iter) -> Dict:
    """Streaming variant: consume an iterator of [k, H, W, 3] BGR chunks.

    Device calls are dispatched asynchronously as windows fill, so decode
    and host preprocessing overlap device compute — the double-buffered
    pipeline for long/4K clips (BASELINE.json config #3).  Results are
    identical to compute_features() on the concatenated frames.
    """
    import jax.numpy as jnp

    from avd_tpu.serve import batching

    host_mode = _prep_mode() == "host"
    chunk = _DEFAULT_CHUNK if host_mode else None
    batcher = batching.active_batcher() if host_mode else None
    packed_mode = host_mode and batcher is None

    pend: list = []      # (device_outs, valid, is_first, window_len)
    tex_parts: list = []
    held = None          # tuple of np arrays not yet dispatched
    prev_last = None     # tuple of lead-in frames
    n_total = 0

    def dispatch(parts):
        nonlocal prev_last
        valid = parts[0].shape[0]
        target = _bucket_len(valid + 1, chunk)
        leads = prev_last if prev_last is not None else \
            tuple(p[0] for p in parts)
        windows = [_pad_window(np.concatenate([ld[None], p]), target)
                   for ld, p in zip(leads, parts)]
        if batcher is not None:
            outs = batcher.submit_prep(*windows)  # future (cross-request)
        elif packed_mode:
            # motion proxy over the VALID prefix only: _pad_window
            # repeats the last frame, and those zero deltas would dilute
            # the proxy — a short high-motion run padded into the full
            # bucket could slip under the threshold and ship noise-like
            # deltas (the measured lose case, ~136 vs 108 ms)
            d = _use_delta(windows[0][:valid + 1], target, chunk)
            fn = _compiled_prep_packed(target, d)
            packed = _pack_prep_window(*windows, delta=d)
            # future of a device array: the tunnel put runs on the
            # dispatch worker, overlapped with next-chunk decode + prep
            # (delta-encoded puts compress in the tunnel — _h2d_delta)
            outs = _dispatch_pool().submit(
                lambda fn=fn, p=packed: fn(jnp.asarray(p)))
        else:  # device-prep mode: full-res gray windows
            fn = _compiled_chunk(target, *parts[0].shape[1:3])
            outs = fn(*(jnp.asarray(w) for w in windows))  # async jax
        pend.append((outs, valid, prev_last is None, target))
        prev_last = tuple(p[-1] for p in parts)

    for frames in chunk_iter:
        if frames.shape[0] == 0:
            continue
        if host_mode:
            s320, s32, tex = _host_prep(frames)
            tex_parts.append(tex)
            parts = (s320, s32)
        else:
            gray = _to_gray_host(frames)
            if chunk is None:
                chunk = _chunk_size(*gray.shape[1:3])
            parts = (gray,)
        if held is not None:
            parts = tuple(np.concatenate([h_, p])
                          for h_, p in zip(held, parts))
            held = None
        while parts[0].shape[0] >= chunk:
            dispatch(tuple(p[:chunk] for p in parts))
            n_total += chunk
            parts = tuple(p[chunk:] for p in parts)
        held = parts if parts[0].shape[0] else None
    if held is not None and held[0].shape[0]:
        n_total += held[0].shape[0]
        dispatch(held)

    feats = {"dup": 0, "total": n_total, "flow_means": [], "flow_vars": [],
             "textures": [], "timeline_ai": []}
    if n_total == 0:
        return feats

    if packed_mode and pend:
        # resolve dispatch futures → device arrays (puts already in flight)
        pend = [(outs.result(), valid, is_first, target)
                for outs, valid, is_first, target in pend]
        # fetch packed windows in groups of equal shape: one D2H round trip
        # per group (tail windows use a smaller bucket and fetch alone)
        fetched = []
        i = 0
        while i < len(pend):
            group = [pend[i]]
            while (len(group) < _FETCH_GROUP and i + len(group) < len(pend)
                   and pend[i + len(group)][3] == group[0][3]):
                group.append(pend[i + len(group)])
            if len(group) == 1:
                fetched.append(np.asarray(group[0][0]))
            else:
                stk = _compiled_stack_fetch(len(group))
                arr = np.asarray(stk(*(g[0] for g in group)))
                fetched.extend(arr[j] for j in range(len(group)))
            i += len(group)
        pend = [(_unpack_prep_out(vec, target), valid, is_first, target)
                for vec, (_, valid, is_first, target) in zip(fetched, pend)]
        mark_device_warm()

    sinks = ([], [], [], [])
    start = 0
    for outs, valid, is_first, target in pend:
        if batcher is not None:
            outs = outs.result()
        if host_mode:
            ham, fmean, fvar = outs
            tex = None
        else:
            tex, ham, fmean, fvar = outs
        _window_slices(0 if is_first else 1, valid, tex, ham, fmean, fvar,
                       sinks)
        start += valid
    if host_mode:
        sinks = (np.concatenate(tex_parts).tolist(),) + tuple(sinks[1:])
    mark_device_warm()
    return _assemble(feats, *sinks)


def analyze_frames(frames: np.ndarray, w: int, h: int, fps: float,
                   duration: float) -> Dict:
    """Full TPU video analysis over a decoded batch (mirrors
    oracle.video_ref.analyze_frames)."""
    feats = compute_features(frames)
    return video_ref.summarize(feats, w, h, fps, duration)
