#!/usr/bin/env python
"""Headline benchmark: video-forensics frames/sec/chip at 1080p.

Measures the full per-frame feature pipeline (grayscale, average-hash
duplicate detection, full-res Laplacian texture variance, 320×320 Farnebäck
optical flow per consecutive pair, AI-suspicion timeline) on:

* the TPU path (``avd_tpu.ops.video_features`` — batched jitted XLA), and
* the CPU reference path (``avd_tpu.oracle.video_ref`` — the
  reference-faithful numpy/OpenCV loop, i.e. what
  /root/reference/app/analyzers/video.py:27-58 does per frame).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup over the measured CPU run (BASELINE.md target:
>= 10x).  The reference publishes no numbers of its own (BASELINE.json
"published": {}).
"""

import json
import os
import sys
import time

import numpy as np

N_FRAMES = int(os.getenv("AVD_BENCH_FRAMES", "145"))
# resolution override: AVD_BENCH_RES=4k measures BASELINE.json config #3
_RES = {"1080p": (1080, 1920), "4k": (2160, 3840), "720p": (720, 1280)}
H, W = _RES[os.getenv("AVD_BENCH_RES", "1080p")]
CPU_FRAMES = int(os.getenv("AVD_BENCH_CPU_FRAMES", "31"))
REPS = int(os.getenv("AVD_BENCH_REPS", "5"))
CPU_REPS = int(os.getenv("AVD_BENCH_CPU_REPS", "3"))
DECODE_CHUNK = 29  # frames per simulated decode chunk (streaming mode)


def make_frames(n: int) -> np.ndarray:
    """Deterministic textured frames with real motion.

    AVD_BENCH_CONTENT=noise switches to per-frame uncorrelated noise —
    the flow solver's worst case (chaotic flow maximizes the warp
    kernel's displacement boxes; device stage measured ~3.6× slower than
    on panning content, docs/PERFORMANCE.md round 2b) — for honest
    content-dependence measurement.
    """
    rng = np.random.default_rng(0)
    content = os.getenv("AVD_BENCH_CONTENT", "pan")
    if content == "noise":
        return rng.integers(0, 256, (n, H, W, 3), dtype=np.int16) \
                  .astype(np.uint8)
    if content == "static":
        # still textured scene (talking-head/CCTV-like): the adaptive
        # H2D delta encoding's best case (near-zero frame deltas
        # compress in the tunnel — ops/video_features._h2d_delta_mode)
        base = rng.integers(0, 256, (H, W, 3), dtype=np.int16) \
                  .astype(np.uint8)
        try:
            import cv2
            base = cv2.GaussianBlur(base, (0, 0), 2)
        except Exception:
            pass
        return np.broadcast_to(base, (n, H, W, 3)).copy()
    base = rng.integers(0, 256, (H + 64, W + 64, 3),
                        dtype=np.int16).astype(np.uint8)
    try:
        import cv2
        base = cv2.GaussianBlur(base, (0, 0), 2)
    except Exception:
        pass
    frames = np.empty((n, H, W, 3), np.uint8)
    for i in range(n):
        dy, dx = (i * 3) % 64, (i * 5) % 64
        frames[i] = base[dy:dy + H, dx:dx + W]
    return frames


def bench_tpu(frames: np.ndarray) -> list:
    """Steady-state streaming throughput: decode-sized chunks flow through
    host prep + async device dispatch (the serving configuration).
    Returns the per-rep fps list (headline = best; median and spread are
    emitted next to it so the recorded number carries its own noise bar
    — VERDICT r4 #2)."""
    from avd_tpu.ops import video_features

    def chunks():
        for i in range(0, len(frames), DECODE_CHUNK):
            yield frames[i:i + DECODE_CHUNK]

    video_features.compute_features_streaming(chunks())  # compile + warm
    fps = []
    for _ in range(REPS):
        t = time.perf_counter()
        video_features.compute_features_streaming(chunks())
        fps.append(len(frames) / (time.perf_counter() - t))
    return fps


def bench_device_resident(frames: np.ndarray) -> float:
    """Device-stage fps with the packed window already RESIDENT in HBM —
    isolates the jitted feature program from the tunnel put, so a noisy
    headline can be attributed (host/tunnel vs device) from the bench
    JSON alone.  Uses the production 49-frame prep program."""
    import jax
    import jax.numpy as jnp

    from avd_tpu.ops import video_features as vf

    n = min(49, len(frames))
    s320, s32, _ = vf._host_prep(frames[:n])
    fn = vf._compiled_prep_packed(n, False)
    dev = jax.device_put(jnp.asarray(vf._pack_prep_window(s320, s32)))
    float(np.asarray(fn(dev))[0])  # compile + warm (axon: scalar fetch)
    chain = 8
    best = float("inf")
    for _ in range(REPS):
        t = time.perf_counter()
        for _ in range(chain):
            out = fn(dev)
        float(np.asarray(out)[0])  # force completion
        best = min(best, time.perf_counter() - t)
    return n * chain / best


def bench_cpu(frames: np.ndarray) -> float:
    """Median of CPU_REPS timed oracle runs over CPU_FRAMES frames.

    The shared host core carries 2-5x timing noise from neighbor tenants;
    a 13-frame best-of-2 (round 1) swung the recorded ratio +-15%.  31
    frames x median-of-3 keeps the recorded speedup reproducible within
    ~5% run to run (VERDICT round 1, item 9)."""
    import statistics

    from avd_tpu.oracle import video_ref
    times = []
    for _ in range(CPU_REPS):
        t = time.perf_counter()
        video_ref.compute_features(frames)
        times.append(time.perf_counter() - t)
    return len(frames) / statistics.median(times)


def bench_latency() -> dict:
    """Secondary config (BASELINE.json metric #2): p50 end-to-end
    analyze_path latency for a 60 s 1080p clip, decode included.
    Run via AVD_BENCH_MODE=latency."""
    import statistics
    import tempfile

    import cv2

    from avd_tpu import pipeline

    secs = int(os.getenv("AVD_BENCH_CLIP_SECS", "60"))
    path = os.path.join(tempfile.gettempdir(), f"avd_bench_{secs}s.mp4")
    if not os.path.exists(path):
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             30.0, (W, H))
        base = make_frames(64)
        for i in range(secs * 30):
            vw.write(base[i % 64])
        vw.release()

    pipeline.analyze_path(path)  # warm (compiles cached)
    times = []
    for _ in range(3):
        t = time.perf_counter()
        out = pipeline.analyze_path(path)
        times.append(time.perf_counter() - t)
    assert out["result"]["label"] in ("real", "ai", "uncertain")
    p50 = statistics.median(times)
    return {
        "metric": f"analyze_latency_p50_{secs}s_1080p",
        "value": round(p50, 2),
        "unit": "seconds",
        "vs_baseline": 0.0,
    }


def main() -> int:
    if os.getenv("AVD_BENCH_MODE") == "latency":
        print(json.dumps(bench_latency()))
        return 0
    import statistics

    frames = make_frames(N_FRAMES)
    fps_reps = bench_tpu(frames)
    tpu_fps = max(fps_reps)
    try:
        device_fps = (bench_device_resident(frames)
                      if os.getenv("AVD_BENCH_DEVICE_STAGE", "1") != "0"
                      else 0.0)
    except Exception:
        device_fps = 0.0
    cpu_fps = bench_cpu(frames[:CPU_FRAMES])
    out = {
        "metric": ("video_forensics_frames_per_sec_"
                   + os.getenv("AVD_BENCH_RES", "1080p")),
        "value": round(tpu_fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
        "cpu_fps": round(cpu_fps, 2),
        # noise bar (VERDICT r4 #2): the headline stays best-of-N for
        # round-over-round comparability; median+spread say how much the
        # shared-host tenant noise moved this capture, and the
        # device-resident fps attributes a drop (tunnel/host vs device)
        "tpu_fps_reps": [round(f, 1) for f in fps_reps],
        "tpu_fps_median": round(statistics.median(fps_reps), 2),
        "tpu_fps_spread": round(max(fps_reps) - min(fps_reps), 2),
        "device_stage_fps": round(device_fps, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
