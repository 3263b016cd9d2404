"""Deterministic golden-clip and waveform synthesis (SURVEY.md §4.1).

Videos are written with cv2 (mp4v) — solid color, noise, moving gradient,
spliced halves — audio as 16 kHz WAV files (sine = flat/TTS-like spectrum,
noise = variable).  Every generator is seeded and parameterized so the same
bytes are produced on every run.
"""

from __future__ import annotations

import wave

import numpy as np


def write_video(path: str, frames: np.ndarray, fps: float = 30.0) -> str:
    import cv2
    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                         fps, (w, h))
    assert vw.isOpened(), f"VideoWriter failed for {path}"
    for f in frames:
        vw.write(f)
    vw.release()
    return str(path)


def solid_clip(n: int = 60, size: int = 128,
               color=(40, 80, 120)) -> np.ndarray:
    f = np.zeros((n, size, size, 3), np.uint8)
    f[...] = np.array(color, np.uint8)
    return f


def noise_clip(n: int = 60, size: int = 128, seed: int = 7) -> np.ndarray:
    r = np.random.default_rng(seed)
    return r.integers(0, 256, (n, size, size, 3), dtype=np.uint8,
                      endpoint=False).astype(np.uint8)


def gradient_clip(n: int = 60, size: int = 128) -> np.ndarray:
    """Moving diagonal gradient — smooth motion, moderate texture."""
    ys, xs = np.mgrid[0:size, 0:size]
    frames = []
    for t in range(n):
        g = ((xs + ys + 5 * t) % 256).astype(np.int32)
        frames.append(np.stack([g, 255 - g, (g // 2 + 60) % 256], axis=-1))
    return np.stack(frames).astype(np.uint8)


def spliced_clip(n: int = 60, size: int = 128, seed: int = 3) -> np.ndarray:
    """First half static solid (AI-ish), second half noisy (real-ish)."""
    a = solid_clip(n // 2, size)
    b = noise_clip(n - n // 2, size, seed=seed)
    return np.concatenate([a, b])


def write_wav(path: str, wav: np.ndarray, sr: int = 16000) -> str:
    pcm = np.clip(wav * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return str(path)


def sine_wav(seconds: float = 4.0, sr: int = 16000,
             freq: float = 440.0) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def noise_wav(seconds: float = 4.0, sr: int = 16000,
              seed: int = 11) -> np.ndarray:
    r = np.random.default_rng(seed)
    return (0.3 * r.standard_normal(int(seconds * sr))).astype(np.float32)


def speechy_wav(seconds: float = 4.0, sr: int = 16000,
                seed: int = 5) -> np.ndarray:
    """Amplitude-modulated filtered noise — crude speech-like envelope."""
    r = np.random.default_rng(seed)
    n = int(seconds * sr)
    x = r.standard_normal(n)
    # cheap lowpass via cumulative smoothing
    k = np.hanning(64)
    x = np.convolve(x, k / k.sum(), mode="same")
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * np.arange(n) / sr))
    return (0.6 * x * env).astype(np.float32)
