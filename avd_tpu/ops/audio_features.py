"""Batched audio spectral features on TPU.

The reference iterates 0.5 s windows in Python, one rFFT at a time, with a
scalar linear scan for the spectral rolloff
(/root/reference/app/analyzers/audio.py:40-61).  Here all full windows form
one ``[n_windows, 8000]`` matrix: a single jitted program computes RMS,
zero-crossing rate, Hann-windowed rFFT, spectral flatness, the 85 % rolloff
(vectorized cumsum + argmax instead of the scalar scan), and the normalized
centroid for every window at once.

The final *ragged* window (fewer than 8000 samples) has a different rFFT
length, so it cannot share the static-shape program; it is computed on the
host with the identical formulas (``avd_tpu.oracle.audio_ref``) and
appended.  Aggregation (percentiles, variances, tts_like, timeline
normalization) runs on host in float64 for bit-parity with the oracle.

Precision split (why this path can be the default within the 1e-3
ai_score budget): every feature except spectral flatness is insensitive
to f32 — the s16/32768 samples are exactly representable, zcr/rms are
short exact reductions, rolloff/centroid errors are sub-bin.  Flatness
(exp(mean(log|FFT|)), audio.py:47-50) is the one pathology: on
spectrally-pure signals the true sidelobe magnitudes sit *below* the f32
FFT noise floor, so their logs are garbage and norm01 amplifies the
noise across the timeline.  Those clips identify themselves — some
window's flatness lands near zero — so when ``min(flat) <
AVD_AUDIO_FLAT_FLOOR`` (default 1e-3) the flatness column alone is
recomputed on host with one vectorized float64 rFFT; realistic
speech/music/noise (flatness ≫ 1e-3 in every window) never triggers it.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import numpy as np

from avd_tpu.oracle import audio_ref

_WINDOW_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)


def _bucket(n: int) -> int:
    for b in _WINDOW_BUCKETS:
        if n <= b:
            return b
    return n


@functools.lru_cache(maxsize=8)
def _compiled_features(batch: int, win: int):
    import jax
    import jax.numpy as jnp

    hann = np.hanning(win).astype(np.float32)
    n_mag = win // 2 + 1
    freqs = np.linspace(0.0, 1.0, n_mag).astype(np.float32)

    @jax.jit
    def features(seg: jnp.ndarray):
        # seg: [batch, win] f32
        rms = jnp.sqrt(jnp.mean(seg ** 2, axis=1))
        sign = jnp.sign(seg)
        zcr = jnp.mean(jnp.abs(sign[:, 1:] - sign[:, :-1]), axis=1) / 2.0
        spec = jnp.fft.rfft(seg * hann[None, :], axis=1)
        mag = jnp.abs(spec) + 1e-9
        flat = jnp.exp(jnp.mean(jnp.log(mag), axis=1)) / jnp.mean(mag, axis=1)
        csum = jnp.cumsum(mag, axis=1)
        cutoff = 0.85 * csum[:, -1:]
        # first index reaching the cutoff; argmax of bool = first True,
        # 0 when none — same fallback as the reference's scan.
        idx = jnp.argmax(csum >= cutoff, axis=1)
        roll = idx.astype(jnp.float32) / max(1.0, float(n_mag))
        denom = jnp.sum(mag, axis=1)
        cent = jnp.sum(freqs[None, :] * mag, axis=1) / denom
        return rms, zcr, flat, roll, cent

    return features


def window_features(wav: np.ndarray, sr: int) -> Dict[str, list]:
    """Per-window feature lists matching audio_ref.window_features, with all
    full windows computed batched on device."""
    win = max(1, int(sr * 0.5)) if sr else 1
    n_full = len(wav) // win
    tail = wav[n_full * win:]

    out = {"rms": [], "zcr": [], "flat": [], "roll": [], "cent": []}
    if n_full:
        import jax.numpy as jnp
        segs = wav[: n_full * win].reshape(n_full, win).astype(np.float32)
        b = _bucket(n_full)
        if b != n_full:
            segs = np.concatenate(
                [segs, np.zeros((b - n_full, win), np.float32)])
        fn = _compiled_features(b, win)
        rms, zcr, flat, roll, cent = (np.asarray(x)[:n_full]
                                      for x in fn(jnp.asarray(segs)))
        out["rms"] = [float(x) for x in rms]
        out["zcr"] = [float(x) for x in zcr]
        out["flat"] = [float(x) for x in flat]
        out["roll"] = [float(x) for x in roll]
        out["cent"] = [float(x) for x in cent]

        floor = float(os.getenv("AVD_AUDIO_FLAT_FLOOR", "1e-3"))
        if min(out["flat"]) < floor:
            # tonal content: redo flatness in float64 on host (vectorized,
            # one rFFT call), keep the device values for everything else
            segs64 = (wav[: n_full * win].reshape(n_full, win)
                      .astype(np.float64))
            mag = np.abs(np.fft.rfft(segs64 * np.hanning(win)[None, :],
                                     axis=1)) + 1e-9
            flat64 = (np.exp(np.mean(np.log(mag), axis=1))
                      / np.mean(mag, axis=1))
            out["flat"] = [float(x) for x in flat64]

    if tail.size:
        t = audio_ref.window_features(tail.astype(np.float64), sr)
        for k in out:
            out[k].extend(t[k])
    return out


def analyze_waveform(wav: np.ndarray, sr: int) -> Dict:
    """Full audio analysis: device windows + host float64 aggregation."""
    if wav.ndim > 1:
        wav = wav[:, 0]
    dur = len(wav) / sr if sr > 0 else 0.0
    return audio_ref.aggregate(window_features(wav, sr), dur)
