"""Audio analyzer — public entry point.

Contract from /root/reference/app/analyzers/audio.py: ``analyze(path, meta)``
returns ``{"scores": {...}, "flags_audio": {...}, "timeline": [...]}``; any
internal failure yields the neutral result
``{"scores": {}, "flags_audio": {"error": str(e)}, "timeline": [0.5]*tlen}``
with ``tlen = max(1, round(meta duration))`` (audio.py:112-118).

TPU-first architecture: the host extracts mono 16 kHz PCM
(``avd_tpu.ingest.audio_reader``); full 0.5 s windows are framed into a
``[n_windows, 8000]`` matrix and every spectral feature is computed batched
on device (``avd_tpu.ops.audio_features``); the single ragged tail window —
whose rFFT length differs, so it cannot share the batched static-shape
program — is computed on host with the identical formulas.
"""

from __future__ import annotations

import os
from typing import Any, Dict

from avd_tpu.ingest import audio_reader


def _backend() -> str:
    """Audio backend selection.

    Default is the batched device path with a precision split: all
    features run as one [n_windows, 8000] f32 program on device, and the
    spectral-flatness column alone is recomputed on host in float64 for
    the clips that need it — the reference's formula
    (exp(mean(log|FFT|)), audio.py:47-50) breaks under an f32 FFT only on
    spectrally-pure signals, and those identify themselves by some
    window's flatness landing below AVD_AUDIO_FLAT_FLOOR (see
    ops/audio_features.py).  Validated worst-case timeline deviation vs
    the f64 oracle: 5e-5 (pure tones exact via the guard) — well inside
    the 1e-3 ai_score budget.  AVD_AUDIO_BACKEND=host forces the float64
    host loop; AVD_BACKEND=oracle forces the host path globally.
    """
    if os.getenv("AVD_BACKEND", "jax") == "oracle":
        return "oracle"
    return os.getenv("AVD_AUDIO_BACKEND", "jax")


def _neutral(meta: dict, err: str) -> Dict[str, Any]:
    tlen = int(max(1, round(meta.get("duration") or 0.0)))
    return {"scores": {}, "flags_audio": {"error": err},
            "timeline": [0.5] * tlen}


def analyze(path: str, meta: dict) -> Dict[str, Any]:
    try:
        wav, sr = audio_reader.load_mono_16k(path)
        if wav.ndim > 1:
            wav = wav[:, 0]
        if _backend() == "jax":
            from avd_tpu.ops import audio_features
            return audio_features.analyze_waveform(wav, sr)
        from avd_tpu.oracle import audio_ref
        return audio_ref.analyze_waveform(wav.astype("float64"), sr)
    except Exception as e:  # neutral-fallback contract (audio.py:112-118)
        return _neutral(meta, str(e))
