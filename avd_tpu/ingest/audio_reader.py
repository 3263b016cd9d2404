"""Mono 16 kHz audio extraction.

The reference pipes the container through ``ffmpeg -ac 1 -ar 16000`` to a
temp WAV and reads it with libsndfile as float32
(/root/reference/app/analyzers/audio.py:7-20).  Backends here:

1. ``ffmpeg`` subprocess → raw s16le pipe (no temp file, no libsndfile) when
   the binary exists; sample values are bit-identical to the reference's
   WAV-roundtrip path (s16 / 32768 → float32).
2. Native libav* extraction (avd_tpu/native/src/avd_decode.cc): the same
   libavcodec + libswresample pipeline the ffmpeg CLI wraps, linked
   directly — covers mp4/AAC/any-container audio on hosts without the
   binary.
3. Native WAV read (stdlib ``wave``) + polyphase resample/downmix for .wav
   inputs — covers hosts without ffmpeg or libav*.
4. Otherwise ``AudioExtractError("ffmpeg_convert_failed")`` — the same error
   string the reference raises (audio.py:13), which the analyzer maps to the
   neutral timeline contract (audio.py:112-118).
"""

from __future__ import annotations

import shutil
import subprocess
import wave
from typing import Tuple

import numpy as np

TARGET_SR = 16000


class AudioExtractError(RuntimeError):
    pass


def _ffmpeg_pcm(path: str, sr: int = TARGET_SR) -> np.ndarray:
    cmd = [
        "ffmpeg", "-v", "error", "-i", path,
        "-ac", "1", "-ar", str(sr), "-f", "s16le", "-",
    ]
    try:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                              stderr=subprocess.DEVNULL, check=False)
    except OSError as e:
        raise AudioExtractError("ffmpeg_convert_failed") from e
    if proc.returncode != 0:
        raise AudioExtractError("ffmpeg_convert_failed")
    pcm = np.frombuffer(proc.stdout, dtype="<i2")
    return (pcm.astype(np.float32) / 32768.0)


def _read_wav_native(path: str) -> Tuple[np.ndarray, int]:
    """Stdlib WAV read → float32 in [-1, 1), shape [n] or [n, ch]."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) / 128.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise AudioExtractError("soundfile_read_failed")
    if ch > 1:
        data = data.reshape(-1, ch)
    return data, sr


def _resample(x: np.ndarray, sr: int, target: int) -> np.ndarray:
    if sr == target:
        return x
    from scipy.signal import resample_poly
    from math import gcd
    g = gcd(sr, target)
    return resample_poly(x, target // g, sr // g).astype(np.float32)


def load_mono_16k(path: str) -> Tuple[np.ndarray, int]:
    """Return (wav_float32_mono, sample_rate=16000).

    Raises AudioExtractError when no backend can produce audio, matching the
    reference's failure strings so the neutral-fallback contract and the
    ``flags_audio.error`` field stay byte-compatible.
    """
    if shutil.which("ffmpeg"):
        wav = _ffmpeg_pcm(path)
        return wav, TARGET_SR
    if not path.lower().endswith(".wav"):
        # libav*-linked extraction — s16-mono-16k semantics identical to
        # the CLI pipeline (same libswresample defaults)
        try:
            from avd_tpu.native import decode as native_decode
            got = native_decode.decode_audio_mono16k(path, TARGET_SR)
        except Exception:
            got = None
        if got is not None:
            return got[0], TARGET_SR
    if path.lower().endswith(".wav"):
        # C++ decoder (parse + downmix + windowed-sinc resample) first
        try:
            from avd_tpu import native
            with open(path, "rb") as f:
                decoded = native.wav_decode_mono(f.read())
            if decoded is not None:
                data, sr = decoded
                if sr != TARGET_SR:
                    from math import gcd
                    g = gcd(sr, TARGET_SR)
                    res = native.resample(data, TARGET_SR // g, sr // g)
                    if res is not None:
                        return res, TARGET_SR
                else:
                    return data, TARGET_SR
        except Exception:
            pass
        try:
            data, sr = _read_wav_native(path)
        except AudioExtractError:
            raise
        except Exception as e:
            raise AudioExtractError("soundfile_read_failed") from e
        if data.ndim > 1:
            # ffmpeg -ac 1 downmixes by averaging channels; mirror that.
            data = data.mean(axis=1)
        return _resample(data, sr, TARGET_SR), TARGET_SR
    raise AudioExtractError("ffmpeg_convert_failed")
