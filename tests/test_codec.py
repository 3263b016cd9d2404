"""Real-codec round-trip helper (avd_tpu/ingest/codec.py + the
avd_venc_write encoder in native/src/avd_decode.cc).

The robustness eval and training augmentation depend on three
properties asserted here: every input frame comes back (the zero-
duration edit-list trim regression), severity is monotone in CRF, and
all three in-image encoder families work.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest

from avd_tpu.ingest import codec
from avd_tpu.native import decode

pytestmark = pytest.mark.skipif(not codec.available(),
                                reason="libav* encoder unavailable")


def _frames(n=12, size=64, seed=0):
    """Smooth drifting scene + mild noise.  Deliberately NOT per-pixel
    random chroma: 4:2:0 subsampling would dominate the error and mask
    what the quantizer does."""
    rng = np.random.default_rng(seed)
    coarse = rng.random((8, 8, 3)).astype(np.float32)
    base = np.repeat(np.repeat(coarse, size // 8, 0), size // 8, 1)
    out = np.empty((n, size, size, 3), np.float32)
    for t in range(n):
        out[t] = np.clip(np.roll(base, 2 * t, axis=1)
                         + rng.normal(0, 0.02, base.shape), 0, 1)
    return out


@pytest.mark.parametrize("codec_name", ["libx264", "libx265", "mpeg4"])
def test_encode_decode_all_frames(codec_name, tmp_path):
    """Every encoded frame decodes back — including the LAST one (a
    zero pkt->duration put the final sample on the mp4 edit-list
    boundary, where demuxers DISCARD-flag it)."""
    frames = (_frames(n=13) * 255).astype(np.uint8)[..., ::-1]
    path = str(tmp_path / "clip.mp4")
    assert decode.encode_video(path, frames, fps=12, codec=codec_name,
                               crf=28, gop=5)
    vs = decode.VideoSampler.open(path, 1)
    out = np.concatenate([f.copy() for f, _ in vs.chunks(8)])
    vs.close()
    assert out.shape == frames.shape
    # content sanity: decoded frames track their sources, not neighbors
    src = frames.astype(np.float32)
    dec = out.astype(np.float32)
    mse_aligned = float(np.mean((dec - src) ** 2))
    mse_shifted = float(np.mean((dec[1:] - src[:-1]) ** 2))
    assert mse_aligned < mse_shifted


def test_crf_monotone_severity():
    frames = _frames(n=8)
    prev = None
    for crf in codec.CRF_SWEEP:
        out = codec.roundtrip_frames(frames, crf=crf,
                                     rng=np.random.default_rng(1))
        assert out.shape == frames.shape
        assert out.dtype == np.float32
        mse = float(np.mean((out - frames) ** 2))
        if prev is not None:
            assert mse > prev * 0.99, (crf, mse, prev)
        prev = mse


def test_roundtrip_sequences_shape_and_quality():
    seqs = np.stack([_frames(n=6, seed=s) for s in range(2)])
    out = codec.roundtrip_sequences(seqs, crf=18)
    assert out.shape == seqs.shape
    # near-transparent CRF stays close to the source
    assert float(np.mean((out - seqs) ** 2)) < 0.01


def test_odd_dimensions_rejected():
    frames = (np.zeros((4, 63, 64, 3)) * 255).astype(np.uint8)
    fd, path = tempfile.mkstemp(suffix=".mp4")
    os.close(fd)
    try:
        assert not decode.encode_video(path, frames, fps=12,
                                       codec="libx264", crf=28)
    finally:
        os.unlink(path)


def test_mini_clip_isolation():
    """roundtrip_frames groups mini-clips with gop=clip_len: prediction
    never crosses unrelated frames, so a black frame next to a white
    frame comes back black."""
    frames = np.zeros((4, 64, 64, 3), np.float32)
    frames[1::2] = 1.0
    out = codec.roundtrip_frames(frames, crf=18,
                                 rng=np.random.default_rng(0))
    assert float(np.abs(out[0]).mean()) < 0.02
    assert float(np.abs(out[1] - 1.0).mean()) < 0.02
