"""C++ host runtime: build, bit-exact gray conversion, WAV decode,
resampler quality."""

import os

import numpy as np
import pytest

from avd_tpu import native
from tests import fixtures

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="no C++ toolchain")


def test_gray_bit_exact_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (4, 60, 70, 3),
                          dtype=np.int64).astype(np.uint8)
    ours = native.bgr_to_gray(frames)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(ours[i], cv2.cvtColor(
            f, cv2.COLOR_BGR2GRAY))


def test_gray_threaded_large():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, 512, 512, 3),
                          dtype=np.int64).astype(np.uint8)
    ours = native.bgr_to_gray(frames)
    f = frames.astype(np.int64)
    ref = ((f[..., 2] * 9798 + f[..., 1] * 19235 + f[..., 0] * 3735
            + (1 << 14)) >> 15).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_wav_decode_s16_mono(tmp_path):
    wav = fixtures.sine_wav(1.0)
    path = fixtures.write_wav(tmp_path / "a.wav", wav)
    with open(path, "rb") as f:
        decoded = native.wav_decode_mono(f.read())
    assert decoded is not None
    data, sr = decoded
    assert sr == 16000
    np.testing.assert_allclose(data, np.clip(wav, -1, 1), atol=1e-3)


def test_wav_decode_stereo_downmix(tmp_path):
    import wave as wave_mod
    left = fixtures.sine_wav(0.5, freq=440.0)
    right = fixtures.sine_wav(0.5, freq=880.0)
    inter = np.empty(left.size * 2, np.float32)
    inter[0::2] = left
    inter[1::2] = right
    pcm = np.clip(inter * 32767, -32768, 32767).astype("<i2")
    p = tmp_path / "st.wav"
    with wave_mod.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    with open(p, "rb") as f:
        data, sr = native.wav_decode_mono(f.read())
    np.testing.assert_allclose(data, (left + right) / 2, atol=2e-3)


def test_resample_tone_preserved():
    sr_in, sr_out = 48000, 16000
    t = np.arange(int(0.5 * sr_in)) / sr_in
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    from math import gcd
    g = gcd(sr_in, sr_out)
    out = native.resample(tone, sr_out // g, sr_in // g)
    t2 = np.arange(out.shape[0]) / sr_out
    ref = np.sin(2 * np.pi * 440.0 * t2)
    # ignore filter edges
    sl = slice(100, -100)
    assert np.abs(out[sl] - ref[sl]).max() < 0.02


def test_garbage_wav_rejected():
    assert native.wav_decode_mono(b"not a wav file at all") is None


def test_prep320_fused_bit_exact_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(11)
    for (h, w) in [(1080, 1920), (333, 517), (321, 321), (480, 640)]:
        gray = rng.integers(0, 256, (2, h, w), np.uint8)
        out = native.prep320(gray)
        if out is None:
            pytest.skip("native lib unavailable")
        lap, area, lin = out
        for i in range(2):
            np.testing.assert_array_equal(
                lin[i], cv2.resize(gray[i], (320, 320),
                                   interpolation=cv2.INTER_LINEAR))
            ref_area = cv2.resize(gray[i], (32, 32),
                                  interpolation=cv2.INTER_AREA)
            # ±1: cv2's area path accumulates in float32 (and fixed-point
            # for integer ratios); ties can round differently from our
            # float64 sweep.  ai_score parity is gated elsewhere.
            assert np.abs(area[i].astype(int)
                          - ref_area.astype(int)).max() <= 1
            ref_lap = cv2.Laplacian(gray[i], cv2.CV_64F).var()
            assert abs(lap[i] - ref_lap) <= 1e-9 * max(1.0, abs(ref_lap))


def test_prep320_bgr_matches_gray_path():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(13)
    for (h, w) in [(1080, 1920), (720, 1280), (333, 517), (321, 321)]:
        frames = rng.integers(0, 256, (2, h, w, 3), np.uint8)
        out = native.prep320_bgr(frames)
        if out is None:
            pytest.skip("native lib unavailable")
        lap_b, area_b, lin_b = out
        gray = np.stack([cv2.cvtColor(frames[i], cv2.COLOR_BGR2GRAY)
                         for i in range(2)])
        lap_g, area_g, lin_g = native.prep320(gray)
        # the BGR-fused sweep must be bit-identical to gray-then-prep
        np.testing.assert_array_equal(area_b, area_g)
        np.testing.assert_array_equal(lin_b, lin_g)
        np.testing.assert_allclose(lap_b, lap_g, rtol=0, atol=0)
    assert native.prep320_bgr(
        rng.integers(0, 256, (1, 320, 640, 3), np.uint8)) is None


def test_prep320_declines_non_downscale():
    if native.lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(12)
    assert native.prep320(rng.integers(0, 256, (1, 320, 640), np.uint8)) \
        is None
    assert native.prep320(rng.integers(0, 256, (1, 640, 100), np.uint8)) \
        is None


def _wav_header(fmt_body: bytes, declared_len: int, data: bytes = b"") -> bytes:
    """Assemble RIFF/WAVE bytes with an fmt chunk whose DECLARED length can
    exceed the bytes actually present (truncated-upload shapes)."""
    chunks = b"fmt " + declared_len.to_bytes(4, "little") + fmt_body
    if data:
        chunks += b"data" + len(data).to_bytes(4, "little") + data
    riff = b"WAVE" + chunks
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def test_wav_truncated_extensible_fmt_rejected_safely():
    """A fmt chunk declaring WAVE_FORMAT_EXTENSIBLE (0xFFFE, chunk_len 40)
    but truncated before the sub-format u16 at fmt+24 must be rejected
    without reading past the uploaded bytes (avd_native.cc wav_info)."""
    body = bytearray(24)  # file ends 24 bytes into a declared-40 chunk
    body[0:2] = (0xFFFE).to_bytes(2, "little")
    body[2:4] = (1).to_bytes(2, "little")       # channels
    body[4:8] = (16000).to_bytes(4, "little")   # sample rate
    body[14:16] = (16).to_bytes(2, "little")    # bits
    data = _wav_header(bytes(body), declared_len=40)
    assert len(data) == 44  # minimum accepted size; fmt+24 is exactly OOB
    assert native.wav_decode_mono(data) is None


def test_wav_extensible_full_fmt_decodes():
    """A well-formed WAVE_FORMAT_EXTENSIBLE (PCM sub-format) still decodes."""
    body = bytearray(40)
    body[0:2] = (0xFFFE).to_bytes(2, "little")
    body[2:4] = (1).to_bytes(2, "little")
    body[4:8] = (16000).to_bytes(4, "little")
    body[8:12] = (32000).to_bytes(4, "little")  # byte rate
    body[12:14] = (2).to_bytes(2, "little")     # block align
    body[14:16] = (16).to_bytes(2, "little")
    body[16:18] = (22).to_bytes(2, "little")    # cbSize
    body[18:20] = (16).to_bytes(2, "little")    # valid bits
    body[24:26] = (1).to_bytes(2, "little")     # sub-format: PCM
    pcm = (np.sin(np.linspace(0, 20, 400)) * 20000).astype("<i2")
    decoded = native.wav_decode_mono(
        _wav_header(bytes(body), declared_len=40, data=pcm.tobytes()))
    assert decoded is not None
    out, sr = decoded
    assert sr == 16000
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0,
                               atol=1e-6)


def test_laplacian_var_degenerate_dims_safe():
    """1-pixel-high/wide frames (decodable degenerate uploads) must not
    read out of bounds; semantics match numpy 'reflect' padding, which
    equals cv2 REFLECT_101 for len>=2 and its len==1 edge special-case."""
    rng = np.random.default_rng(21)

    def ref_var(g):
        p = np.pad(g.astype(np.float64), 1, mode="reflect")
        lap = (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
               - 4.0 * p[1:-1, 1:-1])
        return lap.var()

    for shape in [(3, 1, 64), (3, 64, 1), (2, 1, 1), (2, 2, 2)]:
        gray = rng.integers(0, 256, shape, np.uint8)
        out = native.laplacian_var(gray)
        assert out is not None and np.all(np.isfinite(out))
        for i in range(shape[0]):
            assert abs(out[i] - ref_var(gray[i])) < 1e-9 * max(
                1.0, ref_var(gray[i]))
    # zero-pixel frames decline cleanly instead of dividing by zero
    assert native.laplacian_var(np.zeros((1, 0, 5), np.uint8)) is None


def test_ensure_so_atomic_and_sourceless(tmp_path):
    import ctypes as ct
    import importlib
    # the package's _build() function shadows the submodule on attribute
    # access, so resolve the module explicitly
    bld = importlib.import_module("avd_tpu.native._build")

    src = tmp_path / "s.cc"
    src.write_text('extern "C" int avd_answer() { return 42; }\n')
    so = str(tmp_path / "out.so")

    def cmd(out):
        return ["g++", "-shared", "-fPIC", "-o", out, str(src)]

    # failed compile leaves NO artifact at the output path (atomicity)
    bad_src = tmp_path / "bad.cc"
    bad_src.write_text("this is not C++")
    assert not bld.ensure_so(str(bad_src), so,
                             lambda o: ["g++", "-shared", "-fPIC", "-o", o,
                                        str(bad_src)], 60)
    assert not os.path.exists(so)

    assert bld.ensure_so(str(src), so, cmd, 60)
    assert os.path.exists(so)

    # corrupt artifact + force=True → rebuilt loadable library (load only
    # the final artifact: dlopening then overwriting the mapped file
    # in-place would SIGBUS the process, which is exactly the failure
    # mode the loaders' rebuild-on-OSError path exists to avoid)
    with open(so, "wb") as f:
        f.write(b"garbage not elf")
    with pytest.raises(OSError):
        ct.CDLL(so)
    assert bld.ensure_so(str(src), so, cmd, 60, force=True)
    assert ct.CDLL(so).avd_answer() == 42

    # prebuilt .so without source is accepted as a candidate ...
    src.unlink()
    assert bld.ensure_so(str(src), so, cmd, 60)
    # ... but nothing to build from when both are missing
    assert not bld.ensure_so(str(src), str(tmp_path / "none.so"), cmd, 60)
