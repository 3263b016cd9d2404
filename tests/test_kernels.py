"""Kernel unit tests: each JAX op against its cv2/numpy ground truth
(SURVEY.md §4.2)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp  # noqa: E402

from avd_tpu.ops import color, hashing, laplacian, resize  # noqa: E402
from avd_tpu.oracle import video_ref  # noqa: E402


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (6, 96, 128, 3), dtype=np.uint8,
                        endpoint=False).astype(np.uint8)


def test_gray_bit_exact(frames):
    ours = np.asarray(color.bgr_to_gray_u8(jnp.asarray(frames)))
    for i, f in enumerate(frames):
        ref = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(ours[i], ref)


def test_laplacian_variance(frames):
    gray = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2GRAY) for f in frames])
    ours = np.asarray(laplacian.texture_variance(
        jnp.asarray(gray, jnp.float32)))
    for i in range(len(frames)):
        ref = cv2.Laplacian(gray[i], cv2.CV_64F).var()
        assert abs(ours[i] - ref) < 1e-2 * max(1.0, ref)


def test_area_resize_exact_divisor():
    # 128→32 divides evenly: INTER_AREA is an exact box mean
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (128, 128), dtype=np.int64).astype(np.uint8)
    m = resize.area_matrix(128, 32)
    ours = np.asarray(resize.resize_matmul(
        jnp.asarray(img, jnp.float32)[None], m, m))[0]
    ref = cv2.resize(img, (32, 32), interpolation=cv2.INTER_AREA)
    assert np.abs(np.round(ours) - ref).max() <= 1.0


def test_linear_resize_close_to_cv2():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (96, 128), dtype=np.int64).astype(np.uint8)
    rm = resize.linear_matrix(96, 320, quantize=True)
    cm = resize.linear_matrix(128, 320, quantize=True)
    ours = np.asarray(resize.resize_matmul(
        jnp.asarray(img, jnp.float32)[None], rm, cm))[0]
    ref = cv2.resize(img, (320, 320), interpolation=cv2.INTER_LINEAR)
    # fixed-point accumulation differences of at most 1 gray level
    assert np.abs(np.clip(np.round(ours), 0, 255) - ref).max() <= 1.0
    assert (np.abs(np.clip(np.round(ours), 0, 255) - ref) > 0).mean() < 0.2


def test_average_hash_matches_oracle(frames):
    gray = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2GRAY) for f in frames])
    m_r = resize.area_matrix(96, 32)
    m_c = resize.area_matrix(128, 32)
    small = resize.resize_matmul(jnp.asarray(gray, jnp.float32), m_r, m_c)
    bits = np.asarray(hashing.average_hash_bits(jnp.round(small)))
    for i, f in enumerate(frames):
        ref = video_ref.average_hash(f, 32).astype(bool)
        agree = (bits[i] == ref).mean()
        assert agree > 0.97, f"hash bit agreement {agree}"


def test_duplicate_detection_on_identical_frames():
    f = np.full((4, 64, 64, 3), 77, np.uint8)
    gray = color.bgr_to_gray_f32(jnp.asarray(f))
    m = resize.area_matrix(64, 32)
    small = resize.resize_matmul(gray, m, m)
    bits = hashing.average_hash_bits(jnp.round(small))
    assert int(hashing.duplicate_count(bits)) == 3
    ham = np.asarray(hashing.consecutive_hamming(bits))
    np.testing.assert_array_equal(ham, [0, 0, 0])
