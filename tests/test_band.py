"""Banded-matrix correlates (ops/band.py) vs the conv-based
_sep_correlate formulation they replace on the TPU hot path."""

import numpy as np
import pytest

import jax.numpy as jnp

from avd_tpu.ops import band
from avd_tpu.ops import flow


@pytest.mark.parametrize("size,mode", [
    (40, "edge"), (40, "reflect"),
    (57, "edge"), (57, "reflect"),
    (320, "edge"), (320, "reflect"),
])
def test_correlate_matrix_matches_conv(size, mode):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, size, size + 11)).astype(np.float32))
    k = flow._gaussian_blur_kernel(7, 1.3)
    ref = flow._sep_correlate(img, k, k, mode)
    kt = tuple(float(x) for x in k)
    got = band.apply_separable(
        img,
        band.correlate_matrix(size, kt, mode),
        band.correlate_matrix(size + 11, kt, mode))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-5)


def test_reflect_fold_small_image():
    """Kernel wider than the image exercises multi-fold reflection."""
    v = np.arange(5, dtype=np.float32)
    k = np.full(13, 1.0 / 13.0, np.float64)
    # np.pad 'reflect' is the fold's ground truth (jnp.pad matches it)
    ref = np.correlate(np.pad(v.astype(np.float64), 6, mode="reflect"),
                       k, mode="valid")
    m = band.correlate_matrix(5, tuple(float(x) for x in k), "reflect")
    np.testing.assert_allclose(m @ v, ref, atol=1e-6)


def test_blur_resize_matrix_matches_sequential():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((3, 320, 320)).astype(np.float32) * 255)
    gk = tuple(float(x) for x in flow._gaussian_blur_kernel(17, 3.5))
    seq = flow._resize_bilinear(
        flow._sep_correlate(img, np.asarray(gk, np.float32),
                            np.asarray(gk, np.float32), "reflect"), 40, 40)
    fus = band.apply_separable(img,
                               band.blur_resize_matrix(320, 40, gk),
                               band.blur_resize_matrix(320, 40, gk))
    np.testing.assert_allclose(np.asarray(fus), np.asarray(seq),
                               atol=2e-3, rtol=1e-5)


def test_poly_expansion_matches_conv_formulation():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((2, 80, 80)).astype(np.float32) * 255)
    g, xg, xxg, ig11, ig03, ig33, ig55 = flow._poly_exp_kernels(5, 1.2)
    b1 = flow._sep_correlate(img, g, g, "edge")
    b2 = flow._sep_correlate(img, g, xg, "edge")
    b3 = flow._sep_correlate(img, xg, g, "edge")
    b4 = flow._sep_correlate(img, g, xxg, "edge")
    b5 = flow._sep_correlate(img, xxg, g, "edge")
    b6 = flow._sep_correlate(img, xg, xg, "edge")
    ref = jnp.stack([b2 * ig11, b3 * ig11, b1 * ig03 + b4 * ig33,
                     b1 * ig03 + b5 * ig33, b6 * ig55], 1)
    got = flow.poly_expansion(img, 5, 1.2)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=scale * 1e-5)
