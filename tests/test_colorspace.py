"""Color-science tests: golden values from the reference's GPU shader tests
(`core/src/shader_tests.rs:169-241`) plus roundtrip/inverse checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from kmeans_tpu.ops.colorspace import (
    lab_to_srgb,
    lab_to_srgb8,
    srgb8_to_lab,
    srgb_to_lab,
)


def test_known_lab_values():
    # White -> L=100, a=b=0.
    lab = np.asarray(srgb_to_lab(jnp.array([1.0, 1.0, 1.0])))
    assert abs(lab[0] - 100.0) < 0.05
    assert abs(lab[1]) < 0.05
    assert abs(lab[2]) < 0.05

    # Black -> L=0.
    lab = np.asarray(srgb_to_lab(jnp.array([0.0, 0.0, 0.0])))
    assert np.all(np.abs(lab) < 1e-4)

    # sRGB red (255,0,0): canonical D65 Lab approx (53.24, 80.09, 67.20).
    lab = np.asarray(srgb8_to_lab(jnp.array([255, 0, 0], dtype=jnp.uint8)))
    assert abs(lab[0] - 53.24) < 0.05
    assert abs(lab[1] - 80.09) < 0.1
    assert abs(lab[2] - 67.20) < 0.1


def test_roundtrip_exact_u8():
    # Every value that starts as u8 sRGB must round-trip bit-exactly through
    # Lab, like the reference's convert -> revert pipeline does visually.
    rng = np.random.default_rng(0)
    rgb8 = rng.integers(0, 256, size=(257, 3), dtype=np.uint8)
    lab = srgb8_to_lab(jnp.asarray(rgb8))
    back = np.asarray(lab_to_srgb8(lab))
    np.testing.assert_array_equal(back, rgb8)


def test_inverse_consistency_float():
    rng = np.random.default_rng(1)
    rgb = rng.random((1000, 3), dtype=np.float32)
    lab = srgb_to_lab(jnp.asarray(rgb))
    back = np.asarray(lab_to_srgb(lab))
    np.testing.assert_allclose(back, rgb, atol=2e-5)


def test_linear_toe_branch():
    # Values below the 0.04045 gamma threshold and the 0.008856 lab toe.
    dark = jnp.array([0.002, 0.03, 0.0405])
    lab = np.asarray(srgb_to_lab(dark))
    back = np.asarray(lab_to_srgb(jnp.asarray(lab)))
    np.testing.assert_allclose(back, np.asarray(dark), atol=1e-5)


def test_broadcast_shapes():
    img = jnp.zeros((4, 6, 3))
    assert srgb_to_lab(img).shape == (4, 6, 3)
    assert lab_to_srgb(srgb_to_lab(img)).shape == (4, 6, 3)
