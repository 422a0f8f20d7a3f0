"""Resize tests: shrink-dimension policy and sampler-convention bilinear."""

import jax.numpy as jnp
import numpy as np

from kmeans_tpu.ops.resize import resize_bilinear, resize_uint8, shrunk_dimensions


def test_shrunk_dimensions_policy():
    # Matches InputTexture::resized (core/src/structures.rs:78-90).
    assert shrunk_dimensions(100, 100, 256) == (100, 100)
    assert shrunk_dimensions(512, 256, 256) == (256, 128)
    assert shrunk_dimensions(256, 512, 256) == (128, 256)
    assert shrunk_dimensions(1000, 3, 256) == (256, 1)  # min-1 clamp
    assert shrunk_dimensions(1920, 1080, 256) == (256, 144)
    assert shrunk_dimensions(3840, 2160, 256) == (256, 144)


def test_upsample_convention():
    # 1-D pair [0, 1] upsampled to 4. Corner-aligned sampler: coords are
    # x * 2 / 4 - 0.5 = [-0.5, 0, 0.5, 1] -> clamped edges give [0, 0, .5, 1].
    img = np.array([[[0.0], [1.0]]], dtype=np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(img), 1, 4))[0, :, 0]
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0], atol=1e-6)


def test_constant_image_preserved():
    img = np.full((64, 48, 4), 0.25, dtype=np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(img), 13, 17))
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def test_downsample_2x_convention():
    # 1-D ramp along x, 2x downsample. Sampler convention: output x samples at
    # continuous coord x * 2 - 0.5 between texel centers (clamped at edges).
    img = np.zeros((2, 8, 1), dtype=np.float32)
    img[:, :, 0] = np.arange(8.0)
    out = np.asarray(resize_bilinear(jnp.asarray(img), 1, 4))[0, :, 0]
    # coords: x*8/4 - 0.5 = [-0.5, 1.5, 3.5, 5.5] -> clamp lo edge -> [0, 1.5, 3.5, 5.5]
    np.testing.assert_allclose(out, [0.0, 1.5, 3.5, 5.5], atol=1e-5)


def test_uint8_resize_range():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(40, 30, 4), dtype=np.uint8)
    out = np.asarray(resize_uint8(jnp.asarray(img), 10, 8))
    assert out.shape == (10, 8, 4)
    assert out.dtype == np.uint8
