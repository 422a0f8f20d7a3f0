"""Delta-E golden tests, ported from the reference GPU shader tests
(`core/src/shader_tests.rs:169-217`, kernels `core/shaders/tests/test_distance.wgsl`)."""

import jax.numpy as jnp
import numpy as np

from kmeans_tpu.ops.colorspace import srgb8_to_lab
from kmeans_tpu.ops.delta_e import (
    distance_cie94,
    distance_cie94_sq,
    distance_cie2000,
)


def _lab(rgb8):
    return srgb8_to_lab(jnp.array(rgb8, dtype=jnp.uint8))


def test_cie94_golden():
    # shader_tests.rs:180-187: d(lab(255,0,0), lab(255,128,0)) == 19.094658
    d = float(distance_cie94(_lab([255, 0, 0]), _lab([255, 128, 0])))
    assert abs(d - 19.094658) < 0.01


def test_cie94_asymmetry():
    # S_C/S_H depend on the first argument's chroma (delta_e.wgsl:8,18-19).
    a = jnp.array([50.0, 40.0, 30.0])
    b = jnp.array([55.0, 10.0, -10.0])
    assert abs(float(distance_cie94(a, b)) - float(distance_cie94(b, a))) > 1e-3


def test_cie94_sq_matches():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(50, 30, size=(64, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(50, 30, size=(64, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(distance_cie94(x, y)) ** 2,
        np.asarray(distance_cie94_sq(x, y)),
        rtol=1e-4,
        atol=1e-4,
    )


def test_cie2000_sharma_pair():
    # shader_tests.rs:199-206: Sharma test pair 2.0424595.
    d = float(
        distance_cie2000(
            jnp.array([50.0000, 2.6772, -79.7751]),
            jnp.array([50.0000, 0.0000, -82.7485]),
        )
    )
    assert abs(d - 2.0424595) < 0.01


def test_cie2000_golden_rgb():
    # shader_tests.rs:208-214: d2000(lab(255,0,0), lab(255,128,0)) == 21.164806
    d = float(distance_cie2000(_lab([255, 0, 0]), _lab([255, 128, 0])))
    assert abs(d - 21.164806) < 0.01


def test_cie2000_zero_for_identical():
    x = jnp.array([31.0, -5.0, 12.0])
    assert float(distance_cie2000(x, x)) < 1e-3


def test_broadcast_matrix():
    pixels = jnp.zeros((10, 3)) + jnp.array([50.0, 0.0, 0.0])
    cents = jnp.stack([jnp.array([50.0, 0.0, 0.0]), jnp.array([80.0, 10.0, 10.0])])
    d = distance_cie94(pixels[:, None, :], cents[None, :, :])
    assert d.shape == (10, 2)
    assert float(d[0, 0]) < 1e-4


def test_cie2000_sq_consistent_with_cie2000():
    """distance_cie2000_sq is the square of distance_cie2000 (and >= 0),
    so argmin selections match the full metric."""
    import numpy as np

    from kmeans_tpu.ops.delta_e import distance_cie2000, distance_cie2000_sq

    rng = np.random.default_rng(3)
    a = np.column_stack(
        [rng.uniform(0, 100, 64), rng.uniform(-90, 90, (64, 2))]
    ).astype(np.float32)
    b = np.column_stack(
        [rng.uniform(0, 100, 64), rng.uniform(-90, 90, (64, 2))]
    ).astype(np.float32)
    d = np.asarray(distance_cie2000(a, b))
    d2 = np.asarray(distance_cie2000_sq(a, b))
    assert (d2 >= 0).all()
    np.testing.assert_allclose(d * d, d2, rtol=1e-5, atol=1e-5)


def test_metric_fns_registry():
    import pytest

    from kmeans_tpu.ops.delta_e import (
        distance_cie94,
        distance_cie2000,
        metric_fns,
    )

    assert metric_fns("cie94")[0] is distance_cie94
    assert metric_fns("cie2000")[0] is distance_cie2000
    with pytest.raises(ValueError, match="unknown delta-E metric"):
        metric_fns("cie76")
