"""K-means model tests: seeding, Lloyd convergence, reference protocol."""

import jax.numpy as jnp
import numpy as np

from kmeans_tpu.models import kmeans as km


def _blobs(n_per=500, seed=0):
    """Three tight, well-separated Lab blobs."""
    rng = np.random.default_rng(seed)
    centers = np.array([[20.0, 0.0, 0.0], [60.0, 40.0, -30.0], [90.0, -50.0, 50.0]])
    pts = np.concatenate(
        [c + rng.normal(0, 0.5, size=(n_per, 3)) for c in centers]
    ).astype(np.float32)
    return jnp.asarray(pts), centers


def test_reference_seed_index_deterministic_and_in_range():
    for w, h in [(256, 256), (256, 144), (1, 1), (100, 7)]:
        idx = km.reference_seed_index(w, h)
        assert 0 <= idx < w * h
        assert idx == km.reference_seed_index(w, h)


def test_plusplus_init_spreads():
    pts, centers = _blobs()
    cents = np.asarray(km.plusplus_init(pts, 3, 0))
    # Farthest-point seeding must land one seed in each blob.
    dists = np.linalg.norm(cents[:, None, :] - centers[None, :, :], axis=2)
    assert set(dists.argmin(axis=1).tolist()) == {0, 1, 2}


def test_fit_recovers_blobs():
    pts, centers = _blobs()
    cents, iters = km.fit(pts, 3, 0)
    cents = np.asarray(cents)
    order = np.linalg.norm(cents[:, None, :] - centers[None, :, :], axis=2).argmin(1)
    assert sorted(order.tolist()) == [0, 1, 2]
    np.testing.assert_allclose(cents, centers[order], atol=0.2)
    assert int(iters) < km.MAX_ITERATIONS


def test_convergence_check_cadence():
    # On trivially-stable data, the loop must exit at the first check point
    # (iteration 8 completed -> i == 9), matching the reference protocol of
    # checking only every 8th iteration (core/src/modules.rs:802-804).
    pts, _ = _blobs(n_per=100)
    _, iters = km.fit(pts, 3, 0)
    assert int(iters) == 9


def test_k_equals_one():
    pts, _ = _blobs()
    cents, _ = km.fit(pts, 1, 0)
    # Single cluster converges to the global mean.
    np.testing.assert_allclose(
        np.asarray(cents)[0], np.asarray(pts).mean(0), atol=0.5
    )


def test_k_active_masking_matches_unpadded():
    pts, _ = _blobs()
    full, _ = km.fit(pts, 3, 0)
    padded, _ = km.fit(pts, 8, 0, k_active=3)
    np.testing.assert_allclose(np.asarray(padded)[:3], np.asarray(full), atol=1e-4)


def test_more_clusters_than_points():
    pts = jnp.asarray(np.array([[10.0, 0, 0], [50.0, 0, 0]], np.float32))
    cents, _ = km.fit(pts, 4, 0)
    # Two clusters get the two points; the others stay wherever seeded
    # (duplicates), like the reference's empty-cluster behavior.
    assert np.isfinite(np.asarray(cents)).all()


def test_assign_clusters_nearest():
    pts = jnp.asarray(np.array([[20.0, 0, 0], [90.0, 0, 0]], np.float32))
    cents = jnp.asarray(np.array([[85.0, 0, 0], [25.0, 0, 0]], np.float32))
    assign = np.asarray(km.assign_clusters(pts, cents))
    np.testing.assert_array_equal(assign, [1, 0])


def test_weighted_fit_ignores_zero_weight_pixels():
    # Appending garbage pixels with weight 0 must not change seeding or
    # updates: same seeds (garbage can't win the argmax) and exact-zero
    # contributions to sums. Palettes match the unweighted fit on the real
    # pixels to float tolerance (reduction order differs with padded N).
    import numpy as np

    from kmeans_tpu.models import kmeans as km

    rng = np.random.default_rng(17)
    real = jnp.asarray(rng.uniform(0, 100, (500, 3)).astype(np.float32))
    garbage = jnp.asarray(rng.uniform(0, 100, (123, 3)).astype(np.float32))
    padded = jnp.concatenate([real, garbage])
    weight = jnp.concatenate([jnp.ones(500), jnp.zeros(123)]).astype(jnp.float32)

    base, iters_a = km.fit(real, 4, 7)
    weighted, iters_b = km.fit(padded, 4, 7, weight=weight)
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(weighted), rtol=1e-5, atol=1e-4
    )
    assert int(iters_a) == int(iters_b)


def test_weighted_seeding_never_picks_padding():
    import numpy as np

    from kmeans_tpu.models import kmeans as km

    # Real pixels are all identical; garbage is far away and would win any
    # unmasked farthest-point argmax.
    real = jnp.zeros((50, 3), jnp.float32)
    garbage = jnp.full((10, 3), 100.0, jnp.float32)
    padded = jnp.concatenate([real, garbage])
    weight = jnp.concatenate([jnp.ones(50), jnp.zeros(10)]).astype(jnp.float32)
    cents = km.plusplus_init(padded, 3, 0, weight=weight)
    np.testing.assert_array_equal(np.asarray(cents), np.zeros((3, 3)))


def test_fit_cie2000_metric_recovers_blobs():
    """fit(metric='cie2000') clusters with CIEDE2000 distances end-to-end
    (seeding, assignment, convergence) and still recovers blob centers."""
    import jax.numpy as jnp
    import numpy as np

    from kmeans_tpu.models.kmeans import fit

    rng = np.random.default_rng(21)
    centers = np.array([[25.0, 10, -40], [60.0, -45, 30], [85.0, 30, 55]])
    pix = jnp.asarray(
        (centers[rng.integers(0, 3, 3000)] + rng.normal(0, 0.8, (3000, 3)))
        .astype(np.float32)
    )
    cents, iters = fit(pix, 3, 0, metric="cie2000")
    cents = np.asarray(cents)
    d = np.linalg.norm(cents[:, None, :] - centers[None, :, :], axis=2)
    assert (d.min(axis=1) < 3.0).all()
    assert int(iters) >= 1


def test_fit_restarts_semantics():
    """restarts=1 is exactly fit(); restarts>1 never yields worse inertia
    and each trajectory matches an individually-run fit (batched
    while_loop freezes converged items)."""
    import jax.numpy as jnp
    import numpy as np

    from kmeans_tpu.models.kmeans import _masked_d2, fit, fit_restarts

    rng = np.random.default_rng(17)
    centers = np.array(
        [[15.0, 5, -20], [55.0, 35, 25], [80.0, -35, -25], [45.0, -45, 45]]
    )
    pix = jnp.asarray(
        (centers[rng.integers(0, 4, 2500)] + rng.normal(0, 1.0, (2500, 3)))
        .astype(np.float32)
    )
    c1, i1 = fit(pix, 4, 0)
    cr, ir = fit_restarts(pix, 4, 0, restarts=1)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(cr))
    assert int(i1) == int(ir)

    def inertia(c):
        d2 = _masked_d2(pix, jnp.asarray(c), jnp.ones(4, bool))
        return float(jnp.sum(jnp.min(d2, axis=1)))

    c6, _ = fit_restarts(pix, 4, 0, restarts=6)
    assert inertia(c6) <= inertia(c1) + 1e-2


def test_fit_chunked_matches_fit():
    """The memory-bounded k>64 trainer (row-chunked lax.map) must match
    the plain fit within f32 partial-sum reordering; restarts pick the
    same winner as the sequential construction."""
    import jax.numpy as jnp
    import numpy as np

    from kmeans_tpu.models.kmeans import fit, fit_chunked

    rng = np.random.default_rng(61)
    centers = rng.uniform(-60, 90, (12, 3)).astype(np.float32)
    pix = jnp.asarray(
        (centers[rng.integers(0, 12, 4000)] + rng.normal(0, 1.0, (4000, 3)))
        .astype(np.float32)
    )
    c1, i1 = fit(pix, 12, 7)
    c2, i2 = fit_chunked(pix, 12, 7)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-3)
    assert int(i1) == int(i2)
    # weighted + k_active + restarts smoke (sequential path)
    weight = jnp.asarray(rng.uniform(0.1, 1.0, 4000).astype(np.float32))
    cr, _ = fit_chunked(pix, 16, 7, restarts=3, k_active=12, weight=weight)
    assert np.isfinite(np.asarray(cr)).all() and cr.shape == (16, 3)


def test_fit_restarts_weighted_pads_never_seed():
    import jax.numpy as jnp
    import numpy as np

    from kmeans_tpu.models.kmeans import fit_restarts

    rng = np.random.default_rng(23)
    real = rng.normal(50, 10, (800, 3)).astype(np.float32)
    pad = np.full((400, 3), 1e4, np.float32)  # absurd values: seeds would show
    pix = jnp.asarray(np.concatenate([real, pad]))
    weight = jnp.concatenate([jnp.ones(800), jnp.zeros(400)]).astype(jnp.float32)
    cents, _ = fit_restarts(pix, 3, 0, restarts=5, weight=weight)
    assert np.asarray(cents).max() < 200.0  # no pad pixel ever seeded a run
