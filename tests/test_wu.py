"""Wu quantizer tests (additive algorithm family, models/wu.py)."""

import numpy as np

from kmeans_tpu.models.wu import _Box, _moments, _vol, extract_palette_wu


def test_moments_totals():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (1000, 3), dtype=np.uint8)
    wt, mr, mg, mb, m2 = _moments(rgb)
    full = _Box(0, 32, 0, 32, 0, 32)
    assert _vol(full, wt) == 1000
    assert _vol(full, mr) == rgb[:, 0].astype(np.int64).sum()
    assert _vol(full, mg) == rgb[:, 1].astype(np.int64).sum()
    assert _vol(full, mb) == rgb[:, 2].astype(np.int64).sum()
    assert _vol(full, m2) == (rgb.astype(np.int64) ** 2).sum()


def test_recovers_separated_clusters():
    rng = np.random.default_rng(1)
    base = np.array(
        [[20, 30, 40], [220, 40, 60], [60, 200, 90], [90, 110, 230]], np.int32
    )
    pix = np.concatenate(
        [
            np.clip(b + rng.integers(-6, 7, (500, 3)), 0, 255)
            for b in base
        ]
    ).astype(np.uint8)
    palette = extract_palette_wu(pix, 4)
    assert len(palette) == 4
    got = np.asarray([c[:3] for c in palette], np.int32)
    d = np.linalg.norm(got[:, None, :] - base[None, :, :], axis=2)
    # Each true cluster center is matched by some palette entry.
    assert (d.min(axis=0) < 10).all()


def test_fewer_colors_than_k():
    pixels = np.asarray([[10, 20, 30], [200, 100, 50]] * 7, np.uint8)
    palette = extract_palette_wu(pixels, 8)
    # Both colors land in distinct histogram cells; means are exact.
    assert sorted(palette) == [(10, 20, 30, 255), (200, 100, 50, 255)]


def test_single_color():
    pixels = np.full((50, 3), 123, np.uint8)
    assert extract_palette_wu(pixels, 5) == [(123, 123, 123, 255)]


def test_zero_and_empty():
    assert extract_palette_wu(np.zeros((10, 3), np.uint8), 0) == []
    assert extract_palette_wu(np.zeros((0, 3), np.uint8), 8) == []


def test_sse_beats_or_matches_mediancut():
    # Wu optimizes SSE directly; on a random image it should not lose badly
    # to median cut at equal k.
    from kmeans_tpu.models.mediancut import extract_palette_mediancut

    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (4096, 3), dtype=np.uint8)

    def sse(palette):
        pal = np.asarray([c[:3] for c in palette], np.float64)
        d = ((rgb[:, None, :].astype(np.float64) - pal[None, :, :]) ** 2).sum(2)
        return d.min(axis=1).sum()

    wu = sse(extract_palette_wu(rgb, 8))
    mc = sse(extract_palette_mediancut(rgb, 8))
    assert wu <= mc * 1.05


def test_api_wu_palette_and_reduce():
    from kmeans_tpu.api import Algorithm, ImageProcessor
    from kmeans_tpu.image import Image

    rng = np.random.default_rng(3)
    base = np.array([[15, 25, 35], [230, 50, 70], [70, 210, 100]], np.int32)
    h, w = 48, 64
    labels = rng.integers(0, 3, (h, w))
    noise = rng.integers(-5, 6, (h, w, 3))
    rgb = np.clip(base[labels] + noise, 0, 255).astype(np.uint8)
    pixels = np.concatenate(
        [rgb, np.full((h, w, 1), 255, np.uint8)], axis=2
    )
    image = Image((w, h), pixels)

    p = ImageProcessor()
    pal = p.palette(3, image, Algorithm.WU)
    assert 1 <= pal.shape[0] <= 3
    # L*-ascending sort, like every other algorithm family.
    from kmeans_tpu.ops.colorspace import srgb8_to_lab_np

    lightness = srgb8_to_lab_np(pal[:, :3])[:, 0]
    assert (np.diff(lightness) >= -1e-4).all()

    out = p.reduce(3, image, Algorithm.WU)
    assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 3
