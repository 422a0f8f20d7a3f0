"""Octree quantizer tests, including the reference's 46-color fixture
(`core/src/octree.rs:244-312`)."""

import numpy as np

from kmeans_tpu.models.octree import ColorTree, extract_palette_octree

# The reference's test fixture (octree.rs:249-296): 46 distinct colors that
# must reduce to exactly 8.
FIXTURE = [
    [9, 10, 20], [16, 20, 31], [21, 29, 40], [23, 32, 56], [25, 51, 45],
    [30, 29, 57], [32, 46, 55], [36, 21, 39], [37, 58, 94], [37, 86, 46],
    [52, 28, 39], [57, 74, 80], [60, 94, 139], [64, 39, 81], [65, 29, 49],
    [70, 130, 50], [77, 43, 50], [79, 143, 186], [87, 114, 119], [96, 44, 44],
    [115, 190, 211], [117, 36, 56], [117, 167, 67], [122, 54, 123],
    [122, 72, 65], [129, 151, 150], [136, 75, 43], [162, 62, 140],
    [164, 221, 219], [165, 48, 48], [168, 181, 178], [168, 202, 88],
    [173, 119, 87], [190, 119, 43], [192, 148, 115], [198, 81, 151],
    [199, 207, 204], [207, 87, 60], [208, 218, 145], [215, 181, 148],
    [218, 134, 62], [222, 158, 65], [223, 132, 165], [231, 213, 179],
    [232, 193, 112], [235, 237, 233],
]


def test_reference_fixture_reduces_to_8():
    palette = extract_palette_octree(np.asarray(FIXTURE, np.uint8), 8)
    assert len(palette) == 8
    for r, g, b, a in palette:
        assert 0 <= r <= 255 and 0 <= g <= 255 and 0 <= b <= 255 and a == 255


def test_fewer_colors_than_k():
    pixels = np.asarray([[10, 20, 30], [200, 100, 50]], np.uint8)
    palette = extract_palette_octree(pixels, 8)
    assert sorted(palette) == [(10, 20, 30, 255), (200, 100, 50, 255)]


def test_zero_color_count():
    assert extract_palette_octree(np.asarray(FIXTURE, np.uint8), 0) == []


def test_single_color_mean():
    # Two close colors sharing all high bits merge into their mean.
    pixels = np.asarray([[100, 100, 100]] * 3 + [[101, 101, 101]], np.uint8)
    palette = extract_palette_octree(pixels, 1)
    assert len(palette) == 1
    r, g, b, _ = palette[0]
    assert r == (100 * 3 + 101) // 4  # truncating integer mean


def test_weighted_add_matches_per_pixel():
    rng = np.random.default_rng(8)
    pixels = rng.integers(0, 256, size=(500, 3), dtype=np.uint8)
    # via add_pixels (aggregated)
    p1 = extract_palette_octree(pixels, 6)
    # via per-pixel add_color
    tree = ColorTree()
    for r, g, b in pixels.tolist():
        tree.add_color(r, g, b)
    p2 = tree.reduce(6)
    assert p1 == p2


def test_scan_order_with_heavy_ties():
    # Small color space forces duplicate colors and merge-priority ties,
    # exercising the node_id (insertion-order) tie-break; aggregated
    # add_pixels must equal per-pixel scan-order insertion exactly.
    rng = np.random.default_rng(13)
    for k in (2, 5, 9):
        pixels = rng.integers(0, 5, size=(300, 3), dtype=np.uint8) * 50
        a = extract_palette_octree(pixels, k)
        tree = ColorTree()
        for r, g, b in pixels.tolist():
            tree.add_color(r, g, b)
        assert a == tree.reduce(k)
