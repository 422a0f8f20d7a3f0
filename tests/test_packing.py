"""Native readback-unpack fast paths (runtime/_imagio.c) vs their numpy
spec twins (utils/packing.py).

The C functions walk the fused kernels' tile layouts in one pass; the
numpy implementations ARE the layout spec (and the fallback when the
extension isn't built), so the two must be bit-equal on every (bits,
tile_rows, ragged h*w) combination the kernels can emit."""

import numpy as np
import pytest

from kmeans_tpu.utils import packing


def _has_native():
    return packing._native is not None and hasattr(
        packing._native, "unpack_rgb24"
    )


pytestmark = pytest.mark.skipif(
    not _has_native(), reason="native codec not built"
)


@pytest.mark.parametrize(
    "h,w,tile_rows", [(16, 24, 256), (33, 77, 128), (100, 130, 256),
                      (128, 128, 128), (1, 1, 256)]
)
def test_unpack_rgb24_native_matches_numpy(h, w, tile_rows):
    rng = np.random.default_rng(h * 1000 + w)
    lanes = 128
    n_tiles = -(-(h * w) // (tile_rows * lanes))
    words = rng.integers(
        -(2**31), 2**31, (n_tiles * 3 * (tile_rows // 4), lanes),
        dtype=np.int64,
    ).astype(np.int32)
    want = packing._unpack_rgb24_np(words, h, w, tile_rows)
    got = packing.unpack_rgb24_tile_words(words, h, w, tile_rows)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bits,k", [(2, 4), (4, 16), (8, 256), (16, 512)])
@pytest.mark.parametrize("h,w", [(45, 61), (128, 130)])
def test_unpack_gather_native_matches_numpy(bits, k, h, w):
    rng = np.random.default_rng(bits * 100 + h)
    tile_rows, lanes = 256, 128
    ppw = 32 // bits
    blk = tile_rows // ppw
    n_tiles = -(-(h * w) // (tile_rows * lanes))
    acc = np.zeros((n_tiles * blk, lanes), np.uint32)
    for s in range(ppw):
        acc |= rng.integers(
            0, k, (n_tiles * blk, lanes), dtype=np.uint32
        ) << np.uint32(bits * s)
    words = acc.view(np.int32)
    pal = rng.integers(0, 256, (k, 4), dtype=np.uint8)
    idx = packing.unpack_tile_words(words, h, w, bits, tile_rows=tile_rows)
    want = pal[idx]
    got = packing.unpack_tile_words_gather(
        words, h, w, bits, pal, tile_rows=tile_rows
    )
    np.testing.assert_array_equal(got, want)


def test_unpack_gather_rejects_out_of_range_index():
    """A packed index beyond the palette is a hard error (silent wraps
    would garble pixels), matching numpy's fancy-index behavior."""
    tile_rows, lanes, bits = 256, 128, 8
    blk = tile_rows // (32 // bits)
    words = np.full((blk, lanes), 0x05050505, np.int32)  # idx 5 everywhere
    pal = np.zeros((4, 4), np.uint8)  # only 4 colors
    with pytest.raises((ValueError, IndexError)):
        packing.unpack_tile_words_gather(
            words, 10, 10, bits, pal, tile_rows=tile_rows
        )


def test_unpack_rgb24_rejects_bad_length():
    with pytest.raises(ValueError):
        packing.unpack_rgb24_tile_words(
            np.zeros((7, 128), np.int32), 10, 10, 256
        )


def test_native_unpack_results_are_writable():
    """The native paths back their results with a bytearray so the
    np.frombuffer views are WRITABLE — `Image.pixels` from the fused
    readbacks must support in-place post-processing, exactly like the
    numpy fancy-indexing fallback (round-3 review regression)."""
    tile_rows, lanes = 256, 128
    words = np.zeros((3 * (tile_rows // 4), lanes), np.int32)
    out = packing.unpack_rgb24_tile_words(words, 10, 10, tile_rows)
    assert out.flags.writeable
    out[..., 3] = 128  # must not raise

    blk = tile_rows // (32 // 8)
    pal = np.zeros((4, 4), np.uint8)
    got = packing.unpack_tile_words_gather(
        np.zeros((blk, lanes), np.int32), 10, 10, 8, pal, tile_rows=tile_rows
    )
    assert got.flags.writeable
    got[..., 3] = 128


def test_strip_alpha_native_matches_numpy():
    """api._host_rgb's native RGBA->RGB strip must be byte-equal to the
    numpy slice spec on contiguous input, fall back identically on
    non-contiguous / RGB input, and stay writable."""
    from kmeans_tpu.api import _host_rgb

    rng = np.random.default_rng(7)
    for shape in [(33, 17, 4), (4, 5, 6, 4), (1, 1, 4), (128, 128, 4)]:
        rgba = rng.integers(0, 256, shape, np.uint8)
        ref = np.ascontiguousarray(rgba[..., :3])
        got = _host_rgb(rgba)
        assert got.dtype == np.uint8 and got.flags.c_contiguous
        assert np.array_equal(got, ref)
        got[(0,) * (got.ndim - 1) + (0,)] = 9  # writable
    # non-contiguous view + already-RGB input take the numpy path
    rgba = rng.integers(0, 256, (40, 30, 4), np.uint8)
    sub = rgba[3:29, 5:21]
    assert np.array_equal(_host_rgb(sub), np.ascontiguousarray(sub[..., :3]))
    rgb = np.ascontiguousarray(rgba[..., :3])
    assert np.array_equal(_host_rgb(rgb), rgb)
