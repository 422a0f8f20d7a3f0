"""Shape-bucketing serving mode: ladder properties, canvas resize
correctness, output parity with the exact path, and executable reuse."""

import numpy as np
import pytest

import kmeans_tpu.api as api
from kmeans_tpu.api import Algorithm, ImageProcessor, ReduceMode
from kmeans_tpu.image import Image
from kmeans_tpu.utils.bucketing import bucket_shape, next_bucket, pad_to_bucket


def _blob_image(w, h, seed=5):
    rng = np.random.default_rng(seed)
    base = np.array([[215, 45, 45], [45, 195, 65], [55, 65, 215]], np.int32)
    idx = rng.integers(0, 3, size=(h, w))
    rgb = np.clip(base[idx] + rng.integers(-10, 11, idx.shape + (3,)), 0, 255)
    rgba = np.concatenate(
        [rgb.astype(np.uint8), np.full((h, w, 1), 255, np.uint8)], -1
    )
    return Image((w, h), rgba)


# ---------------------------------------------------------------------- #
# Ladder
# ---------------------------------------------------------------------- #


def test_next_bucket_properties():
    prev = 0
    for n in range(1, 5000):
        b = next_bucket(n)
        assert b >= n
        assert b >= prev  # monotone in n
        assert b <= max(4, n) * 1.25  # bounded padding overhead
        assert next_bucket(b) == b  # rungs are fixed points
        prev = b


def test_bucket_shape_and_pad():
    im = np.arange(9 * 13 * 4, dtype=np.uint8).reshape(9, 13, 4)
    assert bucket_shape(9, 13) == (10, 14)
    padded, h, w = pad_to_bucket(im)
    assert (h, w) == (9, 13)
    assert padded.shape == (10, 14, 4)
    np.testing.assert_array_equal(padded[:9, :13], im)
    assert (padded[9:] == 0).all() and (padded[:, 13:] == 0).all()
    # Already on a rung: no copy, same object.
    onrung = np.zeros((16, 20, 4), np.uint8)
    same, _, _ = pad_to_bucket(onrung)
    assert same is onrung


# ---------------------------------------------------------------------- #
# Canvas resize
# ---------------------------------------------------------------------- #


def test_resize_to_canvas_matches_static_resize():
    from kmeans_tpu.ops.resize import resize_to_canvas, resize_uint8

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (130, 210, 3), dtype=np.uint8)
    padded, h, w = pad_to_bucket(img)
    sh, sw = 40, 64  # dynamic shrink target
    canvas, weight = resize_to_canvas(padded, 64, 64, h, w, sh, sw)
    exact = resize_uint8(img, sh, sw)
    np.testing.assert_array_equal(np.asarray(canvas)[:sh, :sw], np.asarray(exact))
    wt = np.asarray(weight)
    assert (wt[:sh, :sw] == 1.0).all()
    assert wt.sum() == sh * sw  # everything outside the real region is 0


def test_resize_to_canvas_identity_when_no_shrink():
    from kmeans_tpu.ops.resize import resize_to_canvas

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (30, 50, 3), dtype=np.uint8)
    padded, h, w = pad_to_bucket(img)
    canvas, weight = resize_to_canvas(padded, 64, 64, h, w, h, w)
    np.testing.assert_array_equal(np.asarray(canvas)[:h, :w], img)
    assert np.asarray(weight).sum() == h * w


# ---------------------------------------------------------------------- #
# End-to-end parity
# ---------------------------------------------------------------------- #


@pytest.mark.parametrize("mode", [ReduceMode.REPLACE, ReduceMode.DITHER, ReduceMode.MELD])
def test_bucketed_find_bit_equal(mode):
    image = _blob_image(101, 67)
    colors = np.array(
        [[10, 10, 10, 255], [230, 230, 230, 255], [200, 40, 40, 255]], np.uint8
    )
    exact = ImageProcessor().find(image, colors, mode)
    bucketed = ImageProcessor(bucketing=True).find(image, colors, mode)
    np.testing.assert_array_equal(bucketed.pixels, exact.pixels)
    assert bucketed.dimensions == image.dimensions


def test_bucketed_reduce_quality_small_image():
    # Image below the training cap: bucketed training sees the identical
    # pixel set (weighted), so the palette must recover the same blobs.
    image = _blob_image(100, 75)
    exact = ImageProcessor().reduce(3, image)
    bucketed = ImageProcessor(bucketing=True).reduce(3, image)
    assert bucketed.dimensions == image.dimensions
    pe = np.unique(exact.pixels.reshape(-1, 4), axis=0).astype(np.int32)
    pb = np.unique(bucketed.pixels.reshape(-1, 4), axis=0).astype(np.int32)
    assert len(pb) <= 3
    # Palettes match to within rounding of near-identical centroids.
    d = np.abs(pe[:, None, :] - pb[None, :, :]).max(axis=2).min(axis=1)
    assert (d <= 2).all()


def test_bucketed_reduce_quality_shrunk_image():
    # Image above the training cap: exercises the dynamic-shrink canvas.
    image = _blob_image(300, 140)
    exact = ImageProcessor().reduce(3, image)
    bucketed = ImageProcessor(bucketing=True).reduce(3, image)
    pe = np.unique(exact.pixels.reshape(-1, 4), axis=0).astype(np.int32)
    pb = np.unique(bucketed.pixels.reshape(-1, 4), axis=0).astype(np.int32)
    d = np.abs(pe[:, None, :] - pb[None, :, :]).max(axis=2).min(axis=1)
    assert (d <= 2).all()


def test_bucketed_palette_and_cpu_algos():
    image = _blob_image(90, 60)
    p = ImageProcessor(bucketing=True)
    pal = p.palette(3, image)
    assert pal.shape == (3, 4)
    for algo in (Algorithm.OCTREE, Algorithm.MEDIANCUT, Algorithm.WU):
        out = p.reduce(3, image, algo)
        assert out.dimensions == image.dimensions
        assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 3


def test_bucketed_cpu_algo_shrink_matches_exact():
    # >128px image: the octree shrink goes through the bucketed canvas and
    # must reproduce the exact-resize pixels, hence the exact palette.
    image = _blob_image(260, 120, seed=9)
    exact = ImageProcessor().palette(4, image, Algorithm.OCTREE)
    bucketed = ImageProcessor(bucketing=True).palette(4, image, Algorithm.OCTREE)
    np.testing.assert_array_equal(exact, bucketed)


def test_bucket_executable_reuse():
    # Two different sizes in the same bucket share one compiled executable.
    p = ImageProcessor(bucketing=True)
    before = api._reduce_bucketed_jit._cache_size()
    p.reduce(3, _blob_image(55, 41))  # bucket (48, 56), not used elsewhere
    after_first = api._reduce_bucketed_jit._cache_size()
    p.reduce(3, _blob_image(53, 44, seed=6))  # same (48, 56) bucket
    after_second = api._reduce_bucketed_jit._cache_size()
    assert after_first == before + 1
    assert after_second == after_first  # no recompile


def test_bucketed_full_resolution_training():
    image = _blob_image(150, 90)
    out = ImageProcessor(bucketing=True, train_max_size=None).reduce(3, image)
    assert out.dimensions == image.dimensions
    assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 3


def test_bucketed_reduce_pipelined_varied_sizes():
    # Streaming frames of different sizes: each result matches the
    # bucketed single-image reduce, cropped to its own dimensions.
    p = ImageProcessor(bucketing=True)
    frames = [_blob_image(100, 75), _blob_image(97, 70, seed=6), _blob_image(55, 41)]
    outs = p.reduce_pipelined(frames, 3)
    assert [o.dimensions for o in outs] == [f.dimensions for f in frames]
    for frame, out in zip(frames, outs):
        single = p.reduce(3, frame)
        np.testing.assert_array_equal(out.pixels, single.pixels)


def test_warmup_precompiles_buckets():
    p = ImageProcessor(bucketing=True)
    # (37, 29) -> bucket (32, 40): a shape no other test touches.
    n = p.warmup([(37, 29)], [2], find_palette_sizes=[3])
    assert n == 3  # reduce + palette + find
    size_before = api._reduce_bucketed_jit._cache_size()
    idx_before = api._reduce_bucketed_indexed_jit._cache_size()
    train_before = api._train_bucketed_jit._cache_size()
    p.reduce(2, _blob_image(37, 29))
    p.reduce(2, _blob_image(35, 30, seed=8))  # same bucket
    p.palette(2, _blob_image(37, 29))
    colors = np.array([[0, 0, 0, 255], [255, 0, 0, 255], [0, 255, 0, 255]], np.uint8)
    p.find(_blob_image(35, 30, seed=8), colors)
    assert api._reduce_bucketed_jit._cache_size() == size_before
    assert api._reduce_bucketed_indexed_jit._cache_size() == idx_before
    assert api._train_bucketed_jit._cache_size() == train_before
    with pytest.raises(ValueError):
        ImageProcessor().warmup([(16, 16)], [2])


def test_warmup_covers_pipeline_strip_buckets():
    """Pipeline-mode palettes train on the host-shrunk strip padded to
    the STRIP's bucket (aspect-ratio dependent), so warmup must build
    its palette dummies at the real representative size — the
    image-bucket dummy would warm a different strip bucket."""
    p = ImageProcessor(bucketing=True, pipeline=True)
    # 700x520 shrinks to a 256x191-class strip; no other test warms it.
    p.warmup([(700, 520)], [2], find_palette_sizes=[])
    train_before = api._train_bucketed_jit._cache_size()
    p.palette(2, _blob_image(700, 520))
    p.palette(2, _blob_image(690, 515, seed=5))  # same strip bucket
    assert api._train_bucketed_jit._cache_size() == train_before


def test_bucketed_frame_count_reuse():
    from kmeans_tpu.utils.bucketing import bucket_frames

    assert [bucket_frames(n) for n in (1, 2, 3, 4, 5, 8, 9, 11, 14)] == [
        1, 2, 3, 4, 5, 8, 10, 12, 14,
    ]
    p = ImageProcessor(bucketing=True)
    colors = np.array([[0, 0, 0, 255], [255, 255, 255, 255]], np.uint8)
    frames9 = [_blob_image(21, 17, seed=i) for i in range(9)]
    frames10 = [_blob_image(21, 17, seed=i) for i in range(10)]
    outs = p.find_batch(frames9, colors)
    before = api._find_batch_jit._cache_size()
    outs10 = p.find_batch(frames10, colors)  # same (10,) frame bucket
    assert api._find_batch_jit._cache_size() == before
    assert len(outs) == 9 and len(outs10) == 10
    # Pad frames never leak into results; each output matches exact find.
    exact = ImageProcessor().find(frames9[8], colors)
    np.testing.assert_array_equal(outs[8].pixels, exact.pixels)
    # Joint palette ignores pad frames: 9 vs 10 distinct frames both work.
    pal = p.palette_images(frames9, 3)
    assert 1 <= pal.shape[0] <= 3


def test_bucketed_find_batch_bit_equal():
    frames = [_blob_image(50, 34, seed=i) for i in range(3)]
    colors = np.array(
        [[215, 45, 45, 255], [45, 195, 65, 255], [55, 65, 215, 255]], np.uint8
    )
    exact = ImageProcessor().find_batch(frames, colors)
    bucketed = ImageProcessor(bucketing=True).find_batch(frames, colors)
    for a, b in zip(exact, bucketed):
        np.testing.assert_array_equal(a.pixels, b.pixels)


def test_bucketed_reduce_images():
    frames = [_blob_image(50, 34, seed=i) for i in range(3)]
    p = ImageProcessor(bucketing=True)
    outs = p.reduce_images(frames, 3)
    assert len(outs) == 3
    for f, o in zip(frames, outs):
        assert o.dimensions == f.dimensions
        assert len(np.unique(o.pixels.reshape(-1, 4), axis=0)) <= 3


def test_bucketed_palette_images_matches_exact():
    # Frames below the training cap: the bucketed joint palette sees the
    # identical pixels (weighted), so palettes agree within rounding.
    frames = [_blob_image(50, 34, seed=i) for i in range(2)]
    exact = ImageProcessor().palette_images(frames, 3)
    bucketed = ImageProcessor(bucketing=True).palette_images(frames, 3)
    d = np.abs(
        exact.astype(int)[:, None, :] - bucketed.astype(int)[None, :, :]
    ).max(axis=2)
    assert (d.min(axis=1) <= 2).all()


def test_bucketed_shrunk_image_palette_images():
    # Frames above the cap exercise the dynamic per-frame canvas shrink.
    frames = [_blob_image(300, 140, seed=i) for i in range(2)]
    pal = ImageProcessor(bucketing=True).palette_images(frames, 3)
    assert 1 <= pal.shape[0] <= 3


def test_bucketed_reduce_batch():
    image = _blob_image(70, 46)
    exact = ImageProcessor().reduce_batch(image, [2, 3, 4])
    bucketed = ImageProcessor(bucketing=True).reduce_batch(image, [2, 3, 4])
    assert len(bucketed) == 3
    for k, (a, b) in zip([2, 3, 4], zip(exact, bucketed)):
        assert b.dimensions == image.dimensions
        ub = np.unique(b.pixels.reshape(-1, 4), axis=0)
        assert len(ub) <= k
        # Palettes agree with the exact path within rounding.
        ua = np.unique(a.pixels.reshape(-1, 4), axis=0).astype(int)
        d = np.abs(ua[:, None, :] - ub.astype(int)[None, :, :]).max(axis=2)
        assert (d.min(axis=1) <= 2).all()


def test_k_bucket_executable_reuse():
    from kmeans_tpu.utils.bucketing import bucket_k

    assert [bucket_k(k) for k in (1, 4, 5, 8, 9, 16, 100)] == [
        4, 4, 8, 8, 16, 16, 128,
    ]
    p = ImageProcessor(bucketing=True)
    img = _blob_image(27, 22)  # bucket (24, 28): unique to this test
    out5 = p.reduce(5, img)
    before = api._reduce_bucketed_jit._cache_size()
    before_idx = api._reduce_bucketed_indexed_jit._cache_size()
    out7 = p.reduce(7, img)  # same k bucket (8): no recompile
    assert api._reduce_bucketed_jit._cache_size() == before
    assert api._reduce_bucketed_indexed_jit._cache_size() == before_idx
    assert len(np.unique(out5.pixels.reshape(-1, 4), axis=0)) <= 5
    assert len(np.unique(out7.pixels.reshape(-1, 4), axis=0)) <= 7
    # Palette honors the requested k exactly, not the bucket.
    pal = p.palette(5, img)
    assert pal.shape == (5, 4)


def test_find_palette_size_bucket_reuse():
    # find with 3 colors and 4 colors shares one executable (kp=4); the
    # padded rows are masked and never selected. Output stays bit-equal
    # to the exact path.
    p = ImageProcessor(bucketing=True)
    img = _blob_image(19, 13)  # bucket (14, 20): unique to this test
    c3 = np.array([[0, 0, 0, 255], [128, 128, 128, 255], [255, 255, 255, 255]], np.uint8)
    c4 = np.vstack([c3, [[200, 30, 30, 255]]]).astype(np.uint8)
    out3 = p.find(img, c3)
    import kmeans_tpu.api as api_mod
    from kmeans_tpu.ops.quantize import quantize_image as qi

    def caches():
        # Count every find execution path: the Pallas ones (TPU) AND the
        # XLA quantize_image (CPU backends, where fused=False).
        return (
            api_mod._quantize_fused_jit._cache_size()
            + api_mod._assign_indexed_jit._cache_size()
            + qi._cache_size()
        )

    before = caches()
    out4 = p.find(img, c4)  # same kp=4 bucket
    assert caches() == before
    exact3 = ImageProcessor().find(img, c3)
    np.testing.assert_array_equal(out3.pixels, exact3.pixels)
    exact4 = ImageProcessor().find(img, c4)
    np.testing.assert_array_equal(out4.pixels, exact4.pixels)


def test_reduce_streamed_matches_bucketed_small():
    # No training shrink: the streamed path trains on identical pixels and
    # the quantize is per-pixel, so outputs are bit-equal to the bucketed
    # reduce — including dither, which validates the band row offsets.
    image = _blob_image(60, 37)
    p = ImageProcessor(bucketing=True)
    for mode in (ReduceMode.REPLACE, ReduceMode.DITHER, ReduceMode.MELD):
        whole = p.reduce(3, image, reduce_mode=mode)
        streamed = p.reduce_streamed(3, image, reduce_mode=mode, band_rows=8)
        np.testing.assert_array_equal(whole.pixels, streamed.pixels)


def test_reduce_streamed_shrunk_image():
    # Image above the training cap: the two-stage shrink may differ by
    # ~1 u8 step from the single-stage path; assert palette quality on a
    # spatially-blocky image (downscaling must not blend across colors).
    rng = np.random.default_rng(12)
    base = np.array([[215, 45, 45], [45, 195, 65], [55, 65, 215]], np.int32)
    block_idx = rng.integers(0, 3, size=(15, 30))  # 10x10 px blocks
    rgb = np.kron(base[block_idx], np.ones((10, 10, 1), np.int32))
    rgba = np.concatenate(
        [rgb.astype(np.uint8), np.full((150, 300, 1), 255, np.uint8)], -1
    )
    image = Image((300, 150), rgba)
    p = ImageProcessor(bucketing=True)
    streamed = p.reduce_streamed(3, image, band_rows=64)
    assert streamed.dimensions == image.dimensions
    pal = np.unique(streamed.pixels.reshape(-1, 4), axis=0).astype(int)
    assert len(pal) <= 3
    d = np.abs(pal[:, None, :3] - base[None, :, :]).max(axis=2)
    assert (d.min(axis=1) < 25).all()
    # And the streamed output agrees with the whole-image reduce almost
    # everywhere (palettes may differ by the intermediate rounding).
    whole = p.reduce(3, image)
    agree = (whole.pixels == streamed.pixels).all(axis=-1).mean()
    assert agree > 0.98


def test_reduce_streamed_requires_train_cap():
    p = ImageProcessor(bucketing=True, train_max_size=None)
    with pytest.raises(ValueError):
        p.reduce_streamed(3, _blob_image(20, 20))


def test_warmup_gif_paths():
    p = ImageProcessor(bucketing=True)
    # (26, 18) -> bucket (20, 28), frames 3: unique to this test.
    n = p.warmup(
        [(26, 18)], [2], find_palette_sizes=[2], gif_frame_counts=[3]
    )
    assert n == 7  # reduce, palette, find, pimg, rimg, rmany, fbatch
    before = (
        api._reduce_images_bucketed_jit._cache_size()
        + api._train_frames_bucketed_jit._cache_size()
        + api._find_batch_jit._cache_size()
        + api._reduce_many_bucketed_jit._cache_size()
    )
    frames = [_blob_image(26, 18, seed=i) for i in range(3)]
    p.reduce_images(frames, 2)
    p.palette_images(frames, 2)
    p.reduce_many(frames, 2)
    colors = np.array([[0, 0, 0, 255], [255, 255, 255, 255]], np.uint8)
    p.find_batch(frames, colors)
    after = (
        api._reduce_images_bucketed_jit._cache_size()
        + api._train_frames_bucketed_jit._cache_size()
        + api._find_batch_jit._cache_size()
        + api._reduce_many_bucketed_jit._cache_size()
    )
    assert after == before  # warmup covered all four GIF/batch executables


def test_warmup_batch_sizes_covers_reduce_many():
    """warmup(batch_sizes=...) must precompile exactly the reduce_many
    executables the serving micro-batcher hits — a later coalesced batch
    of those sizes causes zero new compiles."""
    p = ImageProcessor(bucketing=True)
    # (22, 30) -> unique bucket for this test; batcher sizes 2 and 3.
    n = p.warmup(
        [(22, 30)], [3], modes=(ReduceMode.REPLACE,), palette=False,
        batch_sizes=[2, 3],
    )
    assert n == 3  # reduce + rmany(fb=2) + rmany(fb=3)
    before = api._reduce_many_bucketed_jit._cache_size()
    frames = [_blob_image(22, 30, seed=i) for i in range(3)]
    p.reduce_many(frames, 3)
    p.reduce_many(frames[:2], 3)
    assert api._reduce_many_bucketed_jit._cache_size() == before


def test_warmup_batch_sizes_covers_palette_many():
    """warmup(batch_sizes=...) with palette warming must precompile the
    coalesced palette_many executables the /palette micro-batcher hits."""
    p = ImageProcessor(bucketing=True, fused=False)
    # (38, 26) -> unique bucket for this test; batcher sizes 2 and 3.
    n = p.warmup(
        [(38, 26)], [3], modes=(), palette=True, batch_sizes=[2, 3],
    )
    assert n == 3  # palette + pmany(fb=2) + pmany(fb=3)
    before = api._palette_many_bucketed_jit._cache_size()
    frames = [_blob_image(38, 26, seed=i) for i in range(3)]
    p.palette_many(frames, 3)
    p.palette_many(frames[:2], 3)
    assert api._palette_many_bucketed_jit._cache_size() == before


def test_warmup_batch_sizes_covers_find_many(monkeypatch):
    """warmup(batch_sizes=..., find_palette_sizes=...) must precompile the
    coalesced find_many executables the /find micro-batcher hits — a later
    coalesced batch of those sizes causes zero new fused compiles."""
    from functools import partial

    from kmeans_tpu.ops import kernels

    monkeypatch.setattr(
        api,
        "fused_assign_packed",
        partial(kernels.fused_assign_packed, interpret=True),
    )
    monkeypatch.setattr(api, "_pallas_available", lambda device=None: True)

    p = ImageProcessor(bucketing=True, fused=True)
    # (34, 30) -> unique bucket for this test; batcher sizes 2 and 3.
    n = p.warmup(
        [(34, 30)], [], modes=(ReduceMode.REPLACE,), palette=False,
        find_palette_sizes=[2], batch_sizes=[2, 3],
    )
    assert n == 3  # find + fbatch(fb=2) + fbatch(fb=3)
    before = api._find_batch_fused_jit._cache_size()
    frames = [_blob_image(34, 30, seed=i) for i in range(3)]
    colors = np.array([[0, 0, 0, 255], [255, 255, 255, 255]], np.uint8)
    p.find_many(frames, colors)
    p.find_many(frames[:2], colors)
    assert api._find_batch_fused_jit._cache_size() == before


def test_find_streamed_matches_bucketed_find():
    """find_streamed is purely per-pixel: bit-equal to whole-image find on
    a bucketed processor, at any band split, for every mode."""
    from kmeans_tpu.api import ImageProcessor, ReduceMode
    from kmeans_tpu.image import Image

    rng = np.random.default_rng(41)
    image = Image((70, 53), rng.integers(0, 256, (53, 70, 4), dtype=np.uint8))
    colors = rng.integers(0, 256, (5, 4), dtype=np.uint8)
    colors[:, 3] = 255
    p = ImageProcessor(bucketing=True)
    pe = ImageProcessor()
    for mode in (ReduceMode.REPLACE, ReduceMode.DITHER, ReduceMode.MELD):
        whole = p.find(image, colors, mode)
        for band in (8, 17, 64):
            streamed = pe.find_streamed(image, colors, mode, band_rows=band)
            np.testing.assert_array_equal(
                whole.pixels, streamed.pixels,
                err_msg=f"mode={mode} band={band}",
            )


def test_find_streamed_empty_palette_rejected():
    from kmeans_tpu.api import ImageProcessor
    from kmeans_tpu.image import Image

    img = Image((4, 4), np.zeros((4, 4, 4), np.uint8))
    with pytest.raises(ValueError, match="at least one color"):
        ImageProcessor().find_streamed(img, np.zeros((0, 4), np.uint8))


def test_palette_streamed_matches_bucketed_palette():
    """palette_streamed trains on the same strip pipeline as
    reduce_streamed; for images needing no shrink it matches the bucketed
    whole-image palette exactly (identical training pixels)."""
    from kmeans_tpu.api import ImageProcessor

    rng = np.random.default_rng(47)
    base = np.array(
        [[230, 40, 40], [40, 220, 60], [60, 60, 230], [230, 220, 70]], np.int32
    )
    idx = rng.integers(0, 4, (60, 80))
    rgb = np.clip(base[idx] + rng.integers(-10, 11, (60, 80, 3)), 0, 255)
    rgba = np.concatenate(
        [rgb.astype(np.uint8), np.full((60, 80, 1), 255, np.uint8)], -1
    )
    from kmeans_tpu.image import Image

    image = Image((80, 60), rgba)
    p = ImageProcessor(bucketing=True)
    whole = p.palette(4, image)
    streamed = ImageProcessor().palette_streamed(4, image, band_rows=16)
    np.testing.assert_array_equal(whole, streamed)
