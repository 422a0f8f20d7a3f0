"""Public-API tests: palette/find/reduce semantics through ImageProcessor."""

import numpy as np
import pytest

from kmeans_tpu.api import Algorithm, ColorSpace, ImageProcessor, ReduceMode
from kmeans_tpu.image import Image
from kmeans_tpu.ops.colorspace import srgb8_to_lab_np


@pytest.fixture(scope="module")
def blobs_image():
    rng = np.random.default_rng(11)
    base = np.array(
        [[220, 40, 40], [40, 200, 60], [50, 60, 210], [235, 225, 80]], np.int32
    )
    idx = rng.integers(0, 4, size=(96, 128))
    rgb = np.clip(base[idx] + rng.integers(-12, 13, idx.shape + (3,)), 0, 255)
    rgba = np.concatenate(
        [rgb.astype(np.uint8), np.full((96, 128, 1), 255, np.uint8)], -1
    )
    return Image((128, 96), rgba), base


def test_palette_sorted_by_lightness(blobs_image):
    image, base = blobs_image
    pal = ImageProcessor().palette(4, image)
    assert pal.shape == (4, 4)
    lightness = srgb8_to_lab_np(pal[:, :3])[:, 0]
    assert (np.diff(lightness) >= -1e-4).all()  # ascending L*
    # each palette entry is near one true blob color
    d = np.linalg.norm(
        pal[:, :3].astype(int)[:, None, :] - base[None, :, :], axis=2
    )
    assert (d.min(axis=1) < 40).all()


def test_reduce_replace_k_colors(blobs_image):
    image, _ = blobs_image
    out = ImageProcessor().reduce(4, image)
    assert out.dimensions == image.dimensions
    assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 4


def test_reduce_octree(blobs_image):
    image, _ = blobs_image
    out = ImageProcessor().reduce(4, image, Algorithm.OCTREE, ReduceMode.REPLACE)
    assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 4


def test_find_exact_palette(blobs_image):
    image, _ = blobs_image
    colors = np.array(
        [[5, 5, 5, 255], [255, 255, 255, 255], [255, 0, 0, 255]], np.uint8
    )
    out = ImageProcessor().find(image, colors)
    uniq = np.unique(out.pixels.reshape(-1, 4), axis=0)
    assert set(map(tuple, uniq)) <= set(map(tuple, colors))


def test_reduce_batch_matches_single(blobs_image):
    image, _ = blobs_image
    p = ImageProcessor()
    batch = p.reduce_batch(image, [2, 4])
    single = p.reduce(4, image)
    # The k=4 batch entry and the single k=4 run share seeding and protocol.
    np.testing.assert_array_equal(batch[1].pixels, single.pixels)
    assert len(np.unique(batch[0].pixels.reshape(-1, 4), axis=0)) <= 2


def test_invalid_k(blobs_image):
    image, _ = blobs_image
    with pytest.raises(ValueError):
        ImageProcessor().reduce(0, image)


def test_colorspace_convergence_values():
    # core/src/lib.rs:189-194
    assert ColorSpace.LAB.convergence == 1.0
    assert ColorSpace.RGB.convergence == 0.01


def test_rgb_colorspace_internal(blobs_image):
    # The Rgb working space (reachable through internals, like the
    # reference's) trains on normalized RGB with convergence 0.01.
    image, _ = blobs_image
    cents = ImageProcessor().extract_palette_kmeans(image, 4, ColorSpace.RGB)
    arr = np.asarray(cents)
    assert arr.shape == (4, 3)
    assert (arr >= 0).all() and (arr <= 1).all()


def test_find_batch_matches_single(blobs_image):
    image, _ = blobs_image
    colors = np.array([[0, 0, 0, 255], [255, 255, 255, 255]], np.uint8)
    p = ImageProcessor()
    outs = p.find_batch([image, image], colors, ReduceMode.DITHER)
    single = p.find(image, colors, ReduceMode.DITHER)
    assert len(outs) == 2
    np.testing.assert_array_equal(outs[0].pixels, single.pixels)
    np.testing.assert_array_equal(outs[1].pixels, single.pixels)


def test_reduce_images_batch(blobs_image):
    image, _ = blobs_image
    other = Image(image.dimensions, image.pixels[::-1].copy())
    p = ImageProcessor()
    outs = p.reduce_images([image, other], 3)
    single = p.reduce(3, image)
    assert len(outs) == 2
    np.testing.assert_array_equal(outs[0].pixels, single.pixels)
    assert len(np.unique(outs[1].pixels.reshape(-1, 4), axis=0)) <= 3


def test_tiny_and_degenerate_images():
    p = ImageProcessor()
    # 1x1 image, k=1
    one = Image((1, 1), np.full((1, 1, 4), 200, np.uint8))
    out = p.reduce(1, one)
    assert out.pixels.shape == (1, 1, 4)
    pal = p.palette(1, one)
    assert pal.shape == (1, 4)
    # extreme aspect ratio (shrink clamps short side to >= 1)
    wide = Image((1024, 2), np.random.default_rng(0).integers(
        0, 256, (2, 1024, 4), dtype=np.uint8))
    out = p.reduce(3, wide)
    assert out.dimensions == (1024, 2)


def test_find_duplicate_palette_colors(blobs_image):
    image, _ = blobs_image
    colors = np.array(
        [[255, 255, 255, 255], [255, 255, 255, 255], [0, 0, 0, 255]], np.uint8
    )
    out = ImageProcessor().find(image, colors)
    uniq = np.unique(out.pixels.reshape(-1, 4), axis=0)
    assert len(uniq) <= 2


def test_reduce_pipelined_matches_reduce(blobs_image):
    image, _ = blobs_image
    other = Image((64, 48), image.pixels[:48, :64].copy())
    p = ImageProcessor()
    outs = p.reduce_pipelined([image, other], 3)
    np.testing.assert_array_equal(outs[0].pixels, p.reduce(3, image).pixels)
    np.testing.assert_array_equal(outs[1].pixels, p.reduce(3, other).pixels)


def test_mediancut_algorithm(blobs_image):
    from kmeans_tpu.models.mediancut import extract_palette_mediancut

    image, base = blobs_image
    pal = ImageProcessor().palette(4, image, Algorithm.MEDIANCUT)
    assert 1 <= pal.shape[0] <= 4
    d = np.linalg.norm(
        pal[:, :3].astype(int)[:, None, :] - base[None, :, :], axis=2
    )
    assert (d.min(axis=1) < 60).all()
    out = ImageProcessor().reduce(4, image, Algorithm.MEDIANCUT)
    assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 4

    # degenerate: fewer unique colors than k
    two = np.asarray([[10, 10, 10], [200, 200, 200]] * 5, np.uint8)
    assert len(extract_palette_mediancut(two, 8)) == 2


def test_find_with_512_color_palette(blobs_image):
    # The CLI's palette-image limit (cli/src/args.rs:199-203) allows up to
    # 512 distinct colors; the quantize path must handle K > 256.
    image, _ = blobs_image
    rng = np.random.default_rng(21)
    colors = np.unique(
        rng.integers(0, 256, (700, 4), dtype=np.uint8), axis=0
    )[:512]
    colors[:, 3] = 255
    out = ImageProcessor().find(image, colors, ReduceMode.MELD)
    assert out.pixels.shape == image.pixels.shape
    out2 = ImageProcessor().find(image, colors, ReduceMode.REPLACE)
    assert len(np.unique(out2.pixels.reshape(-1, 4), axis=0)) <= 512


def test_fused_requires_tpu_device():
    # On the CPU test backend, explicitly requesting the Pallas path must
    # fail loudly at construction, not with a cryptic lowering error later.
    with pytest.raises(ValueError):
        ImageProcessor(fused=True)
    assert ImageProcessor().fused is False  # auto-selects XLA on CPU


def test_reduce_pipelined_window_drain(blobs_image):
    # More frames than the in-flight window (4) exercises mid-loop draining.
    image, _ = blobs_image
    frames = [image] * 6
    outs = ImageProcessor().reduce_pipelined(frames, 3)
    single = ImageProcessor().reduce(3, image)
    assert len(outs) == 6
    for o in outs:
        np.testing.assert_array_equal(o.pixels, single.pixels)


def test_full_resolution_training(blobs_image):
    # train_max_size=None disables the 256px training shrink entirely: a
    # 300px-wide image trains on all its pixels. Palette quality must still
    # recover the true blob colors; the executable is the no-resize branch.
    rng = np.random.default_rng(7)
    base = np.array([[210, 40, 50], [40, 190, 70], [60, 70, 220]], np.int32)
    idx = rng.integers(0, 3, size=(120, 300))
    rgb = np.clip(base[idx] + rng.integers(-8, 9, idx.shape + (3,)), 0, 255)
    rgba = np.concatenate(
        [rgb.astype(np.uint8), np.full((120, 300, 1), 255, np.uint8)], -1
    )
    image = Image((300, 120), rgba)

    full = ImageProcessor(train_max_size=None)
    assert full.train_max_size is None
    pal = full.palette(3, image)
    d = np.linalg.norm(
        pal[:, :3].astype(int)[:, None, :] - base[None, :, :], axis=2
    )
    assert (d.min(axis=1) < 20).all()
    # Same result as an explicit cap that already exceeds the image.
    pal_cap = ImageProcessor(train_max_size=4096).palette(3, image)
    np.testing.assert_array_equal(pal, pal_cap)
    out = full.reduce(3, image)
    assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 3


def test_palette_images_global(blobs_image):
    # A joint palette over frames must cover colors that appear in ANY
    # frame — including one exclusive to the second frame.
    image, base = blobs_image
    rng = np.random.default_rng(21)
    # Second frame: one solid new color absent from frame 1.
    other = np.full_like(image.pixels, 255)
    other[..., :3] = [250, 120, 10]
    frames = [image, Image(image.dimensions, other)]
    p = ImageProcessor()
    pal = p.palette_images(frames, 5)
    assert pal.shape == (5, 4)
    targets = np.vstack([base, [[250, 120, 10]]])
    d = np.linalg.norm(
        pal[:, :3].astype(int)[:, None, :] - targets[None, :, :], axis=2
    )
    assert (d.min(axis=0) < 40).all()
    # L*-ascending order.
    lightness = srgb8_to_lab_np(pal[:, :3])[:, 0]
    assert (np.diff(lightness) >= -1e-4).all()
    # CPU algorithms accept the same batch.
    for algo in (Algorithm.OCTREE, Algorithm.MEDIANCUT, Algorithm.WU):
        pal2 = p.palette_images(frames, 5, algo)
        assert 1 <= pal2.shape[0] <= 5
    # Consistent quantization: find_batch with the global palette uses
    # exactly the same colors in every frame.
    outs = p.find_batch(frames, pal)
    all_colors = np.unique(
        np.concatenate([o.pixels.reshape(-1, 4) for o in outs]), axis=0
    )
    assert len(all_colors) <= 5


def test_fast_mode_option(blobs_image):
    """ImageProcessor(fast=True) threads the fast-kernel flag through every
    reduce/find path. On the CPU (XLA) path it is a no-op, so results must
    be identical to the default; on TPU it relaxes knife-edge bit-parity
    (covered by tests/test_kernels.py fast-mode tests in interpret mode)."""
    image, _ = blobs_image
    exact = ImageProcessor().reduce(4, image)
    fast = ImageProcessor(fast=True).reduce(4, image)
    np.testing.assert_array_equal(exact.pixels, fast.pixels)
    colors = np.asarray([[220, 40, 40, 255], [40, 200, 60, 255]], np.uint8)
    f1 = ImageProcessor().find(image, colors)
    f2 = ImageProcessor(fast=True).find(image, colors)
    np.testing.assert_array_equal(f1.pixels, f2.pixels)
    # Bucketed + fast compose.
    b = ImageProcessor(bucketing=True, fast=True).reduce(4, image)
    assert b.pixels.shape == exact.pixels.shape


def test_delta_e_2000_processor(blobs_image):
    """ImageProcessor(delta_e='2000') runs palette/find/reduce end-to-end
    with CIEDE2000 and still recovers the blob palette."""
    image, base = blobs_image
    p = ImageProcessor(delta_e="2000")
    assert p.delta_e == "cie2000" and p.fused is False
    pal = p.palette(4, image)
    d = np.linalg.norm(
        pal[:, :3].astype(int)[:, None, :] - base[None, :, :], axis=2
    )
    assert (d.min(axis=1) < 40).all()
    out = p.reduce(4, image)
    assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 4
    colors = np.asarray([[220, 40, 40, 255], [40, 200, 60, 255]], np.uint8)
    f = p.find(image, colors, ReduceMode.DITHER)
    assert len(np.unique(f.pixels.reshape(-1, 4), axis=0)) <= 2
    # Batched paths accept the metric too.
    outs = p.reduce_batch(image, [2, 4])
    assert len(outs) == 2
    # Bucketing composes.
    b = ImageProcessor(delta_e="2000", bucketing=True).reduce(4, image)
    assert b.pixels.shape == out.pixels.shape


def test_train_dtype_validation(blobs_image):
    """train_dtype: only bfloat16/float32/None; rejected with bucketing
    (the bucketed trainers never route through the Pallas plane store, so
    accepting it would be a silent no-op in serving); float32/None are
    the same default; a CPU processor accepts it (no-op on XLA routes)
    and still produces valid output."""
    with pytest.raises(ValueError, match="train_dtype"):
        ImageProcessor(train_dtype="float16")
    with pytest.raises(ValueError, match="bucketing"):
        ImageProcessor(train_dtype="bfloat16", bucketing=True)
    assert ImageProcessor(train_dtype="float32").train_dtype is None
    p = ImageProcessor(train_dtype="bfloat16")
    assert p.train_dtype == "bfloat16"
    image, _ = blobs_image
    out = p.reduce(3, image)
    assert out.pixels.shape == image.pixels.shape


def test_delta_e_validation():
    with pytest.raises(ValueError, match="delta_e"):
        ImageProcessor(delta_e="76")
    # fused + delta_e="2000" is now a supported combination (the fused
    # kernels implement CIEDE2000 natively); on the CPU backend fused=True
    # still fails on the device requirement.
    with pytest.raises(ValueError, match="TPU device"):
        ImageProcessor(fused=True, delta_e="2000")



def test_delta_e_2000_sharded_reduce(blobs_image):
    """Sharded entry points honor the CIEDE2000 metric (exact + bucketed):
    previously the bucketed branch silently fell back to CIE94."""
    image, _ = blobs_image
    for bucketing in (False, True):
        p = ImageProcessor(delta_e="2000", bucketing=bucketing)
        out = p.reduce_sharded(4, image)
        assert out.pixels.shape == image.pixels.shape
        assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 4
    colors = np.asarray([[220, 40, 40, 255], [40, 200, 60, 255]], np.uint8)
    f = ImageProcessor(delta_e="2000").find_sharded(image, colors)
    assert len(np.unique(f.pixels.reshape(-1, 4), axis=0)) <= 2


def test_reduce_ignores_input_alpha(blobs_image):
    """The exact reduce path uploads RGB-only (alpha is ignored by the
    whole pipeline; outputs force alpha=255 like the reference's revert
    shader): results must be identical for any input alpha values."""
    image, _ = blobs_image
    p = ImageProcessor()
    base = p.reduce(4, image)
    noisy = image.pixels.copy()
    rng = np.random.default_rng(3)
    noisy[..., 3] = rng.integers(0, 256, noisy.shape[:2], dtype=np.uint8)
    out = p.reduce(4, Image(image.dimensions, noisy))
    np.testing.assert_array_equal(base.pixels, out.pixels)
    assert (out.pixels[..., 3] == 255).all()


def test_pipelined_banded_reduce_matches_monolithic():
    """The transfer-pipelined (banded) reduce must match the monolithic
    exact path: the host-side training shrink mirrors the device sampler
    (bit-equal here), bands assign with the same executables, and dither
    offsets keep the Bayer pattern seamless across band edges."""
    from kmeans_tpu.ops.resize import resize_uint8, resize_uint8_np
    import jax.numpy as jnp

    rng = np.random.default_rng(57)
    img_u8 = rng.integers(0, 256, (2100, 640, 3), dtype=np.uint8)
    dev = np.asarray(resize_uint8(jnp.asarray(img_u8), 144, 256))
    host = resize_uint8_np(img_u8, 144, 256)
    np.testing.assert_array_equal(dev, host)

    base = np.array(
        [[230, 40, 40], [40, 220, 60], [60, 60, 230], [240, 240, 30]],
        np.int32,
    )
    idx = rng.integers(0, 4, (2100, 640))
    rgb = np.clip(
        base[idx] + rng.integers(-10, 11, (2100, 640, 3)), 0, 255
    ).astype(np.uint8)
    rgba = np.concatenate(
        [rgb, np.full((2100, 640, 1), 255, np.uint8)], -1
    )
    image = Image((640, 2100), rgba)
    banded = ImageProcessor(pipeline=True)
    mono = ImageProcessor(pipeline=False)
    for mode in (ReduceMode.REPLACE, ReduceMode.DITHER):
        ob = banded.reduce(4, image, reduce_mode=mode)
        om = mono.reduce(4, image, reduce_mode=mode)
        frac = (ob.pixels == om.pixels).all(axis=-1).mean()
        # bit-equal when the host/device shrinks agree (they do here);
        # tolerate isolated knife-edge pixels if a backend's FMA fusion
        # ever splits them
        assert frac > 0.9999, (mode, frac)
        assert (ob.pixels[..., 3] == 255).all()

    # No-shrink case (train_max_size covers the image): the banded path
    # must skip the host resize entirely — a same-size corner-aligned
    # "resize" is NOT identity (it blends adjacent texels).
    big_cap_b = ImageProcessor(pipeline=True, train_max_size=4096)
    big_cap_m = ImageProcessor(pipeline=False, train_max_size=4096)
    ob = big_cap_b.reduce(4, image)
    om = big_cap_m.reduce(4, image)
    np.testing.assert_array_equal(ob.pixels, om.pixels)


def test_pipelined_palette_matches_default():
    """`pipeline=True` palette uploads only the HOST-shrunk training strip
    (strip bytes instead of the whole image). On CPU the host shrink is
    bit-equal to the device sampler, so the palette must match the
    default path exactly — including the no-shrink case, where the host
    resize must be skipped (same-size corner-aligned resample is not
    identity)."""
    rng = np.random.default_rng(91)
    base = np.array(
        [[230, 40, 40], [40, 220, 60], [60, 60, 230], [240, 240, 30]],
        np.int32,
    )
    idx = rng.integers(0, 4, (700, 520))
    rgb = np.clip(
        base[idx] + rng.integers(-10, 11, (700, 520, 3)), 0, 255
    ).astype(np.uint8)
    rgba = np.concatenate([rgb, np.full((700, 520, 1), 255, np.uint8)], -1)
    image = Image((520, 700), rgba)
    got = ImageProcessor(pipeline=True).palette(4, image)
    want = ImageProcessor().palette(4, image)
    np.testing.assert_array_equal(got, want)
    # no-shrink case: train_max_size covers the image
    got_ns = ImageProcessor(pipeline=True, train_max_size=1024).palette(4, image)
    want_ns = ImageProcessor(train_max_size=1024).palette(4, image)
    np.testing.assert_array_equal(got_ns, want_ns)
    # joint multi-frame palette takes the same strip-upload gate
    frames = [image, Image((520, 700), rgba[::-1].copy())]
    got_b = ImageProcessor(pipeline=True).palette_images(frames, 4)
    want_b = ImageProcessor().palette_images(frames, 4)
    np.testing.assert_array_equal(got_b, want_b)
    # CPU palette algorithms shrink on the host too under pipeline (their
    # only device use was the sampler round trip)
    for algo in (Algorithm.OCTREE, Algorithm.MEDIANCUT, Algorithm.WU):
        got_a = ImageProcessor(pipeline=True).palette(4, image, algo)
        want_a = ImageProcessor().palette(4, image, algo)
        np.testing.assert_array_equal(got_a, want_a)
    # bucketed palette: pipeline host-shrinks and pads the STRIP to its
    # (much smaller) bucket; the trainer's dynamic resize reduces to the
    # exact identity gather, so on CPU the palette matches the bucketed
    # default exactly
    got_bk = ImageProcessor(bucketing=True, pipeline=True).palette(4, image)
    want_bk = ImageProcessor(bucketing=True).palette(4, image)
    np.testing.assert_array_equal(got_bk, want_bk)
    got_bf = ImageProcessor(bucketing=True, pipeline=True).palette_images(
        frames, 4
    )
    want_bf = ImageProcessor(bucketing=True).palette_images(frames, 4)
    np.testing.assert_array_equal(got_bf, want_bf)


def test_restarts_processor(blobs_image):
    """ImageProcessor(restarts=N): restarts=1 matches the default exactly;
    restarts>1 runs end-to-end (exact + bucketed + batched) and still
    recovers the blob palette."""
    image, base = blobs_image
    base_out = ImageProcessor().reduce(4, image)
    same = ImageProcessor(restarts=1).reduce(4, image)
    np.testing.assert_array_equal(base_out.pixels, same.pixels)
    p = ImageProcessor(restarts=4)
    pal = p.palette(4, image)
    d = np.linalg.norm(
        pal[:, :3].astype(int)[:, None, :] - base[None, :, :], axis=2
    )
    assert (d.min(axis=1) < 40).all()
    out = p.reduce(4, image)
    assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 4
    outs = p.reduce_batch(image, [2, 4])
    assert len(outs) == 2
    b = ImageProcessor(restarts=3, bucketing=True).reduce(4, image)
    assert b.pixels.shape == out.pixels.shape
    with pytest.raises(ValueError, match="restarts"):
        ImageProcessor(restarts=0)
    # Sharded restarts are first-class (round 2): multi-chip reduce with
    # restarts>1 must run and still quantize to <= k colors.
    sh = ImageProcessor(restarts=2).reduce_sharded(4, image)
    assert sh.pixels.shape == out.pixels.shape
    assert len(np.unique(sh.pixels.reshape(-1, 4), axis=0)) <= 4


def test_unpack_nibbles_inverts_packing():
    """The host unpack must invert the production device-side pack
    exactly, at both bit widths, including ragged widths (pad columns)."""
    import jax.numpy as jnp

    from kmeans_tpu.api import _pack_bits, _pack_nibbles, _unpack_nibbles

    rng = np.random.default_rng(51)
    for bits in (2, 4):
        per = 8 // bits
        for w in (8, 9, 33, 127, 128):
            idx = rng.integers(0, 1 << bits, (12, w), dtype=np.uint8)
            packed = np.asarray(_pack_nibbles(jnp.asarray(idx), bits))
            assert packed.shape[1] == -(-w // per)
            np.testing.assert_array_equal(
                _unpack_nibbles(packed, w, bits), idx
            )
    assert _pack_bits(4) == 2 and _pack_bits(5) == 4
    assert _pack_bits(16) == 4 and _pack_bits(17) == 8


def test_fused_indexed_paths_on_cpu_interpret(monkeypatch, blobs_image):
    """Drive the fused indexed (nibble-packed) host wiring on CPU by
    running the Pallas kernels in interpret mode: reduce/find outputs
    must be bit-equal to the XLA path (the kernels are bit-identical for
    replace/dither), proving every pack condition has a matching host
    unpack. Without this, the packed paths only ran on real TPU."""
    from functools import partial

    import kmeans_tpu.api as api
    from kmeans_tpu.ops import kernels

    monkeypatch.setattr(
        api,
        "fused_assign_packed",
        partial(kernels.fused_assign_packed, interpret=True),
    )
    monkeypatch.setattr(
        api, "fused_quantize", partial(kernels.fused_quantize, interpret=True)
    )
    monkeypatch.setattr(api, "_pallas_available", lambda device=None: True)

    image, _ = blobs_image
    # odd width slice exercises the pack padding
    odd = Image((127, 96), image.pixels[:, :127])
    colors = np.asarray(
        [[220, 40, 40, 255], [40, 200, 60, 255], [50, 60, 210, 255]], np.uint8
    )

    fused_p = api.ImageProcessor(fused=True)
    xla_p = api.ImageProcessor(fused=False)
    for img in (image, odd):
        got = fused_p.find(img, colors, api.ReduceMode.REPLACE)
        want = xla_p.find(img, colors, api.ReduceMode.REPLACE)
        np.testing.assert_array_equal(got.pixels, want.pixels)
        got = fused_p.reduce(4, img)
        want = xla_p.reduce(4, img)
        np.testing.assert_array_equal(got.pixels, want.pixels)
    # bucketed + streamed wiring
    fused_b = api.ImageProcessor(fused=True, bucketing=True)
    out = fused_b.reduce(4, odd)
    assert len(np.unique(out.pixels.reshape(-1, 4), axis=0)) <= 4

    # find_batch tall-stack fused path: frames with H % 4 != 0 exercise
    # the per-frame Bayer phase padding; must be bit-equal to the XLA
    # batch for replace AND dither. Meld rides its own tall RGB24-packed
    # launch (round 3, no phase to align): bit-equal to per-frame fused
    # `find` — NOT to the XLA twin, whose blend can flip on knife-edge
    # ties even in interpret mode (this fixture hits one; docs/perf.md).
    monkeypatch.setattr(
        api,
        "fused_meld_packed",
        partial(kernels.fused_meld_packed, interpret=True),
    )
    f1 = Image((50, 39), image.pixels[:39, :50])
    f2 = Image((50, 39), image.pixels[30:69, 20:70])
    for mode in (api.ReduceMode.REPLACE, api.ReduceMode.DITHER):
        got = fused_p.find_batch([f1, f2], colors, mode)
        want = xla_p.find_batch([f1, f2], colors, mode)
        for g, x in zip(got, want):
            np.testing.assert_array_equal(g.pixels, x.pixels)
        gotb = fused_b.find_batch([f1, f2], colors, mode)
        for g, x in zip(gotb, want):
            np.testing.assert_array_equal(g.pixels, x.pixels)
    got = fused_p.find_batch([f1, f2], colors, api.ReduceMode.MELD)
    xla = xla_p.find_batch([f1, f2], colors, api.ReduceMode.MELD)
    for g, x, f in zip(got, xla, (f1, f2)):
        solo = fused_p.find(f, colors, api.ReduceMode.MELD)
        np.testing.assert_array_equal(g.pixels, solo.pixels)
        frac = (g.pixels != x.pixels).any(axis=-1).mean()
        assert frac <= 1e-3, f"meld batch vs XLA drift {frac}"
    gotb = fused_b.find_batch([f1, f2], colors, api.ReduceMode.MELD)
    for g, b in zip(got, gotb):
        np.testing.assert_array_equal(g.pixels, b.pixels)
    fs = fused_p.find_streamed(odd, colors, api.ReduceMode.DITHER, band_rows=16)
    ws = api.ImageProcessor(fused=False, bucketing=True).find(
        odd, colors, api.ReduceMode.DITHER
    )
    np.testing.assert_array_equal(fs.pixels, ws.pixels)


def test_fused_meld_sharded_streamed_pipelined_on_cpu_interpret(
    monkeypatch, blobs_image
):
    """Round-3 meld compact-tier wiring beyond the solo paths, driven on
    CPU via interpret-mode kernels: (a) `find_sharded` meld rides the
    per-shard RGB24-packed kernel under shard_map and must be BIT-EQUAL
    to solo fused `find` (meld is per-pixel; sharding must be
    invisible); (b) `find_streamed` meld bands ride `_meld_packed_jit`
    and must equal the whole-image bucketed result; (c) `reduce_pipelined`
    meld rides the same packed executables as solo `reduce` on both the
    exact-shape and bucketed processors."""
    from functools import partial

    import kmeans_tpu.api as api
    import kmeans_tpu.parallel.sharded_ops as so
    from kmeans_tpu.ops import kernels

    monkeypatch.setattr(
        api,
        "fused_meld_packed",
        partial(kernels.fused_meld_packed, interpret=True),
    )
    monkeypatch.setattr(
        api, "_pallas_available", lambda device=None: True
    )
    monkeypatch.setattr(
        so, "meld_fused_sharded", partial(so.meld_fused_sharded, interpret=True)
    )

    image, _ = blobs_image
    odd = Image((127, 51), image.pixels[:51, :127])  # odd h and w
    colors = np.asarray(
        [[220, 40, 40, 255], [40, 200, 60, 255], [50, 60, 210, 255]], np.uint8
    )
    fused_p = api.ImageProcessor(fused=True)
    solo = fused_p.find(odd, colors, api.ReduceMode.MELD)

    sharded = fused_p.find_sharded(odd, colors, api.ReduceMode.MELD)
    np.testing.assert_array_equal(sharded.pixels, solo.pixels)

    fused_b = api.ImageProcessor(fused=True, bucketing=True)
    streamed = fused_b.find_streamed(
        odd, colors, api.ReduceMode.MELD, band_rows=16
    )
    whole = fused_b.find(odd, colors, api.ReduceMode.MELD)
    np.testing.assert_array_equal(streamed.pixels, whole.pixels)

    for p in (fused_p, fused_b):
        piped = p.reduce_pipelined([odd], 4, api.ReduceMode.MELD)
        want = p.reduce(4, odd, reduce_mode=api.ReduceMode.MELD)
        np.testing.assert_array_equal(piped[0].pixels, want.pixels)


def test_fused_find_large_palette_16bit_on_cpu_interpret(
    monkeypatch, blobs_image
):
    """`find` with 256 < k <= 512 colors rides the fused packed path via
    the 16-bit index tier (2 B/px readback instead of 4 B/px RGBA);
    output must stay bit-equal to the XLA path."""
    from functools import partial

    import kmeans_tpu.api as api
    from kmeans_tpu.ops import kernels

    monkeypatch.setattr(
        api,
        "fused_assign_packed",
        partial(kernels.fused_assign_packed, interpret=True),
    )
    monkeypatch.setattr(api, "_pallas_available", lambda device=None: True)

    image, _ = blobs_image
    small = Image((64, 48), image.pixels[:48, :64])
    rng = np.random.default_rng(77)
    colors = rng.integers(0, 256, (300, 4), dtype=np.uint8)
    colors[:, 3] = 255
    # all-distinct colors so index<->color equality is exact
    colors = np.unique(colors, axis=0)
    assert colors.shape[0] > 256

    fused_p = api.ImageProcessor(fused=True)
    xla_p = api.ImageProcessor(fused=False)
    for mode in (api.ReduceMode.REPLACE, api.ReduceMode.DITHER):
        got = fused_p.find(small, colors, mode)
        want = xla_p.find(small, colors, mode)
        np.testing.assert_array_equal(got.pixels, want.pixels)


def test_fused_frame_batch_paths_on_cpu_interpret(monkeypatch, blobs_image):
    """Drive the per-frame-palette fused batch wiring (reduce_images /
    reduce_many) on CPU via interpret-mode kernels: outputs must be
    bit-equal to the vmapped XLA batch paths for replace and dither, on
    both the exact-shape and bucketed processors. Meld rides the
    RGB24-packed frames kernel (round-3 admission) and is bit-equal in
    interpret mode too (hardware 1-ulp flips are measured separately,
    docs/perf.md)."""
    from functools import partial

    import kmeans_tpu.api as api
    from kmeans_tpu.ops import kernels

    monkeypatch.setattr(
        api,
        "fused_assign_frames_packed",
        partial(kernels.fused_assign_frames_packed, interpret=True),
    )
    monkeypatch.setattr(
        api,
        "fused_meld_frames_packed",
        partial(kernels.fused_meld_frames_packed, interpret=True),
    )
    monkeypatch.setattr(
        api,
        "fused_meld_packed",
        partial(kernels.fused_meld_packed, interpret=True),
    )
    monkeypatch.setattr(
        api,
        "fused_assign_packed",
        partial(kernels.fused_assign_packed, interpret=True),
    )
    monkeypatch.setattr(
        api, "fused_quantize", partial(kernels.fused_quantize, interpret=True)
    )
    monkeypatch.setattr(api, "_pallas_available", lambda device=None: True)

    image, _ = blobs_image
    frames = [
        Image((61, 45), image.pixels[:45, :61]),
        Image((61, 45), image.pixels[20:65, 10:71]),
        Image((61, 45), image.pixels[40:85, 30:91]),
    ]
    for bucketing in (False, True):
        fused_p = api.ImageProcessor(fused=True, bucketing=bucketing)
        xla_p = api.ImageProcessor(fused=False, bucketing=bucketing)
        for mode in (
            api.ReduceMode.REPLACE,
            api.ReduceMode.DITHER,
            api.ReduceMode.MELD,
        ):
            got = fused_p.reduce_images(frames, 5, mode)
            want = xla_p.reduce_images(frames, 5, mode)
            for g, x in zip(got, want):
                np.testing.assert_array_equal(g.pixels, x.pixels)

    # reduce_many: mixed sizes; two frames share a bucket (coalesced fused
    # executable), one is alone (solo reduce fallback).
    many = [
        Image((61, 45), image.pixels[:45, :61]),
        Image((59, 47), image.pixels[1:48, 2:61]),
        Image((120, 96), image.pixels[:96, :120]),
    ]
    fused_b = api.ImageProcessor(fused=True, bucketing=True)
    xla_b = api.ImageProcessor(fused=False, bucketing=True)
    for mode in (
        api.ReduceMode.REPLACE,
        api.ReduceMode.DITHER,
        api.ReduceMode.MELD,
    ):
        got = fused_b.reduce_many(many, 4, mode)
        want = xla_b.reduce_many(many, 4, mode)
        for g, x in zip(got, want):
            np.testing.assert_array_equal(g.pixels, x.pixels)


def test_find_many_matches_per_image_find(monkeypatch, blobs_image):
    """`find_many` (mixed-size fixed-palette batch, the /find
    micro-batching entry point) must be BIT-EQUAL to per-image `find`:
    two frames share a bucket (coalesced fused tall-stack launch), one is
    alone (solo fallback). Replace/dither coalesce through the tall-stack
    index kernel; meld coalesces through the tall RGB24-packed meld
    launch (round 3) and must stay bit-equal to solo `find` too. Also
    checked against the XLA (fused=False) processor so the fused stack
    itself is validated."""
    from functools import partial

    import kmeans_tpu.api as api
    from kmeans_tpu.ops import kernels

    monkeypatch.setattr(
        api,
        "fused_assign_packed",
        partial(kernels.fused_assign_packed, interpret=True),
    )
    monkeypatch.setattr(
        api, "fused_quantize", partial(kernels.fused_quantize, interpret=True)
    )
    monkeypatch.setattr(
        api,
        "fused_meld_packed",
        partial(kernels.fused_meld_packed, interpret=True),
    )
    monkeypatch.setattr(api, "_pallas_available", lambda device=None: True)

    image, _ = blobs_image
    many = [
        Image((61, 45), image.pixels[:45, :61]),
        Image((59, 47), image.pixels[1:48, 2:61]),
        Image((120, 96), image.pixels[:96, :120]),
    ]
    rng = np.random.default_rng(7)
    colors = rng.integers(0, 256, (6, 4), dtype=np.uint8)
    colors[:, 3] = 255

    fused_b = api.ImageProcessor(fused=True, bucketing=True)
    xla_b = api.ImageProcessor(fused=False, bucketing=True)
    for mode in (
        api.ReduceMode.REPLACE,
        api.ReduceMode.DITHER,
        api.ReduceMode.MELD,
    ):
        got = fused_b.find_many(many, colors, mode)
        solo = [fused_b.find(f, colors, mode) for f in many]
        want = xla_b.find_many(many, colors, mode)
        for g, s, x in zip(got, solo, want):
            np.testing.assert_array_equal(g.pixels, s.pixels)
            np.testing.assert_array_equal(g.pixels, x.pixels)
        for g, f in zip(got, many):
            assert g.dimensions == f.dimensions


def test_palette_many_matches_per_image_palette(blobs_image):
    """`palette_many` (mixed-size batch, the /palette micro-batching
    entry point): two frames share a bucket (one vmapped training
    launch), one is alone (solo fallback). Each returned palette must
    match solo `palette` — training math is identical; only vmap's f32
    reduction reordering could deviate, and on this backend it doesn't.
    Pipeline mode (strip-bucket grouping) must agree too, and non-kmeans
    algorithms fall back per-image."""
    import kmeans_tpu.api as api

    image, _ = blobs_image
    many = [
        Image((61, 45), image.pixels[:45, :61]),
        Image((59, 47), image.pixels[1:48, 2:61]),
        Image((120, 96), image.pixels[:96, :120]),
    ]
    for kwargs in ({}, {"pipeline": True, "train_max_size": 32}):
        p = api.ImageProcessor(bucketing=True, fused=False, **kwargs)
        got = p.palette_many(many, 4)
        for g, f in zip(got, many):
            want = p.palette(4, f)
            np.testing.assert_array_equal(g, want)

    p = api.ImageProcessor(bucketing=True, fused=False)
    got = p.palette_many(many, 3, api.Algorithm.OCTREE)
    for g, f in zip(got, many):
        np.testing.assert_array_equal(
            g, p.palette(3, f, api.Algorithm.OCTREE)
        )


def test_micro_batch_coalescing_gated_on_plain_trainer_route(
    monkeypatch, blobs_image
):
    """Buckets whose training canvas routes solo requests to the Pallas/
    chunked large-N trainers must NOT take the vmapped coalesced
    executables (those would stack B [N, K]-class intermediates); since
    round 3 they coalesce through the HEAVY executables instead —
    sequential per-frame lax.map trainings in ONE launch, with solo
    semantics and solo memory behavior. _plain_fit_route mirrors the
    _fit_auto branches."""
    import kmeans_tpu.api as api

    # The route mirror itself: plain for small trainings, refused exactly
    # where _fit_auto leaves fit_restarts.
    assert api._plain_fit_route(256 * 256, 8, False, "cie94")
    assert api._plain_fit_route(256 * 256, 128, False, "cie94")
    big = api._CHUNKED_TRAIN_ELEMS // 128 + 1
    assert not api._plain_fit_route(big, 128, False, "cie94")
    assert api._plain_fit_route(big, 128, True, "cie2000") is False
    assert not api._plain_fit_route(
        api._LARGE_TRAIN_PIXELS + 1, 8, True, "cie94"
    )
    assert api._plain_fit_route(api._LARGE_TRAIN_PIXELS + 1, 8, False, "cie94")

    # When the gate refuses, both entry points coalesce through the heavy
    # executables: the vmapped ones compile nothing, the heavy ones serve
    # the batch in one launch each, outputs match solo.
    monkeypatch.setattr(api, "_plain_fit_route", lambda *a: False)
    image, _ = blobs_image
    many = [
        Image((61, 45), image.pixels[:45, :61]),
        Image((59, 47), image.pixels[1:48, 2:61]),
    ]
    p = api.ImageProcessor(bucketing=True, fused=False)
    before_vmapped = (
        api._palette_many_bucketed_jit._cache_size()
        + api._reduce_many_bucketed_jit._cache_size()
    )
    before_heavy = (
        api._palette_many_bucketed_heavy_jit._cache_size()
        + api._reduce_many_bucketed_heavy_jit._cache_size()
    )
    pals = p.palette_many(many, 3)
    outs = p.reduce_many(many, 3)
    assert (
        api._palette_many_bucketed_jit._cache_size()
        + api._reduce_many_bucketed_jit._cache_size()
    ) == before_vmapped
    assert (
        api._palette_many_bucketed_heavy_jit._cache_size()
        + api._reduce_many_bucketed_heavy_jit._cache_size()
    ) == before_heavy + 2
    for f, pal, out in zip(many, pals, outs):
        # lax.map's per-frame computation is the solo protocol; XLA may
        # reassociate f32 sums across the compilation contexts, so the
        # bar is near-identity (the reduce_many vmap caveat), not bits.
        want_pal = p.palette(3, f)
        assert np.abs(pal.astype(int) - want_pal.astype(int)).max() <= 1
        frac = (out.pixels == p.reduce(3, f).pixels).all(axis=-1).mean()
        assert frac > 0.99


def test_micro_batch_heavy_singleton_still_solo(monkeypatch, blobs_image):
    """A frame alone in its heavy bucket keeps the plain per-image path
    (nothing to coalesce), exactly like plain buckets."""
    import kmeans_tpu.api as api

    monkeypatch.setattr(api, "_plain_fit_route", lambda *a: False)
    image, _ = blobs_image
    p = api.ImageProcessor(bucketing=True, fused=False)
    before = (
        api._reduce_many_bucketed_heavy_jit._cache_size()
        + api._palette_many_bucketed_heavy_jit._cache_size()
    )
    (out,) = p.reduce_many([Image((61, 45), image.pixels[:45, :61])], 3)
    (pal,) = p.palette_many([Image((61, 45), image.pixels[:45, :61])], 3)
    assert (
        api._reduce_many_bucketed_heavy_jit._cache_size()
        + api._palette_many_bucketed_heavy_jit._cache_size()
    ) == before
    np.testing.assert_array_equal(
        out.pixels, p.reduce(3, Image((61, 45), image.pixels[:45, :61])).pixels
    )
    np.testing.assert_array_equal(
        pal, p.palette(3, Image((61, 45), image.pixels[:45, :61]))
    )


def test_host_fetch_matches_sequential_asarray():
    """`_host_fetch` (overlapped multi-array readback) must be a pure
    value-preserving fetch: identical to sequential `np.asarray` for
    device arrays, passthrough for plain numpy/scalars, and a tuple of
    the right arity in every case."""
    import jax.numpy as jnp

    from kmeans_tpu.api import _host_fetch

    dev_a = jnp.arange(24, dtype=jnp.int32).reshape(4, 6) * 3
    dev_b = jnp.full((5, 4), 7, jnp.uint8)
    host_c = np.linspace(0.0, 1.0, 11)
    a, b, c = _host_fetch(dev_a, dev_b, host_c)
    np.testing.assert_array_equal(a, np.asarray(dev_a))
    np.testing.assert_array_equal(b, np.asarray(dev_b))
    np.testing.assert_array_equal(c, host_c)
    assert all(isinstance(x, np.ndarray) for x in (a, b, c))
    (single,) = _host_fetch(dev_a)
    np.testing.assert_array_equal(single, a)
    assert _host_fetch() == ()


def test_meld_above_quant_max_kp_routes_xla_everywhere(
    monkeypatch, blobs_image
):
    """k (or its k-bucket) above QUANT_MAX_KP has no meld kernel program
    (the kp=2048 program crashes the Mosaic compiler — docs/perf.md);
    every fused entry point must fall to the row-chunked XLA meld instead
    of tracing `fused_meld_packed` (trace-time ValueError) or
    mis-unpacking its RGBA output as packed RGB24 words. Pins the
    round-5 gates on find_streamed / reduce_pipelined (plain + bucketed)
    / reduce_many's heavy route; the kernel-level cap itself is pinned in
    tests/test_kernels.py."""
    import kmeans_tpu.api as api

    # No interpret-mode kernel patches on purpose: above the cap NO
    # Pallas kernel may be reached — if one is, the trace fails loudly
    # on this CPU-only run, which is exactly the regression to catch.
    monkeypatch.setattr(api, "_pallas_available", lambda device=None: True)

    image, _ = blobs_image
    small = Image((20, 15), image.pixels[:15, :20])
    k = api.QUANT_MAX_KP + 1  # legal input (validate_k has no upper bound)

    # find_streamed: fixed >1024-entry palette pads to bucket 2048.
    rng = np.random.default_rng(5)
    colors = rng.integers(0, 256, (k, 3)).astype(np.uint8)
    fused_b = ImageProcessor(fused=True, bucketing=True)
    whole = fused_b.find(small, colors, ReduceMode.MELD)
    streamed = fused_b.find_streamed(
        small, colors, ReduceMode.MELD, band_rows=8
    )
    np.testing.assert_array_equal(streamed.pixels, whole.pixels)

    # reduce_pipelined rides the same executables as solo reduce on both
    # processor shapes -> bit-equal.
    p_plain = ImageProcessor(fused=True)
    (piped,) = p_plain.reduce_pipelined([small], k, ReduceMode.MELD)
    want = p_plain.reduce(k, small, reduce_mode=ReduceMode.MELD)
    np.testing.assert_array_equal(piped.pixels, want.pixels)
    (pipedb,) = fused_b.reduce_pipelined([small], k, ReduceMode.MELD)
    wantb = fused_b.reduce(k, small, reduce_mode=ReduceMode.MELD)
    np.testing.assert_array_equal(pipedb.pixels, wantb.pixels)

    # reduce_many HEAVY route: above the cap the heavy jit's meld branch
    # returns full RGBA (XLA meld) — the host tail must take the plain
    # else tail, not the meld-words unpack.
    monkeypatch.setattr(api, "_plain_fit_route", lambda *a: False)
    frames = [small, Image((20, 15), image.pixels[5:20, 30:50])]
    outs = fused_b.reduce_many(frames, k, ReduceMode.MELD)
    for f, out in zip(frames, outs):
        assert out.pixels.shape == f.pixels.shape
    # One solo comparison bounds the suite cost (each kp=2048 training is
    # expensive on the single-core CPU; frame 1 shares the executable so
    # the unpack-tail regression this pins cannot be frame-selective) —
    # and frames[0] IS `small`, whose solo result `wantb` is already
    # computed (_plain_fit_route does not affect solo routing). lax.map's
    # per-frame computation is the solo protocol; XLA may reassociate f32
    # sums across compilation contexts, so the bar is near-identity, not
    # bits (the reduce_many vmap caveat).
    frac = (outs[0].pixels == wantb.pixels).all(axis=-1).mean()
    assert frac > 0.99
