"""Golden-output parity: our deterministic pipelines vs the reference's
committed result images (`/root/reference/gfx/`, produced by
`samples.sh:3-8`).

The `find` pipelines have no RNG, so modulo f32 knife-edge pixels (GPU vs
XLA transcendental rounding) the outputs must match the reference's goldens
pixel-exactly. The k-means `reduce` palette depends on the seeding hash
(implementation-defined GPU f32 sin — see `models/kmeans.py`), so for it we
assert equal *quality*: mean CIE94 quantization error within 2% of the
golden's.

Skipped when the reference checkout is not present.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

GFX = "/root/reference/gfx"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GFX), reason="reference gfx/ not available"
)


@pytest.fixture(scope="module")
def tokyo():
    from kmeans_tpu.utils.imageio import load_image

    return load_image(f"{GFX}/tokyo.png")


def _match_fraction(ours, golden):
    return float((ours.pixels == golden.pixels).all(axis=-1).mean())


def test_find_replace_matches_golden(tokyo):
    from kmeans_tpu.api import ImageProcessor, ReduceMode
    from kmeans_tpu.cli import parse_colors
    from kmeans_tpu.utils.imageio import load_image

    golden = load_image(f"{GFX}/tokyo-find-replace-dark-white-red.png")
    ours = ImageProcessor().find(
        tokyo, parse_colors("#050505,#ffffff,#ff0000"), ReduceMode.REPLACE
    )
    assert _match_fraction(ours, golden) > 0.999


def test_find_dither_matches_golden(tokyo):
    from kmeans_tpu.api import ImageProcessor, ReduceMode
    from kmeans_tpu.cli import parse_colors
    from kmeans_tpu.utils.imageio import load_image

    golden = load_image(f"{GFX}/tokyo-find-dither-dark-white-red.png")
    ours = ImageProcessor().find(
        tokyo, parse_colors("#050505,#ffffff,#ff0000"), ReduceMode.DITHER
    )
    assert _match_fraction(ours, golden) > 0.999


def test_find_dither_palette_image_matches_golden(tokyo):
    from kmeans_tpu.api import ImageProcessor, ReduceMode
    from kmeans_tpu.cli import parse_palette_image
    from kmeans_tpu.utils.imageio import load_image

    golden = load_image(f"{GFX}/tokyo-find-dither-apollo.png")
    colors = parse_palette_image(f"{GFX}/apollo-1x.png")
    ours = ImageProcessor().find(tokyo, colors, ReduceMode.DITHER)
    assert _match_fraction(ours, golden) > 0.999


def test_reduce_quality_matches_golden(tokyo):
    from kmeans_tpu.api import ImageProcessor
    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.ops.delta_e import distance_cie94
    from kmeans_tpu.utils.imageio import load_image

    golden = load_image(f"{GFX}/tokyo-reduce-c8-kmeans-replace.png")
    ours = ImageProcessor().reduce(8, tokyo)

    def mean_err(quant):
        lo = srgb8_to_lab(jnp.asarray(tokyo.pixels[..., :3]))
        lq = srgb8_to_lab(jnp.asarray(quant.pixels[..., :3]))
        return float(distance_cie94(lo, lq).mean())

    assert len(np.unique(ours.pixels.reshape(-1, 4), axis=0)) == 8
    assert mean_err(ours) <= mean_err(golden) * 1.02


def test_resurrect_palette_image_loads():
    # cli/src/args.rs:281-294: resurrect_64.png parses to 64 colors.
    from kmeans_tpu.cli import parse_palette_image

    colors = parse_palette_image(f"{GFX}/resurrect_64.png")
    assert colors.shape == (64, 4)


def test_turtles_gif_find_batch_pipeline():
    # BASELINE config 5: decode the reference's turtles.gif, apply the
    # apollo palette with batched find, re-encode.
    from kmeans_tpu.api import ImageProcessor, ReduceMode
    from kmeans_tpu.cli import parse_palette_image
    from kmeans_tpu.utils import imageio

    if not imageio.HAVE_NATIVE:
        pytest.skip("gif requires native runtime")
    frames = imageio.load_gif(f"{GFX}/turtles.gif")
    assert len(frames) == 14
    colors = parse_palette_image(f"{GFX}/apollo-1x.png")
    outs = ImageProcessor().find_batch(frames[:3], colors, ReduceMode.REPLACE)
    palette_set = set(map(tuple, colors.tolist()))
    for out in outs:
        uniq = set(map(tuple, np.unique(out.pixels.reshape(-1, 4), axis=0).tolist()))
        # every output color is (the Lab-roundtrip of) a palette color;
        # compare through the quantize path's own palette conversion
        assert len(uniq) <= len(palette_set)


def test_reduce_dither_quality_matches_golden(tokyo):
    # tokyo-reduce-c8-kmeans-dither.png: same quality criterion as the
    # replace golden — dithering trades per-pixel error for perceptual
    # smoothness, so mean CIE94 error vs the source must stay within 2%
    # of the reference's dithered output.
    from kmeans_tpu.api import ImageProcessor, ReduceMode
    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.ops.delta_e import distance_cie94
    from kmeans_tpu.utils.imageio import load_image

    golden = load_image(f"{GFX}/tokyo-reduce-c8-kmeans-dither.png")
    ours = ImageProcessor().reduce(8, tokyo, reduce_mode=ReduceMode.DITHER)

    def mean_err(quant):
        lo = srgb8_to_lab(jnp.asarray(tokyo.pixels[..., :3]))
        lq = srgb8_to_lab(jnp.asarray(quant.pixels[..., :3]))
        return float(distance_cie94(lo, lq).mean())

    assert len(np.unique(ours.pixels.reshape(-1, 4), axis=0)) <= 8
    assert mean_err(ours) <= mean_err(golden) * 1.02


def test_bucketed_reduce_quality_matches_golden(tokyo):
    # The serving path must hold the same quality bar as the exact path.
    from kmeans_tpu.api import ImageProcessor
    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.ops.delta_e import distance_cie94
    from kmeans_tpu.utils.imageio import load_image

    golden = load_image(f"{GFX}/tokyo-reduce-c8-kmeans-replace.png")
    ours = ImageProcessor(bucketing=True).reduce(8, tokyo)

    def mean_err(quant):
        lo = srgb8_to_lab(jnp.asarray(tokyo.pixels[..., :3]))
        lq = srgb8_to_lab(jnp.asarray(quant.pixels[..., :3]))
        return float(distance_cie94(lo, lq).mean())

    assert ours.dimensions == tokyo.dimensions
    assert mean_err(ours) <= mean_err(golden) * 1.02
