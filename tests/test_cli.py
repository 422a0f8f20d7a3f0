"""CLI tests: validators, output naming, swatch — ported from the
reference's `cli/src/args.rs:233-294` tests — plus end-to-end subcommand
runs through `cli.main` on generated PNGs."""

import argparse
import os

import numpy as np
import pytest

from kmeans_tpu import cli
from kmeans_tpu.image import Image
from kmeans_tpu.utils.imageio import load_image, save_image


def test_validate_k():
    assert cli.validate_k("1") == 1
    assert cli.validate_k("150") == 150
    for bad in ["abs", "0", "-3"]:
        with pytest.raises(argparse.ArgumentTypeError):
            cli.validate_k(bad)


def test_validate_filename():
    assert cli.validate_filename("jog.png") == "jog.png"
    assert cli.validate_filename("jog.jpg") == "jog.jpg"
    for bad in ["jog.pom", ".png"]:
        with pytest.raises(argparse.ArgumentTypeError):
            cli.validate_filename(bad)


def test_parse_colors():
    colors = cli.parse_colors("#ffffff,#000000")
    np.testing.assert_array_equal(
        colors, [[255, 255, 255, 255], [0, 0, 0, 255]]
    )


def test_validate_palette_rejects():
    with pytest.raises(argparse.ArgumentTypeError):
        cli.validate_palette("#ffffff#000000")
    with pytest.raises(argparse.ArgumentTypeError):
        cli.validate_palette("")


def test_validate_palette_hex():
    pal = cli.validate_palette("#ff0000,#00ff00")
    assert pal.shape == (2, 4)


def test_parse_palette_image(tmp_path):
    # 64 distinct colors in an 8x8 image.
    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[..., 0] = np.arange(64).reshape(8, 8) * 4
    rgba[..., 1] = np.arange(64).reshape(8, 8)
    rgba[..., 3] = 255
    p = str(tmp_path / "pal.png")
    save_image(Image((8, 8), rgba), p)
    colors = cli.parse_palette_image(p)
    assert colors.shape == (64, 4)


def test_parse_palette_image_rejects_recurring(tmp_path):
    rgba = np.zeros((2, 2, 4), np.uint8)
    rgba[..., 3] = 255
    p = str(tmp_path / "dup.png")
    save_image(Image((2, 2), rgba), p)
    with pytest.raises(argparse.ArgumentTypeError):
        cli.parse_palette_image(p)


def test_output_naming():
    assert (
        cli.reduce_file_path(8, "kmeans", "replace", None, "/a/tokyo.png")
        == "/a/tokyo-reduce-c8-kmeans-replace.png"
    )
    assert (
        cli.palette_file_path(8, "/a/tokyo.png", None, "kmeans", 40)
        == "/a/tokyo-palette-c8-kmeans-s40.png"
    )
    assert cli.find_file_path("dither", None, "/a/tokyo.jpg").startswith(
        "/a/tokyo-find-dither-"
    )
    assert cli.find_file_path("dither", None, "/a/tokyo.jpg").endswith(".jpg")
    assert cli.reduce_file_path(8, "kmeans", "replace", "/x/y.png", "/a/t.png") == "/x/y.png"


def test_swatch_shape():
    pal = np.array([[1, 2, 3, 255], [4, 5, 6, 255]], np.uint8)
    sw = cli.render_swatch(pal, 40)
    assert sw.shape == (40, 80, 4)
    assert (sw[:, :40] == pal[0]).all()
    assert (sw[:, 40:] == pal[1]).all()


def test_palette_hex_uppercase():
    pal = np.array([[255, 171, 205, 255]], np.uint8)
    assert cli.palette_hex(pal) == "#FFABCD"


@pytest.fixture(scope="module")
def sample_png(tmp_path_factory):
    rng = np.random.default_rng(9)
    base = np.array([[230, 40, 40], [40, 220, 60], [60, 60, 230]], np.int32)
    idx = rng.integers(0, 3, size=(64, 64))
    rgb = np.clip(base[idx] + rng.integers(-10, 11, (64, 64, 3)), 0, 255)
    rgba = np.concatenate(
        [rgb.astype(np.uint8), np.full((64, 64, 1), 255, np.uint8)], -1
    )
    path = tmp_path_factory.mktemp("gfx") / "sample.png"
    save_image(Image((64, 64), rgba), str(path))
    return str(path)


def test_cli_reduce_end_to_end(sample_png):
    assert cli.main(["reduce", "-i", sample_png, "-c", "3"]) == 0
    out = sample_png.replace("sample.png", "sample-reduce-c3-kmeans-replace.png")
    assert os.path.exists(out)
    img = load_image(out)
    assert len(np.unique(img.pixels.reshape(-1, 4), axis=0)) <= 3


def test_validate_train_max_size():
    assert cli.validate_train_max_size("256") == 256
    assert cli.validate_train_max_size("none") is None
    assert cli.validate_train_max_size("FULL") is None
    for bad in ["0", "-1", "abc"]:
        with pytest.raises((argparse.ArgumentTypeError, ValueError)):
            cli.validate_train_max_size(bad)


def test_cli_train_flags_end_to_end(sample_png):
    """--train-max-size none (full-resolution training) and --train-dtype
    reach the processor: the run must succeed and produce <= k colors;
    --train-dtype with --bucketing must propagate the API's rejection."""
    assert (
        cli.main(
            ["--train-max-size", "none", "reduce", "-i", sample_png, "-c", "3"]
        )
        == 0
    )
    assert (
        cli.main(
            ["--train-dtype", "bfloat16", "--train-max-size", "none",
             "reduce", "-i", sample_png, "-c", "3"]
        )
        == 0
    )
    with pytest.raises(SystemExit, match="bucketing"):
        cli.main(
            ["--train-dtype", "bfloat16", "--bucketing",
             "reduce", "-i", sample_png, "-c", "3"]
        )


def test_cli_palette_end_to_end(sample_png, capsys):
    assert cli.main(["palette", "-i", sample_png, "-c", "3", "-s", "10"]) == 0
    printed = capsys.readouterr().out
    assert printed.startswith("Palette: #")
    assert printed.count("#") == 3
    out = sample_png.replace("sample.png", "sample-palette-c3-kmeans-s10.png")
    img = load_image(out)
    assert img.dimensions == (30, 10)


def test_cli_find_end_to_end(sample_png, tmp_path):
    out = str(tmp_path / "found.png")
    assert (
        cli.main(
            ["find", "-i", sample_png, "-p", "#ff0000,#00ff00,#0000ff", "-o", out]
        )
        == 0
    )
    img = load_image(out)
    uniq = np.unique(img.pixels.reshape(-1, 4), axis=0)
    assert len(uniq) == 3


def test_cli_reduce_octree_dither(sample_png, tmp_path):
    out = str(tmp_path / "oct.png")
    assert (
        cli.main(
            ["reduce", "-i", sample_png, "-c", "3", "-a", "octree", "-m", "dither", "-o", out]
        )
        == 0
    )
    assert os.path.exists(out)


def test_palette_swatch_roundtrip_through_find(sample_png, tmp_path):
    # The reference's "model checkpoint" analogue: a palette swatch image
    # can be re-consumed by `find -p` (cli/src/main.rs:221-239,
    # cli/src/args.rs:197-216).
    assert cli.main(["palette", "-i", sample_png, "-c", "3", "-s", "1"]) == 0
    swatch = sample_png.replace("sample.png", "sample-palette-c3-kmeans-s1.png")
    assert os.path.exists(swatch)
    out = str(tmp_path / "roundtrip.png")
    assert cli.main(["find", "-i", sample_png, "-p", swatch, "-o", out]) == 0
    img = load_image(out)
    swatch_colors = set(map(tuple, load_image(swatch).pixels.reshape(-1, 4)))
    out_colors = set(map(tuple, img.pixels.reshape(-1, 4)))
    assert out_colors <= swatch_colors


def test_cli_jpg_end_to_end(sample_png, tmp_path):
    from kmeans_tpu.utils import imageio as iio
    if not iio.HAVE_NATIVE:
        pytest.skip("jpeg requires native runtime")
    # Convert the sample to jpg, then reduce it via the CLI.
    img = load_image(sample_png)
    jpg = str(tmp_path / "sample.jpg")
    save_image(img, jpg)
    out = str(tmp_path / "out.png")
    assert cli.main(["reduce", "-i", jpg, "-c", "3", "-o", out]) == 0
    assert load_image(out).dimensions == img.dimensions


def test_cli_gif_subcommands(tmp_path):
    from kmeans_tpu.utils import imageio as iio
    if not iio.HAVE_NATIVE:
        pytest.skip("gif requires native runtime")
    # Build a small 3-frame gif.
    rng = np.random.default_rng(12)
    frames = []
    for i in range(3):
        base = np.array([[230, 40, 40], [40, 220, 60], [60, 60, 230]], np.int32)
        idx = rng.integers(0, 3, size=(16, 16))
        rgb = np.clip(base[idx] + rng.integers(-9, 10, (16, 16, 3)), 0, 255)
        rgba = np.concatenate(
            [rgb.astype(np.uint8), np.full((16, 16, 1), 255, np.uint8)], -1
        )
        frames.append(Image((16, 16), rgba))
    src = str(tmp_path / "anim.gif")
    iio.save_gif(frames, src)

    assert cli.main(["reduce-gif", "-i", src, "-c", "2"]) == 0
    out = str(tmp_path / "anim-reduce-c2-replace.gif")
    assert os.path.exists(out)
    back = iio.load_gif(out)
    assert len(back) == 3
    for f in back:
        assert len(np.unique(f.pixels.reshape(-1, 4), axis=0)) <= 2

    assert cli.main(["find-gif", "-i", src, "-p", "#ff0000,#00ff00", "-o",
                     str(tmp_path / "f.gif")]) == 0
    back = iio.load_gif(str(tmp_path / "f.gif"))
    assert len(back) == 3


def test_cli_mediancut(sample_png, tmp_path):
    out = str(tmp_path / "mc.png")
    assert cli.main(["reduce", "-i", sample_png, "-c", "3", "-a", "mediancut", "-o", out]) == 0
    assert len(np.unique(load_image(out).pixels.reshape(-1, 4), axis=0)) <= 3


def test_cli_wu(sample_png, tmp_path):
    out = str(tmp_path / "wu.png")
    assert cli.main(["reduce", "-i", sample_png, "-c", "3", "-a", "wu", "-o", out]) == 0
    assert len(np.unique(load_image(out).pixels.reshape(-1, 4), axis=0)) <= 3


def test_cli_reduce_gif_global_palette(tmp_path):
    from kmeans_tpu.utils import imageio as iio
    if not iio.HAVE_NATIVE:
        pytest.skip("gif requires native runtime")
    rng = np.random.default_rng(13)
    base = np.array([[230, 40, 40], [40, 220, 60], [60, 60, 230]], np.int32)
    frames = []
    for i in range(3):
        idx = rng.integers(0, 3, size=(16, 16))
        rgb = np.clip(base[idx] + rng.integers(-9, 10, (16, 16, 3)), 0, 255)
        rgba = np.concatenate(
            [rgb.astype(np.uint8), np.full((16, 16, 1), 255, np.uint8)], -1
        )
        frames.append(Image((16, 16), rgba))
    src = str(tmp_path / "ganim.gif")
    iio.save_gif(frames, src)
    out = str(tmp_path / "g.gif")
    assert cli.main(
        ["reduce-gif", "-i", src, "-c", "3", "--palette-mode", "global", "-o", out]
    ) == 0
    back = iio.load_gif(out)
    # One global palette: the union of colors across frames is <= k.
    union = np.unique(
        np.concatenate([f.pixels.reshape(-1, 4) for f in back]), axis=0
    )
    assert len(union) <= 3


def test_cli_bucketing_flag(sample_png, tmp_path):
    out = str(tmp_path / "b.png")
    assert cli.main(
        ["--bucketing", "reduce", "-i", sample_png, "-c", "3", "-o", out]
    ) == 0
    img = load_image(out)
    assert img.dimensions == load_image(sample_png).dimensions
    assert len(np.unique(img.pixels.reshape(-1, 4), axis=0)) <= 3


def test_cli_band_rows(sample_png, tmp_path):
    out = str(tmp_path / "br.png")
    assert cli.main(
        ["reduce", "-i", sample_png, "-c", "3", "--band-rows", "16", "-o", out]
    ) == 0
    img = load_image(out)
    assert img.dimensions == load_image(sample_png).dimensions
    assert len(np.unique(img.pixels.reshape(-1, 4), axis=0)) <= 3
    with pytest.raises(SystemExit):
        cli.main(["reduce", "-i", sample_png, "-c", "3", "--band-rows", "16",
                  "-a", "octree", "-o", out])
    # The API clamps band_rows to >= 4; the CLI rejects smaller values
    # up front instead of silently ignoring them (ADVICE.md round 1).
    with pytest.raises(SystemExit):
        cli.main(["reduce", "-i", sample_png, "-c", "3", "--band-rows", "2",
                  "-o", out])


def test_cli_delta_e_2000(sample_png, tmp_path):
    out = str(tmp_path / "de2000.png")
    assert cli.main(
        ["--delta-e", "2000", "reduce", "-i", sample_png, "-c", "3", "-o", out]
    ) == 0
    img = load_image(out)
    assert len(np.unique(img.pixels.reshape(-1, 4), axis=0)) <= 3


def test_cli_fast_flag(sample_png, tmp_path):
    out = str(tmp_path / "fast.png")
    assert cli.main(
        ["--fast", "reduce", "-i", sample_png, "-c", "3", "-o", out]
    ) == 0
    assert os.path.exists(out)


def test_cli_pipeline_flag(sample_png, tmp_path, capsys):
    """--pipeline reaches ImageProcessor(pipeline=True) and outputs match
    the default paths. The 64px sample sits below the training shrink, so
    this covers the flag wiring and the no-shrink guard (same-size resample
    must be skipped); the host-shrink path itself is equality-tested in
    test_api.py::test_pipelined_palette_matches_default."""
    out = str(tmp_path / "pipe.png")
    assert cli.main(
        ["--pipeline", "reduce", "-i", sample_png, "-c", "3", "-o", out]
    ) == 0
    want = str(tmp_path / "plain.png")
    assert cli.main(["reduce", "-i", sample_png, "-c", "3", "-o", want]) == 0
    np.testing.assert_array_equal(
        load_image(out).pixels, load_image(want).pixels
    )
    assert cli.main(
        ["--pipeline", "palette", "-i", sample_png, "-c", "3", "-s", "4"]
    ) == 0
    piped = capsys.readouterr().out
    assert cli.main(["palette", "-i", sample_png, "-c", "3", "-s", "4"]) == 0
    assert capsys.readouterr().out == piped
