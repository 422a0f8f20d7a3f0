"""Image IO tests: native codec vs pure-Python fallback, GIF encoding."""

import numpy as np
import pytest

from kmeans_tpu.image import Image
from kmeans_tpu.utils import imageio, png_py


def _random_image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)


def test_png_py_roundtrip():
    rgba = _random_image(31, 17)
    data = png_py.encode_png(31, 17, rgba.tobytes())
    w, h, back = png_py.decode_png(data)
    assert (w, h) == (31, 17)
    np.testing.assert_array_equal(
        np.frombuffer(back, np.uint8).reshape(17, 31, 4), rgba
    )


def test_file_roundtrip(tmp_path):
    rgba = _random_image(20, 10, 1)
    path = str(tmp_path / "img.png")
    imageio.save_image(Image((20, 10), rgba), path)
    img = imageio.load_image(path)
    assert img.dimensions == (20, 10)
    np.testing.assert_array_equal(img.pixels, rgba)


@pytest.mark.skipif(not imageio.HAVE_NATIVE, reason="native runtime not built")
def test_native_matches_fallback():
    rgba = _random_image(13, 9, 2)
    from kmeans_tpu.runtime import _imagio

    data = _imagio.encode_png(13, 9, rgba.tobytes())
    w1, h1, a = _imagio.decode_png(data)
    w2, h2, b = png_py.decode_png(data)
    assert (w1, h1) == (w2, h2) == (13, 9)
    assert a == b


@pytest.mark.skipif(not imageio.HAVE_NATIVE, reason="native runtime not built")
def test_native_decodes_filtered_png():
    # libpng-encoded (filtered) data must decode identically in the fallback.
    rgba = np.zeros((32, 32, 4), np.uint8)
    rgba[..., 0] = np.arange(32)[:, None] * 8
    rgba[..., 1] = np.arange(32)[None, :] * 8
    rgba[..., 3] = 255
    from kmeans_tpu.runtime import _imagio

    data = _imagio.encode_png(32, 32, rgba.tobytes())
    _, _, a = _imagio.decode_png(data)
    _, _, b = png_py.decode_png(data)
    assert a == b


@pytest.mark.skipif(not imageio.HAVE_NATIVE, reason="native runtime not built")
def test_jpeg_roundtrip(tmp_path):
    rgba = _random_image(24, 16, 3)
    path = str(tmp_path / "img.jpg")
    imageio.save_image(Image((24, 16), rgba), path)
    img = imageio.load_image(path)
    assert img.dimensions == (24, 16)  # lossy, so only dims checked


@pytest.mark.skipif(not imageio.HAVE_NATIVE, reason="native runtime not built")
def test_gif_encode(tmp_path):
    frames = []
    for i in range(3):
        rgba = np.zeros((8, 8, 4), np.uint8)
        rgba[..., 0] = i * 80
        rgba[..., 3] = 255
        rgba[: i + 2, :, 1] = 200
        frames.append(Image((8, 8), rgba))
    path = str(tmp_path / "anim.gif")
    imageio.save_gif(frames, path, delay_cs=50)
    with open(path, "rb") as f:
        data = f.read()
    assert data[:6] == b"GIF89a"
    assert data[-1:] == b"\x3b"
    assert data.count(b"\x2c") >= 3  # one image descriptor per frame


def test_bad_extension_rejected(tmp_path):
    with pytest.raises(ValueError):
        imageio.load_image(str(tmp_path / "x.bmp"))


@pytest.mark.skipif(not imageio.HAVE_NATIVE, reason="native runtime not built")
def test_gif_decode_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    frames = []
    for i in range(4):
        rgba = np.zeros((10, 14, 4), np.uint8)
        rgba[..., 0] = rng.integers(0, 4) * 60
        rgba[i % 10, :, 1] = 255
        rgba[..., 3] = 255
        frames.append(Image((14, 10), rgba))
    path = str(tmp_path / "rt.gif")
    imageio.save_gif(frames, path)
    back = imageio.load_gif(path)
    assert len(back) == 4
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a.pixels, b.pixels)


def test_png_py_color_key_transparency():
    # Hand-build a truecolor PNG with a tRNS color key; the fallback
    # decoder must produce alpha=0 for keyed pixels (like libpng).
    import struct
    import zlib

    w, h = 3, 1
    rows = b"\x00" + bytes([255, 0, 0, 10, 20, 30, 255, 0, 0])

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"tRNS", struct.pack(">HHH", 255, 0, 0))
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    dw, dh, rgba = png_py.decode_png(data)
    px = np.frombuffer(rgba, np.uint8).reshape(1, 3, 4)
    assert (dw, dh) == (3, 1)
    np.testing.assert_array_equal(px[0, :, 3], [0, 255, 0])


@pytest.mark.skipif(not imageio.HAVE_NATIVE, reason="native runtime not built")
def test_png_color_key_native_matches_fallback():
    import struct
    import zlib

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    rows = b"\x00" + bytes([255, 0, 0, 10, 20, 30])
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
        + chunk(b"tRNS", struct.pack(">HHH", 255, 0, 0))
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    from kmeans_tpu.runtime import _imagio

    _, _, a = _imagio.decode_png(data)
    _, _, b = png_py.decode_png(data)
    assert a == b


@pytest.mark.skipif(not imageio.HAVE_NATIVE, reason="native runtime not built")
def test_gif_encode_rejects_bad_frames():
    from kmeans_tpu.runtime import _imagio

    # index out of palette range
    with pytest.raises(ValueError):
        _imagio.encode_gif(2, 1, [(bytes([255, 0, 0, 0, 255, 0]), bytes([0, 5]))], 100, True)
    # zero-size frame
    with pytest.raises(ValueError):
        _imagio.encode_gif(0, 0, [(bytes([1, 2, 3]), b"")], 100, True)


@pytest.mark.skipif(not imageio.HAVE_NATIVE, reason="native runtime not built")
def test_decoders_reject_corrupt_data():
    from kmeans_tpu.runtime import _imagio

    good_png = _imagio.encode_png(4, 4, bytes(64))
    with pytest.raises(ValueError):
        _imagio.decode_png(good_png[: len(good_png) // 2])  # truncated mid-IDAT
    good_jpg = _imagio.encode_jpeg(4, 4, bytes(64), 90)
    with pytest.raises(ValueError):
        _imagio.decode_jpeg(good_jpg[: len(good_jpg) // 2])
    with pytest.raises(ValueError):
        _imagio.decode_gif(b"GIF89a\x00")


def test_png_py_rejects_truncated_data():
    rgba = _random_image(12, 9, 7)
    data = png_py.encode_png(12, 9, rgba.tobytes())
    for cut in (8, 20, len(data) // 2, len(data) - 5):
        try:
            png_py.decode_png(data[:cut])
        except Exception as e:
            # must fail with a clean exception, never hang or segfault
            assert isinstance(e, (ValueError, struct.error, Exception))


import struct  # noqa: E402


@pytest.mark.skipif(not imageio.HAVE_NATIVE, reason="native runtime not built")
def test_gif_delay_roundtrip(tmp_path):
    frames = []
    for i in range(3):
        rgba = np.full((6, 6, 4), i * 90, np.uint8)
        rgba[..., 3] = 255
        frames.append(Image((6, 6), rgba))
    path = str(tmp_path / "d.gif")
    imageio.save_gif(frames, path, delays=[4, 10, 250])
    back, delays = imageio.load_gif(path, with_delays=True)
    assert delays == [4, 10, 250]
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a.pixels, b.pixels)


class TestDecodeBudget:
    """Dimension bombs: tiny payloads declaring huge dimensions must be
    rejected before allocation (found by tools/fuzz_codec.py — a ~100-byte
    GIF claiming 65535x65535 allocated ~17 GB)."""

    def _bomb_gif(self):
        # header + 65535x65535 logical screen, minimal frame descriptor
        import struct

        h = b"GIF89a" + struct.pack("<HH", 65535, 65535) + bytes([0x00, 0, 0])
        # image descriptor with a small frame but huge canvas + tiny LZW
        desc = b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + bytes([0x80])
        lct = bytes(6)  # 2-entry local color table
        lzw = bytes([2, 1, 0x44, 0])  # min code size, 1-byte block
        return h + desc[:10] + lct + desc[10:] + lzw + b"\x3b"

    def test_gif_dimension_bomb_rejected(self):
        import pytest

        from kmeans_tpu.utils import imageio

        if not imageio.HAVE_NATIVE:
            pytest.skip("native codec not built")
        with pytest.raises(ValueError, match="decode limit"):
            imageio._imagio.decode_gif(self._bomb_gif())

    def test_png_dimension_bomb_rejected(self):
        import struct
        import zlib

        import pytest

        from kmeans_tpu.utils import imageio, png_py

        def chunk(ctype, payload):
            c = ctype + payload
            return struct.pack(">I", len(payload)) + c + struct.pack(
                ">I", zlib.crc32(c)
            )

        # within libpng's 1M-per-dimension default cap (so OUR budget is
        # what rejects it), but 10 Gpix >> the 512 Mpix decode budget
        ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 6, 0, 0, 0)
        bomb = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="decode limit"):
            png_py.decode_png(bomb)
        if imageio.HAVE_NATIVE:
            with pytest.raises(ValueError, match="decode limit"):
                imageio._imagio.decode_png(bomb)

    def test_limit_adjustable_and_restored(self):
        from kmeans_tpu.utils import imageio

        old = imageio.get_max_decode_pixels()
        try:
            prev = imageio.set_max_decode_pixels(1000)
            assert prev == old
            assert imageio.get_max_decode_pixels() == 1000
            import numpy as np
            import pytest

            from kmeans_tpu.image import Image

            big = Image((64, 64), np.zeros((64, 64, 4), np.uint8))
            data = imageio.encode_png_bytes(big)
            with pytest.raises(ValueError, match="decode limit"):
                imageio.decode_image_bytes(data)
        finally:
            imageio.set_max_decode_pixels(old)
        # normal decode works again
        img = imageio.decode_image_bytes(data)
        assert img.dimensions == (64, 64)


def test_codec_fuzz_smoke():
    """Short mutation-fuzz pass over the native decoders (the full harness
    is tools/fuzz_codec.py): no worker crash across 300 mutants."""
    import os
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/fuzz_codec.py", "300", "42"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=240,
    )
    assert r.returncode == 0, r.stdout + r.stderr
