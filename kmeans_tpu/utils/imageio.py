"""Image file IO: PNG / JPEG / GIF.

The framework's equivalent of the reference CLI's `image` crate usage
(decode `cli/src/main.rs:53,80,107`, encode via `ImageBuffer::save`) and the
examples' `gif` crate (`core/examples/gif.rs:27-42`). Dispatches to the
native C runtime (`kmeans_tpu/runtime/_imagio.c`, libpng/libjpeg + GIF89a
LZW) and falls back to a pure-Python PNG codec when the extension is not
built. JPEG and GIF require the native runtime.
"""

from __future__ import annotations

import os

import numpy as np

from kmeans_tpu.image import Image

try:
    from kmeans_tpu.runtime import _imagio

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - build-dependent
    _imagio = None
    HAVE_NATIVE = False

from kmeans_tpu.utils import png_py


def set_max_decode_pixels(n: int) -> int:
    """Cap the total pixels any single decode may produce (summed over GIF
    frames). Untrusted bytes can declare huge dimensions in tiny payloads;
    without a cap a ~100-byte GIF claiming 65535x65535 allocates ~17 GB
    (found by tools/fuzz_codec.py). Default 512 Mpix (2 GB RGBA). Returns
    the previous limit. Also settable via the KMEANS_TPU_MAX_DECODE_PIXELS
    environment variable at import time."""
    n = int(n)
    old = png_py.set_max_decode_pixels(n)
    if HAVE_NATIVE:
        old = _imagio.set_max_decode_pixels(n)
    return old


def get_max_decode_pixels() -> int:
    return _imagio.get_max_decode_pixels() if HAVE_NATIVE else (
        png_py.max_decode_pixels()
    )


_env_limit = os.environ.get("KMEANS_TPU_MAX_DECODE_PIXELS")
if _env_limit:
    try:
        set_max_decode_pixels(int(_env_limit))
    except ValueError as _e:
        raise ValueError(
            "KMEANS_TPU_MAX_DECODE_PIXELS must be a positive integer "
            f"(pixel count), got {_env_limit!r}"
        ) from _e


def load_image(path: str | os.PathLike) -> Image:
    """Decode a .png or .jpg/.jpeg file into an RGBA8 `Image`."""
    path = os.fspath(path)
    ext = os.path.splitext(path)[1].lower()
    if ext not in (".png", ".jpg", ".jpeg"):
        raise ValueError("Only support png or jpg files.")
    with open(path, "rb") as f:
        data = f.read()
    return decode_image_bytes(data)


def save_image(image: Image, path: str | os.PathLike, quality: int = 90) -> None:
    """Encode an RGBA8 `Image` to .png or .jpg based on the extension."""
    path = os.fspath(path)
    w, h = image.dimensions
    ext = os.path.splitext(path)[1].lower()
    if ext == ".png":
        data = _encode_png_auto(image) if HAVE_NATIVE else png_py.encode_png(
            w, h, np.ascontiguousarray(image.pixels, dtype=np.uint8).tobytes()
        )
    elif ext in (".jpg", ".jpeg"):
        if not HAVE_NATIVE:
            raise RuntimeError("JPEG support requires the native runtime")
        rgba = np.ascontiguousarray(image.pixels, dtype=np.uint8).tobytes()
        data = _imagio.encode_jpeg(w, h, rgba, quality)
    else:
        raise ValueError("Only support png or jpg files.")
    with open(path, "wb") as f:
        f.write(data)


def _encode_png_auto(image: Image) -> bytes:
    """Quantized outputs (<= 256 unique colors) encode as palette PNGs —
    1 B/px, ~4x faster to deflate and far smaller than RGBA. A cheap sample
    gate avoids the full unique() scan for true-color images."""
    w, h = image.dimensions
    pixels = np.ascontiguousarray(image.pixels, dtype=np.uint8)
    packed = pixels.reshape(-1, 4).view(np.uint32).reshape(-1)
    # Seed the palette from a sample (a full unique() with inverse over
    # megapixels costs seconds); extend with any colors the sample missed.
    colors = np.unique(packed[:: max(1, packed.size // 4096)])
    if len(colors) <= 256:
        for _ in range(2):
            idx = np.searchsorted(colors, packed)
            idx_c = np.minimum(idx, len(colors) - 1)
            miss = colors[idx_c] != packed
            if not miss.any():
                pal_rgba = colors.view(np.uint8).reshape(-1, 4)
                return _imagio.encode_png_indexed(
                    w, h, pal_rgba.tobytes(), idx_c.astype(np.uint8).tobytes()
                )
            colors = np.union1d(colors, np.unique(packed[miss]))
            if len(colors) > 256:
                break
    return _imagio.encode_png(w, h, pixels.tobytes())


def decode_image_bytes(data: bytes) -> Image:
    """Decode in-memory PNG or JPEG bytes (format sniffed from the magic
    number) into an RGBA8 `Image` — the serving-path entry that never
    touches the filesystem."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if HAVE_NATIVE:
            w, h, rgba = _imagio.decode_png(data)
        else:
            w, h, rgba = png_py.decode_png(data)
    elif data[:2] == b"\xff\xd8":
        if not HAVE_NATIVE:
            raise RuntimeError("JPEG support requires the native runtime")
        w, h, rgba = _imagio.decode_jpeg(data)
    else:
        raise ValueError("unrecognized image format (need PNG or JPEG)")
    pixels = np.frombuffer(rgba, np.uint8).reshape(h, w, 4)
    return Image((w, h), pixels)


def encode_png_bytes(image: Image) -> bytes:
    """Encode an RGBA8 `Image` to in-memory PNG bytes (indexed when the
    image is palette-sized, like `save_image`)."""
    if HAVE_NATIVE:
        return _encode_png_auto(image)
    w, h = image.dimensions
    return png_py.encode_png(
        w, h, np.ascontiguousarray(image.pixels, dtype=np.uint8).tobytes()
    )


def load_gif(
    path: str | os.PathLike, with_delays: bool = False
) -> list[Image] | tuple[list[Image], list[int]]:
    """Decode an animated GIF into full-canvas RGBA8 frames (disposal and
    transparency composited by the native decoder). With `with_delays=True`
    also returns each frame's delay in centiseconds."""
    with open(os.fspath(path), "rb") as f:
        data = f.read()
    return decode_gif_bytes(data, with_delays=with_delays)


def decode_gif_bytes(
    data: bytes, with_delays: bool = False
) -> list[Image] | tuple[list[Image], list[int]]:
    """In-memory variant of `load_gif` (serving path)."""
    if not HAVE_NATIVE:
        raise RuntimeError("GIF support requires the native runtime")
    w, h, frames, delays = _imagio.decode_gif(data)
    images = [
        Image((w, h), np.frombuffer(buf, np.uint8).reshape(h, w, 4))
        for buf in frames
    ]
    return (images, list(delays)) if with_delays else images


def save_gif(
    frames: list[Image],
    path: str | os.PathLike,
    delay_cs: int = 100,
    loop: bool = True,
    delays: list[int] | None = None,
) -> None:
    """Encode already-quantized frames (each <= 256 unique colors) as an
    animated GIF — the output format of `core/examples/gif.rs`. `delays`
    (centiseconds, one per frame) overrides the uniform `delay_cs`."""
    data = encode_gif_bytes(frames, delay_cs=delay_cs, loop=loop, delays=delays)
    with open(os.fspath(path), "wb") as f:
        f.write(data)


def encode_gif_bytes(
    frames: list[Image],
    delay_cs: int = 100,
    loop: bool = True,
    delays: list[int] | None = None,
) -> bytes:
    """In-memory variant of `save_gif` (serving path)."""
    if not HAVE_NATIVE:
        raise RuntimeError("GIF support requires the native runtime")
    if not frames:
        raise ValueError("need at least one frame")
    if delays is not None and len(delays) != len(frames):
        raise ValueError("delays must have one entry per frame")
    w, h = frames[0].dimensions
    payload = []
    for fi, frame in enumerate(frames):
        if frame.dimensions != (w, h):
            raise ValueError("all frames must share dimensions")
        rgb = frame.pixels[..., :3].astype(np.uint32)
        packed = (
            (rgb[..., 0] << 16) | (rgb[..., 1] << 8) | rgb[..., 2]
        ).reshape(-1)
        colors_packed, indices = np.unique(packed, return_inverse=True)
        if len(colors_packed) > 256:
            raise ValueError(
                f"frame has {len(colors_packed)} unique colors; quantize to <=256 first"
            )
        colors = np.stack(
            [
                (colors_packed >> 16) & 0xFF,
                (colors_packed >> 8) & 0xFF,
                colors_packed & 0xFF,
            ],
            axis=1,
        )
        entry = (colors.astype(np.uint8).tobytes(), indices.astype(np.uint8).tobytes())
        if delays is not None:
            entry = entry + (int(delays[fi]),)
        payload.append(entry)
    return _imagio.encode_gif(w, h, payload, delay_cs, loop)
