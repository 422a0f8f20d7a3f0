"""Bilinear image resize matching the reference's GPU sampler semantics.

The reference shrinks the k-means training image with a compute pass that
samples the source texture with a linear-filter, clamp-to-edge sampler at the
normalized coordinate `(x / W_out, y / H_out)` — i.e. the *corner* of each
output texel, not its center (`core/shaders/resize.wgsl:15-16`, sampler setup
`core/src/structures.rs:122-133`). GPU texture sampling then interpolates
between the two source texels whose centers bracket `coord * W_in - 0.5`.

`jax.image.resize` uses half-pixel-center alignment, which is shifted by half
an output texel from this; to reproduce the reference's training inputs (and
therefore its palettes) we implement the sampler convention directly with
gathers. The shrink-size policy (long side capped, short side scaled
proportionally with floor + min 1) matches `core/src/structures.rs:76-93`.
"""

from __future__ import annotations

import jax.numpy as jnp


def shrunk_dimensions(
    width: int, height: int, max_size: int | None
) -> tuple[int, int]:
    """New (width, height) after capping the long side at `max_size`.

    Matches `InputTexture::resized` (`core/src/structures.rs:78-90`): the
    scaled short side is truncated toward zero and clamped to >= 1. Returns
    the original dimensions when both sides already fit, or always when
    `max_size` is None (full-resolution training, no shrink).
    """
    if max_size is None or (width <= max_size and height <= max_size):
        return width, height
    if width > height:
        return max_size, max(int(height * max_size / width), 1)
    return max(int(width * max_size / height), 1), max_size


def resize_uint8_np(image_u8, new_height: int, new_width: int):
    """Host (numpy) mirror of `resize_uint8`: same corner-aligned
    clamp-to-edge sampler, same unorm round-trip, computed in f32 on the
    CPU. Used by the pipelined reduce to build the training strip BEFORE
    the full-resolution bands upload (the device shrink would need the
    whole image device-resident first, serializing the transfers —
    api.py::_reduce_banded). numpy evaluates the same f32 expressions
    without XLA's FMA contraction, so isolated pixels can round one u8
    step apart from the device shrink; the trained palette is equal or
    near-identical (quality-asserted in tests/test_api.py)."""
    import numpy as np

    image_u8 = np.asarray(image_u8)
    h, w = image_u8.shape[0], image_u8.shape[1]

    def axis_weights(n_out: int, n_in: int):
        coord = (
            np.arange(n_out, dtype=np.float32) / np.float32(n_out) * n_in
            - np.float32(0.5)
        )
        i0 = np.floor(coord)
        frac = coord - i0
        lo = np.clip(i0.astype(np.int32), 0, n_in - 1)
        hi = np.clip(i0.astype(np.int32) + 1, 0, n_in - 1)
        return lo, hi, frac

    y0, y1, fy = axis_weights(new_height, h)
    x0, x1, fx = axis_weights(new_width, w)
    # Gather the sampled rows in u8 FIRST, then convert only those to f32:
    # the u8->f32 unorm conversion is elementwise, so slicing before it is
    # bit-identical to converting the whole image — and for a 4K -> 256px
    # strip it touches ~2x144 rows instead of all 2160 (the full-image
    # conversion alone was ~100 MB of writes).
    top = image_u8[y0].astype(np.float32) / np.float32(255.0)
    bot = image_u8[y1].astype(np.float32) / np.float32(255.0)
    fy = fy[:, None, None]
    rows = top * (np.float32(1.0) - fy) + bot * fy
    left = rows[:, x0]
    right = rows[:, x1]
    fx = fx[None, :, None]
    out = left * (np.float32(1.0) - fx) + right * fx
    return np.round(np.clip(out, 0.0, 1.0) * np.float32(255.0)).astype(
        np.uint8
    )


def resize_bilinear(image: jnp.ndarray, new_height: int, new_width: int) -> jnp.ndarray:
    """Resize `image[H, W, C]` (float) to `[new_height, new_width, C]` using
    the reference sampler convention (corner-aligned, clamp-to-edge)."""
    image = jnp.asarray(image)
    h, w = image.shape[0], image.shape[1]

    def axis_weights(n_out: int, n_in: int):
        # Continuous source coordinate of each output sample, in texels.
        coord = jnp.arange(n_out, dtype=jnp.float32) / n_out * n_in - 0.5
        i0 = jnp.floor(coord)
        frac = coord - i0
        lo = jnp.clip(i0.astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(i0.astype(jnp.int32) + 1, 0, n_in - 1)
        return lo, hi, frac

    y0, y1, fy = axis_weights(new_height, h)
    x0, x1, fx = axis_weights(new_width, w)

    top = image[y0]  # [new_h, W, C]
    bot = image[y1]
    fy = fy[:, None, None]
    rows = top * (1.0 - fy) + bot * fy  # [new_h, W, C]

    left = rows[:, x0]  # [new_h, new_w, C]
    right = rows[:, x1]
    fx = fx[None, :, None]
    return left * (1.0 - fx) + right * fx


def resize_uint8(image_u8: jnp.ndarray, new_height: int, new_width: int) -> jnp.ndarray:
    """uint8 [H, W, C] resize via the unorm float path, rounding back to uint8
    like the Rgba8Unorm storage-texture write in the reference resize pass."""
    out = resize_bilinear(jnp.asarray(image_u8, jnp.float32) / 255.0, new_height, new_width)
    return jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def resize_to_canvas(
    image_u8: jnp.ndarray,
    canvas_height: int,
    canvas_width: int,
    src_h,
    src_w,
    out_h,
    out_w,
):
    """Dynamic-size shrink into a static canvas — the shape-bucketing
    training path.

    `image_u8[Hp, Wp, C]` holds real data in its top-left `[src_h, src_w]`
    corner (the rest is padding). The real image is resized to
    `[out_h, out_w]` with the same corner-aligned sampler as
    `resize_bilinear` and written to the top-left of a static
    `[canvas_height, canvas_width, C]` canvas. `src_h/src_w/out_h/out_w`
    are traced int32 scalars, so ONE compiled executable serves every
    image size within the bucket — only gather indices change.

    When `out == src` along an axis the sampler is replaced by an exact
    identity gather (the no-shrink case; blind corner-aligned sampling at
    equal sizes would blend neighbors instead).

    Returns `(canvas_u8, weight)` where `weight[canvas_height,
    canvas_width]` is 1.0 on real output pixels and 0.0 on canvas padding.
    """
    image_u8 = jnp.asarray(image_u8)
    src_h = jnp.asarray(src_h, jnp.int32)
    src_w = jnp.asarray(src_w, jnp.int32)
    out_h = jnp.asarray(out_h, jnp.int32)
    out_w = jnp.asarray(out_w, jnp.int32)

    def axis(n_canvas: int, n_out, n_in):
        pos = jnp.arange(n_canvas, dtype=jnp.int32)
        coord = (
            pos.astype(jnp.float32)
            / n_out.astype(jnp.float32)
            * n_in.astype(jnp.float32)
            - 0.5
        )
        i0 = jnp.floor(coord)
        frac = coord - i0
        lo = jnp.clip(i0.astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(i0.astype(jnp.int32) + 1, 0, n_in - 1)
        ident = n_out == n_in
        direct = jnp.minimum(pos, n_in - 1)
        lo = jnp.where(ident, direct, lo)
        hi = jnp.where(ident, direct, hi)
        frac = jnp.where(ident, 0.0, frac)
        return lo, hi, frac, pos < n_out

    y0, y1, fy, vy = axis(canvas_height, out_h, src_h)
    x0, x1, fx, vx = axis(canvas_width, out_w, src_w)

    img = jnp.asarray(image_u8, jnp.float32) / 255.0
    top = img[y0]
    bot = img[y1]
    rows = top * (1.0 - fy[:, None, None]) + bot * fy[:, None, None]
    left = rows[:, x0]
    right = rows[:, x1]
    out = left * (1.0 - fx[None, :, None]) + right * fx[None, :, None]
    canvas = jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    weight = (vy[:, None] & vx[None, :]).astype(jnp.float32)
    return canvas, weight
