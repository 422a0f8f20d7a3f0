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
